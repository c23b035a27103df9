package graft

import org.apache.spark.sql.functions._

import graft.operators.{IndexTuning, Similarity}
import graft.operators.IndexTuning.{IvfParams, ivfParamsFor, lshBitsFor}

/** The index auto-retune loop: occupancy rules, the recall reading,
  * and the full monitor→retune cycle — a landed IVF index is healthy
  * on the corpus it saw, PROVABLY sags after drifting growth lands
  * under its frozen quantizer, and the rule-driven retune restores
  * recall. */
class IndexTuningSpec extends SparkSpec {
  import spark.implicits._

  // ---- the occupancy rules themselves ----

  test("ivfParamsFor follows the √N rule with a constant probe fraction") {
    assert(ivfParamsFor(0L) === IvfParams(1, 1))
    assert(ivfParamsFor(10000L).nlists === 100)
    assert(ivfParamsFor(1000000L).nlists === 1000)
    // 100× corpus → 10× lists (√N), nprobe stays the same fraction
    // (ceil'd: 100 lists → 13 probes, 1000 lists → 125)
    val (small, big) = (ivfParamsFor(10000L), ivfParamsFor(1000000L))
    assert(big.nlists === small.nlists * 10)
    assert(small.nprobe === 13 && big.nprobe === 125)
    // clamped at the ceiling
    assert(ivfParamsFor(Long.MaxValue).nlists === (1 << 16))
  }

  test("lshBitsFor keeps expected bucket occupancy constant") {
    // N/2^bits ≤ targetOccupancy, and bits is minimal for that
    for (n <- Seq(100L, 1000L, 10000L, 1000000L); occ <- Seq(16L, 32L, 64L)) {
      val b = lshBitsFor(n, occ)
      assert(n.toDouble / (1L << b) <= occ, s"n=$n occ=$occ bits=$b")
      assert(b == 1 || n.toDouble / (1L << (b - 1)) > occ,
        s"bits not minimal: n=$n occ=$occ bits=$b")
    }
    // doubling the corpus costs exactly one bit
    assert(lshBitsFor(2048L, 32L) === lshBitsFor(1024L, 32L) + 1)
  }

  // ---- the full loop on a landed index ----

  private val dim = 4
  private def unit(i: Int): Array[Double] =
    Array.tabulate(dim)(j => if (i == j) 1.0 else 0.0)
  private def normalize(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    v.map(_ / n)
  }
  private def mix(a: Array[Double], ca: Double, b: Array[Double],
      cb: Double): Array[Double] =
    normalize(Array.tabulate(dim)(j => ca * a(j) + cb * b(j)))

  // land-time corpus: four tight clusters on the axes
  private def corpusA = (for {
    c <- 0 until 4
    i <- 0 until 12
  } yield {
    val jitter = 0.06 * ((i % 5) - 2) / 2.0
    (c * 100L + i, mix(unit(c), 1.0, unit((c + 1) % 4), jitter).toSeq)
  }).toDF("vec_id", "embedding")

  // the drifting growth: one coherent new cluster BETWEEN axes 0 and
  // 1, spread across the frozen quantizer's cell boundary — δ runs
  // −0.2…0.2, so half the cluster assigns to the e0 cell, half to e1
  private def batchB = (0 until 40).map { i =>
    val d = -0.2 + 0.4 * i / 39.0
    (1000L + i, mix(unit(0), 1.0 + d, unit(1), 1.0 - d).toSeq)
  }.toDF("vec_id", "embedding")

  // audit: the B-cluster center (equidistant to both halves) plus one
  // in-cluster A query — the slice a monitor would sample
  private def auditB = Seq((9000L, mix(unit(0), 1.0, unit(1), 1.0).toSeq))
    .toDF("vec_id", "embedding")
  private def auditA = Seq((9001L, mix(unit(2), 1.0, unit(3), 0.02).toSeq))
    .toDF("vec_id", "embedding")

  test("monitor→retune: frozen quantizer sags under drift, rule-derived retune restores") {
    dropTables("retune_ivf")
    val landed = IvfParams(nlists = 4, nprobe = 1) // healthy at land time
    val q0 = Similarity.kmeansCentroids(corpusA, "vec_id", "embedding",
      landed.nlists, iters = 3,
      init = Some(Similarity.kmeansPlusPlusInit(corpusA, "vec_id",
        "embedding", landed.nlists, sampleSize = 64, seed = 7L)),
      roundTo = Some(6))
    Similarity.ivfIndexWrite(corpusA, "vec_id", "embedding", q0, "retune_ivf")

    // healthy on the corpus it saw: the monitor reads ≥ target and the
    // cycle no-ops (measurement is the only cost)
    val healthy = IndexTuning.retuneIvf(spark, "retune_ivf", q0, corpusA,
      auditA, "vec_id", "embedding", landed, targetRecall = 0.9, k = 5)
    assert(!healthy.retuned, s"healthy index retuned: $healthy")
    assert(healthy.recallBefore >= 0.9, s"land-time recall ${healthy.recallBefore}")

    // growth lands under the FROZEN quantizer (the append contract)
    Similarity.ivfIndexAppend(spark, "retune_ivf", batchB,
      "vec_id", "embedding", q0)
    val grown = corpusA.unionByName(batchB)

    // the sag is real and measured: the B query's true top-5 straddles
    // the two old cells the cluster was split across, nprobe=1 sees one
    val sagged = IndexTuning.ivfIndexRecall(spark, "retune_ivf", q0,
      grown, auditB, "vec_id", "embedding", landed.nprobe, k = 5)
    assert(sagged < 0.75, s"expected the frozen index to sag, got $sagged")

    // the loop: below target → re-derive from the √N rule at the NEW
    // size, retrain, rebuild, re-measure
    val report = IndexTuning.retuneIvf(spark, "retune_ivf", q0, grown,
      auditB, "vec_id", "embedding", landed, targetRecall = 0.9, k = 5,
      probeFrac = 0.25, iters = 3, sampleSize = 128, seed = 7L)
    assert(report.retuned)
    assert(report.n === 88L)
    assert(report.after.nlists === ivfParamsFor(88L, probeFrac = 0.25).nlists)
    assert(report.recallBefore === sagged)
    assert(report.recallAfter >= 0.9,
      s"retune failed to restore recall: $report")

    // the rebuilt table serves the A slice too — retuning for the
    // drift must not break the original region
    val aAfter = IndexTuning.ivfIndexRecall(spark, "retune_ivf",
      report.quantizer, grown, auditA, "vec_id", "embedding",
      report.after.nprobe, k = 5)
    assert(aAfter >= 0.9, s"retune regressed the original region: $aAfter")
    dropTables("retune_ivf")
  }

  test("retune rebuild clears pending tombstones — rebuilt rows serve again") {
    dropTables("retune_ivf2")
    val landed = IvfParams(nlists = 4, nprobe = 1)
    val q0 = Similarity.kmeansCentroids(corpusA, "vec_id", "embedding",
      landed.nlists, iters = 3,
      init = Some(Similarity.kmeansPlusPlusInit(corpusA, "vec_id",
        "embedding", landed.nlists, sampleSize = 64, seed = 7L)),
      roundTo = Some(6))
    Similarity.ivfIndexWrite(corpusA, "vec_id", "embedding", q0, "retune_ivf2")

    // a takedown lands a tombstone sibling, then drift growth arrives
    // under the frozen quantizer
    Similarity.ivfIndexRemove(spark, "retune_ivf2",
      Seq(0L).toDF("vec_id"), "vec_id")
    assert(spark.catalog.tableExists("retune_ivf2__tombstones"))
    Similarity.ivfIndexAppend(spark, "retune_ivf2", batchB,
      "vec_id", "embedding", q0)

    // the retune corpus is the caller's CURRENT truth and it contains
    // vec_id 0 again (the takedown was upstream-reversed): the rebuild
    // must serve it, which requires dropping the stale tombstone —
    // sampleSize=1 also proves the init sample is derived from the
    // re-computed nlists, not the caller's static floor
    val grown = corpusA.unionByName(batchB)
    val report = IndexTuning.retuneIvf(spark, "retune_ivf2", q0, grown,
      auditB, "vec_id", "embedding", landed, targetRecall = 0.9, k = 5,
      probeFrac = 0.25, iters = 3, sampleSize = 1, seed = 7L)
    assert(report.retuned)
    assert(!spark.catalog.tableExists("retune_ivf2__tombstones"),
      "rebuild left the stale tombstone sibling in place")
    val served = Similarity.ivfProbeIndex(spark, "retune_ivf2",
      corpusA.filter(col("vec_id") === 0L), "vec_id", "embedding",
      report.quantizer, report.after.nprobe, k = 1)
    assert(served.filter(col("neighbor_id") === 0L).count() === 1L,
      "once-removed id is still hidden after the rebuild")
    dropTables("retune_ivf2")
  }

  test("SQ8 drift monitor→rebuild: tolerated per-batch drift accumulates, retune restores") {
    dropTables("retune_sq8")
    def vecsOf(rows: Seq[(Long, Seq[Double])]) = rows.toDF("vec_id", "embedding")
    // land-time corpus in [0,1]^4
    val a = vecsOf((0 until 40).map(i =>
      (i.toLong, Seq(0.1 + i / 40.0, 0.1 + (i % 7) / 7.0, 0.1 + (i % 11) / 11.0, 0.1 + (i % 5) / 5.0))))
    val (mins, spans) = Similarity.sq8Ranges(a, "vec_id", "embedding")
    Similarity.sq8IndexWrite(a, "vec_id", "embedding", mins, spans, "retune_sq8")
    // a takedown leaves a tombstone the rebuild must clear
    Similarity.sq8IndexRemove(spark, "retune_sq8", Seq(5L).toDF("vec_id"), "vec_id")
    assert(spark.catalog.tableExists("retune_sq8__tombstones"))
    // a drifting batch: dim 0 slides to [1.1, 1.4] — 25% of its values
    // out of range, ADMITTED under a tolerant per-batch guard
    val b = vecsOf((0 until 20).map(i =>
      (100L + i, Seq(1.3 + 0.3 * i / 19.0, 0.1 + (i % 7) / 7.0, 0.1 + (i % 11) / 11.0, 0.1 + (i % 5) / 5.0))))
    Similarity.sq8IndexAppend(spark, "retune_sq8", b, "vec_id", "embedding",
      mins, spans, maxDriftFrac = 0.3)

    // corpus-wide the tolerated drift accumulated past a tight SLO
    val grown = a.unionByName(b) // vec_id 5 is back in the truth too
    val rep = IndexTuning.retuneSq8(spark, "retune_sq8", grown,
      "vec_id", "embedding", mins, spans, maxDriftFrac = 0.01)
    assert(rep.retuned && rep.driftBefore > 0.01, s"no trigger: $rep")
    assert(rep.driftAfter === 0.0)
    assert(!spark.catalog.tableExists("retune_sq8__tombstones"),
      "rebuild left the stale tombstone sibling")

    // rebuilt index ≡ the inline operator under the re-derived ranges
    // (sq8TopK derives its ranges from the same grown corpus), and the
    // once-removed id serves again
    val queries = vecsOf(Seq((900L, Seq(1.35, 0.5, 0.5, 0.5))))
    val served = Similarity.sq8ProbeIndex(spark, "retune_sq8", queries,
      "vec_id", "embedding", rep.mins, rep.spans, k = 5)
      .select("rnk", "neighbor_id").collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    val inline = Similarity.sq8TopK(grown, queries, "vec_id", "embedding", k = 5)
      .select("rnk", "neighbor_id").collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(served === inline)
    val self = Similarity.sq8ProbeIndex(spark, "retune_sq8",
      a.filter(col("vec_id") === 5L), "vec_id", "embedding",
      rep.mins, rep.spans, k = 1)
    assert(self.filter(col("neighbor_id") === 5L).count() === 1L)

    // the rebuilt index clears the next monitor cycle (no-op path)
    val rep2 = IndexTuning.retuneSq8(spark, "retune_sq8", grown,
      "vec_id", "embedding", rep.mins, rep.spans, maxDriftFrac = 0.01)
    assert(!rep2.retuned && rep2.driftBefore === 0.0)
    dropTables("retune_sq8")
  }

  // ---- the LSH pair family ----

  test("lshTablesFor satisfies the collision bound minimally and responds to bits") {
    for (bits <- Seq(1, 2, 4, 8); tau <- Seq(0.5, 0.7, 0.9);
         target <- Seq(0.8, 0.9, 0.95)) {
      val t = IndexTuning.lshTablesFor(bits, tau, target, maxTables = 4096)
      val p = math.pow(1.0 - math.acos(tau) / math.Pi, bits)
      assert(1.0 - math.pow(1.0 - p, t) >= target - 1e-12,
        s"bits=$bits tau=$tau target=$target t=$t misses the bound")
      if (t > 1)
        assert(1.0 - math.pow(1.0 - p, t - 1) < target,
          s"bits=$bits tau=$tau target=$target t=$t not minimal")
    }
    // more bits per table → lower per-table collision → more tables
    assert(IndexTuning.lshTablesFor(8, 0.7, 0.9, 4096) >
      IndexTuning.lshTablesFor(2, 0.7, 0.9, 4096))
  }

  // LSH sag corpus: 60 deterministic pseudo-random unit vectors in
  // dim 8, each with a partner at cosine EXACTLY 0.75 (just above
  // the serving tau 0.7) — the hard pairs the index is contracted to
  // find. At bits=8/tables=1 the per-table collision probability of
  // such a pair is (1 - acos(.75)/π)^8 ≈ 0.12, so the single-table
  // index provably misses most of them.
  private val lshDim = 8
  private def pseudo(i: Int): Array[Double] =
    normalizeN(Array.tabulate(lshDim)(j => math.sin(1.0 + i * 7 + j * 3)))
  private def normalizeN(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    v.map(_ / n)
  }
  private def lshCorpus = {
    val cosT = 0.75
    val rows = (0 until 60).flatMap { i =>
      val v = pseudo(i)
      val r = pseudo(i + 1000)
      val dot = v.zip(r).map { case (a, b) => a * b }.sum
      val u = normalizeN(r.zip(v).map { case (a, b) => a - dot * b })
      val w = Array.tabulate(lshDim)(j =>
        cosT * v(j) + math.sqrt(1 - cosT * cosT) * u(j))
      Seq((i.toLong, v.toSeq), (10000L + i, w.toSeq))
    }
    rows.toDF("vec_id", "embedding")
  }

  test("LSH monitor→retune: single-table index sags on threshold pairs, collision-bound retune restores") {
    dropTables("retune_lsh_vecs", "retune_lsh_bands")
    val corpus = lshCorpus
    val audit = corpus.filter(col("vec_id") < 20) // 20 base vectors
    val weak = IndexTuning.LshParams(bits = 8, tables = 1)
    graft.operators.Dedup.embeddingIndexWrite(corpus, "vec_id", "embedding",
      lshDim, weak.bits, weak.tables, seed = 42L,
      "retune_lsh_vecs", "retune_lsh_bands")

    val report = IndexTuning.retuneLsh(spark, "retune_lsh_vecs",
      "retune_lsh_bands", corpus, audit, "vec_id", "embedding",
      dim = lshDim, seed = 42L, current = weak, tau = 0.7,
      targetRecall = 0.9, targetOccupancy = 32L)
    assert(report.retuned, s"weak index did not trigger: $report")
    assert(report.recallBefore < 0.6,
      s"single-table index should sag on threshold pairs: $report")
    assert(report.n === 120L)
    // rule-derived family: bits from occupancy at N=120, tables from
    // the collision bound at those bits
    assert(report.after.bits === lshBitsFor(120L, 32L))
    assert(report.after.tables ===
      IndexTuning.lshTablesFor(report.after.bits, 0.7, 0.9))
    assert(report.recallAfter >= 0.85,
      s"retune failed to restore pair recall: $report")

    // the rebuilt index clears the next monitor cycle (no-op path)
    val cycle2 = IndexTuning.retuneLsh(spark, "retune_lsh_vecs",
      "retune_lsh_bands", corpus, audit, "vec_id", "embedding",
      dim = lshDim, seed = 42L, current = report.after, tau = 0.7,
      targetRecall = 0.85, targetOccupancy = 32L)
    assert(!cycle2.retuned, s"healthy index retuned: $cycle2")
    assert(cycle2.recallBefore === report.recallAfter)
    dropTables("retune_lsh_vecs", "retune_lsh_bands")
  }
}
