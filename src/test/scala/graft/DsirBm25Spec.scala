package graft

import org.apache.spark.sql.functions._

import graft.operators.Curation

/** DSIR importance resampling and BM25 retrieval scoring — the
  * data-selection additions (SURVEY.md §2c). */
class DsirBm25Spec extends SparkSpec {
  import spark.implicits._

  // two disjoint vocabularies: target docs speak A, raw-only docs
  // speak B — the hashed-bag likelihood ratio must separate them
  private def plantedCorpus = {
    val aTok = Seq("alpha", "axiom", "amber", "atlas")
    val bTok = Seq("bison", "borax", "blimp", "bugle")
    val rows =
      (0 until 20).map { i =>
        (i.toLong, "en", (0 until 12).map(j => aTok((i + j) % 4)).mkString(" "))
      } ++ (20 until 40).map { i =>
        (i.toLong, "de", (0 until 12).map(j => bTok((i + j) % 4)).mkString(" "))
      }
    rows.toDF("doc_id", "lang", "text")
  }

  test("dsirWeights separates target-vocabulary docs from raw-only docs") {
    val w = Curation.dsirWeights(plantedCorpus, "doc_id", col("text"),
        col("lang") === "en", nBuckets = 32)
      .as[(Long, Double)].collect().toMap
    val (aMin, bMax) =
      ((0L until 20L).map(w).min, (20L until 40L).map(w).max)
    assert(aMin > 0.0, s"target-like doc scored non-positive: $aMin")
    assert(bMax < 0.0, s"raw-only doc scored non-negative: $bMax")
    assert(aMin - bMax > 5.0,
      s"disjoint vocabularies should separate by a wide margin, got ${aMin - bMax}")
  }

  test("dsirWeightsSparse (long-form model) matches the dense fold at 1e-9") {
    val docs = sources.Tables.documents(spark, sfDir)
    val dense = Curation.dsirWeights(docs, "doc_id", col("text"),
      col("lang") === "en", nBuckets = 32).as[(Long, Double)].collect().toMap
    val sparse = Curation.dsirWeightsSparse(docs, "doc_id", col("text"),
      col("lang") === "en", nBuckets = 32).as[(Long, Double)].collect().toMap
    assert(dense.keySet === sparse.keySet)
    val maxDiff = dense.map { case (id, v) => math.abs(v - sparse(id)) }.max
    assert(maxDiff <= 1e-9, s"dense vs long-form diverged by $maxDiff")
  }

  test("dsirSelect draws k rows and the wide-margin draw lands on target docs") {
    val sel = Curation.dsirSelect(plantedCorpus, "doc_id", col("text"),
        col("lang") === "en", nBuckets = 32, k = 10)
      .as[(Long, Double, Double)].collect()
    assert(sel.length === 10)
    // planted weight gap (> 5 nats) dwarfs Gumbel(0,1) noise: every
    // draw must come from the target-vocabulary half
    assert(sel.forall(_._1 < 20L),
      s"selection leaked raw-only docs: ${sel.map(_._1).toSeq.sorted}")
    // the draw is deterministic — replay is bit-identical
    val again = Curation.dsirSelect(plantedCorpus, "doc_id", col("text"),
        col("lang") === "en", nBuckets = 32, k = 10)
      .as[(Long, Double, Double)].collect()
    assert(sel.sortBy(_._1).toSeq === again.sortBy(_._1).toSeq)
  }

  test("bm25TopK ranks tf, then penalizes length, and ignores term-free docs") {
    val docs = Seq(
      (1L, "query query query pad"),            // tf=3, dl=4
      (2L, "query query pad pad"),              // tf=2, dl=4
      (3L, "query query pad pad pad pad pad pad"), // tf=2, dl=8 — longer, same tf
      (4L, "pad pad pad pad"))                  // no term
      .toDF("doc_id", "text")
    val out = Curation.bm25TopK(docs, "doc_id", col("text"),
        terms = Seq("query"), k = 4)
      .as[(Long, Int, Double)].collect().sortBy(_._2)
    assert(out.map(_._1).toSeq === Seq(1L, 2L, 3L, 4L),
      s"unexpected ranking: ${out.toSeq}")
    assert(out.last._3 === 0.0, "a doc with zero query terms must score 0")
  }

  test("bm25TopK matches the formula on a hand-computed doc") {
    val docs = Seq(
      (1L, "w w x"), (2L, "x y z z"), (3L, "w x y z z z"))
      .toDF("doc_id", "text")
    // term "w": df=2, N=3, avgdl=(3+4+6)/3
    val (k1, b) = (1.2, 0.75)
    val avgdl = (3.0 + 4.0 + 6.0) / 3.0
    val idf = math.log(1.0 + (3.0 - 2.0 + 0.5) / (2.0 + 0.5))
    def s(tf: Double, dl: Double) =
      idf * (tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + b * dl / avgdl))
    def r4(v: Double) = // Spark round() is HALF_UP
      BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = Map(1L -> r4(s(2, 3)), 2L -> r4(s(0, 4)), 3L -> r4(s(1, 6)))
    val out = Curation.bm25TopK(docs, "doc_id", col("text"),
        terms = Seq("w"), k = 3)
      .as[(Long, Int, Double)].collect().map(r => r._1 -> r._3).toMap
    expected.foreach { case (id, v) =>
      assert(math.abs(out(id) - v) <= 1e-9, s"doc $id: got ${out(id)}, want $v")
    }
  }

  test("epochsSample: clamp, expectation-correct up-sampling, inert default") {
    // 3 strata x 40 docs x 10 tokens each
    val docs = (0 until 120).map { i =>
      (i.toLong, s"s${i % 3}", Seq.fill(10)("tok").mkString(" "))
    }.toDF("doc_id", "source", "text")
    val out = Curation.epochsSample(docs, "source", "doc_id",
        graft.functions.Text.tokenCount(col("text")),
        // s0: 0.5*1200/400 = 1.5 epochs; s1: 2.0*1200/400 = 6 -> clamp 4
        targetShares = Map("s0" -> 0.5, "s1" -> 2.0),
        budgetFactor = 1.0, maxEpochs = 4.0)
      .as[(Long, String, Double, Int)].collect()
    val byS = out.groupBy(_._2)
    // clamped stratum: every doc at exactly 4 copies
    assert(byS("s1").forall(r => r._3 === 4.0 && r._4 === 4))
    // unmapped stratum: exactly 1 copy each (frac 0 never fires)
    assert(byS("s2").forall(r => r._3 === 1.0 && r._4 === 1))
    // fractional stratum: epochs 1.5, copies in {1, 2}, realized
    // tokens within Bernoulli noise of the 600-token target
    // (sd = sqrt(40 * 0.25) * 10 ≈ 32)
    assert(byS("s0").forall(r => r._3 === 1.5 && (r._4 === 1 || r._4 === 2)))
    val realized = byS("s0").map(_._4).sum * 10
    assert(math.abs(realized - 600) <= 100,
      s"realized s0 tokens $realized far from the 600 target")
  }

  test("epochsSample keeps NULL-stratum docs at defaultEpochs instead of dropping them") {
    val docs = Seq(
      (1L, "s0", "a b c d"), (2L, "s0", "a b c d"),
      (3L, null.asInstanceOf[String], "a b c d"))
      .toDF("doc_id", "source", "text")
    val out = Curation.epochsSample(docs, "source", "doc_id",
        graft.functions.Text.tokenCount(col("text")),
        targetShares = Map("s0" -> 0.5), budgetFactor = 1.0, maxEpochs = 4.0)
      .as[(Long, Option[String], Double, Int)].collect()
    assert(out.length === 3, s"NULL-stratum doc dropped: ${out.toSeq}")
    val nullRow = out.find(_._1 == 3L).get
    assert(nullRow._3 === 1.0 && nullRow._4 === 1)
  }

  test("epochsSample draw is avalanched: u spreads over (0,1) on sequential ids") {
    // the poly-31 low bits cluster on sequential ids (span < 0.6 over
    // hundreds of ids); the md5 draw must cover the unit interval
    val docs = (0 until 300).map(i => (i.toLong, "s", "a b c"))
      .toDF("doc_id", "source", "text")
    // epochs = 0.5 exactly: n_copies is Bernoulli(0.5) on u
    val picks = Curation.epochsSample(docs, "source", "doc_id",
        graft.functions.Text.tokenCount(col("text")),
        targetShares = Map("s" -> 0.5), budgetFactor = 1.0, maxEpochs = 4.0)
      .as[(Long, String, Double, Int)].collect()
    val ones = picks.count(_._4 == 1)
    // binomial(300, 0.5): mean 150, sd ~8.7 — accept ±5 sd
    assert(ones > 105 && ones < 195,
      s"Bernoulli(0.5) draw produced $ones/300 successes — u is not uniform")
  }

  test("qualityEnsemble ≡ its component gates composed, flag for flag") {
    val docs = sources.Tables.documents(spark, sfDir)
    val ens = Curation.qualityEnsemble(docs, "doc_id", "text",
        minWords = 10, maxWords = 50000, minSentences = 0,
        bias = -2.0, wLogTokens = 0.6, wStopDev = -6.0,
        wTokenLen = 0.1, wPunct = -4.0,
        maxTopTokenRatio = 0.12, maxDupTrigramRatio = 0.05)
      .as[(Long, Boolean, Boolean, Boolean, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    val c4 = Curation.c4Filters(docs, "doc_id", "text", 10, 50000, 0)
      .select(col("doc_id"), col("c4_keep"))
      .as[(Long, Boolean)].collect().toMap
    val clf = Curation.qualityClassifier(docs, "doc_id", "text",
        -2.0, 0.6, -6.0, 0.1, -4.0)
      .select(col("doc_id"), col("keep"))
      .as[(Long, Boolean)].collect().toMap
    val rep = Curation.repetitionStats(docs, "doc_id", "text", 0.12, 0.05)
      .select(col("doc_id"), col("rep_ok"))
      .as[(Long, Boolean)].collect().toMap
    assert(ens.keySet === c4.keySet)
    ens.foreach { case (id, (c4k, clfk, repk, keep)) =>
      assert(c4k === c4(id) && clfk === clf(id)
        && repk === rep.getOrElse(id, false)
        && keep === (c4k && clfk && repk), s"doc $id flags diverge")
    }
  }

  test("bm25TopK plan: stats broadcast, corpus never shuffled, TakeOrdered selection") {
    val docs = sources.Tables.documents(spark, sfDir)
    val p = Curation.bm25TopK(docs, "doc_id", col("text"),
      terms = Seq("vector", "customer", "spark"), k = 20)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"corpus stats not broadcast:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k selection is not a TakeOrdered:\n$p")
  }
}
