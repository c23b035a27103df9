package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Index AUTO-RETUNE (r10 — the r8/r9 wishlist item): the recall
  * monitors (ann_recall / emb_recall / dedup_recall) close the
  * index-quality loop's MEASUREMENT half; this closes the ACTION
  * half. A serving index is built for the corpus it saw at land
  * time; as the corpus grows and drifts (appends land under the
  * FROZEN quantizer — [[Similarity.ivfIndexAppend]] validates that
  * on purpose), a fixed (nlists, nprobe) probes an ever-worse
  * partition of the data and recall sags. The loop here is the one
  * a production deployment schedules: measure recall on an audit
  * slice against exact ground truth; when it sags below target,
  * re-derive the parameters from the corpus's CURRENT size via the
  * documented occupancy rules, retrain the quantizer, and rebuild
  * the index in place.
  *
  * Occupancy rules (the engine-wide conventions, applied by every
  * index family here):
  *   - IVF: nlists = round(√N) — the √N rule ([[Dedup.autoCap]]'s
  *     rationale at the serving layer): per-list occupancy and list
  *     count grow together as √N, so probe cost per query is
  *     O(nprobe·√N) and neither the list scan nor the list ranking
  *     dominates. nprobe = ceil(probeFrac · nlists) — a constant
  *     FRACTION of the lists, so the probed mass tracks the corpus
  *     instead of shrinking relatively as nlists grows.
  *   - LSH: bits = ceil(log₂(N / targetOccupancy)) — 2^bits ∝ N at
  *     constant expected bucket occupancy, keeping every
  *     bucket-join candidate set linear in corpus size.
  *
  * Scale shape: measurement cost = |audit| × corpus (one exact pass
  * over the audit slice — the slice is SMALL and sampled, the
  * corpus never self-joins); retrain = kmeans++ on a bounded
  * deterministic sample + Lloyd refinement; rebuild = the one
  * assignment pass ivfIndexWrite always costs. Nothing here holds
  * driver state beyond the quantizer (nlists·dim doubles).
  */
object IndexTuning {

  final case class IvfParams(nlists: Int, nprobe: Int)

  /** Outcome of one monitor→retune cycle: the measured recall that
    * triggered (or cleared) the retune, and the parameter movement. */
  final case class RetuneReport(n: Long, before: IvfParams,
      recallBefore: Double, retuned: Boolean, after: IvfParams,
      recallAfter: Double, quantizer: Array[Array[Double]])

  /** The √N rule: nlists = round(√N) (clamped to [1, maxNlists]),
    * nprobe = ceil(probeFrac · nlists). */
  def ivfParamsFor(n: Long, probeFrac: Double = 0.125,
      maxNlists: Int = 1 << 16): IvfParams = {
    require(n >= 0 && probeFrac > 0.0 && probeFrac <= 1.0)
    val nlists = math.max(1, math.min(maxNlists.toLong,
      math.round(math.sqrt(n.toDouble)))).toInt
    IvfParams(nlists, math.max(1, math.ceil(probeFrac * nlists).toInt))
  }

  /** The constant-occupancy rule: smallest bits with
    * 2^bits ≥ N / targetOccupancy (clamped to [1, 62]). */
  def lshBitsFor(n: Long, targetOccupancy: Long = 32L): Int = {
    require(n >= 0 && targetOccupancy >= 1)
    val buckets = math.max(1L, (n + targetOccupancy - 1) / targetOccupancy)
    math.min(62, math.max(1,
      64 - java.lang.Long.numberOfLeadingZeros(buckets - 1)))
  }

  /** Macro-averaged recall@k of the SERVED index against exact
    * brute-force ground truth over the same corpus — the ann_recall
    * monitor as a reusable reading on any audit slice. */
  def ivfIndexRecall(spark: SparkSession, table: String,
      quantizer: Array[Array[Double]], corpus: DataFrame,
      audit: DataFrame, idCol: String, vecCol: String,
      nprobe: Int, k: Int): Double = {
    val exact = Similarity.bruteForceTopK(corpus, audit, idCol, vecCol, k)
      .select(col("query_id"), col("neighbor_id"))
    val served = Similarity.ivfProbeIndex(spark, table, audit,
        idCol, vecCol, quantizer, nprobe, k)
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("__hit"))
    val per = exact.join(served, Seq("query_id", "neighbor_id"), "left")
      .groupBy("query_id").agg(
        (sum(coalesce(col("__hit"), lit(0L)))
          / count(lit(1)).cast("double")).as("r"))
      .agg(avg(col("r")).as("recall"))
      .collect()
    if (per.isEmpty || per.head.isNullAt(0)) 1.0 // empty audit: nothing sags
    else per.head.getDouble(0)
  }

  /** One monitor→retune cycle over a LANDED IVF index
    * ([[Similarity.ivfIndexWrite]] / append lifecycle):
    *
    *  1. measure recall@k on the audit slice under the CURRENT
    *     (quantizer, nprobe);
    *  2. at or above `targetRecall` → no-op (the common cadence —
    *     measurement is the only cost);
    *  3. below target → re-derive (nlists, nprobe) from the corpus's
    *     CURRENT size via [[ivfParamsFor]], retrain the quantizer
    *     (seeded k-means++ on a bounded sample + `iters` Lloyd
    *     rounds), REBUILD the index table under the new quantizer,
    *     and re-measure.
    *
    * Deterministic end to end (seeded init, lowest-id tie-breaks),
    * so a re-run of the same cycle lands the same index. Returns the
    * full report; callers alert on `recallAfter` still below target
    * (data that √N lists cannot serve at this probeFrac — raise
    * probeFrac, the one knob the rule intentionally leaves free). */
  def retuneIvf(spark: SparkSession, table: String,
      quantizer: Array[Array[Double]], corpus: DataFrame,
      audit: DataFrame, idCol: String, vecCol: String,
      current: IvfParams, targetRecall: Double, k: Int,
      probeFrac: Double = 0.125, iters: Int = 3,
      sampleSize: Int = 4096, seed: Long = 42L,
      roundTo: Option[Int] = Some(6)): RetuneReport = {
    require(targetRecall > 0.0 && targetRecall <= 1.0)
    val before = ivfIndexRecall(spark, table, quantizer, corpus, audit,
      idCol, vecCol, current.nprobe, k)
    if (before >= targetRecall)
      RetuneReport(-1L, current, before, retuned = false, current,
        before, quantizer)
    else {
      val n = corpus.count()
      val next = ivfParamsFor(n, probeFrac)
      val q2 = Similarity.kmeansCentroids(corpus, idCol, vecCol,
        next.nlists, iters,
        init = Some(Similarity.kmeansPlusPlusInit(corpus, idCol, vecCol,
          next.nlists, sampleSize, seed)),
        roundTo = roundTo)
      Similarity.ivfIndexWrite(corpus, idCol, vecCol, q2, table)
      val after = ivfIndexRecall(spark, table, q2, corpus, audit,
        idCol, vecCol, next.nprobe, k)
      RetuneReport(n, current, before, retuned = true, next, after, q2)
    }
  }
}
