package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data curation operators: deterministic sampling and
  * distribution-based quality gating (SURVEY.md §2c).
  *
  * Both are single-pass / single-shuffle shapes that survive a 100 TB
  * corpus: hash bucketing is a stateless map (no sampling state, no
  * rand() — retry- and speculation-safe), and the percentile gate is
  * one window per group key with rank pushdown.
  */
object Curation {

  /** Deterministic content-hash bucket in [0, buckets): the md5 of the
    * content's first 8 hex digits as an integer, mod buckets. The same
    * row lands in the same bucket on every run, executor, and retry —
    * the property rand()-based sampling loses under task retries.
    * Standard train/validation/test splitting for training corpora.
    */
  def hashBucket(content: Column, buckets: Int): Column =
    conv(substring(md5(content.cast("binary")), 1, 8), 16, 10)
      .cast("long") % buckets

  /** Keep rows whose bucket falls in [0, takeBuckets) — a
    * deterministic takeBuckets/buckets fraction of the corpus. */
  def hashSplit(df: DataFrame, content: Column, buckets: Int, takeBuckets: Int): DataFrame =
    df.withColumn("bucket", hashBucket(content, buckets))
      .filter(col("bucket") < takeBuckets)

  /** Distribution-based quality gate: per group, keep rows whose
    * metric sits inside [loPct, hiPct] by percent_rank — trims both
    * tails (truncation-damaged shards at the bottom, concatenation
    * blobs at the top) relative to each group's own distribution
    * rather than a global constant. One shuffle on the group key.
    */
  def percentileGate(df: DataFrame, groupCol: String, metric: Column,
      loPct: Double, hiPct: Double, tiebreak: Column): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(metric, tiebreak)
    df.withColumn("pct_rank", percent_rank().over(w))
      .filter(col("pct_rank") >= loPct && col("pct_rank") <= hiPct)
  }
}
