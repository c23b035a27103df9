package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table profiling — the stats-collection pass (ANALYZE) that feeds
  * cost-based planning, data-quality checks, and layout decisions.
  */
object Profile {

  /** Per-column profile: non-null count, distinct count, min/max (as
    * strings, so heterogeneous column types melt into one result
    * relation). One aggregation job over one scan; the per-column
    * single-row aggregate melts to (column, stats) rows IN-ROW
    * (struct array explode — no extra shuffle).
    *
    * `exactNdv = false` (default) uses the HLL sketch for distinct
    * counts: all columns profile in a single pass with fixed memory —
    * the only sane choice at 100 TB. `exactNdv = true` uses exact
    * COUNT(DISTINCT): Catalyst plans N distinct aggregates as an
    * Expand (N-way input replication before the shuffle) — fine at
    * verify scale and oracle-comparable, but the 100 TB profile
    * should stay approximate.
    */
  def profile(df: DataFrame, cols: Seq[String], exactNdv: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs: Seq[Column] = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__n_$c"),
        (if (exactNdv) countDistinct(col(c))
         else approx_count_distinct(col(c))).as(s"__d_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val entries = cols.map { c =>
      struct(
        lit(c).as("column"),
        col(s"__n_$c").as("n_nonnull"),
        col(s"__d_$c").as("n_distinct"),
        col(s"__min_$c").as("min_value"),
        col(s"__max_$c").as("max_value"))
    }
    row.select(explode(array(entries: _*)).as("p")).select("p.*")
  }

  /** Equi-depth histogram: `nBuckets` buckets holding ~equal row
    * counts, bounded by exact percentile cutpoints — the
    * distribution summary that stays informative under skew, where
    * equi-width ([[histogram]]) dumps everything into two bins.
    *
    * One exact-percentile aggregate produces the nBuckets−1 interior
    * cutpoints (full-multiset exact, the q21 trade — at 100 TB use
    * percentile_approx for the cuts); the cut array rides back as a
    * broadcast 1-row frame, each row's bucket = #cuts below its value
    * (an in-row array scan), and the bucket agg combines map-side.
    * The fact is never shuffled — only nBuckets partial rows per
    * partition cross the wire.
    */
  def equidepthHistogram(df: DataFrame, valueCol: String, nBuckets: Int,
      approxAccuracy: Option[Int] = None): DataFrame = {
    require(nBuckets >= 2, s"nBuckets $nBuckets must be >= 2")
    // exact decimal strings so the oracle's literal probabilities
    // parse to bit-identical doubles
    val ps = (1 until nBuckets)
      .map(i => (BigDecimal(i) / nBuckets).underlying.toPlainString)
    // approxAccuracy = Some(acc): cuts from the percentile_approx
    // sketch (fixed O(acc) memory — the 100 TB default; exact
    // `percentile` buffers the full multiset). acc > 2·n makes the
    // sketch exact rank selection (element at rank ceil(p·n)) — the
    // hash-gatable regime at verify scale.
    val cutExpr = approxAccuracy match {
      case Some(acc) =>
        expr(s"percentile_approx($valueCol, array(${ps.mkString(", ")}), $acc)")
          .cast("array<double>")
      case None =>
        expr(s"percentile($valueCol, array(${ps.mkString(", ")}))")
    }
    val cuts = df.agg(cutExpr.as("__cuts"))
    val v = col(valueCol)
    df.crossJoin(broadcast(cuts))
      .select(size(filter(col("__cuts"), c => v > c)).as("bucket"), v.as("__v"))
      .groupBy(col("bucket"))
      .agg(count("*").as("n"), min(col("__v")).as("lo"), max(col("__v")).as("hi"))
  }

  /** Equi-width histogram of a numeric column: values in
    * [lo, lo + width·nBins) bucketed by `floor((v−lo)/width)`,
    * out-of-range values dropped. A groupBy on a codegen'd arithmetic
    * key — partial counts map-side, nBins rows cross the wire per
    * partition at most. The distribution half of the profiling story
    * ([[profile]] gives the scalar stats). */
  def histogram(df: DataFrame, valueCol: String,
      lo: Double, width: Double, nBins: Int): DataFrame = {
    val v = col(valueCol).cast("double")
    df.filter(v >= lo && v < lo + width * nBins)
      .groupBy(floor((v - lo) / width).cast("long").as("bin"))
      .agg(count("*").as("n"))
  }
}
