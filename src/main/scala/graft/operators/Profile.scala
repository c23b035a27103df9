package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.expr.NativeFunctions

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

  /** Bias-correction constant for an m-register HyperLogLog, times
    * m² and the harmonic-sum scale 2^(64−p+1) — the whole numerator
    * of the raw estimate as ONE double literal, so the oracle can
    * inline the identical bits (shortest round-trip repr parses back
    * exactly) and the only cross-engine float op left is a single
    * division by an exact integer. */
  def hllEstimatorConstant(p: Int): Double = {
    val m = 1 << p
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    alpha * m.toDouble * m.toDouble * java.lang.Math.pow(2.0, (64 - p + 1).toDouble)
  }

  /** Deterministic HyperLogLog distinct count per group — the
    * 100 TB cardinality shape (fixed 2^p registers per group,
    * partial-max merge map-side: each task ships ≤ groups×2^p rows
    * regardless of input size, where exact COUNT(DISTINCT) shuffles
    * every (group, key) pair).
    *
    * Unlike `approx_count_distinct` (whose xxhash64-based HLL++ is
    * engine-private), every stage here is reproducible arithmetic:
    * item hash = avalanche64 of the key's 64 bits (murmur-style
    * finalizer, replayable in HUGEINT mod-2^64 SQL), register index =
    * low p bits, rho = trailing zeros of the remaining word + 1
    * (uniform bits make that distribution identical to the canonical
    * leading-zeros form, and `bit_count((w & -w) - 1)` computes it in
    * both engines with pure integer ops). The harmonic sum Σ 2^(−M_j)
    * is kept EXACT: scaled by 2^(64−p+1) it is an integer ≤ 2^65,
    * summed in DECIMAL(38,0) here and HUGEINT in the oracle — no
    * float accumulation order anywhere. The estimator then does one
    * double division (constant literal / exact integer) plus the
    * standard linear-counting branch (E ≤ 2.5m with empty registers →
    * m·ln(m/V)), both branch condition and inputs exact.
    *
    * Returns (groupCol, est_distinct, n_items) — n_items counts
    * non-null keys, riding the register aggregation (no second scan).
    */
  def hllDistinct(df: DataFrame, keyCol: String, groupCol: String,
      p: Int = 10): DataFrame = {
    require(p >= 4 && p <= 16, s"p $p out of range [4, 16]")
    val m = 1 << p
    val rhoCap = 64 - p + 1 // rho when the whole remaining word is 0
    val h = NativeFunctions.avalanche64(col(keyCol).cast("long"))
    val hashed = df.filter(col(keyCol).isNotNull)
      .select(col(groupCol), h.as("__h"))
    val w = shiftrightunsigned(col("__h"), p)
    val rho = when(w === 0L, lit(rhoCap))
      .otherwise(bit_count(w.bitwiseAND(-w) - 1) + 1)
    val regs = hashed
      .select(col(groupCol),
        col("__h").bitwiseAND(lit((m - 1).toLong)).as("__b"), rho.as("__rho"))
      .groupBy(col(groupCol), col("__b"))
      .agg(max(col("__rho")).as("__mr"), count(lit(1)).as("__c"))
    // scaled harmonic term 2^(rhoCap − rho) ≤ 2^(64−p) fits a long;
    // the group total (incl. 2^rhoCap per empty register) needs 65
    // bits → DECIMAL(38,0)
    val term = expr(s"shiftleft(CAST(1 AS BIGINT), $rhoCap - __mr)")
      .cast(DecimalType(38, 0))
    val agg = regs.groupBy(col(groupCol)).agg(
      count(lit(1)).as("__nb"),
      sum(term).as("__s"),
      sum(col("__c")).as("n_items"))
    val vEmpty = lit(m.toLong) - col("__nb")
    val num = (col("__s") +
      vEmpty.cast(DecimalType(38, 0)) * lit(BigDecimal(BigInt(1) << rhoCap)))
      .cast("double")
    val eRaw = lit(hllEstimatorConstant(p)) / num
    val est = when(eRaw <= lit(2.5 * m) && vEmpty > 0,
        lit(m.toDouble) * log(lit(m.toDouble) / vEmpty.cast("double")))
      .otherwise(eRaw)
    agg.select(col(groupCol), round(est, 2).as("est_distinct"), col("n_items"))
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

  /** Population-stability-index drift report between a reference and
    * a current corpus slice — the standing data-quality monitor that
    * catches a pipeline regression (crawler change, filter bug,
    * upstream format shift) BEFORE it poisons a training run. The
    * industry reading: PSI < 0.1 stable, 0.1–0.25 drifting, > 0.25
    * broken.
    *
    * Each feature is a caller-supplied bucket expression mapping a
    * row into [0, nBuckets); values outside that range are CLAMPED to
    * the nearest boundary bucket and NULL-bucket rows are excluded
    * from that feature entirely — numerators and denominators (N is
    * the per-feature sum of bucket counts) always describe the same
    * row set, so a stray bucket value shifts mass to an edge bucket
    * visibly instead of deflating every probability silently.
    * Per (feature, bucket):
    * p = (count + α) / (N + α·B) (Laplace-smoothed so empty buckets
    * stay finite), psi term = (p_cur − p_ref) · ln(p_cur / p_ref);
    * `psi_total` repeats the feature's summed PSI on every row.
    *
    * Scale shape: each side makes ONE map-side-combined aggregate per
    * feature over (feature, bucket) — the shuffle moves ≤ B rows per
    * feature, never the corpus; side totals are per-feature window
    * sums over the already-tiny spine frame (no extra corpus scan);
    * the bucket spine (features × B rows) is driver-built and
    * broadcast. The psi window runs over B-row partitions.
    */
  def driftPsi(ref: DataFrame, cur: DataFrame,
      features: Seq[(String, Column)], nBuckets: Int,
      alpha: Double = 0.5): DataFrame = {
    require(features.nonEmpty, "driftPsi needs at least one feature")
    require(nBuckets >= 2, s"nBuckets $nBuckets must be >= 2")
    require(alpha > 0.0, s"alpha $alpha must be > 0")
    val spark = ref.sparkSession
    // bucket contract (r12 verdict item 3): a bucket expression that
    // lands outside [0, nBuckets) is CLAMPED to the boundary bucket —
    // out-of-range rows used to vanish from the bucket counts while
    // still inflating the side totals, silently deflating every
    // probability. NULL buckets (the one value a clamp can't place)
    // are excluded, and the side totals are the per-feature SUM of
    // the bucket counts (a window over the B-row spine, not a
    // separate corpus scan), so denominators always equal exactly
    // what the numerators counted — no row can be half-lost.
    def sideCounts(df: DataFrame, out: String): DataFrame =
      features.map { case (name, bucket) =>
        val b = bucket.cast("long")
        // least/greatest SKIP nulls (they'd clamp a NULL bucket to an
        // edge) — gate the clamp on non-null explicitly
        df.select(lit(name).as("feature"),
            when(b.isNotNull,
              greatest(lit(0L), least(b, lit(nBuckets - 1L)))).as("bucket"))
          .filter(col("bucket").isNotNull)
          .groupBy("feature", "bucket").agg(count(lit(1)).as(out))
      }.reduce(_ unionByName _)
    import spark.implicits._
    val spine = features.map(_._1).toDF("feature")
      .crossJoin(spark.range(nBuckets).select(col("id").as("bucket")))
    val aB = alpha * nBuckets
    val w = org.apache.spark.sql.expressions.Window.partitionBy("feature")
    spine
      .join(sideCounts(ref, "n_ref"), Seq("feature", "bucket"), "left")
      .join(sideCounts(cur, "n_cur"), Seq("feature", "bucket"), "left")
      .na.fill(0L, Seq("n_ref", "n_cur"))
      .withColumn("__nr", sum(col("n_ref")).over(w))
      .withColumn("__nc", sum(col("n_cur")).over(w))
      .withColumn("__pr", (col("n_ref") + alpha) / (col("__nr") + aB))
      .withColumn("__pc", (col("n_cur") + alpha) / (col("__nc") + aB))
      .withColumn("__term", (col("__pc") - col("__pr")) * log(col("__pc") / col("__pr")))
      .select(col("feature"), col("bucket"), col("n_ref"), col("n_cur"),
        round(col("__pr"), 6).as("p_ref"), round(col("__pc"), 6).as("p_cur"),
        round(col("__term"), 6).as("psi"),
        round(sum(col("__term")).over(w), 4).as("psi_total"))
  }
}
