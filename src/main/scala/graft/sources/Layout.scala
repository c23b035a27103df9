package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout operators: Z-order clustering and min/max
  * file-skipping — the scan-pruning half of the 100 TB story. A
  * petabyte table is only queryable if most of it is never read;
  * these make parquet min/max stats (row-group and file level)
  * actually selective for multi-column predicates.
  */
object Layout {

  /** Interleave the low `bits` bits of two non-negative bucket ids
    * (Morton/Z-curve): bit i of `a` lands at position 2i, bit i of
    * `b` at 2i+1. Pure integer Column arithmetic — codegen'd, no UDF.
    */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits $bits outside [1, 31]")
    (0 until bits).map { i =>
      val abit = shiftleft(a.bitwiseAND(lit(1L << i)), i)
      val bbit = shiftleft(b.bitwiseAND(lit(1L << i)), i + 1)
      abit.bitwiseOR(bbit)
    }.reduce(_ bitwiseOR _)
  }

  /** Equi-depth bucket id of `v` given broadcastable percentile cut
    * points: #cuts strictly below the value (the
    * Profile.equidepthHistogram bucketing, reused as a rank proxy so
    * Z-ordering needs NO global sort to rank its dimensions). */
  private def bucketOf(v: Column, cuts: Column): Column =
    size(filter(cuts, c => v > c)).cast("long")

  /** Write `df` Z-ordered by two numeric columns: each column is
    * ranked into 2^bits equi-depth buckets (one exact-percentile agg
    * per column — percentile_approx at real scale), the interleaved
    * z-value drives a range repartition + within-partition sort, and
    * each output file therefore covers a tight z-range — so per-file
    * min/max stats are tight on BOTH dimensions and a 2-D predicate
    * skips most files (a 1-D sort gives tight stats on one dimension
    * and useless ones on the other).
    *
    * The shuffle bill: ONE range repartition (sampled bounds) + local
    * sort — the same price as any clustered write; the ranking adds
    * no shuffle at all.
    */
  def zorderWrite(df: DataFrame, colA: String, colB: String, bits: Int,
      nFiles: Int, path: String): Unit = {
    val nCuts = (1 << bits) - 1
    val ps = (1 to nCuts).map(i =>
      (BigDecimal(i) / (nCuts + 1)).underlying.toPlainString)
    val cuts = df.agg(
      expr(s"percentile($colA, array(${ps.mkString(",")}))").as("__ca"),
      expr(s"percentile($colB, array(${ps.mkString(",")}))").as("__cb"))
    df.crossJoin(broadcast(cuts))
      .withColumn("__z",
        zValue(bucketOf(col(colA), col("__ca")),
          bucketOf(col(colB), col("__cb")), bits))
      .drop("__ca", "__cb")
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Per-file column stats over a parquet directory — the min/max
    * manifest a lakehouse keeps per data file. One scan, one
    * (file → stats) aggregate; persist the result next to the data
    * and incrementally maintain it on append. */
  def fileStats(spark: SparkSession, path: String, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "fileStats needs at least one column")
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))) :+
      count("*").as("n_rows")
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Manifest-pruned read: keep only the files whose [min, max] range
    * on `column` intersects [lo, hi], then apply the exact predicate.
    * The file list is driver-side but ∝ #files (a manifest row per
    * file, the same order Spark's own file index already holds in
    * memory); the data read is ∝ matching files only.
    *
    * @return (pruned frame, #files read, #files total) — counts let
    *         callers log skipping effectiveness.
    */
  def prunedRead(spark: SparkSession, path: String, manifest: DataFrame,
      column: String, lo: Column, hi: Column,
      maxFiles: Int = 1000000): (DataFrame, Int, Int) =
    scanPruned(spark, path, manifest, Seq((column, lo, hi)), maxFiles)

  /** THE read path of the layout family (r10 — zorderWrite +
    * fileStats wired into one scan): a multi-column range predicate
    * pruned against the per-file min/max manifest, AND-composed —
    * exactly the read a Z-ordered table exists to serve, since only
    * a Z-layout gives per-file stats that are tight on BOTH
    * dimensions at once (LayoutSpec measures it: the same 2-D box
    * reads ~1 file from the Z-layout and most of the files from a
    * 1-D sorted layout of the same data).
    *
    * Keeps a file iff EVERY range intersects its [min, max] on that
    * column (a file missing any one range cannot hold a matching
    * row), then applies the exact predicate to the survivors — the
    * manifest prune is a superset guarantee, never a filter
    * replacement. The file list is driver-side but ∝ #files (a
    * manifest row per file — the same order Spark's own file index
    * holds in memory); the data read is ∝ matching files only.
    *
    * @return (pruned frame, #files read, #files total) — counts let
    *         callers log skipping effectiveness.
    */
  def scanPruned(spark: SparkSession, path: String, manifest: DataFrame,
      ranges: Seq[(String, Column, Column)],
      maxFiles: Int = 1000000): (DataFrame, Int, Int) = {
    require(ranges.nonEmpty, "scanPruned needs at least one range")
    val total = manifest.count().toInt
    // the collect is ∝ matching files; `maxFiles` is the guard rail
    // for degenerate manifests (a million-file table whose predicate
    // matches everything should be read as a plain scan + filter, not
    // via a driver-side path list)
    require(total <= maxFiles,
      s"manifest has $total files > maxFiles=$maxFiles; " +
        "read the table directly instead of via the pruned path list")
    val live = manifest
      .filter(ranges.map { case (c, lo, hi) =>
        !(col(s"max_$c") < lo || col(s"min_$c") > hi)
      }.reduce(_ && _))
      .select("file")
      .collect().map(_.getString(0))
    val exact = ranges.map { case (c, lo, hi) =>
      col(c) >= lo && col(c) <= hi
    }.reduce(_ && _)
    val df =
      if (live.isEmpty) spark.read.parquet(path).filter(lit(false))
      else spark.read.parquet(live.toIndexedSeq: _*).filter(exact)
    (df, live.length, total)
  }

  /** Land a Z-ordered table AND its manifest in one step — the
    * write-side twin of [[scanPruned]], so the full layout loop is
    * two calls: `landZordered(...)` at write time,
    * `scanPruned(...)` per query. Returns the manifest (callers
    * persist it next to the data and refresh on append). */
  def landZordered(df: DataFrame, colA: String, colB: String, bits: Int,
      nFiles: Int, path: String): DataFrame = {
    zorderWrite(df, colA, colB, bits, nFiles, path)
    fileStats(df.sparkSession, path, Seq(colA, colB))
  }
}
