package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Schema'd readers for the engine's table surface.
  *
  * Mirrors the reference's file-based extract stage
  * (/root/reference/main_dag.py:16-47 reads per-researcher files;
  * researchers_xml_download_script.py reads cs_researchers.csv) as
  * proper columnar sources: parquet for facts, schema'd CSV/JSON for
  * small control tables. At scale, parquet scans benefit from column
  * pruning + predicate pushdown; CSV/JSON are for small dims only.
  */
object Tables {

  /** All tables the driver's testdata provides, by name. */
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read one parquet table from a scale-factor directory. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  /** The events table's `ts` column has shipped in three physical
    * forms across driver testdata generations; normalize all of them
    * to microsecond TimestampType (an instant) so every downstream
    * operator sees ONE type:
    *
    *   - int64 nanoseconds (Spark 4 rejects ns timestamps; with
    *     spark.sql.legacy.parquet.nanosAsLong=true they read as Long
    *     nanos) → truncate to µs, tag as instant;
    *   - timestamp[us] WITHOUT timezone (pandas-written parquet reads
    *     as TIMESTAMP_NTZ, which Spark refuses to cast to numeric and
    *     unix_micros rejects) → re-tag as an instant. The graft
    *     session timezone is UTC ([[graft.Sessions]]), so the
    *     NTZ→TIMESTAMP cast is value-preserving: the same wall-clock
    *     reading, now meaning that instant in UTC — exactly how the
    *     DuckDB oracle's epoch_us(naive ts) interprets it;
    *   - TimestampType already → untouched. */
  def events(spark: SparkSession, dir: String): DataFrame =
    normalizeEventsTs(table(spark, dir, "events"))

  /** The per-generation `ts` normalization alone, schema-dispatched —
    * works on batch AND streaming frames (a `readStream` over an
    * events drop-directory needs the identical rewrite; the dispatch
    * reads only the schema, never the data). */
  def normalizeEventsTs(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _                => raw
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** Schema'd CSV reader (no inference job — at 100 TB an inference
    * pass is a full extra scan). Header expected, like
    * cs_researchers.csv in the reference. */
  def csv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("header", "true").csv(path)

  /** Schema'd JSON-lines reader. */
  def jsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** ORC reader — ORC is self-describing like parquet; the explicit
    * schema still prunes columns at scan and catches drift early. */
  def orc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  /** Idempotent partitioned parquet sink — replaces the reference's
    * row-wise Cassandra loop (main_dag.py:313-396). `overwrite` +
    * partitionBy gives restartable, parallel loads; with
    * partitionOverwriteMode=dynamic only touched partitions rewrite. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).parquet(path)
  }

  /** Bucketed sink: pre-shuffles the table into `buckets` bucket files
    * per key (sorted within each bucket) so every FUTURE join or
    * aggregate on that key reads co-located, pre-sorted data and skips
    * the shuffle entirely — at 100 TB, paying the shuffle once at
    * write time instead of on every query is the difference between
    * an interactive join and a cluster-wide exchange. Bucketing
    * metadata lives in the catalog, hence saveAsTable. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key).saveAsTable(table)
}
