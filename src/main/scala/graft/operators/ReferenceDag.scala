package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** The reference's weekly Airflow DAG (/root/reference/main_dag.py:491-523,
  * `extract >> transform >> {load_q1 >> log, q2_count >> load_count}`)
  * as one composed Spark pipeline over the driver testdata's
  * publication-shaped tables (orders = publications, lineitem rows =
  * authorship edges, customers = researchers).
  *
  * Where the reference runs five row-wise pandas/Cassandra tasks with
  * driver loops, this is four declarative plans sharing scans, each
  * written as an idempotent partitioned parquet sink — restartable and
  * parallel at any scale, no task-to-task CSV handoff.
  */
object ReferenceDag {

  case class Outputs(
      snapshot: DataFrame,      // merged unique snapshot  (save_to_csv)
      deleted: DataFrame,       // to-be-deleted keys      (is_seen == False)
      q1Table: DataFrame,       // publication_by_year_and_category
      pairCounts: DataFrame,    // publication_count_unique_author_pair
      volumeMetrics: DataFrame) // volume_update log row

  /** Build every table of the reference pipeline. `asOfBatch` splits
    * history into base snapshot vs "this run's batch" the way the
    * reference splits existing CSV vs newly-fetched XML. */
  def build(spark: SparkSession, dir: String, asOfBatch: String): Outputs = {
    val orders = Tables.orders(spark, dir)
    val lineitem = Tables.lineitem(spark, dir)
    val cut = to_timestamp(lit(asOfBatch))

    val base = orders.filter(col("o_orderdate") < cut)
    val batch = orders.filter(col("o_orderdate") >= cut)

    // transform + merge (main_dag.py:242-262): keep latest per key
    val snapshot = Pipeline.upsertLatest(base, batch,
      Seq("o_orderkey"), Seq(col("o_orderdate"), col("o_custkey")))

    // delete detection (main_dag.py:251-254): customers unseen in batch
    val deleted = Pipeline.deletedKeys(
      Tables.customer(spark, dir), batch.select("o_custkey"),
      "c_custkey", "o_custkey")

    // Q1 table (main_dag.py:293-301)
    val q1 = Pipeline.countByYearCategory(snapshot, "o_orderdate", "o_orderpriority")

    // Q2 pair counts (main_dag.py:265-290)
    val pairs = Pipeline.pairCounts(lineitem, "l_orderkey", "l_suppkey",
      orders.select(col("o_orderkey"), year(col("o_orderdate")).as("year")),
      "o_orderkey")

    // volume_update (main_dag.py:480-488)
    val volume = Pipeline.volumeMetrics(snapshot,
      col("o_orderdate") >= cut, "o_custkey")

    Outputs(snapshot, deleted, q1, pairs, volume)
  }

  /** Run the DAG and land every output as an idempotent partitioned
    * parquet table (the reference's Cassandra loads, main_dag.py:313-396). */
  def run(spark: SparkSession, dir: String, outDir: String, asOfBatch: String): Outputs = {
    val o = build(spark, dir, asOfBatch)
    Tables.writePartitioned(
      o.snapshot.withColumn("year", year(col("o_orderdate"))),
      s"$outDir/publication_snapshot", Seq("year"))
    Tables.writePartitioned(o.deleted, s"$outDir/deleted_keys", Nil)
    Tables.writePartitioned(o.q1Table, s"$outDir/publication_by_year_and_category", Seq("year"))
    Tables.writePartitioned(o.pairCounts, s"$outDir/pair_counts", Seq("year"))
    Tables.writePartitioned(o.volumeMetrics, s"$outDir/volume_update", Nil)
    o
  }
}
