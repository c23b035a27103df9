package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.Pipeline
import graft.sources.Tables
import graft.streaming.ReferenceDagStream
import graft.streaming.ReferenceDagStream.Pub

/** The weekly reference DAG run continuously must converge to what the
  * batch DAG computes over the same rows (backfill/live parity). */
class ReferenceDagStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ordersRows = Tables.orders(spark, sfDir)
    .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")

  test("continuous snapshot merge converges to the batch upsert") {
    val rows = ordersRows.as[Pub].collect().toIndexedSeq
    val (b1, b2) = rows.splitAt(rows.length / 2)

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Pub]
    val q = ReferenceDagStream.snapshotUpdates(mem.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("dag_snapshot").start()
    try {
      mem.addData(b1); q.processAllAvailable()
      mem.addData(b2); q.processAllAvailable()
    } finally { q.stop() }

    val streamed = spark.table("dag_snapshot").as[Pub].collect()
      .groupBy(_.o_custkey)
      .map { case (_, ps) => ps.maxBy(p => (p.o_orderdate.getTime, p.o_orderkey)) }
      .map(p => (p.o_custkey, p.o_orderkey)).toSet
    val batched = Pipeline.upsertLatest(ordersRows.limit(0), ordersRows,
        Seq("o_custkey"), Seq(col("o_orderdate"), col("o_orderkey")))
      .select("o_custkey", "o_orderkey").as[(Long, Long)].collect().toSet
    assert(streamed === batched)
  }

  test("continuous Q1 counts equal the batch year/category table") {
    val rows = ordersRows.as[Pub].collect().toIndexedSeq

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Pub]
    val q = ReferenceDagStream.q1Counts(mem.toDF())
      .writeStream.outputMode("complete")
      .format("memory").queryName("dag_q1").start()
    try { mem.addData(rows); q.processAllAvailable() } finally { q.stop() }

    val streamed = spark.table("dag_q1")
      .orderBy("year", "category").as[(Int, String, Long)].collect()
    val batched = Pipeline.countByYearCategory(ordersRows, "o_orderdate", "o_orderpriority")
      .orderBy("year", "category").as[(Int, String, Long)].collect()
    assert(streamed === batched)
  }

  test("volume log lands one metrics row per micro-batch") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dag_vol").toFile
    val rows = ordersRows.as[Pub].collect().toIndexedSeq
    val (b1, b2) = rows.splitAt(rows.length / 2)

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Pub]
    val q = ReferenceDagStream.volumeLog(mem.toDF(), dir.getAbsolutePath,
      col("o_orderstatus") === "O", "o_custkey")
    try {
      mem.addData(b1); q.processAllAvailable()
      mem.addData(b2); q.processAllAvailable()
    } finally { q.stop() }

    // run-log schema matches the batch DAG's volume table, plus the
    // batch_id partition column from the dir layout
    val log = spark.read.parquet(dir.getAbsolutePath)
    assert(log.count() === 2)
    assert(log.select("batch_id").distinct().count() === 2)
    assert(log.agg(sum("total_rows")).as[Long].head === rows.length.toLong)
    assert(log.agg(sum("total_new")).as[Long].head ===
      rows.count(_.o_orderstatus == "O").toLong)
  }
}
