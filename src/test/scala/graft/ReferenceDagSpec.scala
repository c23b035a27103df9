package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.ReferenceDag
import graft.sources.Tables

class ReferenceDagSpec extends SparkSpec {
  import spark.implicits._

  test("full reference DAG lands all five output tables consistently") {
    val out = Files.createTempDirectory("graft_dag").toFile.getAbsolutePath
    val r = ReferenceDag.run(spark, sfDir, out, asOfBatch = "2000-01-01")

    // snapshot keeps every order exactly once (upsert by primary key)
    val nOrders = Tables.orders(spark, sfDir).count()
    assert(r.snapshot.count() === nOrders)
    assert(spark.read.parquet(s"$out/publication_snapshot").count() === nOrders)

    // q1 counts re-aggregate to the snapshot total
    val q1 = spark.read.parquet(s"$out/publication_by_year_and_category")
    assert(q1.agg(sum("n_pubs")).as[Long].head() === nOrders)

    // deleted = customers with no order in the batch window
    val expectDeleted = Tables.customer(spark, sfDir)
      .join(Tables.orders(spark, sfDir)
          .filter(col("o_orderdate") >= to_timestamp(lit("2000-01-01"))),
        col("c_custkey") === col("o_custkey"), "left_anti").count()
    assert(spark.read.parquet(s"$out/deleted_keys").count() === expectDeleted)

    // volume metrics row agrees with the snapshot
    val vol = spark.read.parquet(s"$out/volume_update").collect().head
    assert(vol.getAs[Long]("total_rows") === nOrders)

    // pair counts: symmetric-free and year-partitioned on disk
    assert(spark.read.parquet(s"$out/pair_counts")
      .filter(col("member_a") >= col("member_b")).count() === 0)
    assert(new java.io.File(s"$out/pair_counts").listFiles()
      .exists(_.getName.startsWith("year=")))
  }
}
