package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{Layout, Tables}

/** Z-order clustering and min/max file skipping. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String) =
    Files.createTempDirectory(s"graft_$name").toFile.getAbsolutePath

  test("zValue interleaves bits (Morton order)") {
    val z = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (3L, 5L))
      .toDF("a", "b")
      .select(Layout.zValue(col("a"), col("b"), 4)).as[Long].collect()
    // a=3 (0011), b=5 (0101) -> z = b3 a3 b2 a2 b1 a1 b0 a0 = 0 0 1 0 0 1 1 1
    assert(z.toSeq === Seq(0L, 1L, 2L, 3L, 39L))
  }

  test("z-ordered files skip a 2-D box that a 1-D sort cannot") {
    val orders = Tables.orders(spark, sfDir)
    val nFiles = 16
    val zDir = tmp("zorder")
    val sDir = tmp("sorted1d")
    Layout.zorderWrite(orders, "o_custkey", "o_totalprice", 4, nFiles, zDir)
    orders.repartitionByRange(nFiles, col("o_custkey"))
      .sortWithinPartitions(col("o_custkey"))
      .write.mode("overwrite").parquet(sDir)

    // same row set either way
    assert(spark.read.parquet(zDir).count() === orders.count())

    // a selective box on BOTH dimensions
    def intersecting(dir: String): Int = {
      val st = Layout.fileStats(spark, dir, Seq("o_custkey", "o_totalprice"))
      st.filter(!(col("max_o_custkey") < 100 || col("min_o_custkey") > 250) &&
          !(col("max_o_totalprice") < 50000.0 || col("min_o_totalprice") > 100000.0))
        .count().toInt
    }
    val (zHit, sHit) = (intersecting(zDir), intersecting(sDir))
    // the 1-D layout has tight custkey ranges but useless totalprice
    // ranges: every custkey-matching file intersects the box. The
    // z-order layout must do strictly better.
    assert(zHit < sHit,
      s"z-order hit $zHit of $nFiles files, 1-D sort hit $sHit — no skipping win")
    assert(zHit <= nFiles / 2, s"z-order should skip most files, hit $zHit/$nFiles")
  }

  test("manifest-pruned read returns exactly the full-scan result from fewer files") {
    val orders = Tables.orders(spark, sfDir)
    val dir = tmp("prune")
    Layout.zorderWrite(orders, "o_custkey", "o_totalprice", 4, 16, dir)
    val manifest = Layout.fileStats(spark, dir, Seq("o_custkey"))

    val (pruned, read, total) = Layout.prunedRead(spark, dir, manifest,
      "o_custkey", lit(100L), lit(250L))
    val expected = orders.filter(col("o_custkey").between(100L, 250L))
      .select("o_orderkey").as[Long].collect().sorted.toSeq
    assert(pruned.select("o_orderkey").as[Long].collect().sorted.toSeq === expected)
    assert(read < total, s"no files skipped: $read of $total")

    // empty range: zero files, empty frame with the right schema
    val (none, r0, _) = Layout.prunedRead(spark, dir, manifest,
      "o_custkey", lit(-10L), lit(-5L))
    assert(r0 === 0 && none.count() === 0L)
    assert(none.columns.contains("o_orderkey"))
  }
}
