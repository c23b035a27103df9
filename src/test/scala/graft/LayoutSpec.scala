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

  test("scanPruned: the 2-D read path — files read track selectivity on the Z-layout") {
    val orders = Tables.orders(spark, sfDir)
    val nFiles = 16
    val dir = tmp("scanpruned")
    // land + manifest in one step (the write-side twin)
    val manifest = Layout.landZordered(orders, "o_custkey", "o_totalprice",
      bits = 4, nFiles, dir)

    def box(loK: Long, hiK: Long, loP: Double, hiP: Double) =
      Seq(("o_custkey", lit(loK), lit(hiK)),
        ("o_totalprice", lit(loP), lit(hiP)))

    // correctness first: pruned 2-D read ≡ full scan + filter
    val (df, read, total) = Layout.scanPruned(spark, dir,
      manifest, box(100L, 250L, 50000.0, 100000.0))
    val expected = orders.filter(
        col("o_custkey").between(100L, 250L) &&
          col("o_totalprice").between(50000.0, 100000.0))
      .select("o_orderkey").as[Long].collect().sorted.toSeq
    assert(df.select("o_orderkey").as[Long].collect().sorted.toSeq === expected)
    assert(total === nFiles)

    // files read ∝ selectivity: the probe the SURVEY §6 entry records.
    // A wider box must read at least as many files; the full-range box
    // reads everything; the selective box skips most of the table.
    val keyMax = orders.agg(max("o_custkey")).as[Long].head
    val priceMax = orders.agg(max("o_totalprice")).as[Double].head
    val readNarrow = read
    val (_, readWide, _) = Layout.scanPruned(spark, dir,
      manifest, box(0L, keyMax / 2, 0.0, priceMax / 2))
    val (_, readAll, _) = Layout.scanPruned(spark, dir,
      manifest, box(0L, keyMax, 0.0, priceMax))
    assert(readNarrow <= readWide && readWide <= readAll,
      s"files read not monotone in selectivity: $readNarrow/$readWide/$readAll")
    assert(readAll === nFiles)
    assert(readNarrow <= nFiles / 2,
      s"selective 2-D box should skip most files, read $readNarrow/$nFiles")

    // the same 2-D box against a 1-D layout reads MORE files — the
    // measured reason zorderWrite exists
    val sDir = tmp("scanpruned1d")
    orders.repartitionByRange(nFiles, col("o_custkey"))
      .sortWithinPartitions(col("o_custkey"))
      .write.mode("overwrite").parquet(sDir)
    val manifest1d = Layout.fileStats(spark, sDir,
      Seq("o_custkey", "o_totalprice"))
    val (df1, read1, _) = Layout.scanPruned(spark, sDir,
      manifest1d, box(100L, 250L, 50000.0, 100000.0))
    assert(df1.select("o_orderkey").as[Long].collect().sorted.toSeq === expected,
      "both layouts must return the identical row set")
    assert(readNarrow < read1,
      s"z-layout read $readNarrow files, 1-D layout $read1 — no 2-D win")
  }
}
