package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Same-JVM A/B of q2_pair_counts formulations (r15 item #3):
  *   a) current: groupBy collect_set (partial+final OHA) → BHJ year →
  *      explode sorted_pairs → count
  *   b) pre-repartitioned collect_set (exchange carries raw rows;
  *      both OHA phases land in one stage)
  *   c) self-join on the deduped (set, member) frame (reused
  *      exchange) instead of collect_set
  *
  * Usage: runMain graft.tools.PairsAb2 [sfDir] [reps]
  */
object PairsAb2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = graft.Sessions.build(32, appName = "graft-pairs-ab2")

    def li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    def yr = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey").as("__yk"), year(col("o_orderdate")).as("year"))

    def tail(sets: DataFrame): Long = {
      val pairs = graft.functions.expr.NativeFunctions.sorted_pairs(col("__ms"))
      sets.join(yr, col("__set") === col("__yk"))
        .select(col("year"), explode(pairs).as("__p"))
        .groupBy(col("year"), col("__p.a").as("a"), col("__p.b").as("b"))
        .agg(count("*").as("n"))
        .count()
    }

    def a(): Long = tail(
      li.groupBy(col("l_orderkey").as("__set"))
        .agg(sort_array(collect_set(col("l_suppkey"))).as("__ms")))

    def b(): Long = tail(
      li.repartition(col("l_orderkey"))
        .groupBy(col("l_orderkey").as("__set"))
        .agg(sort_array(collect_set(col("l_suppkey"))).as("__ms")))

    def c(): Long = {
      val dedup = li.select(col("l_orderkey").as("__set"), col("l_suppkey").as("m"))
        .distinct()
      val p = dedup.as("x").join(dedup.as("y"), col("x.__set") === col("y.__set") &&
          col("x.m") < col("y.m"))
        .select(col("x.__set").as("__set"), col("x.m").as("a"), col("y.m").as("b"))
      p.join(yr, col("__set") === col("__yk"))
        .groupBy(col("year"), col("a"), col("b"))
        .agg(count("*").as("n"))
        .count()
    }

    def d(): Long = {
      val sets = li.repartition(col("l_orderkey"))
        .groupBy(col("l_orderkey").as("__set"))
        .agg(sort_array(collect_set(col("l_suppkey"))).as("__ms"))
      val pairs = graft.functions.expr.NativeFunctions.sorted_pairs(col("__ms"))
      sets.join(yr, col("__set") === col("__yk"))
        .select(col("year"), explode(pairs).as("__p"))
        .select(col("year"), col("__p.a").as("a"), col("__p.b").as("b"))
        .repartition(col("year"), col("a"), col("b"))
        .groupBy(col("year"), col("a"), col("b"))
        .agg(count("*").as("n"))
        .count()
    }

    for (f <- Seq(a _, b _, c _, d _)) f() // warm
    for (r <- 1 to reps; (arm, f) <- Seq("a-collect_set" -> (a _),
        "b-prepart" -> (b _), "c-selfjoin" -> (c _), "d-prepart-both" -> (d _))) {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val n = f()
      println(f"[pairs-ab2] $arm rep$r: ${(System.nanoTime() - t0) / 1e9}%6.3f s  rows=$n")
    }
    spark.stop()
  }
}
