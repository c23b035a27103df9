package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.{Stats, Tables}

/** The CBO stats layer: column statistics let Catalyst price a
  * selective filter, flipping a filtered-dim join from shuffle to
  * broadcast. */
class StatsCboSpec extends SparkSpec {

  private def plan(df: DataFrame): String = df.queryExecution.executedPlan.toString

  test("column stats price the filter and flip the dim join from SMJ to broadcast") {
    val dimTable = "graft_cbo_orders"
    spark.sql(s"DROP TABLE IF EXISTS $dimTable")
    Tables.orders(spark, sfDir).write.saveAsTable(dimTable)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevCbo = spark.conf.get("spark.sql.cbo.enabled")
    val prevReorder = spark.conf.get("spark.sql.cbo.joinReorder.enabled")
    try {
      Stats.enableCbo(spark)
      val fact = Tables.lineitem(spark, sfDir)
      def dimFiltered: DataFrame =
        spark.table(dimTable).filter(col("o_orderstatus") === "P")
      def query(): DataFrame =
        fact.join(dimFiltered, col("l_orderkey") === col("o_orderkey"))

      // without column stats a Filter inherits its child's size: the
      // 1/ndv-selective predicate "looks" like the whole table
      val noStatsSize = dimFiltered.queryExecution.optimizedPlan.stats.sizeInBytes
      val fileSize = spark.table(dimTable).queryExecution.optimizedPlan.stats.sizeInBytes
      assert(noStatsSize === fileSize,
        s"expected size-only estimation pre-ANALYZE: $noStatsSize vs $fileSize")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (fileSize / 2).toString)
      val before = plan(query())
      assert(before.contains("SortMergeJoin"),
        s"without column stats the filtered dim must not be broadcast:\n$before")

      Stats.analyze(spark, dimTable, Seq("o_orderkey", "o_orderstatus"))
      // with stats, CBO prices the equality filter at ~1/ndv of the
      // (uncompressed-width) table estimate
      val fullSize = spark.table(dimTable).queryExecution.optimizedPlan.stats.sizeInBytes
      val filteredSize = dimFiltered.queryExecution.optimizedPlan.stats.sizeInBytes
      assert(filteredSize * 2 < fullSize,
        s"CBO did not price the filter: filtered=$filteredSize full=$fullSize")
      // a threshold that separates them: the full dim still must NOT
      // broadcast, the priced filter must
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
        ((filteredSize + fullSize) / 2).toString)
      val after = plan(query())
      assert(after.contains("BroadcastHashJoin"),
        s"with column stats the selective filter must broadcast:\n$after")
      val unfiltered = plan(fact.join(spark.table(dimTable),
        col("l_orderkey") === col("o_orderkey")))
      assert(unfiltered.contains("SortMergeJoin"),
        s"the unfiltered dim exceeds the same threshold — broadcast must be the filter estimate's doing:\n$unfiltered")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.cbo.enabled", prevCbo)
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", prevReorder)
      spark.sql(s"DROP TABLE IF EXISTS $dimTable")
    }
  }
}
