package graft.sources

import org.apache.spark.sql.SparkSession

/** Cost-based-optimization stats layer: collect table + column
  * statistics into the catalog so Catalyst's CBO (filter-selectivity
  * estimation, join reorder, stats-driven broadcast decisions) has
  * real cardinalities to plan with.
  *
  * Why this matters at 100 TB: without column stats, a Filter's
  * estimated size equals its child's — a 0.1%-selective predicate on
  * a 30 GB dim still "looks" 30 GB, so the join above it shuffles both
  * sides instead of broadcasting the few surviving megabytes. One
  * ANALYZE pass per landed table (an O(table) scan, paid once at
  * write time, amortized across every later query) flips those plans.
  *
  * The stats live in the catalog entry of a SAVED table — this layer
  * therefore pairs with [[Tables.writeBucketed]]/`saveAsTable` landed
  * outputs, not with bare `spark.read.parquet` frames (Spark keys
  * stats by catalog table).
  */
object Stats {

  /** ANALYZE a catalog table: table-level row count/size, plus
    * per-column NDV / min / max / null count for `columns`. */
  def analyze(spark: SparkSession, table: String, columns: Seq[String]): Unit = {
    spark.sql(s"ANALYZE TABLE $table COMPUTE STATISTICS")
    if (columns.nonEmpty)
      spark.sql(
        s"ANALYZE TABLE $table COMPUTE STATISTICS FOR COLUMNS ${columns.mkString(", ")}")
  }

  /** Turn on cost-based optimization for the session: filter/join
    * cardinality estimation from column stats + stats-driven join
    * reorder. Off by default in Spark; a no-op for tables that have
    * no stats (plans fall back to size-only estimation). */
  def enableCbo(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
  }
}
