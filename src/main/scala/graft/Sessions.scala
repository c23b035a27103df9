package graft

import org.apache.spark.sql.SparkSession

/** The library's session builder — one place owns the configuration
  * every graft entry point needs (SURVEY.md §4):
  *
  *   - AQE on (skew-join splitting, dynamic partition coalescing);
  *   - `shuffle.partitions` sized to the local parallelism (Spark's
  *     default 200 just fragments a local[N] run — on a real cluster
  *     callers pass the cluster-appropriate value or let AQE coalesce);
  *   - UTC session timezone (oracle-comparable timestamps);
  *   - ns-timestamp parquet compat (the driver's events.parquet
  *     carries int64 nanoseconds; see [[graft.sources.Tables.events]]);
  *   - graft's native SQL functions + the AsOfJoin planner strategy
  *     registered via [[graft.plans.GraftExtensions]].
  *
  * `build` constructs a local session (tests/CLI mains); `install`
  * retrofits an EXISTING session (e.g. a cluster session created by
  * spark-submit) with the graft extensions, which is all a cluster
  * deployment needs — every other setting above is a default, not a
  * requirement.
  */
object Sessions {

  /** Local session with `cpus` cores and graft extensions installed. */
  def build(cpus: Int, appName: String = "graft"): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      // let AQE coalesce INSIDE cached plans too (default false keeps
      // a cached frame's output partitioning stable for downstream
      // co-partitioning reuse — but graft's eager-persist results are
      // read by scans/aggregates, not partitioning-sensitive joins,
      // and the stable-partitioning default pins every cache at raw
      // shuffle.partitions: r17 jobs-profiling showed each cache
      // materialization + every cache read paying 32 near-empty
      // tasks' launch/deserialize overhead per job)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // bucketed tables (Tables.writeBucketed) need a catalog home;
      // keep it out of the source tree
      .config("spark.sql.warehouse.dir",
        s"${sys.props.getOrElse("java.io.tmpdir", "/tmp")}/graft_warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    install(spark)
    spark
  }

  /** Register graft's SQL functions and planner strategy on a live
    * session (idempotent; the withExtensions construction path is
    * `spark.sql.extensions=graft.plans.GraftExtensions`). */
  def install(spark: SparkSession): Unit = {
    graft.plans.GraftExtensions.registerAll(spark)
    org.apache.spark.sql.graft.ColumnBridge.addStrategy(
      spark, graft.plans.AsOfJoinStrategy)
  }
}
