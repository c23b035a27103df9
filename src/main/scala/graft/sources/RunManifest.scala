package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Run manifest / watermark ledger — the orchestration surface of the
  * reference's weekly schedule (main_dag.py:491-523
  * `schedule_interval` + the timestamp.csv run marker): which
  * interval has been processed, by which run, committed or not.
  *
  * The engine stays a library — scheduling belongs to the
  * orchestrator — but INCREMENTAL batch needs one durable
  * convention the orchestrator and the jobs agree on:
  *
  *  - the ledger is an append-only parquet directory of run rows
  *    `(run_id, lo_watermark, hi_watermark, committed_at_epoch_ms)`,
  *    each written atomically as one partition directory keyed by
  *    run_id (parquet append of a 1-row frame);
  *  - a run processes `(last committed hi, new hi]` — the half-open
  *    interval convention makes consecutive runs tile without overlap
  *    or gaps;
  *  - a run commits its row only AFTER its outputs land (write-then-
  *    commit ordering), so a crashed run leaves no ledger row and the
  *    next run simply re-processes its interval — which is safe
  *    because every sink in this library is idempotent (partitioned
  *    parquet overwrite / version-guarded ExternalSink);
  *  - re-submitting an ALREADY COMMITTED run_id is a no-op (the
  *    replay guard an at-least-once scheduler needs);
  *  - **single scheduler at a time** (the same assumption Airflow's
  *    own scheduler lock provides): probe → body → append is not
  *    atomic, so two schedulers racing the SAME ledger could both
  *    pass the watermark probe and commit overlapping intervals. The
  *    ledger serializes RUNS, not SCHEDULERS — wrap `incrementalRun`
  *    in the orchestrator's run lock (every orchestrator has one; a
  *    second live scheduler is an operations error there too).
  *    Overlap with a RETRY of a crashed run is safe: the crashed
  *    attempt left no ledger row, and the sinks are idempotent.
  */
object RunManifest {

  private val schema = "run_id string, lo_watermark long, hi_watermark long, " +
    "committed_at_epoch_ms long"

  /** All committed runs (empty frame if no ledger yet). The
    * empty-ledger probe goes through the Hadoop FileSystem API, not
    * java.io.File — the ledger lives on durable storage (hdfs://,
    * s3a://, ...) where a local-file probe would always read "empty"
    * and silently reset the watermark (re-processing committed
    * intervals and appending duplicate ledger rows). */
  def runs(spark: SparkSession, path: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val nonEmpty = fs.exists(p) && fs.listStatus(p).nonEmpty
    if (!nonEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(schema))
    else spark.read.schema(schema).parquet(path)
  }

  /** The committed high watermark — the `lo` of the next run.
    * None when no run has committed (first run processes from the
    * caller's epoch floor). */
  def lastWatermark(spark: SparkSession, path: String): Option[Long] = {
    val r = runs(spark, path).agg(max(col("hi_watermark"))).collect()(0)
    if (r.isNullAt(0)) None else Some(r.getLong(0))
  }

  def isCommitted(spark: SparkSession, path: String, runId: String): Boolean =
    runs(spark, path).filter(col("run_id") === runId).limit(1).count() > 0

  /** Run `body` over the next incremental interval and commit.
    *
    * `newHi` is the target watermark (e.g. the batch's max event
    * time, or "now" floored to the schedule grain — the caller's
    * clock discipline). `body(lo, hi)` must land its outputs
    * IDEMPOTENTLY before returning; the ledger row is appended only
    * afterwards. Returns the processed interval, or None when the
    * run_id already committed (replay) or the interval is empty
    * (hi <= lo — the scheduler fired early).
    */
  def incrementalRun(spark: SparkSession, path: String, runId: String,
      newHi: Long, epochFloor: Long = Long.MinValue)(
      body: (Long, Long) => Unit): Option[(Long, Long)] = {
    // ONE ledger scan answers both probes (replay guard + watermark) —
    // this sits on every scheduled run's hot path
    val probe = runs(spark, path).agg(
      max(col("hi_watermark")).as("hi"),
      sum(when(col("run_id") === runId, 1L).otherwise(0L)).as("seen"))
      .collect()(0)
    if (!probe.isNullAt(1) && probe.getLong(1) > 0) return None // replayed run: no-op
    val lo = if (probe.isNullAt(0)) epochFloor else probe.getLong(0)
    if (newHi <= lo) return None // nothing new to process
    body(lo, newHi) // outputs land first...
    import spark.implicits._
    Seq((runId, lo, newHi, System.currentTimeMillis()))
      .toDF("run_id", "lo_watermark", "hi_watermark", "committed_at_epoch_ms")
      .write.mode("append").parquet(path) // ...then the commit row
    Some((lo, newHi))
  }
}
