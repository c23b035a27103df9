package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** The reference's weekly DAG as a continuous pipeline — the
  * streaming twin of graft.operators.ReferenceDag.
  *
  * The reference (main_dag.py:491-523) re-reads and rewrites its whole
  * snapshot weekly: merge new rows by key, recount the Q1 table, log
  * volume metrics. Each of those is a per-key or per-group fold, so
  * the continuous form is the same logic with state instead of
  * re-scans:
  *
  *   - snapshot merge  → [[StreamUpsert.latestPerKey]] (update-mode
  *     change log of winners; state O(live keys));
  *   - Q1 year/category counts → streaming groupBy count (state O(groups));
  *   - volume metrics → per-micro-batch aggregate via foreachBatch,
  *     appended as a run log (the reference's `volume_update` rows).
  *
  * Delete detection stays a batch reconciliation (left_anti between
  * landed snapshots) — absence of a key has no event in a stream.
  */
object ReferenceDagStream {

  /** One publication-like record (the orders-table stand-in the batch
    * ReferenceDag uses; see SURVEY.md §3). */
  case class Pub(o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
      o_totalprice: Double, o_orderdate: Timestamp, o_orderpriority: String)

  /** Change log of the latest publication per key — the continuous
    * snapshot merge. Update output mode. */
  def snapshotUpdates(pubs: Dataset[Pub]): Dataset[Pub] = {
    import pubs.sparkSession.implicits._
    StreamUpsert.latestPerKey(pubs)(_.o_custkey)((a, b) =>
      Ordering[(Long, Long)].gt(
        (a.o_orderdate.getTime, a.o_orderkey),
        (b.o_orderdate.getTime, b.o_orderkey)))
  }

  /** Q1 table maintained continuously: count per (year, category) —
    * literally the batch operator applied to the stream (the grouping
    * is a streaming-legal aggregate), so backfill and live CANNOT
    * diverge. Complete/update output mode (running totals, state
    * O(groups)). */
  def q1Counts(pubs: DataFrame): DataFrame =
    graft.operators.Pipeline.countByYearCategory(pubs, "o_orderdate", "o_orderpriority")

  /** Per-micro-batch volume metrics appended to a parquet run log —
    * the reference's `volume_update` rows, one per run. foreachBatch
    * applies the SAME batch aggregate (Pipeline.volumeMetrics, so the
    * run-log schema matches the batch DAG's volume table:
    * total_rows / total_new / unique_keys) and lands it idempotently
    * in a batch_id=N partition dir; batch_id surfaces on read as the
    * discovered partition column (not duplicated in-file, where the
    * k=v dirname would shadow it with a different type). */
  def volumeLog(pubs: DataFrame, outDir: String, isNew: org.apache.spark.sql.Column,
      keyCol: String): org.apache.spark.sql.streaming.StreamingQuery =
    pubs.writeStream.foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
      graft.operators.Pipeline.volumeMetrics(batch.toDF(), isNew, keyCol)
        .write.mode("overwrite")
        .parquet(s"$outDir/batch_id=$batchId") // idempotent per batch
      ()
    }.start()
}
