package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch event analytics (SURVEY.md §2d). The streaming variants with
  * identical semantics live in graft.streaming.EventStreams — batch
  * and stream share the same grouping logic, so a backfill and the
  * live pipeline agree.
  */
object Events {

  /** Tumbling-window aggregate per event type. date_trunc keeps the
    * group key codegen'd; one shuffle on (hour, type). */
  def hourlyByType(events: DataFrame): DataFrame =
    events.groupBy(
        date_trunc("hour", col("ts")).as("hour_start"),
        col("event_type"))
      .agg(count("*").as("n_events"), round(sum(col("value")), 2).as("total_value"))

  /** Gap-based sessionization: a new session starts when the gap to
    * the previous event of the same user exceeds `gapSeconds`.
    *
    * Two windows over the same (user_id → ts) partitioning — Spark
    * reuses one shuffle + sort for both (same WindowSpec), then the
    * session aggregate shuffles on (user, session). Timestamps are
    * compared at full microsecond precision (cast to double epoch
    * seconds), not floored seconds.
    */
  def sessionize(events: DataFrame, gapSeconds: Double): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val epoch = col("ts").cast("double")
    events
      .withColumn("__gap", epoch - lag(epoch, 1).over(byUser))
      .withColumn("__new", when(col("__gap").isNull || col("__gap") > gapSeconds, 1).otherwise(0))
      .withColumn("session_seq",
        sum(col("__new")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)).cast("int"))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        count("*").as("n_events"),
        min(col("ts")).as("start_ts"),
        max(col("ts")).as("end_ts"),
        round(sum(col("value")), 2).as("total_value"))
  }

  /** Semi-structured JSON prop extraction + aggregate. get_json_object
    * is codegen'd; for a fixed schema, from_json + a struct column
    * would let Catalyst prune fields — used when more than one key is
    * read. */
  def jsonPropAgg(events: DataFrame): DataFrame =
    events
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy(col("event_type"))
      .agg(
        count("*").as("n_events"),
        sum(col("k")).as("sum_k"),
        round(avg(col("k")), 4).as("avg_k"))
}
