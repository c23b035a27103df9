package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming variants of the batch event operators
  * (graft.operators.Events) — same grouping semantics, so a backfill
  * job and the live pipeline produce consistent tables.
  *
  * The reference runs weekly batch Airflow (main_dag.py's schedule) —
  * its "incremental update" pattern (new rows per run + update log)
  * is exactly a streaming upsert; these operators are the
  * continuous-form equivalent.
  */
object EventStreams {

  /** Raw event row as read from the events table. */
  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  /** Emitted session summary (append-mode output). */
  case class Session(user_id: Long, session_seq: Int, n_events: Long,
      start_ts: Timestamp, end_ts: Timestamp, total_value: Double)

  /** Open-session accumulator held in GroupState (public: the state
    * encoder's generated code must reach its accessors). */
  case class SessionState(seq: Int, n: Long, startUs: Long, lastUs: Long, total: Double)

  /** Tumbling-window count/sum per event type with a watermark: the
    * streaming twin of Events.hourlyByType. Late events beyond the
    * watermark are dropped; state is bounded by (watermark horizon ×
    * type cardinality). */
  def windowedByType(events: DataFrame, windowLen: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count("*").as("n_events"), round(sum(col("value")), 2).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Streaming exact dedup: drop events whose `idCols` were already
    * seen, with state bounded by the watermark horizon
    * (dropDuplicatesWithinWatermark — duplicates in a stream arrive
    * close together, e.g. at-least-once redelivery, so expiring dedup
    * state past the watermark keeps it O(horizon), not O(stream)).
    *
    * Survivor semantics: keeps the FIRST ARRIVAL of each key — the
    * only choice a one-pass stream can make. The batch Dedup.exact
    * keeps min(id); the two agree when redeliveries are byte-identical
    * payloads (the at-least-once case this handles) or arrival order
    * follows id order — reconciliations on other streams must compare
    * on the dedup key, not the surviving row. */
  def dedupStream(events: DataFrame, watermark: String, idCols: Seq[String],
      tsCol: String = "ts"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(idCols.head, idCols.tail: _*)

  /** Stream-stream interval join: each left event joined to the same
    * key's right events with `right.ts` in `[left.ts - windowSeconds,
    * left.ts]` (e.g. the clicks preceding each purchase).
    *
    * Both sides carry watermarks AND the join condition bounds
    * right.ts relative to left.ts in both directions — that pair is
    * what lets Spark expire join state on BOTH sides (a right row can
    * be dropped once the left watermark passes right.ts +
    * windowSeconds). Without the time bound, stream-stream join state
    * grows without limit. State ∝ watermark horizon + interval, per
    * key — the streaming analogue of the batch bucketed range join's
    * "never a per-key cross product" rule.
    */
  def intervalJoinStream(left: DataFrame, right: DataFrame, key: String,
      watermark: String, windowSeconds: Long): DataFrame = {
    val l = left.select(col("event_id").as("left_id"), col(key),
        col("ts").as("left_ts"))
      .withWatermark("left_ts", watermark)
    val r = right.select(col("event_id").as("right_id"),
        col(key).as("__rkey"), col("ts").as("right_ts"))
      .withWatermark("right_ts", watermark)
    l.join(r,
        col(key) === col("__rkey") &&
          col("right_ts") >= col("left_ts") - expr(s"INTERVAL $windowSeconds SECONDS") &&
          col("right_ts") <= col("left_ts"))
      .select(col("left_id"), col(key), col("left_ts"),
        col("right_id"), col("right_ts"))
  }

  /** Stateful gap-sessionization: the streaming twin of
    * Events.sessionize. One GroupState per user holds the open
    * session.
    *
    * Emits a session when the gap to the previous event exceeds
    * `gapSeconds`. With `idleFlushMs` set, a processing-time timeout
    * also flushes idle OPEN sessions; a small seq marker remains per
    * user so later sessions continue the numbering — (user, seq)
    * stays unique across flushes (leave unset in synchronous test
    * harnesses — each timeout schedules another micro-batch, so
    * processAllAvailable would never drain). Within-batch events are
    * sorted by (ts, event_id) before folding, so replays are
    * deterministic.
    */
  def sessionizeStream(events: Dataset[Event], gapSeconds: Double,
      idleFlushMs: Option[Long] = None)(
      implicit spark: SparkSession): Dataset[Session] = {
    import spark.implicits._
    val gapMicros = (gapSeconds * 1e6).toLong

    def micros(t: Timestamp): Long = t.getTime * 1000L + (t.getNanos / 1000) % 1000

    // full-µs reconstruction: new Timestamp(us / 1000) alone would
    // truncate to milliseconds and diverge from the batch twin's
    // min/max(ts)
    def toTs(us: Long): Timestamp = {
      val t = new Timestamp((us / 1000000L) * 1000L)
      t.setNanos(((us % 1000000L) * 1000L).toInt)
      t
    }

    // match Spark's round() (HALF_UP) exactly — math.rint is half-even
    // and would diverge from the batch twin at half-cent sums
    def round2(v: Double): Double =
      BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble

    def fold(userId: Long, it: Iterator[Event],
        state: GroupState[SessionState]): Iterator[Session] = {
      if (state.hasTimedOut) {
        // flush the open session but KEEP a seq marker (n == 0): the
        // user's next session must continue the numbering, or a
        // downstream MERGE keyed (user, seq) would overwrite the
        // flushed session with the next one. Marker state is O(users)
        // — the same live-key bound every per-key stateful op pays.
        val out = state.getOption.filter(_.n > 0).map { s =>
          Session(userId, s.seq, s.n, toTs(s.startUs), toTs(s.lastUs), round2(s.total))
        }
        state.getOption.foreach(s => state.update(s.copy(n = 0)))
        return out.iterator
      }
      val sorted = it.toSeq.sortBy(e => (micros(e.ts), e.event_id))
      var cur = state.getOption.orNull
      val emitted = Seq.newBuilder[Session]
      for (e <- sorted) {
        val t = micros(e.ts)
        if (cur == null) {
          cur = SessionState(1, 1, t, t, e.value)
        } else if (cur.n == 0) {
          // idle-flushed marker: continue numbering after the flushed seq
          cur = SessionState(cur.seq + 1, 1, t, t, e.value)
        } else if (t - cur.lastUs > gapMicros) {
          emitted += Session(userId, cur.seq, cur.n,
            toTs(cur.startUs), toTs(cur.lastUs), round2(cur.total))
          cur = SessionState(cur.seq + 1, 1, t, t, e.value)
        } else {
          cur = cur.copy(n = cur.n + 1, lastUs = t, total = cur.total + e.value)
        }
      }
      state.update(cur)
      idleFlushMs.foreach(ms => state.setTimeoutDuration(s"$ms milliseconds"))
      emitted.result().iterator
    }

    val timeoutConf =
      if (idleFlushMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(fold)
  }
}
