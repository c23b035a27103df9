package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Continuous time-grid resample with forward fill — the streaming
  * twin of [[graft.operators.Events.resampleGrid]] (stream_resample).
  *
  * Per key, GroupState holds only the OPEN grid bucket (its count and
  * lexicographically-latest event) — O(keys) state, never O(stream).
  * A bucket emits exactly once, when an event from a LATER bucket
  * proves it complete: first the closed bucket's own row, then one
  * zero-count gap row per empty bucket up to the new open bucket,
  * each carrying the closed bucket's value forward (the same
  * last-non-null carry the batch window computes). Append semantics.
  *
  * Bucket arithmetic is the batch operator's integer-µs rule exactly:
  * bucket = ceil(us / stepUs) via floorDiv(us + step − 1, step), so an
  * event on a grid boundary belongs to that grid point in both forms.
  *
  * Ordering contract (same as Anomaly.zscoreStream): within a batch,
  * rows fold in (ts, event_id) order; across batches the feed must be
  * event-time ordered per key. An event landing in an already-closed
  * bucket is DROPPED — emitted grid rows are immutable (the watermark
  * discipline: bound lateness upstream). The open (maximum) bucket is
  * never emitted — it could still change; batch parity is therefore
  * over every grid point strictly below each key's last bucket.
  */
object ResampleStream {

  case class GridPoint(user_id: Long, grid_epoch_s: Long, n_obs: Long, value: Double)

  /** Open-bucket accumulator (public: state encoder codegen). */
  case class OpenBucket(bucket: Long, n: Long,
      lastTsUs: Long, lastId: Long, lastValue: Double)

  private def micros(t: java.sql.Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000) % 1000

  def resampleStream(events: Dataset[EventStreams.Event], stepSeconds: Long)(
      implicit spark: SparkSession): Dataset[GridPoint] = {
    import spark.implicits._
    require(stepSeconds > 0, s"stepSeconds $stepSeconds must be positive")
    val stepUs = stepSeconds * 1000000L

    def fold(userId: Long, it: Iterator[EventStreams.Event],
        state: GroupState[OpenBucket]): Iterator[GridPoint] = {
      var open = state.getOption.orNull
      val out = Seq.newBuilder[GridPoint]
      it.toSeq.sortBy(e => (micros(e.ts), e.event_id)).foreach { e =>
        val us = micros(e.ts)
        val b = Math.floorDiv(us + stepUs - 1, stepUs)
        if (open == null) {
          open = OpenBucket(b, 1L, us, e.event_id, e.value)
        } else if (b < open.bucket) {
          // late past a closed grid point: dropped (emits are final)
        } else if (b == open.bucket) {
          val newer = us > open.lastTsUs ||
            (us == open.lastTsUs && e.event_id > open.lastId)
          open =
            if (newer) OpenBucket(b, open.n + 1, us, e.event_id, e.value)
            else open.copy(n = open.n + 1)
        } else {
          // bucket `open.bucket` is complete: its row, then the gap
          // rows it forward-fills, then reopen at b
          out += GridPoint(userId, open.bucket * stepSeconds, open.n, open.lastValue)
          var g = open.bucket + 1
          while (g < b) {
            out += GridPoint(userId, g * stepSeconds, 0L, open.lastValue)
            g += 1
          }
          open = OpenBucket(b, 1L, us, e.event_id, e.value)
        }
      }
      if (open != null) state.update(open)
      out.result().iterator
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fold)
  }
}
