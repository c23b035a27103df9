package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Continuous ordered conversion funnel — the streaming twin of
  * [[graft.operators.Events.funnelCounts]] (stream_funnel).
  *
  * Per user, GroupState is a two-field cursor (stages completed, ts
  * of the last completed stage) — O(users) state. An event advances
  * the cursor iff it is the NEXT stage and lands inside the per-step
  * conversion window; each advance emits one Transition row (append
  * semantics). The funnel table is then a trivial per-stage count
  * over the transition log — which downstream can maintain
  * incrementally, because transitions are append-only facts.
  *
  * Greedy-in-time-order ≡ the batch min-chaining: the first
  * qualifying stage-k event in event-time order IS min(ts) of the
  * qualifying set, stage by stage (induction the parity spec checks
  * on real data). Window math is integer µs, as in batch. Ordering
  * contract as in Anomaly.zscoreStream, one notch stronger: in-batch
  * rows fold sorted by (ts, event_id); the cross-batch feed is
  * event-time ordered per user AND events sharing one timestamp must
  * arrive in one batch (the per-timestamp fixpoint below makes
  * same-ts stage chains order-independent WITHIN a batch, but a
  * same-ts pair split across batches in reverse stage order loses
  * the earlier-batch event — state holds a cursor, not an event
  * buffer; batch parity holds under the stated contract).
  */
object FunnelStream {

  case class Transition(user_id: Long, stage_idx: Int, stage: String, ts: Timestamp)

  /** Funnel cursor (public: state encoder codegen). */
  case class FunnelCursor(completed: Int, lastTsUs: Long)

  def funnelStream(events: Dataset[EventStreams.Event], stages: Seq[String],
      maxGapSeconds: Long)(
      implicit spark: SparkSession): Dataset[Transition] = {
    import spark.implicits._
    require(stages.nonEmpty, "funnelStream needs at least one stage")
    val gapUs = maxGapSeconds * 1000000L
    val stageArr = stages.toIndexedSeq
    // local so the fold closure captures a function value, not this
    // (non-serializable) object
    def micros(t: Timestamp): Long =
      t.getTime * 1000L + (t.getNanos / 1000) % 1000

    def fold(userId: Long, it: Iterator[EventStreams.Event],
        state: GroupState[FunnelCursor]): Iterator[Transition] = {
      var cur = state.getOption.getOrElse(FunnelCursor(0, Long.MinValue))
      val out = Seq.newBuilder[Transition]
      // events at ONE timestamp are processed as a group with a
      // stage-advance fixpoint: the batch min-chaining accepts a
      // next-stage event whose ts EQUALS the prior stage's ts, so a
      // same-ts pair must advance in stage order regardless of
      // event_id order (a plain single pass would drop the conversion
      // when the later stage carries the smaller id)
      val sorted = it.toSeq.sortBy(e => (micros(e.ts), e.event_id))
      var idx = 0
      while (idx < sorted.length) {
        val us = micros(sorted(idx).ts)
        var end = idx
        while (end < sorted.length && micros(sorted(end).ts) == us) end += 1
        val group = sorted.slice(idx, end)
        var advanced = true
        while (advanced && cur.completed < stageArr.length) {
          advanced = false
          val inWindow = cur.completed == 0 ||
            (us >= cur.lastTsUs && us <= cur.lastTsUs + gapUs)
          if (inWindow && group.exists(_.event_type == stageArr(cur.completed))) {
            val e = group.filter(_.event_type == stageArr(cur.completed))
              .minBy(_.event_id)
            out += Transition(userId, cur.completed, stageArr(cur.completed), e.ts)
            cur = FunnelCursor(cur.completed + 1, us)
            advanced = true
          }
        }
        idx = end
      }
      state.update(cur)
      out.result().iterator
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fold)
  }
}
