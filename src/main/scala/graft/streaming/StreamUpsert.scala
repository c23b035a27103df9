package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming keep-latest-per-key — the continuous form of the
  * reference's snapshot merge (Pipeline.upsertLatest; main_dag.py:
  * 242-262 re-reads and rewrites the whole CSV snapshot weekly).
  *
  * One GroupState per key holds the current winner; each micro-batch
  * emits the key's new winner iff it changed (update semantics —
  * downstream lands it with an idempotent per-key sink, e.g.
  * foreachBatch MERGE). State size is O(live keys), not O(stream):
  * the same bound the batch row_number() merge pays per run, paid
  * incrementally instead.
  */
object StreamUpsert {

  /** @param newer total "is strictly newer than" order — must be a
    *              strict total order over versions (ties broken
    *              deterministically) or replays could flip winners. */
  def latestPerKey[K: Encoder, T: Encoder](ds: Dataset[T])(keyFn: T => K)(
      newer: (T, T) => Boolean): Dataset[T] = {
    // flatMap, not map: a key whose batch carried only stale versions
    // (at-least-once redelivery) emits NOTHING — the output really is
    // a change log, not a per-batch re-assertion of old winners
    def fold(key: K, rows: Iterator[T], state: GroupState[T]): Iterator[T] = {
      val prev: Option[T] = state.getOption
      var cur: Option[T] = prev
      rows.foreach { r => if (cur.forall(c => newer(r, c))) cur = Some(r) }
      state.update(cur.get)
      if (prev.contains(cur.get)) Iterator.empty else Iterator.single(cur.get)
    }
    ds.groupByKey(keyFn)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(fold)
  }
}
