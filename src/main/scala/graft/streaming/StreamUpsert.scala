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
    def fold(key: K, rows: Iterator[T], state: GroupState[T]): T = {
      var cur: Option[T] = state.getOption
      rows.foreach { r => if (cur.forall(c => newer(r, c))) cur = Some(r) }
      state.update(cur.get)
      cur.get
    }
    ds.groupByKey(keyFn)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(fold)
  }
}
