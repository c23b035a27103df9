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

  /** Streaming CDC apply — the continuous form of
    * [[graft.operators.Pipeline.mergeApply]]: a stream of versioned
    * I/U/D ops folds into per-key state; the output is a change log
    * of `(key, Some(currentRow))` on upsert and `(key, None)`
    * tombstones on delete, emitted only when the key's live row
    * actually changes.
    *
    * State per key is `(appliedVersion, liveRow)`: the version guard
    * makes at-least-once redelivery and out-of-order ops safe (a
    * stale op — version < applied — is ignored, so a replayed U
    * cannot resurrect a deleted key). Deleted keys retain a
    * `(version, None)` tombstone so the guard keeps working; a
    * production deployment bounds tombstone state with an
    * event-time/processing-time timeout — kept NoTimeout here so the
    * semantics stay exact for the spec's replay checks.
    *
    * Version-uniqueness contract: versions should be UNIQUE per key
    * (log-offset / LSN semantics). Ties between DISTINCT ops sharing
    * `(key, version)` are resolved deterministically where the state
    * shape allows: a delete beats a live row at the same version
    * (and a replayed upsert never resurrects a same-version delete);
    * between two distinct LIVE rows at one version, `tiebreak(r, c)`
    * decides if provided ("r beats c"), else the first-applied op
    * keeps winning — which depends on arrival order, so feeds that
    * can carry genuine live-row ties (e.g. coarse timestamp
    * versions) must pass a tiebreak or pack a sequence number into
    * the version's low bits.
    */
  def cdcApply[K, T](ds: Dataset[T])(keyFn: T => K)(
      ver: T => Long, isDelete: T => Boolean,
      tiebreak: Option[(T, T) => Boolean] = None)(
      implicit kEnc: Encoder[K],
      stateEnc: Encoder[(Long, Option[T])],
      outEnc: Encoder[(K, Option[T])]): Dataset[(K, Option[T])] = {
    def fold(key: K, rows: Iterator[T],
        state: GroupState[(Long, Option[T])]): Iterator[(K, Option[T])] = {
      val prev = state.getOption
      var curVer = prev.map(_._1).getOrElse(Long.MinValue)
      var cur = prev.flatMap(_._2)
      rows.foreach { r =>
        val v = ver(r)
        if (v > curVer) {
          curVer = v
          cur = if (isDelete(r)) None else Some(r)
        } else if (v == curVer) (cur, isDelete(r)) match {
          // same-version ties (see contract above): delete wins over
          // a live row; a delete already applied at this version is
          // final; two live rows defer to the caller's tiebreak
          case (Some(_), true) => cur = None
          case (Some(c), false) =>
            tiebreak.foreach(tb => if (tb(r, c)) cur = Some(r))
          case (None, _) => ()
        }
      }
      state.update((curVer, cur))
      if (cur == prev.flatMap(_._2)) Iterator.empty
      else Iterator.single((key, cur))
    }
    ds.groupByKey(keyFn)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(fold)
  }
}
