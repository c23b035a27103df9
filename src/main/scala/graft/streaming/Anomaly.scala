package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Online anomaly detection — the continuous form of
  * [[graft.operators.Events.zscoreOutliers]]: per-key running moments
  * (Welford) instead of a batch moments aggregate, so the detector
  * scores events as they arrive instead of re-scanning history.
  *
  * State per key is three doubles (count, mean, M2) — O(keys), never
  * O(stream). Each event is scored against the moments BEFORE it
  * updates them (prequential scoring): a level shift flags its first
  * events instead of silently absorbing them into the baseline.
  */
object Anomaly {

  /** Welford accumulator. Merged sequentially per (key, batch);
    * numerically stable for long streams (no catastrophic
    * cancellation, unlike naive Σx²−n·mean²). */
  private[streaming] final case class Moments(n: Long, mean: Double, m2: Double) {
    def add(x: Double): Moments = {
      val n1 = n + 1
      val d = x - mean
      val mean1 = mean + d / n1
      Moments(n1, mean1, m2 + d * (x - mean1))
    }
    def variance: Double = if (n < 2) Double.NaN else m2 / (n - 1)
  }

  /** Flag events whose value is > `threshold` sample stddevs from the
    * key's running mean. Events inside each (key, micro-batch) group
    * are folded in `orderBy` order — pass event time so replays and
    * shuffle nondeterminism cannot reorder the fold (prequential
    * scores are order-sensitive by definition). No event is flagged
    * until the key has seen `minN` prior events (a cold detector has
    * no baseline) or while variance is zero.
    *
    * Output rows are `(event, zscore)` for flagged events only —
    * append semantics, safe for any downstream sink.
    */
  def zscoreStream[K, T](ds: Dataset[T])(keyFn: T => K)(
      value: T => Double, orderBy: T => Long,
      threshold: Double, minN: Long)(
      implicit kEnc: Encoder[K],
      stateEnc: Encoder[(Long, Double, Double)],
      outEnc: Encoder[(T, Double)]): Dataset[(T, Double)] = {
    require(threshold > 0.0, s"threshold $threshold must be positive")
    require(minN >= 2, s"minN $minN must be >= 2 (sample variance needs 2 points)")
    def fold(key: K, rows: Iterator[T],
        state: GroupState[(Long, Double, Double)]): Iterator[(T, Double)] = {
      var m = state.getOption
        .map { case (n, mean, m2) => Moments(n, mean, m2) }
        .getOrElse(Moments(0L, 0.0, 0.0))
      val out = Seq.newBuilder[(T, Double)]
      rows.toSeq.sortBy(orderBy).foreach { r =>
        val x = value(r)
        val sd = math.sqrt(m.variance)
        if (m.n >= minN && sd > 0.0) {
          val z = (x - m.mean) / sd
          if (math.abs(z) > threshold) out += ((r, z))
        }
        m = m.add(x)
      }
      state.update((m.n, m.mean, m.m2))
      out.result().iterator
    }
    ds.groupByKey(keyFn)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fold)
  }
}
