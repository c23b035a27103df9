package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** As-of join: attach to each left row the latest right row of the
    * same key with right.ts <= left.ts (time-series point-in-time
    * lookup — Spark has no native ASOF join).
    *
    * Composed Spark-first rather than a custom SparkPlan: tag the two
    * sides, union, and carry the last right payload forward with one
    * window over (key → ts). One shuffle on the key, one sort — the
    * same work a dedicated sort-based as-of exec would do, but
    * Catalyst keeps owning partitioning, spill, and AQE. Right rows
    * sort before left rows at equal ts (tag order), so an exactly
    * coincident right row IS matched.
    *
    * `rightPayload` columns must not collide with left columns; right
    * rows with duplicate (key, ts) should be pre-deduplicated for
    * deterministic output.
    *
    * `forward = true` flips the direction: the EARLIEST right row
    * with right.ts >= left.ts (next-event attribution — the click's
    * following purchase) — the identical one-shuffle/one-sort plan
    * with the window traversing ts descending.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
      rightPayload: Seq[String], forward: Boolean = false): DataFrame = {
    val leftCols = left.columns.toSeq
    // the payload travels as ONE struct (null for left rows): carrying
    // fields independently through last(ignoreNulls) would backfill a
    // null field of the latest right row from an OLDER right row,
    // synthesizing a match that never existed
    val l = left
      .withColumn("__tag", lit(1))
      .withColumn("__pay", lit(null).cast(
        org.apache.spark.sql.types.StructType(rightPayload.map(c => right.schema(c)))))
      .select(leftCols.map(col) :+ col("__tag") :+ col("__pay"): _*)
    val r = right
      .withColumn("__tag", lit(0))
      .withColumn("__pay", struct(rightPayload.map(col): _*))
      .select((leftCols.map(c =>
        (if (c == key || c == ts) col(c) else lit(null).cast(left.schema(c).dataType)).as(c)) :+
        col("__tag")) :+ col("__pay"): _*)
    // forward: traverse ts DESCENDING, so "last right seen" at a left
    // row is the smallest right.ts >= left.ts; the tag tiebreak keeps
    // an exactly coincident right row visible in both directions
    val ord = if (forward) col(ts).desc else col(ts).asc
    val w = Window.partitionBy(col(key)).orderBy(ord, col("__tag"))
      .rowsBetween(Window.unboundedPreceding, 0)
    l.unionByName(r)
      .withColumn("__carried", last(col("__pay"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(leftCols.map(col) ++
        rightPayload.map(c => col(s"__carried.$c").as(c)): _*)
  }

  /** Bucketed range join: for each left row, count right rows with the
    * same key and ts in (left.ts, left.ts + windowSeconds]. A naive
    * inequality join degenerates to per-key cross products; here both
    * sides get an integral time bucket of width `windowSeconds` — each
    * right row lands in exactly one bucket, each left row probes its
    * own and the next bucket (any right row inside the window must be
    * in one of the two) — so the join is an equi-join on (key, bucket)
    * that Catalyst hash-partitions, and the exact range predicate only
    * filters bucket-local candidates. Left rows with no match keep a
    * zero count (left join back to the left side).
    */
  def rangeJoinCount(left: DataFrame, right: DataFrame, key: String, ts: String,
      leftId: String, windowSeconds: Long): DataFrame = {
    def bucket(c: Column): Column = floor(c.cast("double") / windowSeconds)
    val probes = left.select(col(leftId), col(key), col(ts).as("__lts"))
      .withColumn("__bkt",
        explode(array(bucket(col("__lts")), bucket(col("__lts")) + 1)))
    val build = right.select(col(key).as("__rkey"), col(ts).as("__rts"))
      .withColumn("__rbkt", bucket(col("__rts")))
    val counts = probes
      .join(build,
        col(key) === col("__rkey") && col("__bkt") === col("__rbkt") &&
          col("__rts").cast("double") > col("__lts").cast("double") &&
          col("__rts").cast("double") <= col("__lts").cast("double") + windowSeconds)
      .groupBy(col(leftId).as("__cid"))
      .agg(count("*").as("__n"))
    left.select(col(leftId), col(key), col(ts))
      .join(counts, col(leftId) === col("__cid"), "left")
      .select(col(leftId), col(key), col(ts),
        coalesce(col("__n"), lit(0L)).as("n_in_window"))
  }

  /** Interval-overlap join: for each left interval, count right
    * intervals of the same key that overlap it (closed-interval
    * semantics: rs ≤ le ∧ ls ≤ re) — concurrency analysis, overlap
    * detection, double-booking checks. Generalizes [[rangeJoinCount]]
    * from point-probes-interval to interval-probes-interval.
    *
    * A naive inequality join is a per-key cross product; here BOTH
    * sides decompose into the integral `bucketSeconds` buckets their
    * intervals span (in-row `sequence` explode), candidates meet in an
    * equi-join on (key, bucket) that Catalyst hash-partitions, pairs
    * deduplicate (an overlap spanning k shared buckets matches k
    * times) and the exact predicate filters bucket-local candidates.
    * Choose `bucketSeconds` ≈ the typical interval length: explode
    * fan-out is len/bucket + 1 per row, and a bucket's candidate set
    * stays local. Zero-overlap left intervals keep a 0 count.
    *
    * Interval µs arithmetic throughout — no double epochs (at 2026
    * epochs a double ulp is ~0.5 µs, enough to flip a boundary
    * overlap).
    */
  def intervalOverlapCount(left: DataFrame, right: DataFrame, key: String,
      leftId: String, rightId: String, startCol: String, endCol: String,
      bucketSeconds: Long): DataFrame = {
    require(bucketSeconds >= 1, s"bucketSeconds $bucketSeconds must be >= 1")
    val bUs = bucketSeconds * 1000000L
    def us(c: Column): Column = unix_micros(c)
    // µs longs stay < 2^53, so the double divide inside floor is exact
    // enough: integer inputs are ≥ 1/bUs relative distance from the
    // next bucket boundary, orders of magnitude beyond a double ulp
    def buckets(sUs: Column, eUs: Column): Column =
      sequence(floor(sUs / bUs), floor(eUs / bUs))
    val l = left.select(col(leftId), col(key),
        us(col(startCol)).as("__ls"), us(col(endCol)).as("__le"))
      .withColumn("__bkt", explode(buckets(col("__ls"), col("__le"))))
    val r = right.select(col(key).as("__rkey"), col(rightId).as("__rid"),
        us(col(startCol)).as("__rs"), us(col(endCol)).as("__re"))
      .withColumn("__bkt", explode(buckets(col("__rs"), col("__re"))))
    val counts = l.join(r,
        l(key) === r("__rkey") && l("__bkt") === r("__bkt") &&
          col("__rs") <= col("__le") && col("__ls") <= col("__re"))
      // an overlap spanning k shared buckets matched k times: count
      // DISTINCT right rows
      .groupBy(col(leftId).as("__cid"))
      .agg(countDistinct(col("__rid")).as("__n"))
    left.select(col(leftId), col(key), col(startCol), col(endCol))
      .join(counts, col(leftId) === col("__cid"), "left")
      .select(col(leftId), col(key), col(startCol), col(endCol),
        coalesce(col("__n"), lit(0L)).as("n_overlaps"))
  }

  /** Ordered conversion funnel: users who hit stage 1 → first stage-2
    * event within `maxGapSeconds` at-or-after it → first stage-3
    * event within the window after THAT, and so on. Classic
    * staged-conversion analytics with a conversion window.
    *
    * Each stage is one aggregate plus one equi-join keyed on user_id.
    * The prior stage's (user, first-ts) set shrinks at every step
    * (conversion attrition), so Catalyst broadcasts it into the next
    * stage's filtered event scan — the fact is never shuffled for a
    * stage join, only aggregated per stage; recomputed shared
    * subtrees dedupe via runtime exchange reuse. The per-stage user
    * counts combine as broadcast 1-row cross joins. */
  def funnelCounts(events: DataFrame, stages: Seq[String],
      maxGapSeconds: Long): DataFrame = {
    require(stages.nonEmpty, "funnelCounts needs at least one stage")
    val perStage = stages.tail.scanLeft(
      events.filter(col("event_type") === stages.head)
        .groupBy(col("user_id")).agg(min(col("ts")).as("stage_ts"))) {
      (prev, stage) =>
        events.filter(col("event_type") === stage)
          .select(col("user_id"), col("ts"))
          .join(prev.select(col("user_id"), col("stage_ts").as("prev_ts")), "user_id")
          .filter(col("ts") >= col("prev_ts") &&
            // integer µs, not double epoch seconds: at 2026 epochs the
            // double ulp (~0.5 µs) could flip a boundary event
            unix_micros(col("ts")) <=
              unix_micros(col("prev_ts")) + maxGapSeconds * 1000000L)
          .groupBy(col("user_id")).agg(min(col("ts")).as("stage_ts"))
    }
    perStage.zip(stages).map { case (df, stage) =>
      df.agg(count("*").as(s"n_$stage"))
    }.reduce(_ crossJoin _)
  }

  /** MATCH_RECOGNIZE-style sequence pattern: for every `startType`
    * event, the FIRST `endType` event of the same key STRICTLY after
    * it and within `windowSeconds`, provided no `blockType` event
    * falls strictly between the two — the "view → purchase within 30
    * min with no error in between" conversion shape that funnels
    * (min-ts chaining) cannot express, because here EVERY start
    * instance matches independently and an intervening blocker kills
    * exactly its own match.
    *
    * Built by composing the gated forward as-of join (q51 shape)
    * twice — once against the end events, once against the blockers —
    * then filtering: end within window, first-blocker-after-start not
    * before the matched end. Strictly-after is exact integer
    * arithmetic: the probe timestamp is start + 1 µs (event time is
    * µs precision), so "earliest right ≥ probe" ≡ "earliest right >
    * start" with no epsilon games. End events are pre-deduplicated to
    * min event id per (key, ts) — the as-of contract — which is also
    * the deterministic tie rule: the earliest end, smallest id first.
    *
    * Scale shape: two window passes partitioned by the SAME key (one
    * shuffle each, no self-join blowup per key), then one equi-join
    * of the two match frames on the start event id. Rows ∝ start
    * events throughout. A blocker storm cannot fan out: only the
    * FIRST blocker after each start is ever carried.
    *
    * @return (key, start_event_id, end_event_id, gap_us) — matches only.
    */
  def sequenceMatch(events: DataFrame, keyCol: String, tsCol: String,
      idCol: String, typeCol: String, startType: String, endType: String,
      blockType: String, windowSeconds: Long): DataFrame = {
    require(windowSeconds > 0, s"windowSeconds $windowSeconds must be > 0")
    val starts = events.filter(col(typeCol) === startType)
      .select(col(keyCol), col(idCol).as("start_event_id"),
        col(tsCol).as("start_ts"),
        // probe: strictly-after via +1 µs at exact µs precision
        (col(tsCol) + expr("INTERVAL 1 MICROSECOND")).as(tsCol))
    val ends = events.filter(col(typeCol) === endType)
      .groupBy(col(keyCol), col(tsCol))
      .agg(min(col(idCol)).as("end_event_id"))
      .withColumn("end_ts", col(tsCol))
    val blocks = events.filter(col(typeCol) === blockType)
      .select(col(keyCol), col(tsCol)).distinct()
      .withColumn("block_ts", col(tsCol))
    val withEnd = asOfJoin(starts, ends, keyCol, tsCol,
      Seq("end_event_id", "end_ts"), forward = true)
    val withBlock = asOfJoin(withEnd, blocks, keyCol, tsCol,
      Seq("block_ts"), forward = true)
    withBlock
      .filter(col("end_ts").isNotNull &&
        unix_micros(col("end_ts")) <=
          unix_micros(col("start_ts")) + windowSeconds * 1000000L &&
        (col("block_ts").isNull || col("block_ts") >= col("end_ts")))
      .select(col(keyCol), col("start_event_id"), col("end_event_id"),
        (unix_micros(col("end_ts")) - unix_micros(col("start_ts")))
          .as("gap_us"))
  }

  /** Time-grid resample with forward fill: per key, a regular grid of
    * `stepSeconds` points spanning the key's observed range, each
    * point carrying the latest event value at-or-before it plus the
    * count of events in its step. The standard gap-filling /
    * downsampling primitive for uneven event series.
    *
    * Shape at scale: one aggregate collapses events to (key, bucket)
    * rows — map-side combine, so the shuffle moves at most one row
    * per occupied bucket, never the raw events; the grid is generated
    * in-row (`sequence` explode) from a per-key min/max, so grid size
    * is ∝ keys × horizon/step and independent of event count; the
    * forward fill is one window over the same key partitioning. No
    * driver state, keys fill independently (AQE-splittable).
    *
    * Bucket arithmetic is integer µs (`unix_micros`), mirrored by the
    * oracle: an event exactly on a grid boundary belongs to that grid
    * point (ts <= grid ts ⇒ bucket = ceil(us/step_us)).
    *
    * Contract: `value` must be non-null (a null latest value would
    * fill from an OLDER event through the ignoreNulls carry); grid
    * size per key is (max−min)/step — pick `stepSeconds` so
    * horizon/step stays sane (a 1s grid over years of data is ~3×10⁷
    * rows per key by construction, not a bug in the operator).
    */
  def resampleGrid(events: DataFrame, key: String, ts: String, value: String,
      stepSeconds: Long): DataFrame = {
    val stepUs = stepSeconds * 1000000L
    // integer ceil-division via pmod: ceil(us/S) = (a - a mod S)/S with
    // a = us + S - 1. pmod keeps the numerator an exact floor-aligned
    // multiple of S even for negative (pre-1970) timestamps, and `div`
    // (integral divide) on that multiple is unconditionally exact —
    // unlike double division, which mis-buckets once |us| > 2^53, and
    // unlike decimal division, whose scale-10 HALF_UP rounding
    // mis-buckets boundary events once 1/S < 5e-11 (daily steps)
    val usC = unix_micros(col(ts)) + lit(stepUs - 1)
    val perBucket = events
      .withColumn("__usC", usC)
      .withColumn("__b", expr(s"(__usC - pmod(__usC, ${stepUs}L)) div ${stepUs}L"))
      .groupBy(col(key), col("__b"))
      .agg(
        count("*").as("__n"),
        // lexicographic max on (ts, event_id) = latest event, tiebreak
        // by id — one aggregate instead of a row_number window
        max(struct(col(ts), col("event_id"), col(value))).as("__last"))
      .select(col(key), col("__b"), col("__n"), col("__last").getField(value).as("__v"))
    val grid = perBucket
      .groupBy(col(key))
      .agg(min(col("__b")).as("__bmin"), max(col("__b")).as("__bmax"))
      .select(col(key), explode(sequence(col("__bmin"), col("__bmax"))).as("__b"))
    val fill = Window.partitionBy(col(key)).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, 0)
    grid.join(perBucket, Seq(key, "__b"), "left")
      .select(
        col(key),
        (col("__b") * stepSeconds).as("grid_epoch_s"),
        coalesce(col("__n"), lit(0L)).as("n_obs"),
        last(col("__v"), ignoreNulls = true).over(fill).as("value"))
  }

  /** Growth accounting: per day, first-time users and the running
    * distinct-user total. Exact running distinct is a classic trap —
    * the naive per-day `COUNT(DISTINCT)` over a growing range rescans
    * the prefix per day; instead each user collapses to a first-seen
    * day (one agg, map-side combine), days aggregate to new-user
    * counts, and the cumulative sum is a window over day-granularity
    * rows only. The unpartitioned window is safe BECAUSE it runs
    * after both aggregations: its input is ≤ horizon-days rows no
    * matter how many events or users feed it.
    */
  def runningDistinct(events: DataFrame, userCol: String, tsCol: String): DataFrame =
    events.groupBy(col(userCol))
      .agg(to_date(min(col(tsCol))).as("day"))
      .groupBy(col("day"))
      .agg(count("*").as("new_users"))
      .withColumn("cum_users",
        sum(col("new_users")).over(
          Window.orderBy(col("day")).rowsBetween(Window.unboundedPreceding, 0)))

  /** Sliding (hopping) window aggregate per event type: overlapping
    * windows of `windowSeconds` every `slideSeconds`. Spark's
    * `window()` generates each event's window/slide memberships
    * IN-ROW (an event lands in window/slide rows before the shuffle),
    * so the one shuffle moves (window, type) partials — the same
    * map-side-combine shape as the tumbling q15, ×(window/slide)
    * fan-out. Matches the Structured Streaming windowing semantics
    * exactly (same function), so a streaming variant is the identical
    * expression over readStream.
    *
    * Emits epoch seconds for the window start (integer — timezone- and
    * engine-neutral). `windowSeconds` must be a multiple of
    * `slideSeconds` (every event then sits in exactly window/slide
    * windows).
    */
  def slidingCounts(events: DataFrame, windowSeconds: Int, slideSeconds: Int): DataFrame = {
    require(windowSeconds % slideSeconds == 0,
      s"windowSeconds $windowSeconds must be a multiple of slideSeconds $slideSeconds")
    events.groupBy(
        window(col("ts"), s"$windowSeconds seconds", s"$slideSeconds seconds"),
        col("event_type"))
      .agg(count("*").as("n_events"), round(sum(col("value")), 2).as("total_value"))
      .select(col("window.start").cast("long").as("window_start_s"),
        col("event_type"), col("n_events"), col("total_value"))
  }

  /** Weekly cohort retention: users grouped by first-seen week, and
    * for each (cohort, week-offset) the count of cohort members active
    * that week — the classic retention triangle.
    *
    * Both feeding aggregates key on user_id (first-seen week) or
    * (user_id, week) (distinct activity), so the expensive work is
    * two map-side-combining aggs over the fact; the join carries one
    * row per (user, active week) — already collapsed — and the final
    * agg output is ∝ weeks², independent of event count. Week
    * arithmetic is date-exact (trunc + day diff / 7), no floats.
    */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val firstWeek = events.groupBy(col(userCol))
      .agg(date_trunc("week", min(col(tsCol))).as("__cohort"))
    val activity = events
      .select(col(userCol), date_trunc("week", col(tsCol)).as("__week"))
      .distinct()
    activity.join(firstWeek, userCol)
      .groupBy(col("__cohort"),
        (datediff(col("__week"), col("__cohort")) / 7).cast("int").as("week_offset"))
      .agg(count("*").as("n_active"))
      .select(col("__cohort").cast("date").as("cohort_week"),
        col("week_offset"), col("n_active"))
  }

  /** Z-score outlier detection: events whose value sits more than
    * `threshold` sample standard deviations from their event_type's
    * mean. The per-group moments are ONE aggregate (map-side partial
    * moment tuples, output rows = #types) broadcast back over the
    * fact — the fact itself is never shuffled, so the scan stays a
    * single codegen'd pass. The standard first-pass anomaly screen
    * over telemetry/metrics streams.
    */
  def zscoreOutliers(events: DataFrame, threshold: Double): DataFrame = {
    val stats = events.groupBy(col("event_type"))
      .agg(avg(col("value")).as("__mu"), stddev_samp(col("value")).as("__sigma"))
    events.join(broadcast(stats), "event_type")
      .withColumn("__z", (col("value") - col("__mu")) / col("__sigma"))
      .filter(abs(col("__z")) > threshold)
      .select(col("event_id"), col("event_type"), col("value"),
        round(col("__z"), 4).as("zscore"))
  }

  /** Seasonality-aware z-score screen: moments are computed per
    * (event_type, hour-of-day) cell instead of per type, so a value
    * that is normal at peak hour but wild at 3am flags — and the
    * daily cycle itself stops flagging (the #1 false-positive source
    * of the plain screen, [[zscoreOutliers]]). Same scale shape: one
    * broadcast-back moments aggregate (≤ types × 24 rows), the fact
    * scanned once, never shuffled. Cells need `minN` observations to
    * score (a 2-row cell has no meaningful variance). */
  def seasonalZscoreOutliers(events: DataFrame, threshold: Double,
      minN: Long = 30L): DataFrame = {
    val stats = events
      .groupBy(col("event_type"), hour(col("ts")).as("hod"))
      .agg(avg(col("value")).as("__mu"),
        stddev_samp(col("value")).as("__sigma"),
        count("*").as("__n"))
    events.withColumn("hod", hour(col("ts")))
      .join(broadcast(stats), Seq("event_type", "hod"))
      .filter(col("__n") >= minN && col("__sigma") > 0.0)
      .withColumn("__z", (col("value") - col("__mu")) / col("__sigma"))
      .filter(abs(col("__z")) > threshold)
      .select(col("event_id"), col("event_type"), col("hod").cast("int").as("hod"),
        col("value"), round(col("__z"), 4).as("zscore"))
  }

  /** Robust outlier detection via median absolute deviation: events
    * whose |value − median| exceeds `threshold` × 1.4826 × MAD of
    * their event_type (the consistency constant makes MAD a σ
    * estimate under normality). Unlike [[zscoreOutliers]], one wild
    * value cannot inflate the spread estimate and mask later
    * anomalies — the robust variant of the same screen.
    *
    * Two EXACT percentile aggregates (median of values, median of
    * absolute deviations) — full-multiset aggregates, the q21 trade;
    * at 100 TB swap in percentile_approx (approx_quantiles) for
    * fixed-memory sketch medians. Each aggregate's output is one row
    * per type, broadcast back; the fact is scanned twice but never
    * shuffled.
    *
    * Degenerate spread: when a type's MAD is 0 (≥half its values
    * identical), ANY deviation flags and robust_z is ±Infinity — the
    * mathematically honest answer; gate upstream if that's noise.
    */
  def madOutliers(events: DataFrame, threshold: Double,
      approxAccuracy: Option[Int] = None): DataFrame = {
    // approxAccuracy = Some(acc): medians from the percentile_approx
    // sketch (O(acc) memory per group — the 100 TB default; the exact
    // form buffers each group's full value multiset in one agg
    // buffer). When acc > 2·|group| the sketch degenerates to exact
    // rank selection (the element at 1-based rank ceil(p·n)), which
    // is what lets the sketch path be hash-gated at verify scale.
    def med(c: String): Column = approxAccuracy match {
      case Some(acc) => expr(s"percentile_approx($c, 0.5, $acc)")
      case None      => expr(s"percentile($c, 0.5)")
    }
    val medDf = events.groupBy(col("event_type")).agg(med("value").as("__med"))
    val dev = events.join(broadcast(medDf), "event_type")
      .withColumn("__ad", abs(col("value") - col("__med")))
    val mad = dev.groupBy(col("event_type"))
      .agg(med("__ad").as("__mad"))
    dev.join(broadcast(mad), "event_type")
      .filter(col("__ad") > lit(threshold) * lit(1.4826) * col("__mad"))
      .select(col("event_id"), col("event_type"), col("value"),
        round((col("value") - col("__med")) / (lit(1.4826) * col("__mad")), 4)
          .as("robust_z"))
  }

  /** One-pass window-function suite per user (ordered by ts, id):
    * previous/next value, first value, running max, cumulative
    * distribution — the navigation/frame/rank families over ONE
    * shuffle + sort (all five share the same WindowSpec partitioning,
    * so Spark plans a single Window operator). */
  def windowSuite(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events.select(
      col("event_id"), col("user_id"), col("value"),
      lag(col("value"), 1).over(w).as("prev_value"),
      lead(col("value"), 1).over(w).as("next_value"),
      first(col("value")).over(w).as("first_value"),
      max(col("value")).over(w.rowsBetween(Window.unboundedPreceding, 0))
        .as("running_max"),
      round(cume_dist().over(w), 4).as("cume"))
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
