package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Events

class EventsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("hllDistinct lands within 5% of exact per group") {
    val ev = graft.sources.Tables.events(spark, sfDir)
    val approx = graft.operators.Profile.hllDistinct(ev, "user_id", "event_type")
      .select(col("event_type"), col("est_distinct"))
      .as[(String, Double)].collect().toMap
    val exact = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("e")).as[(String, Long)].collect().toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (k, e) =>
      val a = approx(k)
      assert(math.abs(a - e) / e <= 0.05, s"$k: approx $a vs exact $e")
    }
  }

  test("hllDistinct is insensitive to partitioning (register merge is a max)") {
    val ev = graft.sources.Tables.events(spark, sfDir)
    val one = graft.operators.Profile.hllDistinct(
      ev.coalesce(1), "user_id", "event_type")
      .as[(String, Double, Long)].collect().toSet
    val many = graft.operators.Profile.hllDistinct(
      ev.repartition(17), "user_id", "event_type")
      .as[(String, Double, Long)].collect().toSet
    assert(one === many)
  }

  test("hllDistinct leaves linear counting at high cardinality (raw-estimator branch)") {
    // 200k distinct keys against 2^10 registers: every register
    // occupied, V = 0 → the raw-estimator branch must carry, and
    // within the HLL error bound (1.04/√1024 ≈ 3.3%; allow 3σ)
    val n = 200000
    val df = spark.range(n.toLong).select(lit("g").as("g"), col("id"))
    val est = graft.operators.Profile.hllDistinct(df, "id", "g")
      .select("est_distinct").as[Double].head()
    assert(math.abs(est - n) / n <= 0.10, s"raw HLL estimate $est vs $n")
  }

  test("rangeJoinCount counts window hits across bucket boundaries, keeps zeros") {
    // signup at :30 — its 1h window (exclusive start, inclusive end)
    // straddles the bucket boundary at :00
    val signups = Seq((1L, 7L, ts("2024-01-01 10:30:00")),
      (2L, 8L, ts("2024-01-01 10:00:00"))).toDF("event_id", "user_id", "ts")
    val purchases = Seq(
      (7L, ts("2024-01-01 10:30:00")),  // == start: excluded (strict >)
      (7L, ts("2024-01-01 10:59:00")),  // same bucket: counted
      (7L, ts("2024-01-01 11:30:00")),  // next bucket, == end: counted
      (7L, ts("2024-01-01 11:30:01")),  // past end: excluded
      (9L, ts("2024-01-01 10:45:00"))   // other user: excluded
    ).toDF("user_id", "ts")
    val out = Events.rangeJoinCount(signups, purchases, "user_id", "ts",
        "event_id", 3600L)
      .select("event_id", "n_in_window").as[(Long, Long)].collect().sortBy(_._1)
    assert(out === Array((1L, 2L), (2L, 0L)))
  }

  test("intervalOverlapCount matches brute force across bucket boundaries") {
    val left = Seq(
      (1L, 7L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")),
      (2L, 7L, ts("2024-01-01 12:00:00"), ts("2024-01-01 12:10:00")),
      (3L, 8L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00"))
    ).toDF("event_id", "user_id", "start_ts", "end_ts")
    val right = Seq(
      (101L, 7L, ts("2024-01-01 09:00:00"), ts("2024-01-01 10:00:00")), // touches start (closed): counted for 1
      (102L, 7L, ts("2024-01-01 10:30:00"), ts("2024-01-01 13:00:00")), // spans many buckets: counted ONCE for 1 and 2
      (103L, 7L, ts("2024-01-01 11:00:01"), ts("2024-01-01 11:30:00")), // past 1's end, before 2: excluded
      (104L, 8L, ts("2024-01-01 12:00:00"), ts("2024-01-01 12:30:00"))  // other user, no overlap with 3
    ).toDF("event_id", "user_id", "start_ts", "end_ts")
    // bucket = 10 min, far smaller than the intervals — forces
    // multi-bucket matches that the distinct-count must dedup
    val out = Events.intervalOverlapCount(left, right, "user_id",
        "event_id", "event_id", "start_ts", "end_ts", bucketSeconds = 600)
      .select("event_id", "n_overlaps").as[(Long, Long)].collect().sortBy(_._1)
    assert(out === Array((1L, 2L), (2L, 1L), (3L, 0L)))
  }

  test("intervalOverlapCount candidates meet in an equi-join, not a cross product") {
    val ev = graft.sources.Tables.events(spark, sfDir)
    def episodes(typ: String) = ev.filter(col("event_type") === typ)
      .select(col("event_id"), col("user_id"), col("ts").as("start_ts"),
        timestamp_micros(unix_micros(col("ts")) + 600000000L).as("end_ts"))
    val p = Events.intervalOverlapCount(episodes("error"), episodes("click"),
        "user_id", "event_id", "event_id", "start_ts", "end_ts", 600)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"overlap join degenerated to a cross product:\n$p")
  }

  test("sessionize splits on gaps strictly greater than the threshold") {
    val events = Seq(
      (1L, ts("2024-01-01 00:00:00"), 7L, "a", 1.0),
      (2L, ts("2024-01-01 00:29:00"), 7L, "a", 2.0), // same session (29 min)
      (3L, ts("2024-01-01 01:00:00"), 7L, "a", 3.0), // 31 min -> new session
      (4L, ts("2024-01-01 00:10:00"), 8L, "a", 4.0)  // other user
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Events.sessionize(events, 1800.0)
      .orderBy("user_id", "session_seq")
      .select("user_id", "session_seq", "n_events", "total_value")
      .as[(Long, Int, Long, Double)].collect()
    assert(out === Array((7L, 1, 2L, 3.0), (7L, 2, 1L, 3.0), (8L, 1, 1L, 4.0)))
  }

  test("sessionize gap is exclusive at exactly the threshold") {
    val events = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "a", 1.0),
      (2L, ts("2024-01-01 00:30:00"), 1L, "a", 1.0) // exactly 1800s -> same session
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Events.sessionize(events, 1800.0).collect()
    assert(out.length === 1)
  }

  test("hourlyByType truncates to hour boundaries") {
    val events = Seq(
      (1L, ts("2024-01-01 10:05:00"), 1L, "x", 1.5),
      (2L, ts("2024-01-01 10:55:00"), 2L, "x", 2.5),
      (3L, ts("2024-01-01 11:00:00"), 3L, "x", 4.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Events.hourlyByType(events)
      .orderBy("hour_start")
      .select(col("hour_start").cast("string"), col("n_events"), col("total_value"))
      .as[(String, Long, Double)].collect()
    assert(out === Array(
      ("2024-01-01 10:00:00", 2L, 4.0),
      ("2024-01-01 11:00:00", 1L, 4.0)))
  }

  test("resampleGrid fills gaps, carries forward, boundary event owns its grid point") {
    val ev = Seq(
      (1L, 7L, ts("2024-01-01 10:00:00"), 1.0), // exact boundary -> 10:00 point
      (2L, 7L, ts("2024-01-01 10:30:00"), 2.0),
      (3L, 7L, ts("2024-01-01 10:45:00"), 3.0), // latest in 11:00 bucket
      (4L, 7L, ts("2024-01-01 13:10:00"), 4.0), // after a 2-bucket gap
      (10L, 8L, ts("2024-01-01 09:15:00"), 5.0),
      (11L, 8L, ts("2024-01-01 09:15:00"), 6.0)) // same ts: higher id wins
      .toDF("event_id", "user_id", "ts", "value")
    val out = Events.resampleGrid(ev, "user_id", "ts", "value", 3600L)
      .orderBy("user_id", "grid_epoch_s")
      .as[(Long, Long, Long, Double)].collect()
    def ep(s: String) = ts(s).getTime / 1000
    assert(out === Array(
      (7L, ep("2024-01-01 10:00:00"), 1L, 1.0),
      (7L, ep("2024-01-01 11:00:00"), 2L, 3.0),
      (7L, ep("2024-01-01 12:00:00"), 0L, 3.0),
      (7L, ep("2024-01-01 13:00:00"), 0L, 3.0),
      (7L, ep("2024-01-01 14:00:00"), 1L, 4.0),
      (8L, ep("2024-01-01 10:00:00"), 2L, 6.0)))
  }

  test("resampleGrid daily-step boundary events stay in their own grid point") {
    // regression: decimal(38,10) HALF_UP division rounded (q*S + S-1)/S
    // up to q+1 once 1/S < 5e-11 — a midnight event on a daily grid
    // landed one day late
    val ev = Seq(
      (1L, 9L, ts("2024-01-01 00:00:00"), 1.0),
      (2L, 9L, ts("2024-01-03 00:00:00"), 2.0))
      .toDF("event_id", "user_id", "ts", "value")
    val out = Events.resampleGrid(ev, "user_id", "ts", "value", 86400L)
      .orderBy("grid_epoch_s")
      .as[(Long, Long, Long, Double)].collect()
    def ep(s: String) = ts(s).getTime / 1000
    assert(out === Array(
      (9L, ep("2024-01-01 00:00:00"), 1L, 1.0),
      (9L, ep("2024-01-02 00:00:00"), 0L, 1.0),
      (9L, ep("2024-01-03 00:00:00"), 1L, 2.0)))
  }

  test("runningDistinct counts first-seen users per day with a running total") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-02 10:00:00")),
      (2L, ts("2024-01-01 23:59:59")),
      (3L, ts("2024-01-03 00:00:00")))
      .toDF("user_id", "ts")
    val out = Events.runningDistinct(ev, "user_id", "ts")
      .orderBy("day")
      .select(col("day").cast("string"), col("new_users"), col("cum_users"))
      .as[(String, Long, Long)].collect()
    assert(out === Array(
      ("2024-01-01", 2L, 2L),
      ("2024-01-03", 1L, 3L)))
  }

  // ---- sequenceMatch (MATCH_RECOGNIZE-style pattern) ----

  private def seqEv(rows: Seq[(Long, Long, String, String)]) =
    rows.map { case (id, u, tp, t0) => (id, u, tp, ts(t0)) }
      .toDF("event_id", "user_id", "event_type", "ts")

  private def matches(ev: org.apache.spark.sql.DataFrame,
      windowSeconds: Long = 1800L) =
    Events.sequenceMatch(ev, "user_id", "ts", "event_id", "event_type",
        "view", "purchase", "error", windowSeconds)
      .select(col("user_id"), col("start_event_id"), col("end_event_id"),
        col("gap_us"))
      .as[(Long, Long, Long, Long)].collect().toSet

  test("sequenceMatch: basic conversion, blocker kills its own match only") {
    val ev = seqEv(Seq(
      // user 1: view -> error -> purchase: blocked
      (1L, 1L, "view", "2024-01-01 10:00:00"),
      (2L, 1L, "error", "2024-01-01 10:10:00"),
      (3L, 1L, "purchase", "2024-01-01 10:20:00"),
      // user 2: clean view -> purchase within window
      (4L, 2L, "view", "2024-01-01 10:00:00"),
      (5L, 2L, "purchase", "2024-01-01 10:20:00"),
      // user 3: purchase outside the 30-min window
      (6L, 3L, "view", "2024-01-01 10:00:00"),
      (7L, 3L, "purchase", "2024-01-01 10:40:00")))
    assert(matches(ev) === Set((2L, 4L, 5L, 1200L * 1000000L)))
  }

  test("sequenceMatch boundaries: strictly-after start, window edge inclusive, blocker at end ts allowed") {
    val ev = seqEv(Seq(
      // purchase at EXACTLY the view ts: not strictly after -> no match
      (1L, 1L, "view", "2024-01-01 10:00:00"),
      (2L, 1L, "purchase", "2024-01-01 10:00:00"),
      // purchase at exactly start + window: inclusive edge -> match
      (3L, 2L, "view", "2024-01-01 10:00:00"),
      (4L, 2L, "purchase", "2024-01-01 10:30:00"),
      // error at EXACTLY the purchase ts: not strictly between -> match
      (5L, 3L, "view", "2024-01-01 10:00:00"),
      (6L, 3L, "error", "2024-01-01 10:15:00"),
      (7L, 3L, "purchase", "2024-01-01 10:15:00")))
    // user 3's first purchase after the view is at 10:15 with the
    // error at the same instant — allowed (strictly-between guard)
    assert(matches(ev) === Set(
      (2L, 3L, 4L, 1800L * 1000000L),
      (3L, 5L, 7L, 900L * 1000000L)))
  }

  test("sequenceMatch: every start matches independently; same-ts purchases pick min id") {
    val ev = seqEv(Seq(
      // two views, one purchase: BOTH convert (funnel would chain mins)
      (1L, 1L, "view", "2024-01-01 10:00:00"),
      (2L, 1L, "view", "2024-01-01 10:05:00"),
      (5L, 1L, "purchase", "2024-01-01 10:10:00"),
      (4L, 1L, "purchase", "2024-01-01 10:10:00"), // same ts, smaller id wins
      // a later second purchase is NOT re-matched (first-after only)
      (6L, 1L, "purchase", "2024-01-01 10:20:00")))
    assert(matches(ev) === Set(
      (1L, 1L, 4L, 600L * 1000000L),
      (1L, 2L, 4L, 300L * 1000000L)))
  }
}
