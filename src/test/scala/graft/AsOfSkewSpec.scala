package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{Events, Skew}

class AsOfSkewSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asOfJoin picks the latest right row at-or-before each left ts") {
    val left = Seq(
      (100L, 1L, ts("2024-01-01 10:00:00")),
      (101L, 1L, ts("2024-01-01 12:00:00")),
      (102L, 2L, ts("2024-01-01 09:00:00"))) // user 2 has no prior right row
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (1L, ts("2024-01-01 09:30:00"), 900L),
      (1L, ts("2024-01-01 11:00:00"), 901L),
      (2L, ts("2024-01-01 23:00:00"), 902L))
      .toDF("user_id", "ts", "r_id")
    val out = Events.asOfJoin(left, right, "user_id", "ts", Seq("r_id"))
      .orderBy("event_id")
      .select("event_id", "r_id").as[(Long, Option[Long])].collect()
    assert(out === Array((100L, Some(900L)), (101L, Some(901L)), (102L, None)))
  }

  test("asOfJoin does not backfill null payload fields from older rows") {
    val left = Seq((1L, 9L, ts("2024-01-01 12:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (9L, ts("2024-01-01 10:00:00"), Some(111L), Some("old")),
      (9L, ts("2024-01-01 11:00:00"), Some(222L), None)) // latest: note null note
      .toDF("user_id", "ts", "r_id", "note")
    val r = Events.asOfJoin(left, right, "user_id", "ts", Seq("r_id", "note"))
      .select("r_id", "note").as[(Option[Long], Option[String])].collect().head
    assert(r === ((Some(222L), None))) // NOT (222, "old")
  }

  test("asOfJoin matches a right row exactly coincident with left ts") {
    val left = Seq((1L, 7L, ts("2024-01-01 10:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq((7L, ts("2024-01-01 10:00:00"), 55L)).toDF("user_id", "ts", "r_id")
    val out = Events.asOfJoin(left, right, "user_id", "ts", Seq("r_id"))
      .select("r_id").as[Option[Long]].collect()
    assert(out === Array(Some(55L)))
  }

  test("funnelCounts respects order and conversion window") {
    val ev = Seq(
      // user 1: full ordered funnel within window
      (1L, ts("2024-01-01 10:00:00"), 1L, "signup", 0.0),
      (2L, ts("2024-01-01 10:10:00"), 1L, "click", 0.0),
      (3L, ts("2024-01-01 10:20:00"), 1L, "purchase", 5.0),
      // user 2: click BEFORE signup only → stalls at stage 1
      (4L, ts("2024-01-01 09:00:00"), 2L, "click", 0.0),
      (5L, ts("2024-01-01 10:00:00"), 2L, "signup", 0.0),
      // user 3: click too late (outside 1h window)
      (6L, ts("2024-01-01 10:00:00"), 3L, "signup", 0.0),
      (7L, ts("2024-01-01 12:00:01"), 3L, "click", 0.0),
      // user 4: never signed up
      (8L, ts("2024-01-01 10:00:00"), 4L, "click", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Events.funnelCounts(ev, Seq("signup", "click", "purchase"), 3600)
      .as[(Long, Long, Long)].collect().head
    assert(out === ((3L, 1L, 1L)))
  }

  test("saltedJoin returns exactly the plain-join result") {
    val fact = (1L to 1000L).map(i => (i, i % 3 + 1)).toDF("row_id", "k")
    val dim = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "unused")).toDF("k", "v")
    val plain = fact.join(dim, "k").select("row_id", "v")
      .as[(Long, String)].collect().toSet
    val salted = Skew.saltedJoin(fact, dim, "k", salts = 8, factUniqueCol = "row_id")
      .select("row_id", "v").as[(Long, String)].collect().toSet
    assert(salted === plain)
  }

  test("saltedCount matches groupBy count") {
    val df = (1L to 5000L).map(i => (i, if (i <= 4900) "hot" else s"k$i")).toDF("id", "k")
    val expected = df.groupBy("k").count()
      .as[(String, Long)].collect().toMap
    val got = Skew.saltedCount(df, "k", salts = 16, uniqueCol = "id")
      .as[(String, Long)].collect().toMap
    assert(got === expected)
  }
}
