package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Events
import graft.plans.AsOf
import graft.sources.Tables

/** The whole-operator as-of join (custom LogicalPlan/Strategy/Exec)
  * must agree exactly with the composed union+window formulation. */
class AsOfExecSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def sorted(df: DataFrame) =
    df.orderBy(df.columns.map(col): _*).collect().toSeq

  test("AsOf.join plans through AsOfJoinExec") {
    val left = Seq((1L, 1L, ts("2024-01-01 10:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq((1L, ts("2024-01-01 09:00:00"), 9L)).toDF("user_id", "ts", "r_id")
    val df = AsOf.join(left, right, "user_id", "ts", Seq("r_id"))
    // nodeName strips the Exec suffix: the operator renders as "AsOfJoin"
    assert(df.queryExecution.executedPlan.toString.contains("AsOfJoin"))
    assert(df.select("r_id").as[Option[Long]].collect() === Array(Some(9L)))
  }

  test("exec result == composed result on the events table") {
    val ev = Tables.events(spark, sfDir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val signups = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("signup_event_id"))
    val composed = Events.asOfJoin(
      purchases, signups.withColumn("signup_ts", col("ts")),
      "user_id", "ts", Seq("signup_event_id", "signup_ts"))
    val exec = AsOf.join(
      purchases, signups.withColumn("signup_ts", col("ts")),
      "user_id", "ts", Seq("signup_event_id", "signup_ts"))
    assert(exec.count() === purchases.count()) // left-outer: every left row kept
    assert(sorted(exec) === sorted(composed))
  }

  test("no prior right row → null payload; later right rows ignored") {
    val left = Seq(
      (100L, 1L, ts("2024-01-01 10:00:00")),
      (101L, 2L, ts("2024-01-01 09:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (1L, ts("2024-01-01 09:30:00"), 900L),
      (2L, ts("2024-01-01 23:00:00"), 902L)).toDF("user_id", "ts", "r_id")
    val out = AsOf.join(left, right, "user_id", "ts", Seq("r_id"))
      .orderBy("event_id").select("event_id", "r_id")
      .as[(Long, Option[Long])].collect()
    assert(out === Array((100L, Some(900L)), (101L, None)))
  }

  test("coincident right ts matches; progression within a key") {
    val left = Seq(
      (1L, 7L, ts("2024-01-01 10:00:00")),
      (2L, 7L, ts("2024-01-01 11:00:00")),
      (3L, 7L, ts("2024-01-01 12:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (7L, ts("2024-01-01 10:00:00"), 55L),
      (7L, ts("2024-01-01 11:30:00"), 56L)).toDF("user_id", "ts", "r_id")
    val out = AsOf.join(left, right, "user_id", "ts", Seq("r_id"))
      .orderBy("event_id").select("r_id").as[Option[Long]].collect()
    assert(out === Array(Some(55L), Some(55L), Some(56L)))
  }

  test("null keys and null timestamps never match") {
    val left = Seq(
      (1L, Some(7L), Some(ts("2024-01-01 10:00:00"))),
      (2L, None, Some(ts("2024-01-01 10:00:00"))), // null key
      (3L, Some(7L), None)) // null ts
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (Some(7L), Some(ts("2024-01-01 09:00:00")), 1L),
      (None, Some(ts("2024-01-01 09:00:00")), 2L), // null right key: skipped
      (Some(7L), None, 3L)) // null right ts: skipped
      .toDF("user_id", "ts", "r_id")
    val out = AsOf.join(left, right, "user_id", "ts", Seq("r_id"))
      .orderBy("event_id").select("r_id").as[Option[Long]].collect()
    assert(out === Array(Some(1L), None, None))
  }

  test("self-join lineage (shared attribute ids) is re-aliased safely") {
    val ev = Seq(
      (1L, 7L, ts("2024-01-01 10:00:00"), "purchase"),
      (2L, 7L, ts("2024-01-01 09:00:00"), "signup"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val out = AsOf.join(
      ev.filter($"event_type" === "purchase").select("event_id", "user_id", "ts"),
      ev.filter($"event_type" === "signup")
        .select($"user_id", $"ts", $"event_id".as("signup_id")),
      "user_id", "ts", Seq("signup_id"))
      .select("signup_id").as[Option[Long]].collect()
    assert(out === Array(Some(2L)))
  }

  test("mismatched key/ts types are rejected, not silently miscompared") {
    val left = Seq((1L, 1L, ts("2024-01-01 10:00:00"))).toDF("event_id", "user_id", "ts")
    val rIntKey = Seq((1, ts("2024-01-01 09:00:00"), 9L)).toDF("user_id", "ts", "r_id")
    intercept[IllegalArgumentException] {
      AsOf.join(left, rIntKey, "user_id", "ts", Seq("r_id"))
    }
    val rDateTs = Seq((1L, java.sql.Date.valueOf("2024-01-01"), 9L))
      .toDF("user_id", "ts", "r_id")
    intercept[IllegalArgumentException] {
      AsOf.join(left, rDateTs, "user_id", "ts", Seq("r_id"))
    }
  }

  test("payload column colliding with a left column is rejected") {
    val left = Seq((1L, 1L, ts("2024-01-01 10:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq((1L, ts("2024-01-01 09:00:00"))).toDF("user_id", "ts")
    intercept[IllegalArgumentException] {
      AsOf.join(left, right, "user_id", "ts", Seq("ts"))
    }
  }

  test("hot-key partitions stay correct (one key holds most rows)") {
    // skew correctness: 2000 left rows on one key + sparse other keys;
    // the merge must carry the right candidate forward through the
    // long run without drift
    val left = ((1 to 2000).map(i => (i.toLong, 7L, ts("2024-01-01 00:00:00").getTime + i * 1000L)) ++
      Seq((9001L, 8L, ts("2024-01-01 00:30:00").getTime)))
      .map { case (id, k, ms) => (id, k, new java.sql.Timestamp(ms)) }
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (7L, ts("2024-01-01 00:10:00"), 1L), // covers left rows past 10:00
      (7L, ts("2024-01-01 00:20:00"), 2L),
      (8L, ts("2024-01-01 00:00:00"), 3L))
      .toDF("user_id", "ts", "r_id")
    val exec = AsOf.join(left, right, "user_id", "ts", Seq("r_id"))
    val composed = Events.asOfJoin(left, right, "user_id", "ts", Seq("r_id"))
    assert(exec.count() === 2001)
    assert(sorted(exec.select("event_id", "r_id")) ===
      sorted(composed.select("event_id", "r_id")))
    // spot-check the regime boundaries
    val m = exec.select("event_id", "r_id").as[(Long, Option[Long])].collect().toMap
    assert(m(100L) === None)          // before first right row
    assert(m(601L) === Some(1L))      // 00:10:01
    assert(m(1201L) === Some(2L))     // 00:20:01
    assert(m(9001L) === Some(3L))
  }

  test("exactly one exchange+sort per side (no extra shuffle)") {
    val left = Seq((1L, 1L, ts("2024-01-01 10:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq((1L, ts("2024-01-01 09:00:00"), 9L)).toDF("user_id", "ts", "r_id")
    val plan = AsOf.join(left, right, "user_id", "ts", Seq("r_id"))
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 2)
    assert("(?i)\\bSort\\b".r.findAllIn(plan).nonEmpty)
  }
}
