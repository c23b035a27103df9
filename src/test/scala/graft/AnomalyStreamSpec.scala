package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.{Anomaly, EventStreams}

class AnomalyStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, s: Int, v: Double) =
    EventStreams.Event(id, Timestamp.valueOf(f"2024-01-01 00:00:${s}%02d"), 1L, "a", v)

  private val steady = (0 until 20).map(i => ev(i, i, 5.0 + 0.1 * (i % 3)))
  private val outlier = ev(100, 25, 500.0)
  private val after = (21 until 25).map(i => ev(i, 30 + i, 5.1))

  private def runStream(batches: Seq[Seq[EventStreams.Event]], name: String): Set[Long] = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStreams.Event]
    val flagged = Anomaly.zscoreStream(mem.toDS())(_.user_id)(
      _.value, _.ts.getTime, threshold = 3.0, minN = 5)
    val q = flagged.map(_._1.event_id).writeStream
      .outputMode("append").format("memory").queryName(name).start()
    try {
      batches.foreach { b => mem.addData(b); q.processAllAvailable() }
    } finally q.stop()
    spark.table(name).as[Long].collect().toSet
  }

  test("streaming zscore flags the planted outlier, not the steady state") {
    val got = runStream(Seq(steady ++ Seq(outlier) ++ after), "anom_one")
    assert(got === Set(100L))
  }

  test("prequential fold is batch-split invariant (ordered feed)") {
    val all = steady ++ Seq(outlier) ++ after
    val split = runStream(Seq(all.take(7), all.slice(7, 23), all.drop(23)), "anom_split")
    assert(split === Set(100L))
  }

  test("cold detector stays silent below minN even for extreme values") {
    val got = runStream(Seq(Seq(ev(1, 1, 5.0), ev(2, 2, 900.0), ev(3, 3, 5.0))), "anom_cold")
    assert(got === Set.empty[Long])
  }

  test("seasonal keying: per (type, hour-of-day) cells — the continuous q52") {
    // the generic zscoreStream keyed by (event_type, hour) IS the
    // streaming seasonal screen: each cell learns its own baseline,
    // so a peak-hour value arriving in the quiet hour flags while the
    // daily cycle itself never does
    implicit val sqlCtx = spark.sqlContext
    def at(id: Long, hh: Int, i: Int, v: Double) = EventStreams.Event(id,
      java.sql.Timestamp.valueOf(f"2024-01-0${1 + i % 5} $hh%02d:00:${i % 60}%02d"),
      1L, "a", v)
    val cycle = (0 until 40).map(i => at(i, 8, i, 100.0 + (i % 5))) ++
      (100 until 140).map(i => at(i, 20, i, 10.0 + (i % 5)))
    val planted = at(999, 20, 41, 100.0) // peak-hour value, quiet hour
    val ordered = (cycle :+ planted).sortBy(e => (e.ts.getTime, e.event_id))
    val mem = MemoryStream[EventStreams.Event]
    val flagged = Anomaly.zscoreStream(mem.toDS())(
        e => (e.event_type, e.ts.toLocalDateTime.getHour))(
      _.value, _.ts.getTime, threshold = 3.0, minN = 10)
    val q = flagged.map(_._1.event_id).writeStream
      .outputMode("append").format("memory").queryName("anom_seasonal").start()
    try {
      ordered.grouped(30).foreach { b => mem.addData(b); q.processAllAvailable() }
    } finally q.stop()
    assert(spark.table("anom_seasonal").as[Long].collect().toSet === Set(999L))
  }
}
