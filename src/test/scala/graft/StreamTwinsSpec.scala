package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Events
import graft.sources.Tables
import graft.streaming.{EventStreams, FunnelStream, ResampleStream}

/** Batch/streaming parity for the round-3 twins: stream_resample ≡
  * Events.resampleGrid on closed grid points, stream_funnel ≡
  * Events.funnelCounts — on the real sf0.001 events, fed in
  * event-time order across several micro-batches. */
class StreamTwinsSpec extends SparkSpec {
  import spark.implicits._

  implicit private val s: org.apache.spark.sql.SparkSession = spark
  implicit private def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private lazy val eventsDf = Tables.events(spark, sfDir)
  private lazy val ordered: Seq[EventStreams.Event] = eventsDf
    .select("event_id", "ts", "user_id", "event_type", "value")
    .as[EventStreams.Event].collect()
    .sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id)).toSeq

  private def splits(n: Int): Seq[Seq[EventStreams.Event]] = {
    val size = math.max(1, ordered.size / n)
    ordered.grouped(size).toSeq
  }

  private def runResample(batches: Seq[Seq[EventStreams.Event]], name: String) = {
    val mem = MemoryStream[EventStreams.Event]
    val q = ResampleStream.resampleStream(mem.toDS(), stepSeconds = 3600L)
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    try batches.foreach { b => mem.addData(b); q.processAllAvailable() }
    finally q.stop()
    spark.table(name).as[ResampleStream.GridPoint].collect()
      .map(g => (g.user_id, g.grid_epoch_s, g.n_obs, g.value)).toSet
  }

  private def runFunnel(batches: Seq[Seq[EventStreams.Event]], name: String) = {
    val mem = MemoryStream[EventStreams.Event]
    val q = FunnelStream.funnelStream(mem.toDS(),
        Seq("signup", "click", "purchase"), maxGapSeconds = 100000L)
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    try batches.foreach { b => mem.addData(b); q.processAllAvailable() }
    finally q.stop()
    spark.table(name).as[FunnelStream.Transition].collect()
  }

  test("stream_resample emits exactly the batch grid below each key's open bucket") {
    val batch = Events.resampleGrid(eventsDf, "user_id", "ts", "value", 3600L)
    val expected = batch
      .withColumn("__mx", max(col("grid_epoch_s"))
        .over(org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))))
      .filter(col("grid_epoch_s") < col("__mx"))
      .select("user_id", "grid_epoch_s", "n_obs", "value")
      .as[(Long, Long, Long, Double)].collect().toSet
    val got = runResample(splits(3), "res_par")
    assert(got.size === expected.size)
    assert(got === expected)
  }

  test("stream_resample is batch-split invariant") {
    assert(runResample(Seq(ordered), "res_one") === runResample(splits(5), "res_five"))
  }

  test("stream_funnel transition counts equal the batch funnel row") {
    val trans = runFunnel(splits(3), "fun_par")
    val streamCounts = (0 until 3).map(k => trans.count(_.stage_idx == k).toLong)
    val batchRow = Events.funnelCounts(eventsDf,
      Seq("signup", "click", "purchase"), maxGapSeconds = 100000L)
      .as[(Long, Long, Long)].head()
    assert(streamCounts === Seq(batchRow._1, batchRow._2, batchRow._3))
    assert(streamCounts(0) >= streamCounts(1) && streamCounts(1) >= streamCounts(2))
  }

  test("stream_funnel accepts equal-timestamp stage chains regardless of event_id order") {
    // batch min-chaining accepts click.ts == signup.ts; the stream's
    // per-timestamp fixpoint must too, even when the LATER stage
    // carries the SMALLER event_id (a plain (ts, id) fold drops it)
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:10")
    val evs = Seq(
      EventStreams.Event(5L, t0, 1L, "signup", 0.0),
      EventStreams.Event(3L, t0, 1L, "click", 0.0), // smaller id, later stage
      EventStreams.Event(9L, java.sql.Timestamp.valueOf("2024-01-01 00:00:20"),
        1L, "purchase", 0.0))
    val mem = MemoryStream[EventStreams.Event]
    val q = FunnelStream.funnelStream(mem.toDS(),
        Seq("signup", "click", "purchase"), maxGapSeconds = 100000L)
      .writeStream.outputMode("append").format("memory").queryName("fun_tie").start()
    try { mem.addData(evs); q.processAllAvailable() } finally q.stop()
    val trans = spark.table("fun_tie").as[FunnelStream.Transition].collect()
    assert(trans.map(_.stage_idx).sorted.toSeq === Seq(0, 1, 2),
      s"equal-ts chain must fully convert, got ${trans.mkString(",")}")
    // and the batch funnel agrees
    import org.apache.spark.sql.functions.col
    val batch = Events.funnelCounts(
      evs.toDS().toDF(), Seq("signup", "click", "purchase"), 100000L)
      .as[(Long, Long, Long)].head()
    assert(batch === ((1L, 1L, 1L)))
  }

  test("stream_funnel stage timestamps match the batch min-chaining, not just counts") {
    // per user: the ts of each stage reached must equal the batch
    // scanLeft's per-stage min(ts) — the greedy≡min equivalence
    val trans = runFunnel(Seq(ordered), "fun_ts")
    val streamStage0 = trans.filter(_.stage_idx == 0)
      .map(t => t.user_id -> t.ts).toMap
    val batchStage0 = eventsDf.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min(col("ts")).as("ts"))
      .as[(Long, java.sql.Timestamp)].collect().toMap
    assert(streamStage0 === batchStage0)
    // each user emits each stage at most once, in order
    trans.groupBy(_.user_id).foreach { case (_, ts) =>
      val idxs = ts.sortBy(t => t.ts.getTime).map(_.stage_idx)
      assert(idxs === idxs.sorted && idxs.distinct === idxs)
    }
  }
}
