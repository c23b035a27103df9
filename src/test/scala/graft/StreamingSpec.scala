package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.Events
import graft.sources.Tables
import graft.streaming.EventStreams

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("streaming windowedByType matches the batch hourly aggregate") {
    val batch = Tables.events(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value")

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStreams.Event]
    mem.addData(batch.as[EventStreams.Event].collect().toIndexedSeq)

    val q = EventStreams.windowedByType(mem.toDF(), "1 hour", "10 minutes")
      .writeStream.outputMode("complete")
      .format("memory").queryName("win_out").start()
    try { q.processAllAvailable() } finally { q.stop() }

    val streamed = spark.table("win_out")
      .select(col("window_start"), col("event_type"), col("n_events"), col("total_value"))
      .orderBy("window_start", "event_type")
      .as[(java.sql.Timestamp, String, Long, Double)].collect()
    val batched = Events.hourlyByType(batch)
      .select(col("hour_start"), col("event_type"), col("n_events"), col("total_value"))
      .orderBy("hour_start", "event_type")
      .as[(java.sql.Timestamp, String, Long, Double)].collect()
    assert(streamed === batched)
  }

  test("file-source streaming (readStream over parquet dir) matches batch") {
    // production shape: a watched directory of parquet drops
    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toFile
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      java.nio.file.Paths.get(dir.getAbsolutePath, "part-0.parquet"))
    val batch = Tables.events(spark, sfDir)
    val raw = Tables.normalizeEventsTs(spark.readStream
      .schema(spark.read.parquet(s"$sfDir/events.parquet").schema)
      .parquet(dir.getAbsolutePath))
    val q = EventStreams.windowedByType(raw, "1 hour", "10 minutes")
      .writeStream.outputMode("complete")
      .format("memory").queryName("file_win_out").start()
    try { q.processAllAvailable() } finally { q.stop() }
    val streamed = spark.table("file_win_out")
      .orderBy("window_start", "event_type")
      .select("window_start", "event_type", "n_events", "total_value")
      .as[(java.sql.Timestamp, String, Long, Double)].collect()
    val batched = graft.operators.Events.hourlyByType(batch)
      .orderBy("hour_start", "event_type")
      .select("hour_start", "event_type", "n_events", "total_value")
      .as[(java.sql.Timestamp, String, Long, Double)].collect()
    assert(streamed === batched)
  }

  test("streaming parquet file sink lands exactly the batch rows") {
    val outDir = java.nio.file.Files.createTempDirectory("graft_sink").toFile
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toFile
    val batch = Tables.events(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value")

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStreams.Event]
    mem.addData(batch.as[EventStreams.Event].collect().toIndexedSeq)

    // the built-in file sink is exactly-once via its commit log — the
    // production landing path for a streamed corpus
    val q = mem.toDF().writeStream.format("parquet")
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .option("path", outDir.getAbsolutePath)
      .outputMode("append").start()
    try { q.processAllAvailable() } finally { q.stop() }

    val written = spark.read.parquet(outDir.getAbsolutePath)
    assert(written.count() === batch.count())
    assert(written.select("event_id").as[Long].collect().sorted ===
      batch.select("event_id").as[Long].collect().sorted)
  }

  test("dedupStream drops redelivered events, keeps state within watermark") {
    val batch = Tables.events(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value")
    val rows = batch.as[EventStreams.Event].collect().toIndexedSeq

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStreams.Event]
    // at-least-once redelivery: every event arrives twice in-batch
    mem.addData(rows ++ rows)

    val q = EventStreams.dedupStream(mem.toDF(), "10 minutes", Seq("event_id"))
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try { q.processAllAvailable() } finally { q.stop() }

    val streamed = spark.table("dedup_out").select("event_id").as[Long].collect().sorted
    val batched = batch.select("event_id").distinct().as[Long].collect().sorted
    assert(streamed === batched)
  }

  test("streaming latestPerKey converges to the batch upsert across batches") {
    val batch = Tables.events(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value")
    val rows = batch.as[EventStreams.Event].collect().toIndexedSeq
    val (first, second) = rows.splitAt(rows.length / 2)

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStreams.Event]
    val latest = graft.streaming.StreamUpsert.latestPerKey(mem.toDS())(_.user_id)(
      (a, b) => Ordering[(Long, Long)].gt(
        (a.ts.getTime, a.event_id), (b.ts.getTime, b.event_id)))
    val q = latest.writeStream.outputMode("update")
      .format("memory").queryName("upsert_out").start()
    try {
      mem.addData(first); q.processAllAvailable()   // two separate micro-batches:
      mem.addData(second); q.processAllAvailable()  // state must carry across
      // at-least-once redelivery of batch 1: every row is stale, so a
      // change-log upsert must emit nothing new
      val before = spark.table("upsert_out").count()
      mem.addData(first); q.processAllAvailable()
      assert(spark.table("upsert_out").count() === before,
        "stale redeliveries must not re-emit winners")
    } finally { q.stop() }

    // the sink accumulates one emission per (key, batch); the final
    // winner per key is the row with the greatest version
    val streamed = spark.table("upsert_out")
      .as[EventStreams.Event].collect()
      .groupBy(_.user_id)
      .map { case (_, es) => es.maxBy(e => (e.ts.getTime, e.event_id)) }
      .map(e => (e.user_id, e.event_id)).toSet
    val batched = graft.operators.Pipeline.upsertLatest(
        batch.limit(0), batch, Seq("user_id"), Seq(col("ts"), col("event_id")))
      .select("user_id", "event_id").as[(Long, Long)].collect().toSet
    assert(streamed === batched)
  }

  test("stateful sessionizeStream finds the same sessions as batch") {
    val batch = Tables.events(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value")

    implicit val sqlCtx = spark.sqlContext
    implicit val sess = spark
    val mem = MemoryStream[EventStreams.Event]
    mem.addData(batch.as[EventStreams.Event].collect().toIndexedSeq)

    val q = EventStreams.sessionizeStream(mem.toDS(), 1800.0)
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()
    try { q.processAllAvailable() } finally { q.stop() }

    // The stream emits only CLOSED sessions (the per-user open tail
    // stays in state); every emitted session must match its batch twin.
    val streamed = spark.table("sess_out")
      .select("user_id", "session_seq", "n_events", "total_value")
      .as[(Long, Int, Long, Double)].collect().toSet
    val batched = Events.sessionize(batch, 1800.0)
      .select("user_id", "session_seq", "n_events", "total_value")
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(streamed.nonEmpty, "no sessions closed in stream")
    assert(streamed.subsetOf(batched),
      s"streamed sessions disagree with batch: ${streamed.diff(batched).take(3)}")
  }

  test("stream-static join enriches the stream from a broadcast dim") {
    // production shape: a live stream joined to a slowly-changing
    // static snapshot (no watermark needed — the static side is fixed
    // per micro-batch and broadcast, never shuffled as state)
    val batch = Tables.events(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value")
    val dim = batch.select("user_id").distinct()
      .withColumn("segment",
        when(col("user_id") % 2 === 0, "even").otherwise("odd"))

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStreams.Event]
    mem.addData(batch.as[EventStreams.Event].collect().toIndexedSeq)
    val q = mem.toDF().join(broadcast(dim), "user_id")
      .groupBy("segment").agg(count("*").as("n"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("ssd_out").start()
    try { q.processAllAvailable() } finally { q.stop() }

    val streamed = spark.table("ssd_out")
      .as[(String, Long)].collect().toMap
    val batched = batch.join(dim, "user_id").groupBy("segment")
      .agg(count("*").as("n")).as[(String, Long)].collect().toMap
    assert(streamed === batched)
    assert(streamed.values.sum === batch.count())
  }

  test("stream-stream interval join matches the batch interval join") {
    val batch = Tables.events(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value")
    val purchases = batch.filter(col("event_type") === "purchase")
    val clicks = batch.filter(col("event_type") === "click")

    implicit val sqlCtx = spark.sqlContext
    val lMem = MemoryStream[EventStreams.Event]
    val rMem = MemoryStream[EventStreams.Event]
    lMem.addData(purchases.as[EventStreams.Event].collect().toIndexedSeq)
    rMem.addData(clicks.as[EventStreams.Event].collect().toIndexedSeq)

    val q = EventStreams.intervalJoinStream(
        lMem.toDF(), rMem.toDF(), "user_id", "10 minutes", windowSeconds = 3600)
      .writeStream.outputMode("append")
      .format("memory").queryName("ssj_out").start()
    try { q.processAllAvailable() } finally { q.stop() }

    val streamed = spark.table("ssj_out")
      .select("left_id", "right_id").as[(Long, Long)].collect().toSet
    val batched = purchases.alias("p").join(clicks.alias("c"),
        col("p.user_id") === col("c.user_id") &&
          col("c.ts") >= col("p.ts") - expr("INTERVAL 3600 SECONDS") &&
          col("c.ts") <= col("p.ts"))
      .select(col("p.event_id"), col("c.event_id"))
      .as[(Long, Long)].collect().toSet
    assert(batched.nonEmpty, "batch twin found no interval pairs")
    assert(streamed === batched)
  }

  test("streaming cdcApply folds I/U/D ops; tombstones delete; stale replays ignored") {
    // ops over events: key = user_id, version = event_id, delete when
    // event_type == 'error'
    val rows = Tables.events(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[EventStreams.Event].collect().toIndexedSeq.sortBy(_.event_id)
    val (first, second) = rows.splitAt(rows.length / 2)
    def model(ops: Seq[EventStreams.Event]): Map[Long, Option[Long]] =
      ops.groupBy(_.user_id).map { case (k, es) =>
        val last = es.maxBy(_.event_id)
        k -> (if (last.event_type == "error") None else Some(last.event_id))
      }

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStreams.Event]
    val changes = graft.streaming.StreamUpsert.cdcApply(mem.toDS())(_.user_id)(
      _.event_id, _.event_type == "error")
    val q = changes.writeStream.outputMode("update")
      .format("memory").queryName("cdc_out").start()
    try {
      def snap(): Seq[(Long, Option[Long])] =
        spark.table("cdc_out").as[(Long, Option[EventStreams.Event])]
          .collect().toSeq.map { case (k, e) => (k, e.map(_.event_id)) }
      mem.addData(first); q.processAllAvailable()
      // a key whose batch nets out to deleted-without-ever-being-live
      // must NOT emit a tombstone (downstream never saw it)
      assert(snap().toMap === model(first).filter(_._2.nonEmpty),
        "batch-1 change log != model")
      val afterOne = snap()
      mem.addData(second); q.processAllAvailable()
      // batch-2 emissions (order-free multiset diff) must be exactly
      // the keys whose live row changed, each at its final model value
      // — tombstones included as (k, None)
      val batch2New = afterOne.foldLeft(snap()) { (acc, r) =>
        acc.patch(acc.indexOf(r), Nil, 1)
      }
      val finalModel = model(rows)
      val state1 = model(first) // state after batch 1 (None == never live)
      val expectedNew = finalModel.filter { case (k, v) =>
        state1.getOrElse(k, None) != v
      }
      assert(batch2New.toMap === expectedNew, "batch-2 change log != model delta")
      assert(batch2New.toSet.size === batch2New.size, "duplicate emissions for a key in one batch")
      assert(finalModel.values.exists(_.isEmpty), "test data produced no tombstones")
      // stale replay: batch 1 versions are all <= applied — no emissions
      val before = spark.table("cdc_out").count()
      mem.addData(first); q.processAllAvailable()
      assert(spark.table("cdc_out").count() === before,
        "stale replayed ops must not emit or resurrect deleted keys")
    } finally { q.stop() }
  }

  test("cdcApply same-version ties: delete wins; tiebreak orders live rows") {
    import graft.streaming.EventStreams.Event
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    implicit val sqlCtx = spark.sqlContext

    // delete beats a live row at the same version, whatever order the
    // batch iterator delivers them in; a replayed same-version upsert
    // cannot resurrect the delete
    val mem = MemoryStream[Event]
    val q = graft.streaming.StreamUpsert.cdcApply(mem.toDS())(_.user_id)(
        _.event_id, _.event_type == "error")
      .writeStream.outputMode("update").format("memory")
      .queryName("cdc_ties").start()
    try {
      def snap(): Seq[(Long, Option[Long])] =
        spark.table("cdc_ties").as[(Long, Option[Event])]
          .collect().toSeq.map { case (k, e) => (k, e.map(_.event_id)) }
      mem.addData(Event(4L, ts, 1L, "click", 1.0)); q.processAllAvailable()
      assert(snap() === Seq((1L, Some(4L))))
      mem.addData(Event(5L, ts, 1L, "click", 2.0), Event(5L, ts, 1L, "error", 0.0))
      q.processAllAvailable()
      assert(snap() === Seq((1L, Some(4L)), (1L, None)),
        "same-version U+D must net to a tombstone")
      mem.addData(Event(5L, ts, 1L, "click", 2.0)); q.processAllAvailable()
      assert(spark.table("cdc_ties").count() === 2,
        "a same-version upsert must not resurrect the delete")
    } finally { q.stop() }

    // two distinct live rows at one version: the caller's tiebreak
    // decides (here max value), independent of arrival order
    val mem2 = MemoryStream[Event]
    val q2 = graft.streaming.StreamUpsert.cdcApply(mem2.toDS())(_.user_id)(
        _.event_id, _.event_type == "error",
        tiebreak = Some((r, c) => r.value > c.value))
      .writeStream.outputMode("update").format("memory")
      .queryName("cdc_ties2").start()
    try {
      mem2.addData(Event(7L, ts, 2L, "click", 1.0), Event(7L, ts, 2L, "click", 9.0))
      q2.processAllAvailable()
      val out = spark.table("cdc_ties2").as[(Long, Option[Event])].collect()
      assert(out.length === 1 && out.head._2.map(_.value) === Some(9.0),
        "tiebreak must pick the max-value row for a version tie")
    } finally { q2.stop() }
  }
}
