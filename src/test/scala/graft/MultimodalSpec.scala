package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("payload stats are computed without decoding") {
    val media = Multimodal.syntheticMedia(spark, 10).toDF()
    val out = Multimodal.withPayloadStats(media, "payload")
    val r = out.select("media_id", "n_bytes").as[(Long, Long)].collect().toMap
    assert(r(0L) === 64L && r(63L % 10) === (64L + 3 % 64))
    assert(out.columns.contains("checksum"))
  }

  test("extractFeatures is deterministic and shape-stable") {
    implicit val s = spark
    val media = Multimodal.syntheticMedia(spark, 20)
    val f1 = Multimodal.extractFeatures(media, dim = 8).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(media, dim = 8).collect().sortBy(_.media_id)
    assert(f1.length === 20)
    assert(f1.forall(_.features.length === 8))
    assert(f1.map(_.checksum).toSeq === f2.map(_.checksum).toSeq)
    assert(f1.map(_.features.toSeq) === f2.map(_.features.toSeq))
  }

  test("sampleFrames explodes each media row into n frame rows") {
    val media = Multimodal.syntheticMedia(spark, 5).toDF()
    val frames = Multimodal.sampleFrames(media, "payload", nFrames = 4)
    assert(frames.count() === 20)
    assert(frames.groupBy("media_id").count()
      .select("count").as[Long].collect().forall(_ === 4L))
  }

  test("resize updates metadata and payload together, deterministically") {
    implicit val s = spark
    val media = Multimodal.syntheticMedia(spark, 10)
    val small = Multimodal.resize(media, 64, 48).collect().sortBy(_.media_id)
    val again = Multimodal.resize(media, 64, 48).collect().sortBy(_.media_id)
    val orig = media.collect().sortBy(_.media_id)
    assert(small.forall(r => r.meta.width === 64 && r.meta.height === 48))
    // downscale shrinks the payload and changes its bytes
    small.zip(orig).foreach { case (r, o) =>
      assert(r.payload.length < o.payload.length)
      assert(!(r.payload.toSeq == o.payload.toSeq.take(r.payload.length)))
    }
    assert(small.map(_.payload.toSeq) === again.map(_.payload.toSeq))
  }

  test("contentManifest groups identical payloads under one digest") {
    import spark.implicits._
    val df = Seq(
      (1L, "aaa"), (2L, "bbb"), (3L, "aaa"), (4L, "aaa"))
      .toDF("media_id", "s")
      .withColumn("payload", org.apache.spark.sql.functions.encode(
        org.apache.spark.sql.functions.col("s"), "UTF-8"))
    val m = Multimodal.contentManifest(df, "media_id", "payload")
      .orderBy("rep_id")
      .as[(String, Long, Long, Long)].collect()
    assert(m.length === 2)
    assert(m(0) === ((m(0)._1, 3L, 1L, 3L))) // aaa: 3 refs, rep=min id
    assert(m(1) === ((m(1)._1, 1L, 2L, 3L)))
    assert(m.forall(_._1.length === 64)) // sha-256 hex
    assert(m(0)._1 !== m(1)._1)
  }
}
