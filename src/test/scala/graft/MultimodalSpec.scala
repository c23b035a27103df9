package graft

import java.awt.image.BufferedImage

import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.operators.Multimodal.{MediaMeta, MediaRow}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def solidPng(id: Long, w: Int, h: Int, rgb: Int): MediaRow = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    MediaRow(id, Multimodal.encodePng(img), MediaMeta("image/png", w, h, 0L, "png"))
  }

  test("payload stats are computed without decoding") {
    val rows = Multimodal.syntheticMedia(spark, 10).collect().sortBy(_.media_id)
    val out = Multimodal.withPayloadStats(
      Multimodal.syntheticMedia(spark, 10).toDF(), "payload")
    val r = out.select("media_id", "n_bytes").as[(Long, Long)].collect().toMap
    rows.foreach(row => assert(r(row.media_id) === row.payload.length.toLong))
    assert(out.columns.contains("checksum"))
  }

  test("synthetic image payloads are real decodable PNGs with matching metadata") {
    val imgs = Multimodal.syntheticMedia(spark, 10).collect()
      .filter(_.meta.mediaType == "image/png")
    assert(imgs.nonEmpty)
    imgs.foreach { r =>
      val img = Multimodal.decodeImage(r.payload)
      assert(img.getWidth === r.meta.width)
      assert(img.getHeight === r.meta.height)
    }
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

  test("extractFeatures reads REAL pixels: solid black/white images bound luminance") {
    implicit val s = spark
    val ds = Seq(solidPng(0L, 40, 30, 0x000000), solidPng(1L, 40, 30, 0xffffff)).toDS()
    val f = Multimodal.extractFeatures(ds, dim = 4).collect().sortBy(_.media_id)
    assert(f(0).features.forall(v => v === 0.0f))
    assert(f(1).features.forall(v => v === 1.0f))
  }

  test("extractFeatures reads REAL audio samples: silence/amplitude strips") {
    implicit val s = spark
    // first half silent, second half constant amplitude 0.8: with
    // dim=2 the strip RMS features must be ~[0, 0.8] — provably
    // derived from decoded PCM, not payload-byte hashing
    val samples = Array.tabulate(8000)(i => if (i < 4000) 0.0 else 0.8)
    val wav = Multimodal.MediaRow(1L,
      Multimodal.encodeWavPcm16(samples, 8000f),
      Multimodal.MediaMeta("audio/wav", 0, 0, 1000L, "pcm_s16le"))
    val f = Multimodal.extractFeatures(Seq(wav).toDS(), dim = 2).collect().head
    assert(f.ok)
    assert(math.abs(f.features(0)) < 1e-6, s"silent strip: ${f.features(0)}")
    // 0.8 survives 16-bit quantization to ~4 decimals
    assert(math.abs(f.features(1) - 0.8) < 1e-3, s"loud strip: ${f.features(1)}")
    // full WAV round trip: encode -> decode returns the samples
    val decoded = Multimodal.decodeWav(wav.payload)
    assert(decoded.length === 8000)
    assert(math.abs(decoded(6000) - 0.8) < 1e-4)
    assert(decoded(100) === 0.0)
  }

  test("audio resize passes dimensionless payloads through undamaged") {
    implicit val s = spark
    val media = Multimodal.syntheticMedia(spark, 4)
    val before = media.collect().filter(_.media_id % 2 == 1)
    val after = Multimodal.resize(media, 32, 32).collect()
      .filter(_.media_id % 2 == 1)
    assert(before.map(_.media_id).toSet === after.map(_.media_id).toSet)
    after.foreach { r =>
      val orig = before.find(_.media_id == r.media_id).get
      assert(r.payload.toSeq === orig.payload.toSeq, s"payload changed: ${r.media_id}")
      // still a decodable WAV after the pipeline
      assert(Multimodal.decodeWav(r.payload).nonEmpty)
    }
  }

  test("decode failure is data: corrupt image rows flag, don't kill the job") {
    implicit val s = spark
    val corrupt = Multimodal.MediaRow(7L, Array[Byte](1, 2, 3, 4),
      Multimodal.MediaMeta("image/png", 10, 10, 0L, "png"))
    val ds = Seq(solidPng(0L, 20, 20, 0x336699), corrupt).toDS()
    // extractFeatures: per-row ok/error accounting (the Fetch stance)
    val f = Multimodal.extractFeatures(ds, dim = 4).collect().sortBy(_.media_id)
    assert(f.length === 2)
    assert(f(0).ok && f(0).features.length === 4)
    assert(!f(1).ok && f(1).features.isEmpty && f(1).error.nonEmpty)
    // perceptualHashes: undecodable rows dropped, good rows hashed
    assert(Multimodal.perceptualHashes(ds).collect().map(_.getLong(0)).toSeq === Seq(0L))
    // resize: loud fail by default, skip policy drops the bad row
    val failed = intercept[org.apache.spark.SparkException] {
      Multimodal.resize(ds, 10, 10).collect()
    }
    assert(failed.getMessage.contains("media_id=7") ||
      Option(failed.getCause).exists(_.getMessage.contains("media_id=7")))
    val kept = Multimodal.resize(ds, 10, 10, skipUndecodable = true).collect()
    assert(kept.map(_.media_id).toSeq === Seq(0L))
    assert(kept.head.meta.width === 10)
  }

  private def solidFrame(w: Int, h: Int, gray: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val rgb = (gray << 16) | (gray << 8) | gray
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    img
  }

  test("sampleFrameFeatures decodes REAL per-frame pixels from an animated GIF") {
    implicit val s = spark
    // four solid-gray frames with distinct levels: after the GIF
    // round trip, each sampled frame's strip luminance must equal ITS
    // OWN frame's gray level — byte-slice stubs or single-frame
    // decodes cannot produce this
    val grays = Seq(16, 80, 160, 240)
    val gif = Multimodal.encodeGifAnimated(grays.map(g => solidFrame(32, 24, g)))
    val ds = Seq(MediaRow(1L, gif,
      MediaMeta("image/gif", 32, 24, 400L, "gif"))).toDS()
    val out = Multimodal.sampleFrameFeatures(ds, nFrames = 4, dim = 3)
      .collect().sortBy(_.frame)
    assert(out.length === 4)
    out.foreach { f =>
      assert(f.ok)
      assert(f.features.length === 3)
      val expected = grays(f.frame) / 255.0f
      f.features.foreach(v =>
        assert(math.abs(v - expected) <= 0.02f,
          s"frame ${f.frame}: luminance $v, expected ~$expected"))
    }
  }

  test("sampleFrameFeatures samples evenly when the container outruns nFrames") {
    implicit val s = spark
    val grays = (0 until 8).map(i => 15 + i * 30)
    val gif = Multimodal.encodeGifAnimated(grays.map(g => solidFrame(16, 16, g)))
    val ds = Seq(MediaRow(2L, gif,
      MediaMeta("image/gif", 16, 16, 800L, "gif"))).toDS()
    val out = Multimodal.sampleFrameFeatures(ds, nFrames = 4, dim = 1)
      .collect().sortBy(_.frame)
    // even sample over 8 frames at k=4 picks source frames 0, 2, 4, 6
    val picked = Seq(0, 2, 4, 6).map(i => grays(i) / 255.0f)
    assert(out.length === 4)
    out.zip(picked).foreach { case (f, exp) =>
      assert(math.abs(f.features(0) - exp) <= 0.02f,
        s"frame ${f.frame}: ${f.features(0)}, expected ~$exp")
    }
  }

  test("sampleFrameFeatures flags an undecodable GIF row instead of failing") {
    implicit val s = spark
    val ds = Seq(MediaRow(3L, Array[Byte](1, 2, 3, 4),
      MediaMeta("image/gif", 8, 8, 0L, "gif"))).toDS()
    val out = Multimodal.sampleFrameFeatures(ds, nFrames = 2, dim = 2).collect()
    assert(out.length === 1)
    assert(!out(0).ok && out(0).frame === -1 && out(0).features.isEmpty)
  }

  test("sampleFrameFeatures decodes REAL video frames from an MJPEG AVI") {
    implicit val s = spark
    // four solid-gray JPEG frames with distinct levels: each sampled
    // frame's strip luminance must equal ITS OWN frame's planted gray
    // — the byte-slice stub or a metadata-only parse cannot produce
    // this (JPEG is lossy; solid frames survive within ~2/255)
    val grays = Seq(16, 80, 160, 240)
    val avi = Multimodal.encodeAviMjpeg(
      grays.map(g => solidFrame(48, 32, g)), fps = 10)
    val ds = Seq(MediaRow(10L, avi,
      MediaMeta("video/x-msvideo", 48, 32, 400L, "mjpeg"))).toDS()
    val out = Multimodal.sampleFrameFeatures(ds, nFrames = 4, dim = 3)
      .collect().sortBy(_.frame)
    assert(out.length === 4)
    out.foreach { f =>
      assert(f.ok)
      assert(f.features.length === 3)
      val expected = grays(f.frame) / 255.0f
      f.features.foreach(v =>
        assert(math.abs(v - expected) <= 0.02f,
          s"frame ${f.frame}: luminance $v, expected ~$expected"))
    }
  }

  test("AVI frame sampling is even; extractFeatures averages REAL " +
      "decoded frames; corrupt AVI rows flag") {
    implicit val s = spark
    val grays = (0 until 8).map(i => 15 + i * 30)
    val avi = Multimodal.encodeAviMjpeg(
      grays.map(g => solidFrame(32, 32, g)), fps = 5)
    val ds = Seq(MediaRow(11L, avi,
      MediaMeta("video/x-msvideo", 32, 32, 1600L, "mjpeg"))).toDS()
    // even sample over 8 frames at k=4 picks source frames 0, 2, 4, 6
    val out = Multimodal.sampleFrameFeatures(ds, nFrames = 4, dim = 1)
      .collect().sortBy(_.frame)
    val picked = Seq(0, 2, 4, 6).map(i => grays(i) / 255.0f)
    assert(out.length === 4)
    out.zip(picked).foreach { case (f, exp) =>
      assert(math.abs(f.features(0) - exp) <= 0.02f,
        s"frame ${f.frame}: ${f.features(0)}, expected ~$exp")
    }
    // whole-payload features = mean luminance across ALL real frames
    val feats = Multimodal.extractFeatures(ds, dim = 2).collect().head
    assert(feats.ok)
    val mean = grays.map(_ / 255.0f).sum / grays.length
    feats.features.foreach(v =>
      assert(math.abs(v - mean) <= 0.02f,
        s"mean-frame luminance $v, expected ~$mean"))
    // a corrupt AVI row flags instead of failing the task
    val bad = Seq(MediaRow(12L,
      "RIFF    AVI ".getBytes("ISO-8859-1"),
      MediaMeta("video/x-msvideo", 8, 8, 0L, "mjpeg"))).toDS()
    val flagged = Multimodal.sampleFrameFeatures(bad, nFrames = 2, dim = 1)
      .collect()
    assert(flagged.length === 1 && !flagged(0).ok && flagged(0).frame === -1)
  }

  test("AVI container roundtrips the walker; videoMetadata reads RIFF " +
      "and ISO-BMFF side by side") {
    implicit val s = spark
    val avi = Multimodal.encodeAviMjpeg(
      (0 until 6).map(_ => solidFrame(24, 16, 128)), fps = 10)
    val info = Multimodal.parseAvi(avi)
    assert(info.microSecPerFrame === 100000L)
    assert(info.totalFrames === 6L)
    assert(info.width === 24 && info.height === 16)
    assert(info.nStreams === 1 && info.trackTypes === Seq("vids"))
    assert(info.frameChunks.length === 6)
    val mp4 = Multimodal.encodeMp4Skeleton(2500L, 1000L, Seq("vide", "soun"))
    val ds = Seq(
      MediaRow(20L, avi, MediaMeta("video/x-msvideo", 24, 16, 600L, "mjpeg")),
      MediaRow(21L, mp4, MediaMeta("video/mp4", 0, 0, 2500L, "h264"))).toDS()
    val metas = Multimodal.videoMetadata(ds).collect()
      .map(m => m.media_id -> m).toMap
    assert(metas(20L).ok && metas(20L).major_brand === "AVI ")
    assert(metas(20L).duration_ms === 600L) // 6 frames at 10 fps
    assert(metas(20L).n_tracks === 1 && metas(20L).track_types === Seq("vids"))
    assert(metas(21L).ok && metas(21L).major_brand === "isom")
    assert(metas(21L).duration_ms === 2500L)
  }

  test("μ-law WAV decodes through the REAL converter path (not a stub)") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioSystem}
    // synthesize PCM, transcode to 8-bit μ-law WAVE purely in-JVM,
    // then decode through the SAME decodeWav every audio row takes —
    // proving the telephony encodings ride the real converter, so the
    // honest stub set stays exactly mp3/aac (native codecs)
    val samples = Array.tabulate(4000)(i =>
      0.6 * math.sin(2 * math.Pi * i / 50.0))
    val pcm = Multimodal.encodeWavPcm16(samples, 8000f)
    val in = AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(pcm))
    val ulawFmt = new AudioFormat(AudioFormat.Encoding.ULAW,
      8000f, 8, 1, 1, 8000f, false)
    val ulaw = AudioSystem.getAudioInputStream(ulawFmt, in)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ulaw, AudioFileFormat.Type.WAVE, bos)
    val decoded = Multimodal.decodeWav(bos.toByteArray)
    assert(decoded.length === samples.length)
    // 8-bit companding tolerance: μ-law SNR ≈ 38 dB, |err| well under
    // 0.05 on a 0.6-amplitude tone; a stubbed decode could not track
    // the waveform sample-for-sample like this
    val maxErr = decoded.zip(samples).map { case (a, b) =>
      math.abs(a - b) }.max
    assert(maxErr < 0.05, s"mu-law roundtrip error $maxErr")
  }

  test("multi-stream AVI: only the 'vids' stream's chunks become frames") {
    // hand-build a 2-stream container (auds at index 0, vids at 1):
    // '00wb' audio data and a bogus '00dc'-named chunk on the AUDIO
    // stream must not reach the JPEG decoder; the real frames ride
    // as '01dc' (r9 ADVICE: stream identity lives in the 2-digit id
    // prefix, matched against the strh order)
    def le32(v: Long): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def cc(s: String): Array[Byte] = s.getBytes("ISO-8859-1")
    def chunk(id: String, body: Array[Byte]): Array[Byte] =
      cc(id) ++ le32(body.length.toLong) ++ body ++
        (if ((body.length & 1) == 1) Array(0.toByte)
         else Array.emptyByteArray)
    def list(typ: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", cc(typ) ++ body)
    val jpeg = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(solidFrame(24, 16, 200), "jpg", bos)
      bos.toByteArray
    }
    val avih = chunk("avih",
      le32(100000L) ++ le32(0) ++ le32(0) ++ le32(0x10L) ++ le32(2L) ++
        le32(0) ++ le32(2L) ++ le32(0) ++ le32(24L) ++ le32(16L) ++
        new Array[Byte](16))
    def strh(typ: String): Array[Byte] =
      chunk("strh", cc(typ) ++ cc(if (typ == "vids") "MJPG" else "pcm ") ++
        new Array[Byte](48))
    val hdrl = list("hdrl", avih ++
      list("strl", strh("auds")) ++ list("strl", strh("vids")))
    val movi = list("movi",
      chunk("00wb", Array.fill(64)(7.toByte)) ++  // audio data
        chunk("00dc", Array.fill(32)(9.toByte)) ++ // bogus: dc on auds
        chunk("01dc", jpeg) ++ chunk("01dc", jpeg))
    val body = cc("AVI ") ++ hdrl ++ movi
    val avi = cc("RIFF") ++ le32(body.length.toLong) ++ body
    val info = Multimodal.parseAvi(avi)
    assert(info.trackTypes === Seq("auds", "vids"))
    assert(info.frameChunks.length === 2,
      s"audio-stream chunks leaked into the frame list: $info")
    val frames = Multimodal.decodeAviMjpegFrames(avi, maxFrames = 10)
    assert(frames.length === 2)
    assert(frames.forall(f => f.getWidth === 24 && f.getHeight === 16))
  }

  test("sampleFrames explodes each media row into n frame rows") {
    val media = Multimodal.syntheticMedia(spark, 5).toDF()
    val frames = Multimodal.sampleFrames(media, "payload", nFrames = 4)
    assert(frames.count() === 20)
    assert(frames.groupBy("media_id").count()
      .select("count").as[Long].collect().forall(_ === 4L))
  }

  test("resize decodes + rescales REAL images: output payload is a PNG of the target size") {
    implicit val s = spark
    val media = Multimodal.syntheticMedia(spark, 10)
    val out = Multimodal.resize(media, 64, 48).collect().sortBy(_.media_id)
    val orig = media.collect().sortBy(_.media_id).map(r => r.media_id -> r).toMap
    out.filter(_.meta.mediaType == "image/png").foreach { r =>
      assert(r.meta.width === 64 && r.meta.height === 48)
      assert(r.meta.codec === "png")
      val img = Multimodal.decodeImage(r.payload) // pixel-true target dims
      assert(img.getWidth === 64)
      assert(img.getHeight === 48)
      // a real downscale (sources are >= 96x64 noise) shrinks the bytes
      assert(r.payload.length < orig(r.media_id).payload.length)
    }
    // deterministic: same input -> identical bytes
    val again = Multimodal.resize(media, 64, 48).collect().sortBy(_.media_id)
    assert(out.map(_.payload.toSeq).toSeq === again.map(_.payload.toSeq).toSeq)
  }

  test("resize of a JPEG re-labels mediaType to match the PNG re-encode") {
    implicit val s = spark
    val img = new BufferedImage(40, 30, BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val jpeg = MediaRow(1L, bos.toByteArray,
      MediaMeta("image/jpeg", 40, 30, 0L, "jpeg"))
    val r = Multimodal.resize(Seq(jpeg).toDS(), 20, 15).collect().head
    // the payload is PNG bytes now — metadata must say so
    assert(r.meta.mediaType === "image/png" && r.meta.codec === "png")
    val decoded = Multimodal.decodeImage(r.payload)
    assert(decoded.getWidth === 20 && decoded.getHeight === 15)
  }

  test("resize preserves content, not just size: solid color survives the rescale") {
    implicit val s = spark
    val ds = Seq(solidPng(7L, 100, 80, 0xff0000)).toDS()
    val r = Multimodal.resize(ds, 25, 20).collect().head
    val img = Multimodal.decodeImage(r.payload)
    assert(img.getWidth === 25 && img.getHeight === 20)
    // every pixel still pure red after bilinear downscale of a solid
    for (x <- 0 until 25; y <- 0 until 20)
      assert((img.getRGB(x, y) & 0xffffff) === 0xff0000)
  }

  private def gradientPng(id: Long, w: Int, h: Int, ax: Double, ay: Double): MediaRow = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val l = math.max(0, math.min(255,
          (ax * x / w + ay * y / h).toInt))
        img.setRGB(x, y, (l << 16) | (l << 8) | l)
        x += 1
      }
      y += 1
    }
    MediaRow(id, Multimodal.encodePng(img), MediaMeta("image/png", w, h, 0L, "png"))
  }

  test("perceptual near-dups: a resized re-encoded copy is found, different content is not") {
    implicit val s = spark
    // three structurally different images + a resized copy of each
    val originals = Seq(
      gradientPng(0L, 96, 64, 255, 0),   // left→right ramp
      gradientPng(1L, 96, 64, 0, 255),   // top→bottom ramp
      gradientPng(2L, 96, 64, 255, -255) // diagonal
    )
    val copies = Multimodal.resize(originals.toDS(), 48, 32).collect()
      .map(r => r.copy(media_id = r.media_id + 10)).toSeq
    val pairs = Multimodal.phashNearDups((originals ++ copies).toDS(), maxHamming = 8)
      .select("media_a", "media_b").as[(Long, Long)].collect().toSet
    // each original pairs with exactly its own rescaled copy — the
    // byte digests differ (contentManifest would see 6 distinct
    // payloads), but the CONTENT is the same picture
    assert(pairs === Set((0L, 10L), (1L, 11L), (2L, 12L)))
  }

  test("perceptual hash is deterministic and drops non-image rows") {
    implicit val s = spark
    val media = Multimodal.syntheticMedia(spark, 10)
    val a = Multimodal.perceptualHashes(media).as[(Long, Long)].collect().sortBy(_._1)
    val b = Multimodal.perceptualHashes(media).as[(Long, Long)].collect().sortBy(_._1)
    assert(a.toSeq === b.toSeq)
    assert(a.map(_._1).toSet === (0 until 10 by 2).map(_.toLong).toSet, "images are even ids")
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

  // ---- video container metadata (REAL mp4 box parsing) ----

  private def mp4Row(id: Long, durMs: Long, scale: Long,
      handlers: Seq[String]): MediaRow =
    MediaRow(id,
      Multimodal.encodeMp4Skeleton(durMs, scale, handlers),
      MediaMeta("video/mp4", 0, 0, durMs, "h264"))

  test("videoMetadata parses brand, duration, timescale and track handlers from real boxes") {
    implicit val s = spark
    val ds = Seq(
      mp4Row(1L, 90000L, 600L, Seq("vide", "soun")),
      mp4Row(2L, 2500L, 1000L, Seq("vide")),
      solidPng(3L, 8, 8, 0xff0000)).toDS() // non-video rows drop
    val out = Multimodal.videoMetadata(ds).collect().sortBy(_.media_id)
    assert(out.map(_.media_id).toSeq === Seq(1L, 2L))
    val v1 = out(0)
    assert(v1.ok && v1.major_brand === "isom" && v1.timescale === 600L)
    assert(v1.duration_ms === 90000L)
    assert(v1.n_tracks === 2 && v1.track_types === Seq("vide", "soun"))
    assert(out(1).duration_ms === 2500L && out(1).track_types === Seq("vide"))
  }

  test("videoMetadata flags malformed containers instead of failing the task") {
    implicit val s = spark
    val junk = MediaRow(9L, Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9),
      MediaMeta("video/mp4", 0, 0, 0L, "h264"))
    val truncated = {
      val good = Multimodal.encodeMp4Skeleton(1000L, 600L, Seq("vide"))
      MediaRow(10L, good.take(good.length - 5),
        MediaMeta("video/mp4", 0, 0, 0L, "h264"))
    }
    val out = Multimodal.videoMetadata(
      Seq(junk, truncated, mp4Row(11L, 1000L, 600L, Seq("vide"))).toDS())
      .collect().sortBy(_.media_id)
    assert(!out(0).ok && out(0).error.nonEmpty)
    assert(!out(1).ok && out(1).error.nonEmpty)
    assert(out(2).ok)
  }

  test("parseMp4 flags a truncated leaf box instead of reading its sibling's bytes") {
    // an mvhd cut to header-only followed by a trak: the old walker
    // would read the trak's bytes as timescale/duration
    val good = Multimodal.encodeMp4Skeleton(1000L, 600L, Seq("vide"))
    val moovAt = good.indexOfSlice("moov".getBytes("ISO-8859-1")) - 4
    val mvhdAt = good.indexOfSlice("mvhd".getBytes("ISO-8859-1")) - 4
    // shrink mvhd's size to 8 (header only) and splice the rest of
    // moov directly after it, fixing up the moov size
    val mvhdSize = ((good(mvhdAt) & 0xff) << 24) | ((good(mvhdAt + 1) & 0xff) << 16) |
      ((good(mvhdAt + 2) & 0xff) << 8) | (good(mvhdAt + 3) & 0xff)
    val cut = good.take(mvhdAt) ++
      Array[Byte](0, 0, 0, 8) ++ "mvhd".getBytes("ISO-8859-1") ++
      good.slice(mvhdAt + mvhdSize, good.length)
    val newMoovSize = (cut.length - moovAt)
    cut(moovAt) = ((newMoovSize >> 24) & 0xff).toByte
    cut(moovAt + 1) = ((newMoovSize >> 16) & 0xff).toByte
    cut(moovAt + 2) = ((newMoovSize >> 8) & 0xff).toByte
    cut(moovAt + 3) = (newMoovSize & 0xff).toByte
    val e = intercept[IllegalArgumentException] { Multimodal.parseMp4(cut) }
    assert(e.getMessage.contains("truncated"), e.getMessage)
  }

  test("mp4 skeleton roundtrips through the parser, incl. 64-bit largesize boxes") {
    val p = Multimodal.encodeMp4Skeleton(3600000L, 90000L,
      Seq("vide", "soun", "sbtl"))
    val i = Multimodal.parseMp4(p)
    assert(i.majorBrand === "isom" && i.durationMs === 3600000L)
    assert(i.timescale === 90000L && i.nTracks === 3)
    assert(i.trackTypes === Seq("vide", "soun", "sbtl"))
    // rewrite the moov box with a 64-bit largesize header: same parse
    val moovAt = p.indexOfSlice("moov".getBytes("ISO-8859-1")) - 4
    val size32 = ((p(moovAt) & 0xff) << 24) | ((p(moovAt + 1) & 0xff) << 16) |
      ((p(moovAt + 2) & 0xff) << 8) | (p(moovAt + 3) & 0xff)
    val big = p.take(moovAt) ++
      Array[Byte](0, 0, 0, 1) ++ "moov".getBytes("ISO-8859-1") ++
      (56 to 0 by -8).map(sh => (((size32 + 8).toLong >> sh) & 0xff).toByte) ++
      p.slice(moovAt + 8, p.length)
    val i2 = Multimodal.parseMp4(big)
    assert(i2.durationMs === i.durationMs && i2.trackTypes === i.trackTypes)
  }
}
