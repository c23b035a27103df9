package graft.operators

import java.awt.RenderingHints
import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing (SURVEY.md §2c).
  *
  * Media payloads are opaque `binary` columns with a typed metadata
  * struct riding alongside — the schema a 100 TB multimodal corpus
  * actually uses (payload bytes never parsed by Catalyst; metadata
  * prunable/pushable).
  *
  * The IMAGE path is real: PNG/JPEG payloads are decoded, resized,
  * and feature-extracted with `javax.imageio` + Java2D (pure JVM, no
  * native deps), inside `mapPartitions` so codec setup amortizes per
  * partition. The AUDIO path is real for WAV/PCM: payloads decode via
  * `javax.sound.sampled` (pure JVM) to normalized mono samples and
  * feature-extract as per-strip RMS energy. For VIDEO, the CONTAINER
  * level is real for BOTH families — MP4/ISO-BMFF box framing and
  * RIFF/AVI chunk framing parse on the pure JVM ([[videoMetadata]]:
  * brand, duration, timescale, per-track handler types) — and FRAME
  * decode is real for MJPEG-in-AVI (each frame a baseline JPEG
  * javax.imageio decodes). Only mp4/h264 + webm frame decode and
  * compressed audio (mp3/aac) remain deterministic STUBS (clearly
  * marked — those codecs need native libraries absent from this
  * environment); the distributed plumbing around the stub is
  * identical to the real paths.
  */
object Multimodal {

  /** Typed metadata carried next to the payload. */
  case class MediaMeta(mediaType: String, width: Int, height: Int,
      durationMs: Long, codec: String)

  case class MediaRow(media_id: Long, payload: Array[Byte], meta: MediaMeta)

  /** `ok`/`error` make decode failure DATA, not a job failure — the
    * Fetch accounting stance: at corpus scale a few corrupt blobs are
    * certain, and one bad payload must not kill a 100 TB pass. A
    * failed row carries empty features and the decoder's message. */
  case class MediaFeatures(media_id: Long, n_bytes: Long, checksum: Long,
      features: Array[Float], ok: Boolean = true, error: String = "")

  /** Attach payload-level columns computable without decoding —
    * size, checksum — straight Column exprs over the binary. */
  def withPayloadStats(df: DataFrame, payloadCol: String): DataFrame =
    df.withColumn("n_bytes", length(col(payloadCol)).cast("long"))
      .withColumn("checksum", xxhash64(col(payloadCol)))

  /** Content-addressed store manifest: group identical payloads by
    * cryptographic digest → (digest, ref count, representative id,
    * size). The dedup-by-content primitive a large media corpus
    * stores payloads under (upload once per digest, reference
    * everywhere). One groupBy on the digest — partial agg map-side;
    * the shuffle carries (digest, id, length), never payload bytes,
    * because every agg input is computed from the payload BEFORE the
    * exchange. sha2-256: collision-addressable at exabyte scale,
    * unlike the 64-bit checksum in [[withPayloadStats]].
    */
  def contentManifest(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.groupBy(sha2(col(payloadCol), 256).as("digest"))
      .agg(
        count("*").as("n_refs"),
        min(col(idCol)).as("rep_id"),
        min(length(col(payloadCol))).cast("long").as("n_bytes"))

  // ------------------------------------------------------------------
  // Real image codec (javax.imageio — pure JVM). ImageIO's disk cache
  // is disabled once per executor: media batches must never touch
  // local disk for an in-memory transcode.
  // ------------------------------------------------------------------
  private object Codec {
    ImageIO.setUseCache(false)

    def decode(payload: Array[Byte]): BufferedImage = {
      val img = ImageIO.read(new ByteArrayInputStream(payload))
      require(img != null, s"undecodable image payload (${payload.length} bytes)")
      img
    }

    def encodePng(img: BufferedImage): Array[Byte] = {
      val bos = new ByteArrayOutputStream(1024)
      ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** Deterministic software rescale: Java2D bilinear draw into a
      * fixed-type raster (no platform-dependent acceleration paths in
      * the software pipeline — same bytes on every executor/JVM). */
    def rescale(img: BufferedImage, w: Int, h: Int): BufferedImage = {
      val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
          RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, w, h, null)
      } finally g.dispose()
      out
    }

    /** `dim` mean-luminance features over `dim` horizontal strips —
      * a real decoded-pixel statistic (stands where an embedding
      * model's forward pass would run; the I/O + batching shape is
      * identical). Values in [0, 1]. */
    def stripLuminance(img: BufferedImage, dim: Int): Array[Float] = {
      val (w, h) = (img.getWidth, img.getHeight)
      val out = new Array[Float](dim)
      var s = 0
      while (s < dim) {
        val y0 = (s.toLong * h / dim).toInt
        val y1 = math.max(y0 + 1, ((s + 1).toLong * h / dim).toInt)
        var sum = 0.0; var y = y0
        while (y < y1) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            sum += (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3.0
            x += 1
          }
          y += 1
        }
        out(s) = (sum / (255.0 * w.toLong * (y1 - y0))).toFloat
        s += 1
      }
      out
    }

    // ----------------------------------------------------------------
    // Real audio codec (javax.sound.sampled — pure JVM, WAV/PCM and
    // whatever the JDK's SPI chain can convert to signed 16-bit).
    // ----------------------------------------------------------------

    /** Decode a WAV payload to channel-averaged mono samples in
      * [−1, 1]. Any source encoding the JDK can read is first
      * converted to PCM_SIGNED 16-bit little-endian at the source
      * rate/channel count — one deterministic sample pipeline. */
    def decodeWav(payload: Array[Byte]): Array[Double] = {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
      var conv: AudioInputStream = null
      try {
        val src = in.getFormat
        val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
          src.getSampleRate, 16, src.getChannels,
          src.getChannels * 2, src.getSampleRate, false)
        conv = AudioSystem.getAudioInputStream(target, in)
        val bytes = conv.readAllBytes()
        val ch = target.getChannels
        val nFrames = bytes.length / (2 * ch)
        require(nFrames > 0, "empty PCM stream")
        val out = new Array[Double](nFrames)
        var f = 0
        while (f < nFrames) {
          var sum = 0.0
          var c = 0
          while (c < ch) {
            val i = (f * ch + c) * 2
            val s = ((bytes(i) & 0xff) | (bytes(i + 1) << 8)).toShort
            sum += s / 32768.0
            c += 1
          }
          out(f) = sum / ch
          f += 1
        }
        out
      } finally {
        // closing the converter closes the wrapped source too; if
        // conversion setup itself threw, fall back to the source
        if (conv != null) conv.close() else in.close()
      }
    }

    /** `dim` RMS-energy features over `dim` time strips — the audio
      * analog of [[stripLuminance]]: a real decoded-sample statistic
      * (stands where an audio-embedding forward pass would run).
      * Values in [0, 1] for normalized PCM. */
    def stripRms(samples: Array[Double], dim: Int): Array[Float] = {
      val n = samples.length
      val out = new Array[Float](dim)
      var s = 0
      while (s < dim) {
        val i0 = (s.toLong * n / dim).toInt
        val i1 = math.max(i0 + 1, ((s + 1).toLong * n / dim).toInt)
        var acc = 0.0
        var i = i0
        while (i < i1) { acc += samples(i) * samples(i); i += 1 }
        out(s) = math.sqrt(acc / (i1 - i0)).toFloat
        s += 1
      }
      out
    }

    /** Decode up to `maxFrames` frames of a (possibly animated) GIF —
      * the one real multi-frame container a pure JVM can read. Raw
      * frames composite progressively onto a canvas at their declared
      * ImageDescriptor offsets (the no-disposal rule: each frame
      * draws over the previous composite — the common case for
      * synthetic and screen-capture GIFs; restore-to-background
      * disposal is not modeled). The canvas takes the first frame's
      * size (standard GIFs open with a full frame). */
    def decodeGifFrames(payload: Array[Byte], maxFrames: Int): IndexedSeq[BufferedImage] = {
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(payload))
      try {
        val readers = ImageIO.getImageReaders(iis)
        require(readers.hasNext, s"no reader for payload (${payload.length} bytes)")
        val reader = readers.next()
        reader.setInput(iis)
        try {
          val n = reader.getNumImages(true)
          require(n > 0, "container holds no frames")
          val take = math.min(n, maxFrames)
          val out = new scala.collection.mutable.ArrayBuffer[BufferedImage](take)
          var canvas: BufferedImage = null
          var i = 0
          while (i < take) {
            val raw = reader.read(i)
            if (canvas == null)
              canvas = new BufferedImage(raw.getWidth, raw.getHeight,
                BufferedImage.TYPE_INT_RGB)
            val (x, y) = gifFrameOffset(reader, i)
            val g = canvas.createGraphics()
            try g.drawImage(raw, x, y, null) finally g.dispose()
            val copy = new BufferedImage(canvas.getWidth, canvas.getHeight,
              BufferedImage.TYPE_INT_RGB)
            val g2 = copy.createGraphics()
            try g2.drawImage(canvas, 0, 0, null) finally g2.dispose()
            out += copy
            i += 1
          }
          out.toIndexedSeq
        } finally reader.dispose()
      } finally iis.close()
    }

    private def gifFrameOffset(reader: javax.imageio.ImageReader,
        i: Int): (Int, Int) =
      try {
        val tree = reader.getImageMetadata(i)
          .getAsTree("javax_imageio_gif_image_1.0")
          .asInstanceOf[org.w3c.dom.Element]
        val desc = tree.getElementsByTagName("ImageDescriptor")
        if (desc.getLength == 0) (0, 0)
        else {
          val e = desc.item(0).asInstanceOf[org.w3c.dom.Element]
          (e.getAttribute("imageLeftPosition").toInt,
            e.getAttribute("imageTopPosition").toInt)
        }
      } catch { case _: Exception => (0, 0) }

    /** Synthesize an animated GIF from frames — tests/demos (the
      * multi-frame twin of encodePng). GIF quantizes to a 256-color
      * palette per frame; feed low-color frames for exact pixels. */
    def encodeGifAnimated(frames: Seq[BufferedImage]): Array[Byte] = {
      require(frames.nonEmpty, "need at least one frame")
      val bos = new ByteArrayOutputStream(4096)
      val ios = ImageIO.createImageOutputStream(bos)
      val writer = ImageIO.getImageWritersByFormatName("gif").next()
      try {
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        frames.foreach(f =>
          writer.writeToSequence(new javax.imageio.IIOImage(f, null, null), null))
        writer.endWriteSequence()
      } finally { writer.dispose(); ios.close() }
      bos.toByteArray
    }

    /** Synthesize a mono 16-bit PCM WAV from samples in [−1, 1] —
      * tests/demos (the WAV twin of encodePng). */
    def encodeWavPcm16(samples: Array[Double], sampleRate: Float): Array[Byte] = {
      val bytes = new Array[Byte](samples.length * 2)
      var i = 0
      while (i < samples.length) {
        val v = math.max(-1.0, math.min(1.0, samples(i)))
        val s = math.round(v * 32767).toShort
        bytes(2 * i) = (s & 0xff).toByte
        bytes(2 * i + 1) = ((s >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new AudioFormat(sampleRate, 16, 1, true, false)
      val ais = new AudioInputStream(
        new ByteArrayInputStream(bytes), fmt, samples.length.toLong)
      val bos = new ByteArrayOutputStream(44 + bytes.length)
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }

    /** Walk the ISO-BMFF box tree. Handles 32-bit sizes, 64-bit
      * largesize (size == 1) and to-end boxes (size == 0); malformed
      * framing throws (callers convert to flagged rows — decode
      * failure is data). */
    def parseMp4(payload: Array[Byte]): Mp4Info = {
      def be32(o: Int): Long =
        ((payload(o) & 0xffL) << 24) | ((payload(o + 1) & 0xffL) << 16) |
          ((payload(o + 2) & 0xffL) << 8) | (payload(o + 3) & 0xffL)
      def be64(o: Int): Long = (be32(o) << 32) | be32(o + 4)
      def fourcc(o: Int): String = new String(payload, o, 4, "ISO-8859-1")
      var brand = ""
      var timescale = 0L
      var duration = 0L
      var nTracks = 0
      val handlers = scala.collection.mutable.ArrayBuffer.empty[String]
      def walk(start: Int, end: Int): Unit = {
        var o = start
        while (o + 8 <= end) {
          var size = be32(o)
          val typ = fourcc(o + 4)
          var hdr = 8
          if (size == 1L) { size = be64(o + 8); hdr = 16 }
          else if (size == 0L) size = (end - o).toLong
          if (size < hdr || o + size > end)
            throw new IllegalArgumentException(
              s"malformed box '$typ' at $o (size $size)")
          // leaf reads must stay INSIDE the box's declared size — a
          // truncated leaf must flag, not silently read its sibling
          def need(n: Int): Unit =
            if (size < hdr + n)
              throw new IllegalArgumentException(
                s"truncated '$typ' box at $o (size $size < ${hdr + n})")
          typ match {
            case "ftyp" =>
              need(4)
              brand = fourcc(o + hdr)
            case "moov" | "trak" | "mdia" =>
              if (typ == "trak") nTracks += 1
              walk(o + hdr, (o + size).toInt)
            case "mvhd" =>
              need(1)
              val v = payload(o + hdr) & 0xff
              if (v == 1) {
                need(32)
                timescale = be32(o + hdr + 20)
                duration = be64(o + hdr + 24)
              } else {
                need(20)
                timescale = be32(o + hdr + 12)
                duration = be32(o + hdr + 16)
              }
            case "hdlr" =>
              need(12)
              handlers += fourcc(o + hdr + 8)
            case _ => ()
          }
          o += size.toInt
        }
        if (o != end)
          throw new IllegalArgumentException(s"trailing ${end - o} bytes")
      }
      walk(0, payload.length)
      require(timescale > 0, "no mvhd movie header found")
      Mp4Info(brand, duration * 1000L / timescale, timescale, nTracks,
        handlers.toSeq)
    }

    // ----------------------------------------------------------------
    // Real video codec for ONE pure-JVM-decodable format: MJPEG in an
    // AVI (RIFF) container. RIFF is a little-endian box walk (the
    // ISO-BMFF pattern above, LE and word-aligned); each MJPEG frame
    // chunk is a baseline JPEG javax.imageio already decodes. This is
    // the one real video-frame path a no-native-codec JVM can have;
    // mp4/h264 + webm/vp9 frame decode stays the marked stub.
    // ----------------------------------------------------------------

    /** Walk a RIFF/AVI container: main-header fields, per-stream
      * fccTypes, and the offsets of the video data chunks inside the
      * 'movi' list ('##dc'/'##db'). Malformed framing throws (callers
      * convert to flagged rows — decode failure is data). */
    def parseAvi(payload: Array[Byte]): AviInfo = {
      def le32(o: Int): Long =
        (payload(o) & 0xffL) | ((payload(o + 1) & 0xffL) << 8) |
          ((payload(o + 2) & 0xffL) << 16) | ((payload(o + 3) & 0xffL) << 24)
      def fourcc(o: Int): String = new String(payload, o, 4, "ISO-8859-1")
      require(payload.length >= 12 && fourcc(0) == "RIFF" &&
        fourcc(8) == "AVI ", "not a RIFF/AVI payload")
      var usPerFrame = 0L; var totalFrames = 0L
      var w = 0; var h = 0; var nStreams = 0
      val tracks = scala.collection.mutable.ArrayBuffer.empty[String]
      // (streamNo, offset, size) — filtered to the video stream AFTER
      // the walk, once the strh order has fixed each stream's index
      val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int)]
      def walk(start: Int, end: Int, inMovi: Boolean): Unit = {
        var o = start
        while (o + 8 <= end) {
          val id = fourcc(o)
          val size = le32(o + 4)
          if (size < 0 || o + 8 + size > end)
            throw new IllegalArgumentException(
              s"malformed chunk '$id' at $o (size $size)")
          if (id == "LIST") {
            if (size < 4)
              throw new IllegalArgumentException(s"truncated LIST at $o")
            val listType = fourcc(o + 8)
            walk(o + 12, o + 8 + size.toInt, inMovi || listType == "movi")
          } else if (inMovi &&
              (id.endsWith("dc") || id.endsWith("db")) &&
              id.take(2).forall(_.isDigit)) {
            // a video data chunk of stream ##
            frames += ((id.take(2).toInt, o + 8, size.toInt))
          } else id match {
            case "avih" =>
              if (size < 40)
                throw new IllegalArgumentException(s"truncated avih at $o")
              usPerFrame = le32(o + 8)
              totalFrames = le32(o + 8 + 16)
              nStreams = le32(o + 8 + 24).toInt
              w = le32(o + 8 + 32).toInt
              h = le32(o + 8 + 36).toInt
            case "strh" =>
              if (size < 4)
                throw new IllegalArgumentException(s"truncated strh at $o")
              tracks += fourcc(o + 8)
            case _ => ()
          }
          o += 8 + size.toInt + (size.toInt & 1) // chunks are word-aligned
        }
      }
      walk(12, payload.length, inMovi = false)
      require(usPerFrame > 0, "no avih main header found")
      // keep only the VIDEO stream's chunks (r9 ADVICE): stream N is
      // the N-th strh in hdrl order, and data chunk ids carry that
      // index as their two-digit prefix — a multi-stream AVI (e.g.
      // vids + auds) must not interleave audio '##wb'-adjacent or
      // second-stream chunks into the frame list javax.imageio sees
      val vidStream = tracks.indexWhere(_ == "vids")
      require(vidStream >= 0, "no 'vids' stream in hdrl")
      AviInfo(usPerFrame, totalFrames, w, h, nStreams, tracks.toSeq,
        frames.collect { case (s, off, len) if s == vidStream =>
          (off, len)
        }.toIndexedSeq)
    }

    /** Decode up to `maxFrames` REAL frames of an MJPEG-in-AVI
      * payload: every '##dc' chunk in the movi list is a standalone
      * baseline JPEG (this synthesizer writes full JFIF frames, the
      * common MJPEG form), decoded by javax.imageio. */
    def decodeAviMjpegFrames(payload: Array[Byte],
        maxFrames: Int): IndexedSeq[BufferedImage] = {
      val info = parseAvi(payload)
      require(info.frameChunks.nonEmpty, "no video frame chunks in movi")
      info.frameChunks.take(maxFrames).map { case (off, len) =>
        val img = ImageIO.read(new ByteArrayInputStream(payload, off, len))
        require(img != null, s"undecodable MJPEG frame at offset $off")
        img
      }
    }

    /** Synthesize a REAL MJPEG-in-AVI container from frames — the
      * video twin of encodeGifAnimated: RIFF(hdrl(avih, strl(strh
      * 'vids'/'MJPG', strf BITMAPINFOHEADER)), movi('00dc' JPEG ...)).
      * Frames JPEG-encode via javax.imageio, so the payload is a
      * fully standard MJPEG AVI any player decodes. */
    def encodeAviMjpeg(frames: Seq[BufferedImage], fps: Int): Array[Byte] = {
      require(frames.nonEmpty && fps > 0, "need frames and a positive fps")
      val w = frames.head.getWidth
      val h = frames.head.getHeight
      val jpegs = frames.map { f =>
        // the JPEG writer rejects rasters with alpha — normalize
        val rgb =
          if (f.getType == BufferedImage.TYPE_INT_RGB) f
          else {
            val c = new BufferedImage(f.getWidth, f.getHeight,
              BufferedImage.TYPE_INT_RGB)
            val g = c.createGraphics()
            try g.drawImage(f, 0, 0, null) finally g.dispose()
            c
          }
        val bos = new ByteArrayOutputStream(4096)
        ImageIO.write(rgb, "jpg", bos)
        bos.toByteArray
      }
      def le32(v: Long): Array[Byte] = Array(
        (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
      def le16(v: Int): Array[Byte] =
        Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
      def cc(s: String): Array[Byte] = s.getBytes("ISO-8859-1")
      def chunk(id: String, body: Array[Byte]): Array[Byte] =
        cc(id) ++ le32(body.length.toLong) ++ body ++
          (if ((body.length & 1) == 1) Array(0.toByte) else Array.emptyByteArray)
      def list(typ: String, body: Array[Byte]): Array[Byte] =
        chunk("LIST", cc(typ) ++ body)
      // MainAVIHeader: usPerFrame, maxBytesPerSec, padding, flags,
      // totalFrames, initialFrames, streams, sugBufSize, w, h, rsvd[4]
      val avih = chunk("avih",
        le32(1000000L / fps) ++ le32(0) ++ le32(0) ++ le32(0x10L) ++
          le32(frames.length.toLong) ++ le32(0) ++ le32(1) ++ le32(0) ++
          le32(w.toLong) ++ le32(h.toLong) ++ new Array[Byte](16))
      // AVIStreamHeader: type, handler, flags, prio/lang, initFrames,
      // scale, rate, start, length, sugBuf, quality, sampleSize, rcFrame
      val strh = chunk("strh",
        cc("vids") ++ cc("MJPG") ++ le32(0) ++ le32(0) ++ le32(0) ++
          le32(1) ++ le32(fps.toLong) ++ le32(0) ++
          le32(frames.length.toLong) ++ le32(0) ++ le32(0xffffffffL) ++
          le32(0) ++ le16(0) ++ le16(0) ++ le16(w) ++ le16(h))
      // BITMAPINFOHEADER with biCompression = 'MJPG'
      val strf = chunk("strf",
        le32(40) ++ le32(w.toLong) ++ le32(h.toLong) ++ le16(1) ++ le16(24) ++
          cc("MJPG") ++ le32(w.toLong * h * 3) ++
          le32(0) ++ le32(0) ++ le32(0) ++ le32(0))
      val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
      val movi = list("movi",
        jpegs.flatMap(j => chunk("00dc", j).toSeq).toArray)
      val body = cc("AVI ") ++ hdrl ++ movi
      cc("RIFF") ++ le32(body.length.toLong) ++ body
    }

    /** Synthesize a minimal valid MP4 skeleton (ftyp + moov with mvhd
      * and one hdlr-bearing trak per handler) — the container-level
      * twin of encodePng/encodeWavPcm16 for tests. Carries no sample
      * data, exactly like a faststart header fragment. */
    def encodeMp4Skeleton(durationMs: Long, timescale: Long,
        handlers: Seq[String]): Array[Byte] = {
      require(timescale > 0 && timescale <= 0xffffffffL &&
        handlers.forall(_.length == 4))
      require(durationMs >= 0 &&
        durationMs <= (0xffffffffL * 1000L) / timescale,
        s"duration $durationMs ms overflows the 32-bit mvhd v0 field " +
          s"at timescale $timescale")
      def box(typ: String, body: Array[Byte]): Array[Byte] = {
        val out = new Array[Byte](8 + body.length)
        val size = out.length
        out(0) = ((size >> 24) & 0xff).toByte; out(1) = ((size >> 16) & 0xff).toByte
        out(2) = ((size >> 8) & 0xff).toByte; out(3) = (size & 0xff).toByte
        System.arraycopy(typ.getBytes("ISO-8859-1"), 0, out, 4, 4)
        System.arraycopy(body, 0, out, 8, body.length)
        out
      }
      def be32(v: Long): Array[Byte] = Array(
        ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
      val ftyp = box("ftyp",
        "isom".getBytes("ISO-8859-1") ++ be32(0x200L) ++
          "isomiso2".getBytes("ISO-8859-1"))
      // mvhd v0: version/flags, creation, modification, timescale,
      // duration, then rate/volume/reserved/matrix/next_track zeroed
      val mvhd = box("mvhd",
        be32(0L) ++ be32(0L) ++ be32(0L) ++ be32(timescale) ++
          be32(durationMs * timescale / 1000L) ++ new Array[Byte](80))
      val traks = handlers.map { h =>
        val hdlr = box("hdlr",
          be32(0L) ++ be32(0L) ++ h.getBytes("ISO-8859-1") ++
            new Array[Byte](13)) // 12 reserved + NUL name
        box("trak", box("mdia", hdlr))
      }
      ftyp ++ box("moov", mvhd ++ traks.flatten.toArray)
    }
  }

  /** Parsed MP4 (ISO-BMFF) container structure — METADATA only.
    * Box framing is plain length-prefixed binary, so brand,
    * movie-header duration/timescale, and per-track handler types
    * parse on the pure JVM; only FRAME decode needs the native
    * codecs this sandbox lacks (that kernel stays the marked
    * stub). */
  case class Mp4Info(majorBrand: String, durationMs: Long,
      timescale: Long, nTracks: Int, trackTypes: Seq[String])

  /** Parsed RIFF/AVI container structure. `frameChunks` are the
    * (offset, length) spans of the movi video data chunks — for
    * MJPEG each span IS a decodable baseline JPEG. */
  case class AviInfo(microSecPerFrame: Long, totalFrames: Long,
      width: Int, height: Int, nStreams: Int, trackTypes: Seq[String],
      frameChunks: IndexedSeq[(Int, Int)])

  /** Per-video container metadata row — ok/error follow the
    * [[MediaFeatures]] failure-is-data stance. */
  case class VideoMeta(media_id: Long, ok: Boolean, error: String,
      major_brand: String, duration_ms: Long, timescale: Long,
      n_tracks: Int, track_types: Seq[String])

  /** REAL video-container metadata extraction: parse the MP4
    * (ISO-BMFF) box tree of every video-typed row — major brand,
    * movie duration/timescale, track count, per-track handler types
    * ('vide'/'soun'/...). This is the half of the video path that
    * does not need native codecs: box framing is plain
    * length-prefixed binary, so the corpus-manifest questions (how
    * many hours? which tracks? which brands?) answer at scan speed
    * without ever entering the frame-decode stub. Malformed
    * containers emit flagged rows, not task failures. */
  def videoMetadata(ds: Dataset[MediaRow])(
      implicit spark: SparkSession): Dataset[VideoMeta] = {
    import spark.implicits._
    ds.filter((r: MediaRow) => r.meta.mediaType.startsWith("video/"))
      .mapPartitions { rows =>
        rows.map { r =>
          try {
            // RIFF magic → AVI walker; anything else → ISO-BMFF walker
            if (r.payload.length >= 4 && r.payload(0) == 'R' &&
                r.payload(1) == 'I' && r.payload(2) == 'F' &&
                r.payload(3) == 'F') {
              val a = Codec.parseAvi(r.payload)
              VideoMeta(r.media_id, ok = true, "", "AVI ",
                a.microSecPerFrame * a.totalFrames / 1000L,
                1000000L, a.nStreams, a.trackTypes)
            } else {
              val i = Codec.parseMp4(r.payload)
              VideoMeta(r.media_id, ok = true, "", i.majorBrand, i.durationMs,
                i.timescale, i.nTracks, i.trackTypes)
            }
          } catch { case e: Exception =>
            VideoMeta(r.media_id, ok = false,
              s"${e.getClass.getSimpleName}: ${e.getMessage}",
              "", 0L, 0L, 0, Nil)
          }
        }
      }
  }

  /** MP4 helpers exposed for tests/synthesis (the PNG/WAV pattern). */
  private[graft] def encodeMp4Skeleton(durationMs: Long, timescale: Long,
      handlers: Seq[String]): Array[Byte] =
    Codec.encodeMp4Skeleton(durationMs, timescale, handlers)
  private[graft] def parseMp4(payload: Array[Byte]): Mp4Info =
    Codec.parseMp4(payload)

  /** AVI/MJPEG helpers exposed for tests/synthesis. */
  private[graft] def encodeAviMjpeg(frames: Seq[BufferedImage],
      fps: Int): Array[Byte] = Codec.encodeAviMjpeg(frames, fps)
  private[graft] def parseAvi(payload: Array[Byte]): AviInfo =
    Codec.parseAvi(payload)
  private[graft] def decodeAviMjpegFrames(payload: Array[Byte],
      maxFrames: Int): IndexedSeq[BufferedImage] =
    Codec.decodeAviMjpegFrames(payload, maxFrames)

  /** PNG-encode helper exposed for tests/synthesis. */
  private[graft] def encodePng(img: BufferedImage): Array[Byte] = Codec.encodePng(img)
  private[graft] def decodeImage(payload: Array[Byte]): BufferedImage = Codec.decode(payload)
  private[graft] def encodeWavPcm16(samples: Array[Double], rate: Float): Array[Byte] =
    Codec.encodeWavPcm16(samples, rate)
  private[graft] def decodeWav(payload: Array[Byte]): Array[Double] =
    Codec.decodeWav(payload)

  private def isImage(meta: MediaMeta): Boolean = meta.mediaType.startsWith("image/")

  /** WAV containers the pure-JVM decoder handles; compressed audio
    * (mp3/aac/ogg) needs native codecs → stub path. */
  private def isWav(meta: MediaMeta): Boolean =
    meta.mediaType == "audio/wav" || meta.mediaType == "audio/x-wav" ||
      meta.mediaType == "audio/wave"

  /** AVI containers — REAL frame decode when the stream is MJPEG
    * (each frame a baseline JPEG); the one video format a pure JVM
    * decodes. mp4/h264 + webm/vp9 stay on the stub path. */
  private def isAvi(meta: MediaMeta): Boolean =
    meta.mediaType == "video/x-msvideo" || meta.mediaType == "video/avi"

  // ------------------------------------------------------------------
  // STUB: the non-image decode kernel. Audio/video codecs need native
  // libraries (ffmpeg etc.) absent from this environment, so those
  // rows get a deterministic fake feature vector derived from the
  // payload bytes — the distributed plumbing is identical to the real
  // image path above.
  // ------------------------------------------------------------------
  private[operators] def payloadHash(payload: Array[Byte]): Long = {
    var h = 1125899906842597L
    var i = 0
    while (i < payload.length) { h = h * 31L + payload(i); i += 1 }
    h
  }

  private[operators] def decodeStub(payloadHash: Long, dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = payloadHash
    var j = 0
    while (j < dim) {
      h = h * 6364136223846793005L + 1442695040888963407L
      out(j) = ((h >>> 40).toInt % 1000) / 1000.0f
      j += 1
    }
    out
  }

  /** Per-partition batched decode → feature extraction. Image rows
    * decode REAL pixels (javax.imageio) and emit strip-luminance
    * features; audio/video rows fall back to the marked stub. The
    * partition iterator shape mirrors a production codec pipeline:
    * amortized per-partition setup, row-at-a-time streaming (no
    * partition-wide materialization), typed output. An undecodable
    * payload emits a FLAGGED row (ok=false, empty features) instead
    * of failing the task — decode failure is data ([[MediaFeatures]]).
    */
  def extractFeatures(ds: Dataset[MediaRow], dim: Int)(
      implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    ds.mapPartitions { rows =>
      // codec/context init amortizes here, once per partition
      rows.map { r =>
        val h = payloadHash(r.payload)
        try {
          val feats =
            if (isImage(r.meta)) Codec.stripLuminance(Codec.decode(r.payload), dim)
            else if (isWav(r.meta)) Codec.stripRms(Codec.decodeWav(r.payload), dim)
            else if (isAvi(r.meta)) {
              // REAL video features: mean strip-luminance over the
              // decoded MJPEG frames (bounded per-row work)
              val frames = Codec.decodeAviMjpegFrames(r.payload, 64)
              val acc = new Array[Float](dim)
              frames.foreach { f =>
                val s = Codec.stripLuminance(f, dim)
                var i = 0
                while (i < dim) { acc(i) += s(i); i += 1 }
              }
              var i = 0
              while (i < dim) { acc(i) /= frames.length; i += 1 }
              acc
            }
            else decodeStub(h, dim) // STUB: mp4/webm + compressed-audio codecs are native-only
          MediaFeatures(r.media_id, r.payload.length.toLong, h, feats)
        } catch { case e: Exception =>
          MediaFeatures(r.media_id, r.payload.length.toLong, h,
            Array.empty[Float], ok = false,
            error = s"${e.getClass.getSimpleName}: ${e.getMessage}")
        }
      }
    }
  }

  /** Frame sampling STUB: byte-range slices standing in for keyframe
    * extraction — the partitioning/explode shape is the real one
    * (media row → many frame rows, each small enough to shuffle).
    * [[sampleFrameFeatures]] is the typed path with a REAL decode for
    * GIF containers. */
  def sampleFrames(df: DataFrame, payloadCol: String, nFrames: Int): DataFrame = {
    df.withColumn("frame",
        explode(sequence(lit(0), lit(nFrames - 1))))
      .withColumn("frame_bytes",
        expr(s"substring($payloadCol, frame * (length($payloadCol) / $nFrames) + 1, " +
          s"length($payloadCol) / $nFrames)"))
      .drop(payloadCol)
  }

  /** Per-frame features with a REAL multi-frame container path. */
  case class FrameFeatures(media_id: Long, frame: Int, features: Array[Float],
      ok: Boolean = true, error: String = "")

  /** Media-row → frame-rows with REAL per-frame pixels for GIF AND
    * AVI/MJPEG containers: GIF frames decode by progressive composite
    * (frames are deltas, so sampling still reads the whole container,
    * exactly like video keyframe extraction without an index);
    * AVI/MJPEG frames are standalone baseline JPEGs pulled straight
    * from their movi chunks. `nFrames` are sampled evenly across the
    * timeline, each emitting strip-luminance features over its
    * DECODED pixels. mp4/webm rows keep the clearly-marked
    * deterministic stub (their codecs are native-only); an
    * undecodable container emits one flagged row (frame = −1,
    * ok = false) instead of failing the task — the [[MediaFeatures]]
    * accounting stance. The explode happens inside mapPartitions:
    * frame rows (dim floats each) are what shuffles, never the
    * container payload. */
  def sampleFrameFeatures(ds: Dataset[MediaRow], nFrames: Int, dim: Int,
      maxFrames: Int = 1024)(
      implicit spark: SparkSession): Dataset[FrameFeatures] = {
    import spark.implicits._
    require(nFrames > 0, s"nFrames $nFrames must be positive")
    ds.mapPartitions { rows =>
      // codec init amortizes here, once per partition
      def sampled(r: MediaRow,
          decode: => IndexedSeq[BufferedImage]): Seq[FrameFeatures] =
        try {
          val frames = decode
          val n = frames.length
          val k = math.min(nFrames, n)
          (0 until k).map { j =>
            val fi = (j.toLong * n / k).toInt // even temporal sample
            FrameFeatures(r.media_id, j,
              Codec.stripLuminance(frames(fi), dim))
          }
        } catch { case e: Exception =>
          Seq(FrameFeatures(r.media_id, -1, Array.empty[Float], ok = false,
            error = s"${e.getClass.getSimpleName}: ${e.getMessage}"))
        }
      rows.flatMap { r =>
        if (isGif(r.meta))
          sampled(r, Codec.decodeGifFrames(r.payload, maxFrames))
        else if (isAvi(r.meta))
          sampled(r, Codec.decodeAviMjpegFrames(r.payload, maxFrames))
        else {
          // STUB: mp4/webm/compressed-audio frame decode needs native
          // codecs absent from this environment
          (0 until nFrames).map(j =>
            FrameFeatures(r.media_id, j,
              decodeStub(payloadHash(r.payload) * 31L + j, dim)))
        }
      }
    }
  }

  private def isGif(meta: MediaMeta): Boolean = meta.mediaType == "image/gif"

  /** Test/demo handle for the GIF synth pair (the encodeWavPcm16
    * stance: specs feed the operator REAL containers, not mocks). */
  private[graft] def encodeGifAnimated(frames: Seq[BufferedImage]): Array[Byte] =
    Codec.encodeGifAnimated(frames)

  /** Resize. Image rows: REAL decode → Java2D bilinear rescale →
    * PNG re-encode, with the metadata dims updated in the same row
    * mutation (payload and metadata must change together; a resize
    * that edits only metadata corrupts the corpus). Audio/video rows:
    * deterministic payload-resynthesis STUB honoring the same
    * size-tracks-area contract. Per-partition batching as in
    * [[extractFeatures]].
    *
    * Decode-failure policy: `skipUndecodable = false` (default) fails
    * the job loudly on the first corrupt payload — the right default
    * for a transform whose OUTPUT contract is "every row resized"
    * (silently passing a corrupt blob through would corrupt the
    * output corpus). Pass `true` for dirty corpora: undecodable rows
    * are DROPPED, and the caller reconciles counts (or runs
    * [[extractFeatures]] first, whose ok/error flags identify the bad
    * rows without failing). */
  def resize(ds: Dataset[MediaRow], width: Int, height: Int,
      skipUndecodable: Boolean = false)(
      implicit spark: SparkSession): Dataset[MediaRow] = {
    import spark.implicits._
    require(width > 0 && height > 0, s"bad target ${width}x$height")
    ds.mapPartitions { rows =>
      // codec/scaler context init amortizes here, once per partition
      rows.flatMap { r =>
        if (isImage(r.meta)) {
          val decoded =
            try Some(Codec.decode(r.payload))
            catch { case e: Exception =>
              if (skipUndecodable) None
              else throw new IllegalArgumentException(
                s"resize: undecodable payload for media_id=${r.media_id} " +
                  s"(${r.payload.length} bytes): ${e.getMessage}", e)
            }
          decoded.map { img =>
            val scaled = Codec.rescale(img, width, height)
            // payload is re-encoded as PNG, so mediaType AND codec must
            // follow — metadata that contradicts the bytes is corruption
            MediaRow(r.media_id, Codec.encodePng(scaled),
              r.meta.copy(mediaType = "image/png", width = width, height = height,
                codec = "png"))
          }
        } else Some {
          // STUB (non-image): unclamped resynthesis — an upscale
          // legitimately GROWS the payload; size and metadata track
          // together in both directions. Dimensionless media (audio:
          // 0×0) genuinely passes through UNCHANGED — a spatial
          // resize has no meaning for it, and regenerating bytes
          // would corrupt a decodable payload (real WAVs since r4).
          val srcArea = r.meta.width.toLong * r.meta.height
          if (srcArea <= 0) r
          else {
            val scale = (width.toLong * height).toDouble / srcArea
            val n = math.max(1, (r.payload.length * scale).toInt)
            val out = new Array[Byte](n)
            var h = payloadHash(r.payload)
            var i = 0
            while (i < n) {
              h = h * 6364136223846793005L + 1442695040888963407L
              out(i) = (h >>> 56).toByte
              i += 1
            }
            MediaRow(r.media_id, out,
              r.meta.copy(width = width, height = height))
          }
        }
      }
    }
  }

  /** 64-bit average-hash (aHash): rescale to 8×8, bit i set iff cell
    * luminance ≥ image mean. The standard cheap perceptual
    * fingerprint: stable under rescaling/re-encoding (what
    * content-addressing by byte digest — [[contentManifest]] —
    * cannot see), flipped by genuinely different content. */
  private[graft] def aHash64(img: BufferedImage): Long = {
    val small = Codec.rescale(img, 8, 8)
    val lum = new Array[Double](64)
    var i = 0
    while (i < 64) {
      val rgb = small.getRGB(i % 8, i / 8)
      lum(i) = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3.0
      i += 1
    }
    val mean = lum.sum / 64.0
    var bits = 0L
    i = 0
    while (i < 64) { if (lum(i) >= mean) bits |= 1L << i; i += 1 }
    bits
  }

  /** (media_id, phash) for the image rows: REAL decode + 8×8
    * average-hash, batched per partition like [[extractFeatures]].
    * Non-image rows are dropped (a perceptual IMAGE hash has no
    * meaning for audio bytes), and so are UNDECODABLE image rows — a
    * hash of garbage bytes would only produce spurious near-dup
    * pairs; run [[extractFeatures]] for per-row failure accounting. */
  def perceptualHashes(ds: Dataset[MediaRow])(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    ds.mapPartitions { rows =>
      // codec init amortizes here, once per partition
      rows.filter(r => isImage(r.meta))
        .flatMap { r =>
          try Some((r.media_id, aHash64(Codec.decode(r.payload))))
          catch { case _: Exception => None }
        }
    }.toDF("media_id", "phash")
  }

  /** Perceptual near-duplicate image pairs: aHash signatures into the
    * SAME pigeonhole block join the text simhash uses
    * ([[Dedup.hammingPairs]] — linear bucket join, never all-pairs).
    * The multimodal completion of the dedup family: contentManifest
    * catches byte-identical payloads; this catches re-encoded /
    * resized / lightly-edited copies of the same picture.
    *
    * @return (media_a, media_b, hamming), media_a < media_b.
    */
  def phashNearDups(ds: Dataset[MediaRow], maxHamming: Int)(
      implicit spark: SparkSession): DataFrame =
    Dedup.hammingPairs(perceptualHashes(ds), "media_id", "phash", maxHamming)
      .select(col("id_a").as("media_a"), col("id_b").as("media_b"), col("hamming"))

  /** Deterministic synthetic media table for tests/demos. Even ids
    * are REAL PNG images (id-seeded LCG pixels, varying dimensions —
    * decodable by any compliant reader); odd ids are REAL mono PCM
    * WAVs (id-seeded LCG samples — decodable by any compliant
    * reader). */
  def syntheticMedia(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n.toLong).map { id =>
      if (id % 2 == 0) {
        val w = 96 + (id % 5).toInt * 16
        val h = 64 + (id % 3).toInt * 16
        val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
        var seed = id * 6364136223846793005L + 1442695040888963407L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            seed = seed * 6364136223846793005L + 1442695040888963407L
            img.setRGB(x, y, ((seed >>> 40) & 0xffffff).toInt)
            x += 1
          }
          y += 1
        }
        MediaRow(id, Codec.encodePng(img),
          MediaMeta("image/png", w, h, 0L, "png"))
      } else {
        val rate = 8000f
        val nSamples = 2048 + (id % 64).toInt * 32
        var seed = id * 6364136223846793005L + 1442695040888963407L
        val samples = Array.fill(nSamples) {
          seed = seed * 6364136223846793005L + 1442695040888963407L
          ((seed >>> 40).toInt % 1000) / 1000.0 * 0.8
        }
        MediaRow(id, Codec.encodeWavPcm16(samples, rate),
          MediaMeta("audio/wav", 0, 0, (nSamples * 1000L) / rate.toLong, "pcm_s16le"))
      }
    }
  }
}
