package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing (SURVEY.md §2c).
  *
  * Media payloads are opaque `binary` columns with a typed metadata
  * struct riding alongside — the schema a 100 TB multimodal corpus
  * actually uses (payload bytes never parsed by Catalyst; metadata
  * prunable/pushable). Real codecs are NOT available in this
  * environment, so the decode kernels are STUBBED with deterministic
  * fakes (clearly marked below); everything around them — schema,
  * batch iteration shape, partition-level processing, output
  * contracts — is real and tested.
  */
object Multimodal {

  /** Typed metadata carried next to the payload. */
  case class MediaMeta(mediaType: String, width: Int, height: Int,
      durationMs: Long, codec: String)

  case class MediaRow(media_id: Long, payload: Array[Byte], meta: MediaMeta)

  case class MediaFeatures(media_id: Long, n_bytes: Long, checksum: Long,
      features: Array[Float])

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
  // STUB: the decode kernel. In production this calls the native
  // codec (libjpeg/ffmpeg/...) per batch inside mapPartitions (one
  // codec init per partition, not per row). Here it derives a
  // deterministic fake feature vector from the payload bytes so the
  // distributed plumbing is exercised end-to-end.
  // ------------------------------------------------------------------
  private[operators] def payloadHash(payload: Array[Byte]): Long = {
    var h = 1125899906842597L
    var i = 0
    while (i < payload.length) { h = h * 31L + payload(i); i += 1 }
    h
  }

  /** Features derived from the payload hash — one payload scan feeds
    * both the checksum and the fake features (a real decoder would
    * likewise read the bytes once). */
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

  /** Per-partition batched "decode" → feature extraction. The
    * partition iterator shape mirrors a real codec pipeline: amortized
    * per-partition setup, row-at-a-time streaming (no partition-wide
    * materialization), typed output. */
  def extractFeatures(ds: Dataset[MediaRow], dim: Int)(
      implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    ds.mapPartitions { rows =>
      // production: codec/context init here, once per partition
      rows.map { r =>
        val h = payloadHash(r.payload) // single pass over the bytes
        MediaFeatures(r.media_id, r.payload.length.toLong, h,
          decodeStub(h, dim))
      }
    }
  }

  /** Frame sampling STUB: byte-range slices standing in for keyframe
    * extraction — the partitioning/explode shape is the real one
    * (media row → many frame rows, each small enough to shuffle). */
  def sampleFrames(df: DataFrame, payloadCol: String, nFrames: Int): DataFrame = {
    df.withColumn("frame",
        explode(sequence(lit(0), lit(nFrames - 1))))
      .withColumn("frame_bytes",
        expr(s"substring($payloadCol, frame * (length($payloadCol) / $nFrames) + 1, " +
          s"length($payloadCol) / $nFrames)"))
      .drop(payloadCol)
  }

  /** Resize STUB: returns rows with updated dimension metadata and a
    * deterministically re-derived payload whose size scales with the
    * target area — the real op's contract (payload AND metadata must
    * change together; a resize that edits only metadata corrupts the
    * corpus). Per-partition batching mirrors extractFeatures: one
    * scaler init per partition in production. */
  def resize(ds: Dataset[MediaRow], width: Int, height: Int)(
      implicit spark: SparkSession): Dataset[MediaRow] = {
    import spark.implicits._
    require(width > 0 && height > 0, s"bad target ${width}x$height")
    ds.mapPartitions { rows =>
      // production: scaler/codec context init here, once per partition
      rows.map { r =>
        // unclamped: an upscale legitimately GROWS the payload — size
        // and metadata must track together in both directions
        val scale =
          (width.toLong * height).toDouble / (r.meta.width.toLong * r.meta.height)
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

  /** Deterministic synthetic media table for tests/demos: payload
    * bytes derived from the id. */
  def syntheticMedia(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n.toLong).map { id =>
      val bytes = Array.tabulate[Byte](64 + (id % 64).toInt)(i => ((id * 31 + i) % 127).toByte)
      MediaRow(id, bytes,
        MediaMeta(if (id % 2 == 0) "image/png" else "audio/wav",
          640, 480, id * 10, "fake"))
    }
  }
}
