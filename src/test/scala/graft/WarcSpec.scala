package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.functions.Html
import graft.sources.Warc
import graft.streaming.ExtractStream

/** WARC/CDX ingestion gate (the multi_format_source convention: a
  * synthesized container round-trips through the source and the
  * parsed rows feed the gated extraction operators — batch AND
  * stream). Covers: plain + member-gzip framing, record filtering,
  * HTTP envelope peeling, charset repair on real latin-1 bytes, and
  * the CDX index surface. */
class WarcSpec extends SparkSpec {
  import spark.implicits._

  implicit private def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def crlf(lines: Seq[String]): Array[Byte] =
    lines.mkString("", "\r\n", "\r\n").getBytes("UTF-8")

  private def warcRecord(typ: String, uri: String, date: String,
      contentType: String, block: Array[Byte]): Array[Byte] = {
    val head = crlf(Seq(
      "WARC/1.0",
      s"WARC-Type: $typ",
      s"WARC-Record-ID: <urn:uuid:$typ-${uri.hashCode}>",
      s"WARC-Date: $date") ++
      (if (uri.nonEmpty) Seq(s"WARC-Target-URI: <$uri>") else Nil) ++ Seq(
      s"Content-Type: $contentType",
      s"Content-Length: ${block.length}",
      ""))
    head ++ block ++ "\r\n\r\n".getBytes("UTF-8")
  }

  private def httpBlock(status: Int, mime: String,
      body: Array[Byte]): Array[Byte] =
    crlf(Seq(
      s"HTTP/1.1 $status X",
      s"Content-Type: $mime",
      s"Content-Length: ${body.length}",
      "")) ++ body

  private val htmlCp1252 =
    ("<html><head><title>Café page</title></head><body><nav>n</nav>" +
      "<p>Voilà ü</p><a href=\"HTTPS://A.COM:443/x/?utm_s=1&q=2\">l</a>" +
      "</body></html>").getBytes("ISO-8859-1")
  private val htmlUtf8 =
    ("<html><head><meta charset=\"utf-8\"><title>plain</title></head>" +
      "<body><p>héllo</p><a href=\"http://b.net:80/y//\">m</a></body></html>")
      .getBytes("UTF-8")

  private def segment: Array[Byte] =
    warcRecord("warcinfo", "", "2026-01-02T03:04:05Z",
      "application/warc-fields", "software: graft-test\r\n".getBytes("UTF-8")) ++
    warcRecord("request", "https://a.com/x/", "2026-01-02T03:04:06Z",
      "application/http; msgtype=request",
      "GET /x/ HTTP/1.1\r\n\r\n".getBytes("UTF-8")) ++
    warcRecord("response", "https://a.com/x/", "2026-01-02T03:04:06Z",
      "application/http; msgtype=response",
      httpBlock(200, "text/html; charset=ISO-8859-1", htmlCp1252)) ++
    warcRecord("response", "http://b.net/y", "2026-01-02T03:05:00Z",
      "application/http; msgtype=response",
      httpBlock(200, "text/html", htmlUtf8)) ++
    warcRecord("response", "https://a.com/gone", "2026-01-02T03:06:00Z",
      "application/http; msgtype=response",
      httpBlock(404, "text/html", "<html>gone</html>".getBytes("UTF-8"))) ++
    warcRecord("response", "https://a.com/img", "2026-01-02T03:07:00Z",
      "application/http; msgtype=response",
      httpBlock(200, "image/png", Array[Byte](1, 2, 3)))

  private def gzipMembers(recs: Seq[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    recs.foreach { r =>
      val g = new java.util.zip.GZIPOutputStream(out)
      g.write(r); g.finish()
    }
    out.toByteArray
  }

  private def writeTmp(name: String, bytes: Array[Byte]): Path = {
    val dir = Files.createTempDirectory("graft_warc")
    val p = dir.resolve(name)
    Files.write(p, bytes)
    p
  }

  test("plain WARC: every record framed, typed, dated") {
    val p = writeTmp("seg.warc", segment)
    val recs = Warc.read(spark, p.toString).collect()
    assert(recs.length === 6)
    assert(recs.map(_.warc_type).toSeq ===
      Seq("warcinfo", "request", "response", "response", "response", "response"))
    val r = recs(2)
    assert(r.target_uri === "https://a.com/x/")
    assert(r.warc_date.toInstant.toString === "2026-01-02T03:04:06Z")
    assert(r.content_type.startsWith("application/http"))
  }

  test("member-gzip WARC parses identically to the plain form") {
    val recs = Seq(
      warcRecord("warcinfo", "", "2026-01-02T03:04:05Z",
        "application/warc-fields", "software: graft-test\r\n".getBytes("UTF-8")),
      warcRecord("response", "https://a.com/x/", "2026-01-02T03:04:06Z",
        "application/http; msgtype=response",
        httpBlock(200, "text/html; charset=ISO-8859-1", htmlCp1252)))
    val p = writeTmp("seg.warc.gz", gzipMembers(recs))
    val got = Warc.read(spark, p.toString).collect()
    assert(got.length === 2)
    assert(got(1).warc_type === "response")
    assert(got(1).target_uri === "https://a.com/x/")
  }

  test("responses(): HTTP envelope peeled, request/warcinfo dropped") {
    val p = writeTmp("seg.warc", segment)
    val rs = Warc.responses(Warc.read(spark, p.toString))
      .collect().sortBy(_.url)
    assert(rs.map(r => (r.url, r.http_status, r.mime)).toSeq === Seq(
      ("http://b.net/y", 200, "text/html"),
      ("https://a.com/gone", 404, "text/html"),
      ("https://a.com/img", 200, "image/png"),
      ("https://a.com/x/", 200, "text/html")))
    assert(rs.find(_.url == "https://a.com/img").get.body.toSeq ===
      Seq[Byte](1, 2, 3))
  }

  test("pages(): 2xx html only, charset-repaired — feeds the gated extraction") {
    val p = writeTmp("seg.warc", segment)
    val pages = Warc.pages(Warc.read(spark, p.toString))
    val got = pages.select(col("url"),
        Html.titleFromHtml(col("html")).as("title"),
        Html.textFromHtml(col("html")).as("body"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    // the cp1252 body decoded é/à/ü correctly (raw bytes are NOT utf-8)
    assert(got === Set(
      ("https://a.com/x/", "Café page", "Café page Voilà ü l"),
      ("http://b.net/y", "plain", "plain héllo m")))
    // link extraction + canonicalization off the same pages
    val links = pages
      .select(posexplode(regexp_extract_all(col("html"),
        lit("href=\"([^\"]+)\""), lit(1))))
      .select(graft.functions.Urls.canonicalize(col("col")).as("u"))
      .as[String].collect().toSet
    assert(links === Set("https://a.com/x?q=2", "http://b.net/y"))
  }

  test("ExtractStream fed from WARC pages ≡ the batch extraction") {
    val p = writeTmp("seg.warc", segment)
    val pages = Warc.pages(Warc.read(spark, p.toString))
      .orderBy("url").collect()
      .zipWithIndex.map { case (r, i) => ExtractStream.Page(i.toLong, r.getString(2)) }
    val mem = MemoryStream[ExtractStream.Page]
    val q = ExtractStream.extractStream(mem.toDS()).writeStream
      .outputMode("append").format("memory").queryName("warc_ex").start()
    try { mem.addData(pages.toSeq); q.processAllAvailable() } finally q.stop()
    val streamed = spark.table("warc_ex").collect()
      .map(r => (r.getString(1), r.getString(2))).toSet
    assert(streamed === Set(
      ("plain", "plain héllo m"),
      ("Café page", "Café page Voilà ü l")))
  }

  test("truncated and malformed segments fail loudly, not silently short") {
    // a segment cut mid-block must throw (framing is Content-Length;
    // silently dropping the tail would under-count a crawl), and a
    // non-WARC payload must be rejected at the version line
    // cut mid-block: the Content-Length framing detects the short read
    val r2start = segment.indexOfSlice("WARC/1.0".getBytes("UTF-8"), 1)
    val cutMidBlock = segment.take(segment.length - 10)
    val p1 = writeTmp("cut.warc", cutMidBlock)
    val e1 = intercept[org.apache.spark.SparkException] {
      Warc.read(spark, p1.toString).collect()
    }
    assert(e1.toString.contains("truncated"), s"unexpected failure: $e1")
    // cut mid-headers: the missing Content-Length is equally fatal
    val cutMidHeaders = segment.take(r2start + 40)
    val p1b = writeTmp("cuth.warc", cutMidHeaders)
    val e1b = intercept[org.apache.spark.SparkException] {
      Warc.read(spark, p1b.toString).collect()
    }
    assert(e1b.toString.contains("Content-Length") ||
      e1b.toString.contains("truncated"), s"unexpected failure: $e1b")
    val p2 = writeTmp("junk.warc", "HTTP/1.1 200 OK\r\n\r\nnope".getBytes("UTF-8"))
    val e2 = intercept[org.apache.spark.SparkException] {
      Warc.read(spark, p2.toString).collect()
    }
    assert(e2.toString.contains("WARC") || e2.getMessage.contains("WARC"))
  }

  test("readCdx: CommonCrawl-shape index lines surface the record byte ranges") {
    val lines = Seq(
      """com,a)/x 20260102030406 {"url": "https://a.com/x/", "mime": "text/html", "status": "200", "digest": "SHA", "length": "512", "offset": "340", "filename": "seg.warc.gz"}""",
      "",
      """net,b)/y 20260102030500 {"url": "http://b.net/y", "mime": "text/html", "status": "200", "digest": "SHB", "length": "600", "offset": "852", "filename": "seg.warc.gz"}""")
    val p = writeTmp("idx.cdx", lines.mkString("\n").getBytes("UTF-8"))
    val got = Warc.readCdx(spark, p.toString).orderBy("urlkey").collect()
    assert(got.length === 2)
    val r0 = got(0)
    assert(r0.getAs[String]("urlkey") === "com,a)/x")
    assert(r0.getAs[java.sql.Timestamp]("capture_ts").toInstant.toString ===
      "2026-01-02T03:04:06Z")
    assert(r0.getAs[String]("url") === "https://a.com/x/")
    assert(r0.getAs[Int]("status") === 200)
    assert(r0.getAs[Long]("offset") === 340L)
    assert(r0.getAs[Long]("length") === 512L)
    assert(r0.getAs[String]("filename") === "seg.warc.gz")
  }

  test("capture_ts parses as UTC regardless of session timezone") {
    val line =
      """com,a)/x 20260102030406 {"url": "https://a.com/x/", "mime": "text/html", "status": "200", "digest": "SHA", "length": "512", "offset": "340", "filename": "seg.warc.gz"}"""
    val p = writeTmp("idx_tz.cdx", line.getBytes("UTF-8"))
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
      val ts = Warc.readCdx(spark, p.toString)
        .select("capture_ts").collect()(0).getTimestamp(0)
      assert(ts.toInstant.toString === "2026-01-02T03:04:06Z")
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("fetchRecords: CDX byte ranges pull single records ≡ the full scan") {
    // the 6-record segment as one member-gzip file, with the exact
    // (offset, length) of every member — what a CDX indexer records
    val members = Seq(
      warcRecord("warcinfo", "", "2026-01-02T03:04:05Z",
        "application/warc-fields", "software: graft-test\r\n".getBytes("UTF-8")),
      warcRecord("request", "https://a.com/x/", "2026-01-02T03:04:06Z",
        "application/http; msgtype=request",
        "GET /x/ HTTP/1.1\r\n\r\n".getBytes("UTF-8")),
      warcRecord("response", "https://a.com/x/", "2026-01-02T03:04:06Z",
        "application/http; msgtype=response",
        httpBlock(200, "text/html; charset=ISO-8859-1", htmlCp1252)),
      warcRecord("response", "http://b.net/y", "2026-01-02T03:05:00Z",
        "application/http; msgtype=response",
        httpBlock(200, "text/html", htmlUtf8)),
      warcRecord("response", "https://a.com/gone", "2026-01-02T03:06:00Z",
        "application/http; msgtype=response",
        httpBlock(404, "text/html", "<html>gone</html>".getBytes("UTF-8"))),
      warcRecord("response", "https://a.com/img", "2026-01-02T03:07:00Z",
        "application/http; msgtype=response",
        httpBlock(200, "image/png", Array[Byte](1, 2, 3))))
    val gzMembers = members.map(m => gzipMembers(Seq(m)))
    val offsets = gzMembers.scanLeft(0L)(_ + _.length)
    val segPath = writeTmp("seg_ra.warc.gz", gzMembers.reduce(_ ++ _))

    val full = Warc.read(spark, segPath.toString).collect()
      .map(r => (r.warc_type, r.record_id, r.target_uri, r.warc_date,
        r.content_type, r.content.toSeq))

    // fetch a SELECTED subset (records 2 and 4) without scanning
    val picks = Seq(2, 4)
    val cdx = picks.map(i =>
        ("seg_ra.warc.gz", offsets(i), gzMembers(i).length.toLong))
      .toDF("filename", "offset", "length")
    val fetched = Warc.fetchRecords(cdx, segPath.getParent.toString).collect()
      .map(r => (r.warc_type, r.record_id, r.target_uri, r.warc_date,
        r.content_type, r.content.toSeq))

    assert(fetched.toSet === picks.map(full).toSet)
    assert(fetched.length === picks.length)
  }

  test("fetchRecords at CDX fan-out: many segments × many records, " +
      "one contiguous forward-only run per (partition, segment)") {
    // the 100 TB shape (r16 verdict item 6): thousands of CDX hits
    // spread over many segments — not a selected subset of one. 24
    // member-gzip segments × 40 records = 960 positioned reads.
    val base = Files.createTempDirectory("graft_warc_fan")
    val all = (0 until 24).flatMap { s =>
      val members = (0 until 40).map { i =>
        warcRecord("response", s"https://h$s.example/p$i",
          "2026-01-02T03:04:06Z", "application/http; msgtype=response",
          httpBlock(200, "text/html", s"<html>seg$s rec$i</html>".getBytes("UTF-8")))
      }
      val gz = members.map(m => gzipMembers(Seq(m)))
      val offsets = gz.scanLeft(0L)(_ + _.length)
      Files.write(base.resolve(f"seg_$s%02d.warc.gz"), gz.reduce(_ ++ _))
      gz.indices.map(i =>
        (f"seg_$s%02d.warc.gz", offsets(i), gz(i).length.toLong, s, i))
    }
    // deterministic scramble: the CONTRACT (repartition + in-partition
    // sort), not friendly input order, must provide the grouping
    val cdx = all.sortBy { case (f, o, _, _, _) => (o * 31 + f.hashCode) }
      .map { case (f, o, l, _, _) => (f, o, l) }
      .toDF("filename", "offset", "length")
    val fetched = Warc.fetchRecords(cdx, base.toString).collect()
    assert(fetched.length === 24 * 40)
    assert(fetched.map(_.target_uri).toSet ===
      (for (s <- 0 until 24; i <- 0 until 40)
        yield s"https://h$s.example/p$i").toSet)
    // the one-open-per-(task, file) + forward-only invariant the
    // implementation's open-on-name-change logic relies on: after the
    // same repartition + sortWithinPartitions stage, every partition
    // holds each filename as ONE contiguous run with strictly
    // increasing offsets inside it
    val runs = cdx
      .repartition(col("filename"))
      .sortWithinPartitions(col("filename"), col("offset"))
      .select(col("filename").cast("string"), col("offset").cast("long"))
      .as[(String, Long)]
      .mapPartitions { it =>
        val rows = it.toVector
        val runFiles = scala.collection.mutable.ArrayBuffer.empty[String]
        rows.foreach { case (f, _) =>
          if (runFiles.isEmpty || runFiles.last != f) runFiles += f
        }
        // strict offset increase within each filename run
        var monotonic = true
        rows.groupBy(_._1).foreach { case (_, rs) =>
          val offs = rs.map(_._2)
          if (offs != offs.sorted || offs.distinct.length != offs.length)
            monotonic = false
        }
        Iterator.single((runFiles.toVector, monotonic))
      }.collect()
    runs.foreach { case (runFiles, monotonic) =>
      assert(runFiles.distinct.length === runFiles.length,
        s"a segment appears in two separated runs: $runFiles")
      assert(monotonic, "offsets not strictly increasing within a run")
    }
  }

  test("fetchRecords on a plain (uncompressed) segment") {
    val members = Seq(
      warcRecord("response", "https://a.com/x/", "2026-01-02T03:04:06Z",
        "application/http; msgtype=response",
        httpBlock(200, "text/html", htmlUtf8)),
      warcRecord("response", "http://b.net/y", "2026-01-02T03:05:00Z",
        "application/http; msgtype=response",
        httpBlock(200, "text/html", htmlUtf8)))
    val offsets = members.scanLeft(0L)(_ + _.length)
    val segPath = writeTmp("seg_plain_ra.warc", members.reduce(_ ++ _))
    val cdx = Seq(("seg_plain_ra.warc", offsets(1), members(1).length.toLong))
      .toDF("filename", "offset", "length")
    val got = Warc.fetchRecords(cdx, segPath.getParent.toString).collect()
    assert(got.length === 1)
    assert(got(0).target_uri === "http://b.net/y")
  }
}
