package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.functions.{Html, Urls}
import graft.streaming.ExtractStream

/** Batch/stream parity for the extraction family: the streaming
  * twins are the SAME stateless Columns as the gated batch queries,
  * so feeding the same pages across micro-batches must emit exactly
  * the batch results (append mode, no state, no watermark). */
class ExtractStreamSpec extends SparkSpec {
  import spark.implicits._

  implicit private def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val pages: Seq[ExtractStream.Page] = (0L until 24L).map { i =>
    ExtractStream.Page(i,
      s"""<html><head><title>doc $i</title><script>t($i)</script></head>
         |<body><nav>Home</nav><h1>h$i</h1><p>alpha $i beta</p>
         |<a href="HTTPS://S${i % 3}.COM:443/p/?utm_a=1&q=$i#f">x</a>
         |<a href="http://c${i % 2}.net:80/a//">y</a></body></html>""".stripMargin)
  }

  private def runStream(f: org.apache.spark.sql.Dataset[ExtractStream.Page] =>
      org.apache.spark.sql.DataFrame, name: String): Set[String] = {
    val mem = MemoryStream[ExtractStream.Page]
    val q = f(mem.toDS()).writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    try pages.grouped(7).foreach { b => mem.addData(b); q.processAllAvailable() }
    finally q.stop()
    spark.table(name).collect().map(_.mkString("|")).toSet
  }

  test("extractStream ≡ the batch extraction columns, across micro-batches") {
    val batch = pages.toDF().select(col("doc_id"),
        Html.titleFromHtml(col("html")).as("title"),
        Html.textFromHtml(col("html")).as("body"))
      .collect().map(_.mkString("|")).toSet
    assert(runStream(ExtractStream.extractStream(_), "ex_par") === batch)
    assert(batch.exists(_.contains("doc 3|doc 3 h3 alpha 3 beta x y")))
  }

  test("ingestStream: mangled bytes → repaired text → extraction ≡ batch, across micro-batches") {
    // three charset regimes per page family: latin-1 bytes (invalid
    // UTF-8 → cp1252 fallback), UTF-16 with BOM, plain UTF-8
    val raws: Seq[ExtractStream.RawPage] = pages.map { p =>
      val mangledHtml = p.html.replace("alpha", "Café à")
      val bytes = (p.doc_id % 3) match {
        case 0 => mangledHtml.getBytes("ISO-8859-1")
        case 1 => mangledHtml.getBytes("UTF-16")
        case _ => mangledHtml.getBytes("UTF-8")
      }
      ExtractStream.RawPage(p.doc_id, bytes)
    }
    val batch = raws.toDF()
      .select(col("doc_id"),
        Html.titleFromHtml(
          graft.functions.expr.NativeFunctions.charset_decode(col("raw"))).as("title"),
        Html.textFromHtml(
          graft.functions.expr.NativeFunctions.charset_decode(col("raw"))).as("body"))
      .collect().map(_.mkString("|")).toSet
    val mem = MemoryStream[ExtractStream.RawPage]
    val q = ExtractStream.ingestStream(mem.toDS()).writeStream
      .outputMode("append").format("memory").queryName("ing_par").start()
    try raws.grouped(7).foreach { b => mem.addData(b); q.processAllAvailable() }
    finally q.stop()
    val streamed = spark.table("ing_par").collect().map(_.mkString("|")).toSet
    assert(streamed === batch)
    // the accents survived every byte regime (decode really repaired)
    assert(streamed.exists(_.contains("Café à 3")))
  }

  test("frontierStream: canonicalize + robots gate ≡ batch, across micro-batches") {
    val robots = "User-agent: *\nDisallow: /private/*\nAllow: /private/pub$\n"
    val links: Seq[ExtractStream.FrontierLink] = (0L until 20L).map { i =>
      val url = (i % 4) match {
        case 0 => s"HTTPS://A.COM:443/public/$i?utm_x=1"
        case 1 => s"https://a.com/private/x$i"
        case 2 => "https://a.com/private/pub"
        case _ => s"https://A.com/Private/$i" // case-SENSITIVE path survives
      }
      ExtractStream.FrontierLink(url, robots)
    }
    val batch = links.toDF()
      .select(graft.functions.Urls.canonicalize(col("url")).as("u"))
      .collect().map(_.getString(0))
    val mem = MemoryStream[ExtractStream.FrontierLink]
    val q = ExtractStream.frontierStream(mem.toDS(), "bot").writeStream
      .outputMode("append").format("memory").queryName("fr_par").start()
    try links.grouped(6).foreach { b => mem.addData(b); q.processAllAvailable() }
    finally q.stop()
    val got = spark.table("fr_par").collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(got.size === batch.distinct.size)
    assert(got("https://a.com/public/4") === true)
    assert(got("https://a.com/private/x1") === false, "Disallow /private/* gates")
    assert(got("https://a.com/private/pub") === true, "$-anchored Allow wins")
    // URL canonicalization lowercases the HOST, not the path — the
    // mixed-case /Private path does NOT match the /private rule
    assert(got("https://a.com/Private/3") === true)
  }

  test("linkStream ≡ the batch link extraction, canonicalized, across micro-batches") {
    val batch = pages.toDF()
      .select(col("doc_id"),
        posexplode(regexp_extract_all(col("html"), lit("href=\"([^\"]+)\""), lit(1))))
      .select(col("doc_id"), (col("pos") + 1).cast("int").as("link_pos"),
        Urls.canonicalize(col("col")).as("canonical_url"))
      .collect().map(_.mkString("|")).toSet
    val got = runStream(ExtractStream.linkStream(_), "lk_par")
    assert(got === batch)
    assert(got.contains("3|1|https://s0.com/p?q=3"))
    assert(got.contains("3|2|http://c1.net/a"))
  }
}
