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
