package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.functions.{Html, Urls}

/** Streaming twin of the extraction family (text_extract_html /
  * text_extract_links): raw crawled pages arrive as a stream, text
  * and outlinks leave as streams. Both transforms are STATELESS
  * per-row maps — append mode, no watermark, no state store — so
  * they compose with any upstream source, never block on event time,
  * and are exactly the batch Columns run by the gated queries
  * (parity spec: ExtractStreamSpec feeds the same pages in
  * micro-batches and asserts set-equality with the batch plans).
  *
  * Scale shape: this is the front of the continuous-ingestion
  * pipeline — extraction happens ONCE per fetched page at ingest,
  * and every downstream standing-index probe (dedup, decon, quality)
  * consumes the extracted text, never the markup.
  */
object ExtractStream {

  /** A fetched page: id + raw markup. */
  final case class Page(doc_id: Long, html: String)

  /** (doc_id, title, body) per page — the text_extract_html twin. */
  def extractStream(pages: Dataset[Page]): DataFrame =
    pages.select(col("doc_id"),
      Html.titleFromHtml(col("html")).as("title"),
      Html.textFromHtml(col("html")).as("body"))

  /** (doc_id, link_pos, canonical_url) per href — the
    * text_extract_links twin; in-row explode keeps it stateless. */
  def linkStream(pages: Dataset[Page]): DataFrame =
    pages
      .select(col("doc_id"),
        posexplode(regexp_extract_all(col("html"),
          lit("href=\"([^\"]+)\""), lit(1))))
      .select(col("doc_id"), (col("pos") + 1).cast("int").as("link_pos"),
        Urls.canonicalize(col("col")).as("canonical_url"))

  /** A fetched page BEFORE decoding: id + the raw bytes a crawl
    * actually delivers (the [[graft.sources.Warc]] response body). */
  final case class RawPage(doc_id: Long, raw: Array[Byte])

  /** A frontier candidate: a discovered link plus the target host's
    * robots.txt payload (joined on by the frontier enrichment —
    * robots is per-host state, kilobytes, broadcast at scale). */
  final case class FrontierLink(url: String, robots: String)

  /** Crawl-frontier gate (r14): canonicalize each discovered URL and
    * evaluate the host's robots.txt for `agent` — the politeness +
    * dedup-key step between link extraction and the fetch queue, as
    * one stateless per-row map (append mode, no state store). Emits
    * (canonical_url, allowed); the caller keeps allowed=true rows
    * and dedups on the canonical key downstream. */
  def frontierStream(links: Dataset[FrontierLink], agent: String): DataFrame = {
    import graft.functions.expr.NativeFunctions.robots_allowed
    val canonical = Urls.canonicalize(col("url"))
    // the rule path is the URL's path+query (robots matches from the
    // first octet after the authority) — derived from the CANONICAL
    // form so equivalent messy spellings gate identically
    val path = regexp_replace(canonical, "^[a-z0-9+.-]+://[^/]*", "")
    links.select(
      canonical.as("canonical_url"),
      robots_allowed(col("robots"),
        when(path === "", lit("/")).otherwise(path), agent).as("allowed"))
  }

  /** Byte-level ingest twin (r14): charset sniff + decode repair
    * fused in front of the extraction — the full crawl front
    * (bytes → repaired text → title/body) as ONE stateless per-row
    * map, so a WARC-fed stream needs no separate decode hop and no
    * mis-decoded page can poison downstream standing indexes. Same
    * contract as extractStream over
    * [[graft.functions.expr.CharsetDecode]]'s output (parity spec:
    * mangled bytes across micro-batches ≡ the batch columns). */
  def ingestStream(pages: Dataset[RawPage]): DataFrame = {
    import graft.functions.expr.NativeFunctions.charset_decode
    val html = charset_decode(col("raw"))
    pages.select(col("doc_id"),
      Html.titleFromHtml(html).as("title"),
      Html.textFromHtml(html).as("body"))
  }
}
