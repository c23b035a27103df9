package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML-to-text extraction — the raw-crawl→text step that runs BEFORE
  * every quality gate in a web-corpus pipeline: a crawl delivers
  * markup, the tokenizers/dedup/classifiers all want prose. The
  * contract (deliberately small and oracle-replayable — this is a
  * boilerplate stripper, not a browser): drop `script`/`style`
  * payloads and `nav` boilerplate wholesale, strip remaining tags to
  * a space, collapse whitespace runs, trim.
  *
  * [[textFromHtml]] is the native fused scan
  * ([[graft.functions.expr.HtmlText]], codegen'd).
  * [[textFromHtmlColumns]] is the same contract as a 5-step regex
  * Column chain — the executable spec the native path is
  * property-tested against (HtmlSpec) and the form the DuckDB oracle
  * replays verbatim (RE2 supports every pattern; flags 'gs').
  */
object Html {

  /** Native single-pass-per-stage extraction. Output identical to
    * [[textFromHtmlColumns]]. */
  def textFromHtml(html: Column): Column =
    graft.functions.expr.NativeFunctions.html_text(html)

  /** The regex-chain formulation — retained as the executable
    * contract and the oracle's SQL shape. */
  def textFromHtmlColumns(html: Column): Column = {
    val noScript = regexp_replace(html, "(?s)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?s)<style[^>]*>.*?</style>", " ")
    val noNav = regexp_replace(noStyle, "(?s)<nav[^>]*>.*?</nav>", " ")
    val noTags = regexp_replace(noNav, "<[^>]*>", " ")
    // explicit class, not \s: java \s includes \x0B but RE2's (the
    // oracle engine's) does not — the explicit set means the SAME
    // characters collapse in Spark, in the native scan, and in the
    // DuckDB replay
    trim(regexp_replace(noTags, "[ \\t\\n\\x0B\\f\\r]+", " "))
  }

  /** First `<title>…</title>` payload (empty when absent) — the
    * page-metadata column a crawl keeps beside the body text. */
  def titleFromHtml(html: Column): Column =
    regexp_extract(html, "(?s)<title>(.*?)</title>", 1)
}
