package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the first step of web-crawl dedup: distinct
  * fetches of the same resource (case-jittered scheme/host, default
  * ports, tracking params, fragments, trailing slashes) must collapse
  * to one key BEFORE content dedup ever runs.
  *
  * [[canonicalize]] is the native single-pass
  * [[graft.functions.expr.UrlCanonicalize]] expression (codegen'd, one
  * scan per row). [[canonicalizeColumns]] keeps the original Column
  * regex/array formulation — ~10 regex engines per row, the 3.4×-over-
  * oracle constant the r12 bench flagged — as the executable contract
  * the native path is property-spec'd against (UrlCanonSpec).
  */
object Urls {

  private val scheme = "^([A-Za-z][A-Za-z0-9+.-]*)://"
  // non-capturing variant: host/path extraction patterns must keep
  // group 1 for their own capture
  private val schemeNc = "^(?:[A-Za-z][A-Za-z0-9+.-]*)://"

  /** Tracking params dropped during canonicalization. */
  val trackingParamPattern = "^(utm_[A-Za-z0-9_]*|fbclid|gclid|ref_src)="

  /** Canonical form: lowercase scheme+host, default port stripped,
    * trailing path slashes collapsed (root stays "/"), tracking
    * params dropped, surviving params sorted, fragment dropped.
    * Native single-pass scan; output identical to [[canonicalizeColumns]].
    */
  def canonicalize(url: Column): Column =
    graft.functions.expr.NativeFunctions.url_canonicalize(url)

  /** The original 8-regex Column formulation of [[canonicalize]] —
    * retained as the property-spec reference for the native path. */
  def canonicalizeColumns(url: Column): Column = {
    val sch = lower(regexp_extract(url, scheme, 1))
    val hostport = lower(regexp_extract(url, schemeNc + "([^/?#]*)", 1))
    val host = when(sch === "http", regexp_replace(hostport, ":80$", ""))
      .when(sch === "https", regexp_replace(hostport, ":443$", ""))
      .otherwise(hostport)
    val rawPath = regexp_extract(url, schemeNc + "[^/?#]*([^?#]*)", 1)
    val path = when(regexp_replace(rawPath, "/+$", "") === "", lit("/"))
      .otherwise(regexp_replace(rawPath, "/+$", ""))
    val rawQ = regexp_extract(url, "\\?([^#]*)", 1)
    val params = array_sort(filter(split(rawQ, "&"),
      p => p =!= "" && !p.rlike(trackingParamPattern)))
    val qs = concat_ws("&", params)
    concat(sch, lit("://"), host, path,
      when(qs === "", lit("")).otherwise(concat(lit("?"), qs)))
  }
}
