package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.expr.{BloomAgg, BloomContainsAny, CharsetDecode,
  CharsetSniff, CmsAgg, CmsEstimate, DotProduct, HammingDistance, HtmlText,
  MinHashAgg, RobotsAllowed, RollingHash, ShingleHashes, ShingleHashesAll,
  SimHashAgg, UrlCanonicalize}

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions as SQL functions, so `spark.sql("SELECT
  * hamming_distance(a, b) ...")` works alongside the Column API.
  *
  * Install with:
  * {{{
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)           // programmatic
  *   // or spark.sql.extensions=graft.plans.GraftExtensions
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
  }
}

object GraftExtensions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  private def arity(name: String, children: Seq[Expression], n: Int): Unit =
    if (children.size != n)
      throw new IllegalArgumentException(
        s"$name expects $n arguments, got ${children.size}")

  /** Foldable integral literal → Long, with a clear error. */
  private def constLong(name: String, arg: String, e: Expression): Long = {
    def bad(why: String) = throw new IllegalArgumentException(s"$name: $arg $why")
    if (!e.foldable) bad("must be a constant integer, got a non-literal")
    e.eval(null) match {
      case i: Int => i.toLong
      case l: Long => l
      case s: Short => s.toLong
      case b: Byte => b.toLong
      case other => bad(s"must be a constant integer, got $other (${e.dataType.simpleString})")
    }
  }

  /** Foldable string literal → String, with a clear error. */
  private def constString(name: String, arg: String, e: Expression): String = {
    def bad(why: String) = throw new IllegalArgumentException(s"$name: $arg $why")
    if (!e.foldable) bad("must be a constant string, got a non-literal")
    e.eval(null) match {
      case s: org.apache.spark.unsafe.types.UTF8String => s.toString
      case other => bad(s"must be a constant string, got $other (${e.dataType.simpleString})")
    }
  }

  /** (identifier, info, builder) triples — shared by the
    * withExtensions path and live-session registration. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    // the r14 extraction/crawl scalar family — SQL parity with the
    // Column API (the sketch aggregates below set the precedent: a
    // SQL-only user gets the same engine surface)
    (FunctionIdentifier("url_canonicalize"),
      info("url_canonicalize", "url_canonicalize(url) - canonical dedup-key form of a messy URL"),
      (children: Seq[Expression]) => {
        arity("url_canonicalize(url)", children, 1)
        UrlCanonicalize(children.head)
      }),
    (FunctionIdentifier("html_text"),
      info("html_text", "html_text(html) - boilerplate-stripped page text"),
      (children: Seq[Expression]) => {
        arity("html_text(html)", children, 1)
        HtmlText(children.head)
      }),
    (FunctionIdentifier("charset_sniff"),
      info("charset_sniff", "charset_sniff(bytes) - detected charset of raw fetched bytes"),
      (children: Seq[Expression]) => {
        arity("charset_sniff(bytes)", children, 1)
        CharsetSniff(children.head)
      }),
    (FunctionIdentifier("charset_decode"),
      info("charset_decode", "charset_decode(bytes) - charset-repaired text of raw fetched bytes"),
      (children: Seq[Expression]) => {
        arity("charset_decode(bytes)", children, 1)
        CharsetDecode(children.head)
      }),
    (FunctionIdentifier("robots_allowed"),
      info("robots_allowed", "robots_allowed(robots_txt, path, agent) - RFC 9309 fetch permission"),
      (children: Seq[Expression]) => {
        arity("robots_allowed(robots_txt, path, agent)", children, 3)
        RobotsAllowed(children(0), children(1),
          constString("robots_allowed(robots_txt, path, agent)", "agent", children(2)))
      }),
    (FunctionIdentifier("hamming_distance"),
      info("hamming_distance", "hamming_distance(a, b) - bit distance of two int64 signatures"),
      (children: Seq[Expression]) => {
        arity("hamming_distance(a, b)", children, 2)
        HammingDistance(children(0), children(1))
      }),
    (FunctionIdentifier("rolling_hash"),
      info("rolling_hash", "rolling_hash(str[, seed]) - 64-bit polynomial content hash"),
      (children: Seq[Expression]) => children match {
        // optional seed, matching the Column API — silently ignoring a
        // passed seed would fingerprint with the wrong constant
        case Seq(str) => RollingHash(str, 1125899906842597L)
        case Seq(str, seed) =>
          RollingHash(str, constLong("rolling_hash(str, seed)", "seed", seed))
        case _ => throw new IllegalArgumentException(
          s"rolling_hash(str[, seed]) expects 1 or 2 arguments, got ${children.size}")
      }),
    (FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(a, b) - dot product of two array<double>"),
      (children: Seq[Expression]) => {
        arity("dot_product(a, b)", children, 2)
        DotProduct(children(0), children(1))
      }),
    (FunctionIdentifier("shingle_hashes"),
      info("shingle_hashes", "shingle_hashes(text, k) - distinct word-k-gram hashes"),
      (children: Seq[Expression]) => {
        // k must be a foldable integral literal: evaluate it once here
        // with a clear error, instead of a ClassCastException (BIGINT
        // literal) or an NPE (column argument) at plan build
        def bad(why: String) = throw new IllegalArgumentException(
          s"shingle_hashes(text, k): $why")
        if (children.size != 2) bad(s"expects 2 arguments, got ${children.size}")
        if (!children(1).foldable) bad("k must be a constant integer, got a non-literal")
        val k = children(1).eval(null) match {
          case i: Int => i
          case l: Long if l.isValidInt => l.toInt
          case s: Short => s.toInt
          case b: Byte => b.toInt
          case other => bad(s"k must be a constant integer, got $other " +
            s"(${children(1).dataType.simpleString})")
        }
        ShingleHashes(children.head, k)
      }),
    (FunctionIdentifier("shingle_hashes_all"),
      info("shingle_hashes_all", "shingle_hashes_all(text, k) - ALL word-k-gram hashes in position order"),
      (children: Seq[Expression]) => {
        arity("shingle_hashes_all(text, k)", children, 2)
        ShingleHashesAll(children.head,
          constLong("shingle_hashes_all(text, k)", "k", children(1)).toInt)
      }),
    // sketch aggregates: builders return the AggregateFunction — the
    // analyzer wraps it in an AggregateExpression like any built-in
    (FunctionIdentifier("minhash_agg"),
      info("minhash_agg", "minhash_agg(hash, perms) - MinHash signature of a group's int64 hashes"),
      (children: Seq[Expression]) => {
        arity("minhash_agg(hash, perms)", children, 2)
        MinHashAgg(children.head,
          constLong("minhash_agg(hash, perms)", "perms", children(1)).toInt)
      }),
    (FunctionIdentifier("simhash_agg"),
      info("simhash_agg", "simhash_agg(hash) - SimHash-64 signature of a group's int64 hashes"),
      (children: Seq[Expression]) => {
        arity("simhash_agg(hash)", children, 1)
        SimHashAgg(children.head)
      }),
    (FunctionIdentifier("cms_agg"),
      info("cms_agg", "cms_agg(hash, depth, width) - Count-Min sketch of a group's int64 hashes"),
      (children: Seq[Expression]) => {
        arity("cms_agg(hash, depth, width)", children, 3)
        CmsAgg(children.head,
          constLong("cms_agg(hash, depth, width)", "depth", children(1)).toInt,
          constLong("cms_agg(hash, depth, width)", "width", children(2)).toInt)
      }),
    (FunctionIdentifier("cms_estimate"),
      info("cms_estimate", "cms_estimate(sketch, hash, depth, width) - CMS frequency upper bound"),
      (children: Seq[Expression]) => {
        arity("cms_estimate(sketch, hash, depth, width)", children, 4)
        CmsEstimate(children(0), children(1),
          constLong("cms_estimate(sketch, hash, depth, width)", "depth", children(2)).toInt,
          constLong("cms_estimate(sketch, hash, depth, width)", "width", children(3)).toInt)
      }),
    (FunctionIdentifier("bloom_agg"),
      info("bloom_agg", "bloom_agg(hash, numBits, k) - Bloom filter of a group's int64 hashes"),
      (children: Seq[Expression]) => {
        arity("bloom_agg(hash, numBits, k)", children, 3)
        BloomAgg(children.head,
          constLong("bloom_agg(hash, numBits, k)", "numBits", children(1)).toInt,
          constLong("bloom_agg(hash, numBits, k)", "k", children(2)).toInt)
      }),
    (FunctionIdentifier("bloom_contains_any"),
      info("bloom_contains_any", "bloom_contains_any(bloom, hashes, k) - any array element maybe in filter"),
      (children: Seq[Expression]) => {
        arity("bloom_contains_any(bloom, hashes, k)", children, 3)
        BloomContainsAny(children(0), children(1),
          constLong("bloom_contains_any(bloom, hashes, k)", "k", children(2)).toInt)
      }))

  /** Register on an already-running session (withExtensions only
    * applies at construction time). */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (id, fnInfo, builder) =>
      org.apache.spark.sql.graft.ColumnBridge.registerFunction(spark, id, fnInfo, builder)
    }
}
