package graft

import graft.functions.expr.Robots

/** The RFC 9309 contract beyond what the crawl_robots construction
  * gate exercises: glob backtracking, anchoring, precedence ties,
  * group selection corner cases, and hostile formatting. */
class RobotsSpec extends SparkSpec {

  private def allow(robots: String, path: String, agent: String = "bot") =
    Robots.allowed(robots, path, agent)

  test("glob matcher: wildcards, anchors, backtracking") {
    assert(Robots.pathMatches("/a/*/c", "/a/b/c"))
    assert(Robots.pathMatches("/a/*/c", "/a/x/y/c/d"), "prefix match, * backtracks")
    assert(!Robots.pathMatches("/a/*/c$", "/a/x/c/d"), "$ anchors the end")
    assert(Robots.pathMatches("/a/*/c$", "/a/x/y/c"))
    assert(Robots.pathMatches("*.pdf$", "/docs/x.pdf"))
    assert(!Robots.pathMatches("*.pdf$", "/docs/x.pdfz"))
    assert(Robots.pathMatches("/p", "/page"), "rules are prefix matches")
    assert(!Robots.pathMatches("/page", "/p"))
    assert(Robots.pathMatches("/a*b*c", "/axxbyyc-and-more"))
    assert(!Robots.pathMatches("/a*b*c", "/axxbyy"))
    assert(Robots.pathMatches("", "/anything"), "empty pattern matches all")
    // pathological backtracking stays correct
    assert(Robots.pathMatches("/*a*a*a*a$", "/" + "xa" * 4))
    assert(!Robots.pathMatches("/*a*a*a*a$", "/" + "xa" * 3 + "x"))
  }

  test("longest match wins; allow wins length ties; no match allows") {
    val r = "User-agent: *\nDisallow: /shop\nAllow: /shop/sale\n"
    assert(!allow(r, "/shop/cart"))
    assert(allow(r, "/shop/sale/item"), "longer allow overrides")
    assert(allow(r, "/elsewhere"))
    // exact tie: Allow and Disallow patterns of equal length → allow
    val tie = "User-agent: *\nDisallow: /a/b/\nAllow: /a/c/\nDisallow: /a/c/\n"
    assert(allow(tie, "/a/c/x"), "allow wins the 5-octet tie")
  }

  test("group selection: specific beats *, case-insensitive, merges, zero-rule group") {
    val r = "User-agent: GoodBot\nDisallow: /only-good\n\n" +
      "User-agent: *\nDisallow: /\n"
    assert(!allow(r, "/only-good/x", "goodbot"), "token match is case-insensitive")
    assert(allow(r, "/other", "goodbot"), "specific group shields from *")
    assert(!allow(r, "/other", "randombot"), "* group applies to everyone else")
    // consecutive user-agent lines STACK into one group (RFC 9309:
    // blank lines are not delimiters — only rules end a header run),
    // so goodbot here shares the * group's Disallow
    val stacked = "User-agent: goodbot\n\nUser-agent: *\nDisallow: /\n"
    assert(!allow(stacked, "/anything", "goodbot"))
    // a zero-rule specific group can therefore only exist at EOF —
    // and it means allow-all with NO star fallback
    val empty = "User-agent: *\nDisallow: /\n\nUser-agent: goodbot\n"
    assert(allow(empty, "/anything", "goodbot"))
    assert(!allow(empty, "/anything", "otherbot"))
    // multiple groups for the same token merge
    val merged = "User-agent: bot\nDisallow: /a\n\n" +
      "User-agent: other\nDisallow: /x\n\nUser-agent: bot\nDisallow: /b\n"
    assert(!allow(merged, "/a1") && !allow(merged, "/b1"))
    assert(allow(merged, "/x1"), "other group's rules don't leak")
    // shared group header: two agents, one rule block
    val shared = "User-agent: bot\nUser-agent: crawler\nDisallow: /z\n"
    assert(!allow(shared, "/z", "crawler") && !allow(shared, "/z", "bot"))
  }

  test("hostile formatting: comments, CRLF, empty rules, unknown keys") {
    val r = "# top comment\r\n" +
      "User-agent: * # trailing comment\r\n" +
      "Crawl-delay: 10\r\n" +
      "Disallow: /secret # hidden\r\n" +
      "Disallow:\r\n" + // empty = no-op, must NOT disallow everything
      "Sitemap: https://x.example/sitemap.xml\r\n"
    assert(!allow(r, "/secret/x"))
    assert(allow(r, "/public"))
    assert(allow("", "/anything"), "empty robots.txt allows all")
    assert(allow("garbage without colons\n%%%\n", "/x"))
  }

  test("precedence counts pattern octets, not the '$' anchor (RFC 9309 §2.2.2)") {
    // '/abc$' and '/abc' are the SAME octet count (4): the exact-tie
    // rule (least restrictive wins) must apply, not anchor-length +1
    assert(allow("User-agent: *\nDisallow: /abc$\nAllow: /abc\n", "/abc"))
    // sanity: one more real octet still outranks
    assert(!allow("User-agent: *\nDisallow: /abcd\nAllow: /abc\n", "/abcd"))
    // and the anchored rule still wins where it is genuinely longer
    assert(!allow("User-agent: *\nDisallow: /abc/x$\nAllow: /abc\n", "/abc/x"))
  }

  test("column API evaluates inside codegen") {
    import org.apache.spark.sql.functions._
    import graft.functions.expr.NativeFunctions.robots_allowed
    val df = spark.range(4).select(col("id"),
      robots_allowed(
        lit("User-agent: *\nDisallow: /odd\n"),
        concat(when(col("id") % 2 === 1, lit("/odd/")).otherwise(lit("/even/")),
          col("id").cast("string")),
        "bot").as("ok"))
    val got = df.collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got === Map(0L -> true, 1L -> false, 2L -> true, 3L -> false))
    assert(df.queryExecution.executedPlan.toString.contains("*(1) Project"))
  }
}
