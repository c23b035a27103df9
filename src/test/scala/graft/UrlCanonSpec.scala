package graft

import org.apache.spark.sql.functions._

import graft.functions.Urls

/** The native single-pass [[graft.functions.expr.UrlCanonicalize]]
  * must be EXTENSIONALLY equal to the original 8-regex Column
  * formulation it replaced (r12 verdict item 6) — including the
  * degenerate behaviors the regexes happen to have: the "://"+"/"
  * skeleton on non-URLs, first-'?'-anywhere query detection, and
  * regex-level tracking-param matching. The dedup_url oracle derives
  * the expected canonical INDEPENDENTLY from base columns, so this
  * spec plus that gate pin the native path from both sides. */
class UrlCanonSpec extends SparkSpec {
  import spark.implicits._

  private val adversarial = Seq(
    // the dedup_url jitter family
    "HTTPS://WWW.Shop3.COM:443/cat/2-high/57/?utm_source=feed&z=9&a=4#sec123",
    "https://www.shop1.com/cat/1-urgent/33?utm_source=feed&z=9&a=2#sec44",
    // scheme/host/port edge cases
    "http://Host.COM:80/", "http://host.com:8080/x", "https://h:443",
    "https://h:80/x", "http://h:443/x", "ftp://H.example:21/A/B/",
    "a+b-c.d://MiXeD/P", "HTTP://h", "http://h#frag", "https://h/#frag",
    // path slashes
    "https://h//", "https://h///a///", "https://h/a/b//", "https://h/a/./b/",
    // query param soup: empties, dup keys, tracking at every position
    "https://h/p?b=2&a=1&utm_source=x&fbclid=z&ref_src=t",
    "https://h/p?utm_=q&utm_a_b=1&utm-x=keep&fbclidx=1&gclid=g",
    "https://h/p?&&a=1&&b=2&&", "https://h/p?a", "https://h/p?=v&a==b",
    "https://h/p?a=1&a=1&a=0", "https://h/p?z#a=1", "https://h/p?#f",
    // '?' before '#' ordering games
    "https://h/p#f?x=1", "https://h/p?q=1#f?x=2", "https://h?q=1",
    // no/broken scheme
    "", "h", "h?a=1", "://x", "notaurl?utm_source=1&b=2", "9http://h/p",
    "http:/h/p", "http//h/p", "https:///p?x=1",
    // case in params is preserved (only scheme/host lowercase)
    "HTTPS://H/P?B=2&a=1", "https://h/UPPER/Path?Key=Val",
    // non-ASCII hosts/paths: the native lowercase fallback must ride
    // the same route as Spark lower() (incl. Turkish İ, Cyrillic)
    "http://ÜBER.example/É?Ω=1", "https://ШОП.рф:443/Путь/",
    "http://İstanbul.example/ı", "ftp://ΣΕΛΙΔΑ.gr/ΑΒ")

  test("native canonicalize ≡ the regex Column formulation on adversarial URLs") {
    val df = adversarial.toDF("u")
    val both = df.select(
        Urls.canonicalize(col("u")).as("native"),
        Urls.canonicalizeColumns(col("u")).as("regex"))
      .as[(String, String)].collect()
    adversarial.zip(both).foreach { case (in, (n, r)) =>
      assert(n === r, s"native vs regex diverge on <$in>")
    }
  }

  test("native canonicalize hand-checks (independent of the regex form)") {
    def c(u: String): String =
      Seq(u).toDF("u").select(Urls.canonicalize(col("u"))).as[String].head()
    assert(c("HTTPS://WWW.Shop.COM:443/cat/x/?utm_source=f&z=9&a=4#s")
      === "https://www.shop.com/cat/x?a=4&z=9")
    assert(c("http://Host.COM:80") === "http://host.com/")
    assert(c("https://h:8443/a//") === "https://h:8443/a")
    // params sort in byte order, non-tracking utm-lookalikes survive
    assert(c("https://h/p?utm-x=1&b=2&A=3") === "https://h/p?A=3&b=2&utm-x=1")
    assert(c("https://h/p?utm_source") === "https://h/p?utm_source")
  }

  test("native ≡ regex on randomized URL-grammar strings (60 cases, batched)") {
    import org.scalacheck.{Gen, Prop, Test => ScTest}
    // grammar biased toward the canonicalizer's decision points:
    // scheme casing/absence, default ports, slash runs, tracking-
    // lookalike params, empty params, fragments, stray '?'/'#'
    val scheme = Gen.oneOf("http", "HTTP", "https", "HTTPS", "ftp", "a+b-c.d", "")
    val host = Gen.oneOf("H.com", "h.com", "WWW.Shop3.COM", "h", "")
    val port = Gen.oneOf("", ":80", ":443", ":8080", ":")
    val seg = Gen.oneOf("", "/", "//", "/a", "/a/", "/a//b///", "/cat/x")
    val param = Gen.oneOf("", "a=1", "B=2", "utm_source=x", "utm_=q", "utm-x=1",
      "fbclid=z", "fbclidx=1", "gclid", "ref_src=t", "=v", "a==b", "a")
    val query = Gen.listOfN(3, param).map(_.mkString("&"))
    val frag = Gen.oneOf("", "#f", "#a?b", "#")
    val urlGen = for {
      s <- scheme; sep <- Gen.oneOf("://", ":/", "//", "")
      h <- host; p <- port; pa <- seg
      qm <- Gen.oneOf("", "?"); q <- query; f <- frag
    } yield s"$s$sep$h$p$pa$qm$q$f"
    val prop = Prop.forAll(Gen.listOfN(30, urlGen)) { urls =>
      val both = urls.toDF("u").select(
          Urls.canonicalize(col("u")).as("n"),
          Urls.canonicalizeColumns(col("u")).as("r"))
        .as[(String, String)].collect()
      val bad = urls.zip(both).filter { case (_, (n, r)) => n != r }
      if (bad.nonEmpty) System.err.println(s"diverged: $bad")
      bad.isEmpty
    }
    val res = ScTest.check(ScTest.Parameters.default
      .withMinSuccessfulTests(60).withWorkers(1), prop)
    assert(res.passed, res.status.toString)
  }

  test("null URL stays null through the native expression") {
    val out = Seq[String](null).toDF("u")
      .select(Urls.canonicalize(col("u"))).collect()
    assert(out.head.isNullAt(0))
  }
}
