package graft

import org.apache.spark.sql.functions._

import graft.functions.Html

/** The native fused [[graft.functions.expr.HtmlText]] scan must be
  * EXTENSIONALLY equal to the 5-regex Column chain it replaces —
  * including the chain's edge behaviors: unclosed containers keep
  * their bodies (only the open tag strips), '<' with no '>' stays
  * literal, container close tags match lowercase-exactly, and pass
  * ORDER resolves pathological overlaps (a container opened inside
  * another tag's attributes). */
class HtmlSpec extends SparkSpec {
  import spark.implicits._

  private val adversarial = Seq(
    "<html><head><title>T</title><script>var x=1;</script></head>" +
      "<body><nav>Home | About</nav><h1>Hi</h1><p>a  b</p></body></html>",
    // unclosed containers: body survives, open tag strips
    "<script>leaked body", "<style>h1{}", "<nav>menu",
    // nested/overlapping containers and attribute games
    "<script type=\"a>b\">x</script>rest",
    "<img alt=\"<script>\">x</script>tail",
    "<style><script></style></script>",
    "<script><script>inner</script>after</script>",
    // close-tag casing and spacing are exact-match
    "<script>x</SCRIPT>y</script>z", "<script>x</script >y</script>z",
    // scriptx is still a container start per [^>]*
    "<scriptx>y</script>z",
    // bare '<' stays literal; empty tags; tag soup
    "a < b", "a <> b", "<<x>>", "<", ">", "<>",
    "text<br/>more<hr>end",
    // whitespace zoo
    " \t\na\f b \r\n ", "", "   ", "<p>   </p>",
    // multiple containers in sequence
    "<script>1</script>mid<style>2</style>end<nav>3</nav>!")

  test("native html_text ≡ the regex Column chain on adversarial markup") {
    val both = adversarial.toDF("h").select(
        Html.textFromHtml(col("h")).as("n"),
        Html.textFromHtmlColumns(col("h")).as("r"))
      .as[(String, String)].collect()
    adversarial.zip(both).foreach { case (in, (n, r)) =>
      assert(n === r, s"native vs regex diverge on <$in>")
    }
  }

  test("native ≡ regex on randomized tag-soup strings (60 cases, batched)") {
    import org.scalacheck.{Gen, Prop, Test => ScTest}
    val piece = Gen.oneOf(
      "<script>", "</script>", "<script a=\"x\">", "<scriptx>",
      "<style>", "</style>", "<nav>", "</nav>", "<p>", "</p>",
      "<b c>", "<", ">", "<>", "txt", "a b", " ", "\t", "\n", "|")
    val soup = Gen.listOf(piece).map(_.mkString)
    val prop = Prop.forAll(Gen.listOfN(30, soup)) { docs =>
      val both = docs.toDF("h").select(
          Html.textFromHtml(col("h")).as("n"),
          Html.textFromHtmlColumns(col("h")).as("r"))
        .as[(String, String)].collect()
      val bad = docs.zip(both).filter { case (_, (n, r)) => n != r }
      if (bad.nonEmpty) System.err.println(s"diverged: $bad")
      bad.isEmpty
    }
    val res = ScTest.check(ScTest.Parameters.default
      .withMinSuccessfulTests(60).withWorkers(1), prop)
    assert(res.passed, res.status.toString)
  }

  test("hand-check: boilerplate dropped, prose kept, title extracted") {
    val html = "<html><head><title>Doc 7</title><style>p{}</style>" +
      "<script>nav()</script></head><body><nav>Home|About</nav>" +
      "<h1>Title</h1><p>hello   world</p><p>two</p></body></html>"
    val out = Seq(html).toDF("h").select(
        Html.textFromHtml(col("h")).as("text"),
        Html.titleFromHtml(col("h")).as("title"))
      .as[(String, String)].head()
    assert(out._1 === "Doc 7 Title hello world two")
    assert(out._2 === "Doc 7")
  }

  test("null html stays null") {
    val r = Seq[String](null).toDF("h")
      .select(Html.textFromHtml(col("h"))).collect()
    assert(r.head.isNullAt(0))
  }
}
