package graft

import org.apache.spark.sql.functions._

import graft.functions.XmlPublication

class XmlPublicationSpec extends SparkSpec {
  import spark.implicits._

  // Shape mirrors DBLP publication profiles (the reference's input;
  // /root/reference/main_dag.py:110-218 pulls these exact fields).
  private val article =
    """<article key="journals/corr/abs-1234" mdate="2020-05-17">
      |<author pid="167/4350" orcid="0000-0001-0000-0000">Ada Lovelace</author>
      |<author pid="88/6919">Charles Babbage</author>
      |<title>On Analytical Engines</title>
      |<year>1843</year>
      |<journal>CoRR</journal>
      |<volume>abs/1234</volume>
      |<ee>https://example.org/a</ee>
      |<ee>https://example.org/b</ee>
      |<url>db/journals/corr/corr1843.html</url>
      |</article>""".stripMargin.replaceAll("\n", "")

  test("parse extracts the reference's full row shape") {
    val r = Seq(article).toDF("xml")
      .select(XmlPublication.parse(col("xml")).as("p"))
      .select("p.*").collect().head
    assert(r.getAs[String]("paper_key") === "journals/corr/abs-1234")
    assert(r.getAs[String]("title") === "On Analytical Engines")
    assert(r.getAs[Int]("year") === 1843)
    assert(r.getAs[String]("publication_type") === "article")
    assert(r.getAs[String]("category") === "journal") // split('/')[0] minus last char
    assert(r.getAs[String]("publisher") === "CoRR")
    assert(r.getAs[Map[Int, String]]("authors_pids") ===
      Map(1 -> "167/4350", 2 -> "88/6919"))
    assert(r.getAs[Map[Int, String]]("authors_names") ===
      Map(1 -> "Ada Lovelace", 2 -> "Charles Babbage"))
    // one shared ordinal across the three maps: author 2 has no orcid,
    // so ordinal 2 carries an explicit null — it must not collapse to
    // {1 -> orcid1} (reference inserts None; main_dag.py:163-175)
    assert(r.getAs[Map[Int, String]]("authors_orcids") ===
      Map(1 -> "0000-0001-0000-0000", 2 -> null))
    assert(r.getAs[Seq[String]]("ee") ===
      Seq("https://example.org/a", "https://example.org/b"))
    assert(r.getAs[java.sql.Date]("mdate").toString === "2020-05-17")
    val pos = r.getStruct(r.fieldIndex("position"))
    assert(pos.getAs[String]("volume") === "abs/1234")
    assert(pos.getAs[String]("number") === null)
  }

  test("publisher falls back booktitle -> journal -> publisher") {
    val inproc = """<inproceedings key="conf/x/1"><booktitle>NeurIPS</booktitle></inproceedings>"""
    val book = """<book key="books/x/1"><publisher>Springer</publisher></book>"""
    val out = Seq(inproc, book).toDF("xml")
      .select(XmlPublication.publisher(col("xml"))).as[String].collect()
    assert(out === Array("NeurIPS", "Springer"))
  }

  test("author without attrs does not shift later ordinals") {
    val xml = """<article key="conf/x/2"><author>Anon One</author>""" +
      """<editor pid="p2" orcid="o2">Named Two</editor></article>"""
    val r = Seq(xml).toDF("xml")
      .select(XmlPublication.parse(col("xml")).as("p")).select("p.*").collect().head
    assert(r.getAs[Map[Int, String]]("authors_pids") === Map(1 -> null, 2 -> "p2"))
    assert(r.getAs[Map[Int, String]]("authors_orcids") === Map(1 -> null, 2 -> "o2"))
    assert(r.getAs[Map[Int, String]]("authors_names") ===
      Map(1 -> "Anon One", 2 -> "Named Two"))
  }

  test("missing optional fields become nulls, not empty strings") {
    val minimal = """<www key="homepages/x/1"></www>"""
    val r = Seq(minimal).toDF("xml")
      .select(XmlPublication.parse(col("xml")).as("p")).select("p.*").collect().head
    assert(r.getAs[String]("title") === null)
    assert(r.isNullAt(r.fieldIndex("year")))
    assert(r.getAs[String]("publication_type") === "www")
  }
}
