package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** DBLP publication-XML parsing as pure Column expressions.
  *
  * The reference parses per-researcher DBLP XML with ElementTree in a
  * Python loop (/root/reference/main_dag.py:83-239), producing one row
  * per publication element with: paper_key, title, year,
  * publication_type (the element tag), author ordinal maps (pid /
  * orcid / name keyed 1..n), category = paper_key.split('/')[0][:-1],
  * publisher = first of booktitle|journal|publisher, position =
  * (number, volume, pages), ee (one or many), url, crossref, mdate.
  *
  * Here each publication element arrives as one string value in a
  * column (records are split upstream — at scale, by a newline-framed
  * text source or a streaming splitter) and every field is a
  * `regexp_extract`/`regexp_extract_all` Column — codegen'd, no UDF,
  * no DOM allocation. 100 TB of XML parses at scan speed.
  */
object XmlPublication {

  val publicationTags: Seq[String] = Seq(
    "article", "inproceedings", "proceedings", "book", "incollection",
    "phdthesis", "masterthesis", "www", "data")

  private def tagText(xml: Column, tag: String): Column = {
    val m = regexp_extract(xml, s"<$tag[^>]*>([^<]*)</$tag>", 1)
    when(m === "", lit(null)).otherwise(m)
  }

  private def attr(xml: Column, name: String): Column = {
    val m = regexp_extract(xml, "<[a-z]+[^>]*\\b" + name + "=\"([^\"]*)\"", 1)
    when(m === "", lit(null)).otherwise(m)
  }

  /** The element tag = publication_type (main_dag.py:115-138). */
  def publicationType(xml: Column): Column =
    regexp_extract(trim(xml), "^<([a-z]+)", 1)

  def paperKey(xml: Column): Column = attr(xml, "key")

  /** category = key.split('/')[0] minus its last char (main_dag.py:177). */
  def category(key: Column): Column = {
    val head = split(key, "/").getItem(0)
    head.substr(lit(1), length(head) - 1)
  }

  /** Ordinal map {1 -> value, ...} like the reference's author dicts. */
  private def ordinalMap(values: Column): Column =
    when(size(values) > 0,
      map_from_arrays(sequence(lit(1), size(values)), values))
      .otherwise(map_from_arrays(array().cast("array<int>"), array().cast("array<string>")))

  /** All author/editor elements (full tags) in document order — the
    * shared ordinal universe for the three author maps. The reference
    * keys authors_pids/authors_orcids/authors_names by ONE counter
    * over all author+editor elements, inserting explicit None when
    * pid/orcid is absent (main_dag.py:163-175) — so an author without
    * a pid must NOT shift later authors' ordinals. */
  def authorElements(xml: Column): Column =
    regexp_extract_all(xml,
      lit("<(?:author|editor)[^>]*>[^<]*</(?:author|editor)>"), lit(0))

  /** Per-element attribute/text extraction; "" (no match) → null, so
    * missing pid/orcid lands as an explicit null at its ordinal. */
  private def elemField(e: Column, pattern: String): Column = {
    val m = regexp_extract(e, pattern, 1)
    when(m === "", lit(null)).otherwise(m)
  }

  /** Author/editor display names in document order (main_dag.py:163-175). */
  def authorNames(xml: Column): Column =
    transform(authorElements(xml), e => regexp_extract(e, ">([^<]*)<", 1))

  def authorPids(xml: Column): Column =
    transform(authorElements(xml), e => elemField(e, "\\bpid=\"([^\"]*)\""))

  def authorOrcids(xml: Column): Column =
    transform(authorElements(xml), e => elemField(e, "\\borcid=\"([^\"]*)\""))

  /** publisher = booktitle, else journal, else publisher (main_dag.py:179-192). */
  def publisher(xml: Column): Column =
    coalesce(tagText(xml, "booktitle"), tagText(xml, "journal"), tagText(xml, "publisher"))

  /** All <ee> electronic-edition links (main_dag.py:202-210 collects 1..n). */
  def ee(xml: Column): Column =
    regexp_extract_all(xml, lit("<ee[^>]*>([^<]*)</ee>"), lit(1))

  /** Full parse: one struct column with the reference's row shape. */
  def parse(xml: Column): Column = {
    val key = paperKey(xml)
    struct(
      key.as("paper_key"),
      tagText(xml, "title").as("title"),
      tagText(xml, "year").cast("int").as("year"),
      publicationType(xml).as("publication_type"),
      ordinalMap(authorPids(xml)).as("authors_pids"),
      ordinalMap(authorOrcids(xml)).as("authors_orcids"),
      ordinalMap(authorNames(xml)).as("authors_names"),
      category(key).as("category"),
      publisher(xml).as("publisher"),
      struct(
        tagText(xml, "number").as("number"),
        tagText(xml, "volume").as("volume"),
        tagText(xml, "pages").as("pages")).as("position"),
      ee(xml).as("ee"),
      tagText(xml, "url").as("url"),
      tagText(xml, "crossref").as("crossref"),
      to_date(attr(xml, "mdate"), "yyyy-MM-dd").as("mdate"))
  }
}
