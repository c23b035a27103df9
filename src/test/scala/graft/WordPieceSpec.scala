package graft

import org.apache.spark.sql.functions._

import graft.operators.WordPiece
import graft.operators.WordPiece.Vocab

/** WordPiece greedy encode: longest-match-first, role-split vocab
  * (word-initial vs ##-continuation), BERT's all-or-nothing [UNK]. */
class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  private def enc(word: String, v: Vocab): Seq[String] =
    Seq((1L, word)).toDF("doc_id", "text")
      .transform(d => WordPiece.encodeWords(d, "doc_id", "text", v))
      .select("pieces").collect().head.getSeq[String](0).toSeq

  private val v = Vocab(
    init = Seq("ab", "a", "c", "un"),
    cont = Seq("a", "b", "cd", "d", "le", "n"),
    maxLen = 3)

  test("greedy longest-match with role-split vocabulary") {
    // pos 0 consults init ("ab" beats "a"); later positions consult
    // cont and carry the ## marker
    assert(enc("abad", v) === Seq("ab", "##a", "##d"))
    // "un" initial then "a","b","le" continuations
    assert(enc("unable", v) === Seq("un", "##a", "##b", "##le"))
    // cont prefers the longest match too: "cd" over "c"+"d"
    assert(enc("acd", v) === Seq("a", "##cd"))
  }

  test("unknown anywhere makes the WHOLE word [UNK] (BERT semantics)") {
    assert(enc("xy", v) === Seq("[UNK]"))      // initial miss
    assert(enc("ax", v) === Seq("[UNK]"))      // continuation miss mid-word
    // role matters: "n" exists ONLY as continuation, so a word
    // STARTING with n cannot begin
    assert(enc("na", v) === Seq("[UNK]"))
  }

  test("frequency-seeded vocab covers the corpus and splits roles") {
    val docs = Seq((1L, "spark spark sparse par"), (2L, "spark par park"))
      .toDF("doc_id", "text")
    val vv = WordPiece.vocab(docs, "text", maxLen = 3, topK = 10)
    // all first characters are initial pieces, all later ones continuation
    assert(vv.init.contains("s") && vv.init.contains("p"))
    assert(vv.cont.contains("k") && vv.cont.contains("r"))
    // the dominant initial trigram makes the top-K cut
    assert(vv.init.contains("spa"))
    // full corpus encodes without [UNK] (single-codepoint coverage)
    val out = WordPiece.encodeWords(docs, "doc_id", "text", vv)
      .select("pieces").collect().map(_.getSeq[String](0))
    assert(out.forall(p => !p.contains("[UNK]")))
    // and round-trips: stripping ## markers reassembles each word
    val words = WordPiece.encodeWords(docs, "doc_id", "text", vv)
      .select("word", "pieces").collect()
    words.foreach { r =>
      val re = r.getSeq[String](1).map(_.stripPrefix("##")).mkString
      assert(re === r.getString(0), s"round-trip broke: $r")
    }
  }
}
