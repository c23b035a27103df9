package graft

import org.apache.spark.sql.functions._

import graft.functions.Text
import graft.functions.expr.NativeFunctions._

class TextSpec extends SparkSpec {
  import spark.implicits._

  test("shingles produces distinct k-grams in order-insensitive sets") {
    val df = Seq("a b c d", "a b", "").toDF("t")
    val out = df.select(Text.shingles(col("t"), 3).as("s"))
      .as[Seq[String]].collect()
    assert(out(0) === Seq("a b c", "b c d"))
    assert(out(1) === Seq.empty) // fewer than k tokens
    assert(out(2) === Seq.empty)
  }

  test("fingerprint is whitespace/case-insensitive but content-sensitive") {
    val df = Seq(("A  b\tC", "a b c", "a b d")).toDF("x", "y", "z")
    val r = df.select(Text.fingerprint(col("x")).as("fx"),
      Text.fingerprint(col("y")).as("fy"),
      Text.fingerprint(col("z")).as("fz")).collect().head
    assert(r.getString(0) === r.getString(1))
    assert(r.getString(0) !== r.getString(2))
  }

  test("langId picks the language whose stopwords dominate") {
    val df = Seq(
      "the cat and the dog in the house",
      "der Hund und die Katze ist nicht hier",
      "el perro y la casa es de madera",
      "qqq www zzz").toDF("t")
    val out = df.select(Text.langId(col("t"))).as[String].collect()
    assert(out === Array("en", "de", "es", "und"))
  }

  test("stopwordRatio and tokenCount agree with hand counts") {
    val r = Seq("the fast the slow xyz").toDF("t")
      .select(Text.tokenCount(col("t")).as("n"),
        Text.stopwordRatio(col("t")).as("r")).collect().head
    assert(r.getInt(0) === 5)
    assert(math.abs(r.getDouble(1) - 0.4) < 1e-12)
  }

  test("native hamming_distance matches bit_count(xor) and survives codegen") {
    val df = Seq((0xFFL, 0x0FL), (0L, 0L), (-1L, 0L)).toDF("a", "b")
    val out = df.select(hamming_distance(col("a"), col("b")).as("h"),
      bit_count(col("a").bitwiseXOR(col("b"))).cast("long").as("ref"))
    assert(out.collect().forall(r => r.getLong(0) === r.getLong(1)))
  }

  test("native rolling_hash is deterministic and order-sensitive") {
    val df = Seq(("abc", "abc", "acb")).toDF("x", "y", "z")
    val r = df.select(rolling_hash(col("x")).as("hx"),
      rolling_hash(col("y")).as("hy"),
      rolling_hash(col("z")).as("hz")).collect().head
    assert(r.getLong(0) === r.getLong(1))
    assert(r.getLong(0) !== r.getLong(2))
  }

  test("native hashes fold Unicode CODEPOINTS — the oracle's ord(c) rule") {
    // the r4 fix for the one documented oracle-parity domain bound:
    // byte folds agreed with the SQL ord(c) fold on ASCII only; the
    // codepoint fold agrees on the full plane (é U+00E9 is 2 UTF-8
    // bytes, 日 U+65E5 is 3, 𝄞 U+1D11E is 4 — all must fold as ONE
    // codepoint each)
    def ordFold(s: String, seed: Long): Long =
      s.codePoints().toArray.foldLeft(seed)((h, cp) => h * 31L + cp)
    val texts = Seq("héllo", "日本語 text", "mixed 𝄞 clef", "plain ascii")
    val got = texts.toDF("t")
      .select(rolling_hash(col("t"), 17L).as("h")).as[Long].collect()
    assert(got.toSeq === texts.map(ordFold(_, 17L)))

    // shingle token hashes build on the same codepoint fold: a
    // non-ASCII 2-token doc's 2-gram hash must equal the reference
    // combine of the two ord-fold token hashes
    val doc = "héllo wörld"
    val tokA = ordFold("héllo", 17L)
    val tokB = ordFold("wörld", 17L)
    val expected = (1125899906842597L * -7046029254386353131L + tokA) *
      -7046029254386353131L + tokB
    val sh = Seq(doc).toDF("t")
      .select(graft.functions.expr.NativeFunctions.shingle_hashes(col("t"), 2).as("s"))
      .as[Seq[Long]].collect().head
    assert(sh === Seq(expected))
  }

  test("deflate ratio separates boilerplate, prose, and gibberish") {
    // the Gopher/RefinedWeb compression signal: duplicated spans
    // compress far below natural prose; high-entropy gibberish sits
    // near (or above) ratio 1. Deterministic inputs, ordering + bound
    // assertions (zlib's exact byte count is JDK detail, the SIGNAL
    // is the ordering).
    val boiler = "click here to subscribe now " * 40
    val prose = "The quick brown fox jumps over the lazy dog while " +
      "seventeen jurors deliberated quietly about the verdict, and " +
      "outside the rain kept falling on the cobblestones of the old town."
    val gibberish = {
      var h = 1125899906842597L
      val sb = new StringBuilder
      (0 until 800).foreach { _ =>
        h = h * 6364136223846793005L + 1442695040888963407L
        sb.append(((h >>> 40).toInt & 0x3f + 48).toChar)
      }
      sb.toString
    }
    val out = Seq(("b", boiler), ("p", prose), ("g", gibberish))
      .toDF("k", "text")
      .select(col("k"), deflate_ratio(col("text")).as("r"))
      .as[(String, Double)].collect().toMap
    assert(out("b") < 0.2, s"boilerplate ratio ${out("b")}")
    assert(out("b") < out("p") && out("p") < out("g"),
      s"ordering violated: $out")
    assert(out("g") > 0.5, s"gibberish ratio ${out("g")}")
    // empty text guards the division
    val z = Seq(("e", "")).toDF("k", "text")
      .select(deflate_ratio(col("text"))).as[Double].collect().head
    assert(z === 0.0)
  }

  test("phrase search finds overlapping contiguous runs with positions") {
    val docs = Seq(
      (1L, "a b a b a"),        // "a b a" matches at 1 and 3
      (2L, "x a b y a z"),      // terms present but never contiguous
      (3L, "a b a")).toDF("doc_id", "text")
    val out = graft.operators.Curation
      .phraseSearch(docs, "doc_id", "text", Seq("a", "b", "a"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    assert(out === Map(1L -> ((2L, 1)), 3L -> ((1L, 1))))
  }

  test("proximity search: any order within the window, minimal span, hard boundary") {
    val docs = Seq(
      (1L, "sort x x column x row"), // reversed order, span 5
      (2L, "row x x x x x column x sort"), // span 8
      (3L, "row x x x x x x column x sort"), // span 9 — outside
      (4L, "row column x x x")).toDF("doc_id", "text") // missing 'sort'
    val out = graft.operators.Curation
      .proximitySearch(docs, "doc_id", "text",
        Seq("row", "column", "sort"), maxSpan = 8)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out === Map(1L -> 5, 2L -> 8))
  }
}
