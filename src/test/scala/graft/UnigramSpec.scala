package graft

import org.apache.spark.sql.functions._

import graft.functions.expr.NativeFunctions
import graft.operators.Unigram

/** Unigram-LM tokenizer (hard-EM train + native Viterbi encode):
  * the segmenter's decision rules pinned one by one, then the
  * training loop's prune/determinism contract, then the train→encode
  * round trip the driver gate replays at corpus scale. */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private def encodeOne(word: String, pieces: Seq[(String, Double)],
      maxLen: Int = 3, unk: Double = Unigram.UnkLogp): Seq[String] =
    Seq(word).toDF("w")
      .select(NativeFunctions.unigram_encode(col("w"), pieces, maxLen, unk)
        .as("p"))
      .collect().head.getSeq[String](0)

  test("Viterbi picks the higher-probability segmentation") {
    // 'abc' as one piece (-1.0) beats a+b+c (-0.5*3 = -1.5)
    val m = Seq("abc" -> -1.0, "a" -> -0.5, "b" -> -0.5, "c" -> -0.5)
    assert(encodeOne("abc", m) === Seq("abc"))
    // flip the trade: now the single chars win
    val m2 = Seq("abc" -> -2.0, "a" -> -0.5, "b" -> -0.5, "c" -> -0.5)
    assert(encodeOne("abc", m2) === Seq("a", "b", "c"))
  }

  test("exact score ties break to the LONGEST piece") {
    // 'ab' at -1.0 exactly equals a+b at -0.5-0.5; the longest-first
    // strictly-greater replace keeps 'ab'
    val m = Seq("ab" -> -1.0, "a" -> -0.5, "b" -> -0.5)
    assert(encodeOne("ab", m) === Seq("ab"))
    // and a 3-way tie (abc = ab+c = a+b+c) still takes the longest
    val m3 = Seq("abc" -> -1.5, "ab" -> -1.0, "a" -> -0.5,
      "b" -> -0.5, "c" -> -0.5)
    assert(encodeOne("abc", m3) === Seq("abc"))
  }

  test("unknown codepoints fall back to single chars at the unk floor") {
    val m = Seq("ab" -> -1.0, "a" -> -0.5, "b" -> -0.5)
    // 'x' is not in the table: segments alone; the rest still merges
    assert(encodeOne("axb", m) === Seq("a", "x", "b"))
    // a fully-unknown word segments per codepoint (total function)
    assert(encodeOne("xyz", m) === Seq("x", "y", "z"))
    // the unk penalty really is the floor: even a terrible known
    // piece (-99) beats an unk char (-100)
    val cheap = Seq("q" -> -99.0)
    assert(encodeOne("q", cheap) === Seq("q"))
  }

  test("multi-char pieces never bridge an unknown gap") {
    // 'ab' exists but 'xb'/'ax' don't: the unk char can only be
    // covered by its single-codepoint fallback, never absorbed
    val m = Seq("ab" -> -0.1, "a" -> -0.5, "b" -> -0.5)
    assert(encodeOne("xab", m) === Seq("x", "ab"))
  }

  test("train prunes pieces that win no Viterbi position") {
    // corpus where 'ab' dominates: after EM the mid-frequency
    // substrings that never win a position drop out of the table
    val docs = Seq.fill(50)("ababab ab").toDF("text")
    val m0pieces = // seed table size: every distinct substring ≤ 3
      Seq("a", "b", "ab", "ba", "aba", "bab", "abab").size // doc sanity
    val model = Unigram.train(docs, "text", iters = 2, maxLen = 3,
      seedTopK = 200)
    val pieces = model.pieces.map(_.piece).toSet
    assert(pieces.contains("ab"), s"dominant piece pruned: $pieces")
    // EM kept only winners: strictly fewer pieces than the seed and
    // every surviving piece carries a positive count
    assert(model.pieces.forall(_.cnt > 0))
    assert(pieces.size < m0pieces + 26,
      s"no pruning happened: ${pieces.size} pieces")
    // 'ba' never wins a position in 'ababab'/'ab' segmentations once
    // 'ab' dominates — it must be gone
    assert(!pieces.contains("ba"), s"losing piece survived: $pieces")
  }

  test("training is deterministic: two runs, identical model") {
    val docs = Seq("tok eniz ation toktok", "tok tok eniz",
      "ation ation tok").toDF("text")
    val a = Unigram.train(docs, "text", iters = 2, maxLen = 3, seedTopK = 50)
    val b = Unigram.train(docs, "text", iters = 2, maxLen = 3, seedTopK = 50)
    assert(a.pieces === b.pieces)
    assert(a.pieces.nonEmpty)
    // logps are normalized: Σ exp(logp) ≈ 1 (6dp rounding slack)
    val mass = a.pieces.map(p => math.exp(p.logp)).sum
    assert(math.abs(mass - 1.0) < 1e-3, s"piece mass $mass")
  }

  test("encodeWords round-trips: concatenated pieces rebuild each word") {
    val docs = Seq((1L, "interchange inter change"), (2L, "changeover over"))
      .toDF("doc_id", "text")
    val model = Unigram.train(docs, "text", iters = 2, maxLen = 3,
      seedTopK = 100)
    val enc = Unigram.encodeWords(docs, "doc_id", "text", model)
      .select(col("word"), concat_ws("", col("pieces")).as("rebuilt"),
        size(col("pieces")).as("np"))
      .collect()
    assert(enc.length === 5) // every occurrence, not every distinct word
    enc.foreach { r =>
      assert(r.getAs[String]("rebuilt") === r.getAs[String]("word"),
        "pieces must concatenate back to the word")
      assert(r.getAs[Int]("np") >= 1)
    }
  }
}
