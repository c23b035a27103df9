package graft

import org.apache.spark.sql.functions._

import graft.functions.expr.NativeFunctions.cdc_chunk_hashes
import graft.operators.Dedup

/** Content-defined chunking: the boundary rule is content-derived, so
  * chunk hashes must survive the insertions that shift every
  * fixed-stride window — that invariant IS the operator's reason to
  * exist, and this spec proves it on planted edits. */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def words(seed: Int, n: Int): Seq[String] = {
    var s = seed.toLong * 2654435761L + 17
    (0 until n).map { _ =>
      s = s * 6364136223846793005L + 1442695040888963407L
      "w" + ((s >>> 40) % 97)
    }
  }

  private def chunksOf(text: String): Seq[(Long, Int)] =
    Seq(Tuple1(text)).toDF("text")
      .select(explode(cdc_chunk_hashes(col("text"), 4, 8)).as("c"))
      .select(col("c.hash"), col("c.len"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq

  test("chunk lengths partition the token stream; expected length tracks D") {
    val text = words(1, 400).mkString(" ")
    val cs = chunksOf(text)
    assert(cs.map(_._2).sum === 400)
    assert(cs.forall(_._2 >= 1))
    // expected chunk length ≈ D=8 (warmup and the tail flush skew it
    // a little); a broken boundary rule lands far outside this band
    val avg = 400.0 / cs.size
    assert(avg >= 4.0 && avg <= 16.0, s"avg chunk length $avg")
  }

  test("a front insertion only perturbs chunks up to the first surviving boundary") {
    val base = words(2, 300).mkString(" ")
    val edited = "zzz qqq xxx " + base
    val a = chunksOf(base).map(_._1)
    val b = chunksOf(edited).map(_._1).toSet
    // every chunk of the original after the first boundary re-syncs:
    // boundaries depend only on the last w=4 words, so once past the
    // edit the boundary stream is identical — all but the FIRST chunk
    // of the original must reappear verbatim in the edited doc
    val surviving = a.drop(1)
    assert(surviving.nonEmpty)
    assert(surviving.forall(b.contains),
      s"${surviving.count(!b.contains(_))} of ${surviving.size} " +
        "post-edit chunks changed hash")
    // while the fixed-stride equivalent loses EVERY positional window
    val strideA = Seq(Tuple1(base)).toDF("text")
      .select(graft.functions.expr.NativeFunctions
        .shingle_hashes_all(col("text"), 8).as("h"))
      .collect().head.getSeq[Long](0)
    val strideB = Seq(Tuple1(edited)).toDF("text")
      .select(graft.functions.expr.NativeFunctions
        .shingle_hashes_all(col("text"), 8).as("h"))
      .collect().head.getSeq[Long](0)
    val samePos = strideA.zip(strideB).count { case (x, y) => x == y }
    assert(samePos === 0, "positional windows unexpectedly aligned")
  }

  test("empty and whitespace-only input chunk to nothing") {
    val cs = Seq(Tuple1(""), Tuple1("   \t  ")).toDF("text")
      .select(size(cdc_chunk_hashes(col("text"), 4, 8)).as("n"))
      .collect().map(_.getInt(0))
    assert(cs.toSeq === Seq(0, 0))
  }

  test("a copied passage is found across docs at different offsets") {
    val passage = words(3, 60)
    val docA = (words(4, 37) ++ passage ++ words(5, 80)).mkString(" ")
    val docB = (words(6, 113) ++ passage ++ words(7, 20)).mkString(" ")
    val docC = words(8, 150).mkString(" ")
    val docs = Seq((1L, docA), (2L, docB), (3L, docC)).toDF("doc_id", "text")
    val dup = Dedup.cdcDuplicateChunks(docs, "doc_id", "text",
      w = 4, modD = 8, minLen = 4)
    val hit = dup.filter(col("n_docs") >= 2).count()
    // the 60-word shared passage spans ~7 chunks; interior chunks
    // (content fully inside the passage) hash identically in both docs
    assert(hit >= 3, s"only $hit duplicated chunks found")
    // and the doc-level profile points at A and B, not C
    val stats = Dedup.cdcDocStats(docs, "doc_id", "text", 4, 8, 4)
    val ratios = stats.collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(ratios(1L) > 0.0 && ratios(2L) > 0.0)
    assert(ratios(3L) === 0.0, s"clean doc scored ${ratios(3L)}")
    stats.unpersist()
  }
}
