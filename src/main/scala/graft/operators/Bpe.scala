package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.expr.NativeFunctions

/** BPE subword tokenizer — train + apply (SURVEY.md §2c): the one
  * LLM-pipeline primitive the token counters proxy with a regex.
  *
  * Training is the pagerank-style driver loop: the STATE is the
  * word-frequency vocabulary (distinct words ≪ corpus — one
  * corpus-sized aggregation builds it, every later round touches only
  * the vocab), each merge round is ONE adjacent-pair aggregation
  * (map-side combined; ties break (count desc, lhs, rhs) — fully
  * deterministic), and the learned rules are bounded driver state
  * like k-means centroids. The vocab is re-persisted per round with
  * the previous generation released, so plan depth and cache both
  * stay O(1) in the round count.
  *
  * Applying a model is a broadcast-rules column transform: the rule
  * list rides inside the native [[graft.functions.expr.BpeEncode]]
  * expression (the PqEncode codebook-as-literals pattern) — encoding
  * never shuffles anything but its output.
  *
  * Merge semantics (training, encode, and the SQL oracle all share
  * it): one left-to-right fold pass per rule, in training order —
  * see [[graft.functions.expr.BpeOps]]. No end-of-word marker:
  * merges are word-internal, so decode is exact concatenation
  * (round-trip spec).
  */
object Bpe {

  final case class Merge(merge_idx: Int, lhs: String, rhs: String, pair_count: Long)

  final case class Model(merges: IndexedSeq[Merge]) {
    def rules: Seq[(String, String)] = merges.map(m => (m.lhs, m.rhs))
  }

  /** Whitespace word frequencies — the training vocabulary (and the
    * tokenization every other text operator in this repo uses). */
  private def vocabOf(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(trim(col(textCol)), "\\s+")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("freq"))

  /** Learn `nMerges` merge rules. Stops early if the vocab runs out
    * of adjacent pairs (fully merged). `minFreq` drops hapax words
    * from the vocab — at corpus scale the long tail of unique words
    * dominates vocab size while contributing nothing to top pair
    * counts. */
  def train(docs: DataFrame, textCol: String, nMerges: Int,
      minFreq: Long = 1L): Model = {
    require(nMerges > 0, s"nMerges $nMerges must be positive")
    var vocab = vocabOf(docs, textCol)
      .filter(col("freq") >= minFreq)
      .select(NativeFunctions.bpe_encode(col("w"), Seq.empty).as("syms"),
        col("freq"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    vocab.count()
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var round = 0
    var exhausted = false
    while (round < nMerges && !exhausted) {
      val top = vocab.filter(size(col("syms")) >= 2)
        .select(explode(arrays_zip(
            slice(col("syms"), lit(1), size(col("syms")) - 1),
            slice(col("syms"), lit(2), size(col("syms")) - 1))).as("p"),
          col("freq"))
        .groupBy(col("p").getField("0").as("lhs"),
          col("p").getField("1").as("rhs"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("lhs"), col("rhs"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val r = top(0)
        val (lhs, rhs) = (r.getString(0), r.getString(1))
        merges += Merge(round + 1, lhs, rhs, r.getLong(2))
        val next = vocab
          .select(NativeFunctions.bpe_merge_step(col("syms"), lhs, rhs).as("syms"),
            col("freq"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        next.count()
        vocab.unpersist(blocking = false)
        vocab = next
      }
      round += 1
    }
    vocab.unpersist(blocking = false)
    Model(merges.toIndexedSeq)
  }

  /** Encode: one row per (id, word) with its subword array — the
    * model applied as a single codegen-adjacent column transform. */
  def encodeWords(docs: DataFrame, idCol: String, textCol: String,
      model: Model): DataFrame =
    docs.select(col(idCol),
        explode(split(trim(col(textCol)), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .select(col(idCol), col("word"),
        NativeFunctions.bpe_encode(col("word"), model.rules).as("subwords"))

  /** Decode = concatenation (word-internal merges lose nothing). */
  def decodeCol(subwords: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat_ws("", subwords)
}
