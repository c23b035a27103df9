package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data curation operators: deterministic sampling and
  * distribution-based quality gating (SURVEY.md §2c).
  *
  * Both are single-pass / single-shuffle shapes that survive a 100 TB
  * corpus: hash bucketing is a stateless map (no sampling state, no
  * rand() — retry- and speculation-safe), and the percentile gate is
  * one window per group key with rank pushdown.
  */
object Curation {

  /** Deterministic content-hash bucket in [0, buckets): the md5 of the
    * content's first 8 hex digits as an integer, mod buckets. The same
    * row lands in the same bucket on every run, executor, and retry —
    * the property rand()-based sampling loses under task retries.
    * Standard train/validation/test splitting for training corpora.
    */
  def hashBucket(content: Column, buckets: Int): Column =
    conv(substring(md5(content.cast("binary")), 1, 8), 16, 10)
      .cast("long") % buckets

  /** Keep rows whose bucket falls in [0, takeBuckets) — a
    * deterministic takeBuckets/buckets fraction of the corpus. */
  def hashSplit(df: DataFrame, content: Column, buckets: Int, takeBuckets: Int): DataFrame =
    df.withColumn("bucket", hashBucket(content, buckets))
      .filter(col("bucket") < takeBuckets)

  /** Overlapping token-window chunks (the retrieval/embedding-prep
    * split): windows of `chunkLen` tokens every `stride` tokens. The
    * last window start is rounded UP to the next stride step past
    * n-chunkLen+1, so the tail of a long document lands in a (partial)
    * final chunk instead of silently dropping up to stride-1 tokens.
    * Token-less documents emit no chunks. Pure explode over an in-row
    * sequence — no shuffle at all; chunk rows inherit the scan's
    * partitioning. */
  def chunkTokens(docs: DataFrame, idCol: String, tokens: Column,
      chunkLen: Int, stride: Int): DataFrame = {
    val n = col("__n")
    // ceil((n - chunkLen) / stride) in integer arithmetic
    val lastStart = lit(1) +
      lit(stride) * floor((n - chunkLen + (stride - 1)) / lit(stride))
    docs.select(col(idCol).as("doc_id"),
        array_remove(tokens, "").as("__t")) // "" pseudo-token of empty docs
      .withColumn("__n", size(col("__t")))
      .filter(n >= 1)
      .withColumn("start",
        explode(sequence(lit(1),
          when(n <= chunkLen, lit(1)).otherwise(lastStart).cast("int"),
          lit(stride))))
      .select(col("doc_id"), col("start").cast("int").as("start"),
        least(lit(chunkLen), col("__n") - col("start") + 1).cast("int").as("n_chunk_tokens"),
        concat_ws(" ", slice(col("__t"), col("start"), lit(chunkLen))).as("chunk"))
  }

  /** Per-document average token log-likelihood under the corpus
    * unigram distribution — the CCNet-style statistical quality
    * signal (boilerplate scores high, junk scores low). Token
    * frequencies are one aggregate; the corpus total rides along as a
    * broadcast 1-row scalar; docs with no tokens drop out. */
  def unigramLogProb(docs: DataFrame, idCol: String, tokens: Column): DataFrame = {
    val tok = docs.select(col(idCol).as("doc_id"), explode(tokens).as("token"))
      .filter(col("token") =!= "")
    val freq = tok.groupBy("token").agg(count("*").as("cnt"))
    // total = Σ cnt — derived from freq, NOT from a third tokenize
    // pass over the corpus: freq's shuffle exchange is shared with the
    // join side (ReusedExchange), so the corpus is scanned twice, not
    // three times
    val total = freq.agg(sum(col("cnt")).as("total"))
    tok.join(freq, "token")
      .crossJoin(broadcast(total))
      .groupBy("doc_id")
      .agg(count("*").as("n_tokens"),
        round(avg(log(col("cnt") / col("total"))), 4).as("avg_logprob"))
  }

  /** Greedy sequence packing: assign documents to fixed-budget packs
    * (the training-data step that concatenates documents into
    * context-length sequences). Docs are ordered deterministically
    * within each shard; pack id = floor(preceding-cumsum / budget) —
    * the standard streaming pack (a doc straddling a boundary starts
    * its pack at the boundary). One window per shard key: cumsum is a
    * single sort, no driver state, and shards pack independently so
    * 100 TB packs as width, not depth. */
  def packSequences(docs: DataFrame, groupCol: String, idCol: String,
      tokenCount: Column, budget: Int): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col(idCol))
    docs.select(col(groupCol), col(idCol), tokenCount.as("n_tokens"))
      .withColumn("__cum", sum(col("n_tokens")).over(w))
      .withColumn("pack_id",
        floor((col("__cum") - col("n_tokens")) / budget.toDouble).cast("long"))
      .drop("__cum")
  }

  /** Top-k characteristic terms per document by smoothed TF-IDF
    * (tf × (ln((N+1)/(df+1)) + 1)).
    *
    * Three aggregates — term frequency (one shuffle on (doc, token)),
    * document frequency derived from tf (shuffle on token), corpus
    * size as a 1-row aggregate cross-joined in (broadcast scalar, no
    * driver-side count) — then a row_number window for top-k with a
    * deterministic (score desc, token) tiebreak. Every shuffle carries
    * (id, token, count) triples, never document text.
    */
  def tfidfTopTerms(docs: DataFrame, idCol: String, tokens: Column, k: Int): DataFrame = {
    val tf = docs.select(col(idCol).as("doc_id"), explode(tokens).as("token"))
      .filter(col("token") =!= "")
      .groupBy("doc_id", "token").agg(count("*").as("tf"))
    val df = tf.groupBy("token").agg(count("*").as("df"))
    val nDocs = docs.agg(count("*").as("n_docs"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("token"))
    tf.join(df, "token")
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf",
        col("tf") * (log((col("n_docs") + 1.0) / (col("df") + 1.0)) + 1.0))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("doc_id"), col("token"), col("rnk").cast("int").as("rnk"),
        round(col("tfidf"), 4).as("tfidf"))
  }

  /** Distribution-based quality gate: per group, keep rows whose
    * metric sits inside [loPct, hiPct] by percent_rank — trims both
    * tails (truncation-damaged shards at the bottom, concatenation
    * blobs at the top) relative to each group's own distribution
    * rather than a global constant. One shuffle on the group key.
    */
  def percentileGate(df: DataFrame, groupCol: String, metric: Column,
      loPct: Double, hiPct: Double, tiebreak: Column): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(metric, tiebreak)
    df.withColumn("pct_rank", percent_rank().over(w))
      .filter(col("pct_rank") >= loPct && col("pct_rank") <= hiPct)
  }
}
