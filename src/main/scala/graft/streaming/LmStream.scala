package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming LM quality scoring — the continuous deployment shape of
  * [[graft.operators.Curation.interpLogProb]]: the n-gram LM is a
  * FROZEN artifact trained once on a reference corpus (and refreshed
  * offline — the standing-index pattern), and every arriving document
  * is scored against it at ingest. This is how CCNet-style quality
  * filters actually run: the model must NOT drift with the stream it
  * is filtering, so scoring is pure stream-static lookup.
  *
  * Because the model is frozen, a document's score is independent of
  * its batch — streamed scores over any batching equal the one-shot
  * batch scoring exactly (parity spec).
  */
object LmStream {

  case class Doc(doc_id: Long, text: String)

  /** Frozen hash-keyed LM tables (persisted) + the two corpus
    * scalars. `vocab` counts distinct unigrams; unseen tokens take
    * add-one mass over (total + vocab + 1) — the +1 is the OOV
    * class, so every token (seen or not) gets positive probability
    * and no score is −∞. */
  final case class LmModel(bigram: DataFrame, prefix: DataFrame,
      unigram: DataFrame, total: Long, vocab: Long) {
    def release(): Unit = {
      bigram.unpersist(blocking = false)
      prefix.unpersist(blocking = false)
      unigram.unpersist(blocking = false)
    }
  }

  // bigram/unigram builders are SHARED with the batch operator
  // (Curation.bigramHashRows / unigramHashCounts) — one definition of
  // the tokenization + hash-seed convention, so frozen-LM scores can
  // never silently diverge from Curation.interpLogProb
  private def bigramRows(docs: DataFrame, idCol: String, tokens: Column): DataFrame =
    graft.operators.Curation.bigramHashRows(docs, idCol, tokens)

  /** Train (and materialize) the frozen LM: three map-side-combining
    * frequency aggregates over the corpus, 8-byte hash keys
    * throughout (the interpLogProb shapes), persisted as the standing
    * lookup tables. The corpus is tokenized twice (unigram pass +
    * bigram pass) and never again. */
  def trainLm(corpus: DataFrame, idCol: String, tokens: Column): LmModel = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val uni = graft.operators.Curation.unigramHashCounts(corpus, tokens)
      .persist(lvl)
    val withB = bigramRows(corpus, idCol, tokens)
    val bf = withB.groupBy("bigram_h").agg(count("*").as("bcnt")).persist(lvl)
    val pf = withB.groupBy("prefix_h").agg(count("*").as("pcnt")).persist(lvl)
    // two corpus scalars (land-time driver state, the centroid/codebook
    // pattern): total token occurrences and distinct vocab
    val Array(total, vocab) = uni
      .agg(sum("ucnt").cast("long"), count("*")).collect()(0)
      .toSeq.map(_.asInstanceOf[Long]).toArray
    bf.count(); pf.count() // materialize the standing tables once
    LmModel(bf, pf, uni, total, vocab)
  }

  /** Score one (micro-)batch against the frozen model:
    * avg ln(λ·P(w|prev) + (1−λ)·P_add1(w)) per doc, where
    * P(w|prev) = bcnt/pcnt (0 when the prefix or bigram is unseen —
    * the mixture backs off to the unigram) and
    * P_add1(w) = (ucnt+1)/(total+vocab+1) (positive for OOV tokens,
    * so scores are always finite). Docs with < 2 tokens drop out. */
  def scoreBatch(model: LmModel, batch: DataFrame, idCol: String,
      tokens: Column, lambda: Double): DataFrame = {
    require(lambda >= 0.0 && lambda < 1.0,
      s"lambda must be in [0,1) for OOV-safe scoring, got $lambda")
    val denom = (model.total + model.vocab + 1).toDouble
    bigramRows(batch, idCol, tokens)
      .join(model.bigram, Seq("bigram_h"), "left")
      .join(model.prefix, Seq("prefix_h"), "left")
      .join(model.unigram, Seq("token_h"), "left")
      .groupBy("doc_id")
      .agg(count("*").as("n_bigrams"),
        round(avg(log(
          lit(lambda) * coalesce(col("bcnt") / col("pcnt"), lit(0.0)) +
            lit(1.0 - lambda) *
              ((coalesce(col("ucnt"), lit(0L)) + 1) / lit(denom)))), 4)
          .as("avg_logprob"))
  }

  /** Drive [[scoreBatch]] per micro-batch via foreachBatch — the
    * ingest-time quality filter. Scores flow to the caller's sink
    * callback; the frozen tables are never recomputed or held as
    * streaming state. */
  def scoreQuery(stream: Dataset[Doc], model: LmModel, lambda: Double)(
      onBatch: DataFrame => Unit): StreamingQuery =
    stream.writeStream.outputMode("append")
      .foreachBatch { (batch: Dataset[Doc], _: Long) =>
        onBatch(scoreBatch(model, batch.toDF(), "doc_id",
          graft.functions.Text.tokens(col("text")), lambda))
      }
      .start()
}
