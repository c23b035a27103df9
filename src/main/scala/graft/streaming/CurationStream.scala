package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{Curation, Dedup, DeconIndex}

/** The END-TO-END continuous curation pipeline: every micro-batch
  * runs the same gauntlet a batch corpus build runs — exact-dup
  * probe against the standing corpus (batch hashes broadcast, the
  * corpus never shuffled), then the composite quality gate (C4 ∧
  * classifier ∧ repetition, each flag kept for attribution) — and
  * only survivors land. This is the composition a production ingest
  * actually deploys; each stage already exists and is gated
  * individually (dedup_incremental, quality_ensemble), so the spec
  * burden here is exactly one claim: streamed batches compose to the
  * batch pipeline on their union.
  *
  * Survivor rows carry the full decision record (dup_of + the three
  * quality flags + keep), so the downstream sink doubles as the
  * filter-attribution ledger. Batch independence: each batch is
  * judged against the FROZEN corpus plus nothing — cross-batch
  * duplicates are the standing-index loops' job (stream_dedup_probe
  * / the cluster loops); this driver is the stateless-per-batch
  * gauntlet that composes with them.
  */
object CurationStream {

  case class Doc(doc_id: Long, text: String)

  /** One micro-batch through the gauntlet (also the batch-parity
    * reference when handed the whole stream at once). Returns the
    * decision frame: (doc_id, dup_of nullable, c4_keep, clf_keep,
    * rep_ok, keep) — keep ⇔ not a duplicate AND every gate passed. */
  def curateBatch(corpus: DataFrame, batch: DataFrame,
      minWords: Int = 10, maxWords: Int = 50000, minSentences: Int = 0,
      bias: Double = -2.0, wLogTokens: Double = 0.6, wStopDev: Double = -6.0,
      wTokenLen: Double = 0.1, wPunct: Double = -4.0,
      maxTopTokenRatio: Double = 0.12,
      maxDupTrigramRatio: Double = 0.05): DataFrame =
    decide(Dedup.exactIncremental(corpus, batch, "doc_id", "text"),
      batch, minWords, maxWords, minSentences, bias, wLogTokens,
      wStopDev, wTokenLen, wPunct, maxTopTokenRatio, maxDupTrigramRatio)

  private def decide(dups: DataFrame, batch: DataFrame,
      minWords: Int, maxWords: Int, minSentences: Int,
      bias: Double, wLogTokens: Double, wStopDev: Double,
      wTokenLen: Double, wPunct: Double,
      maxTopTokenRatio: Double, maxDupTrigramRatio: Double): DataFrame = {
    val flags = Curation.qualityEnsemble(batch, "doc_id", "text",
      minWords, maxWords, minSentences, bias, wLogTokens, wStopDev,
      wTokenLen, wPunct, maxTopTokenRatio, maxDupTrigramRatio)
    dups.join(flags, "doc_id")
      .select(col("doc_id"), col("dup_of"),
        col("c4_keep"), col("clf_keep"), col("rep_ok"),
        (col("dup_of").isNull && col("keep")).as("keep"))
  }

  /** Continuous DECONTAMINATION probe — the standing-decon-index
    * loop completing the family (the minhashProbeQuery contract):
    * each micro-batch of corpus docs screens against the standing
    * benchmark shingle tables ([[DeconIndex]], built once at
    * benchmark-land time, append/remove-refreshed on the benchmark's
    * own release cadence). Per batch only the batch shingles; the
    * index side broadcasts — benchmark text is never re-read. */
  def deconProbeQuery(stream: Dataset[Doc],
      index: DeconIndex.DeconIndex)(
      onBatch: DataFrame => Unit): StreamingQuery =
    stream.writeStream.outputMode("append")
      .foreachBatch { (batch: Dataset[Doc], _: Long) =>
        onBatch(DeconIndex.deconProbeFromIndex(
          index, batch.toDF(), "doc_id", "text"))
      }
      .start()

  /** foreachBatch driver: run each micro-batch through the gauntlet
    * against the frozen corpus and hand the decision frame to the
    * sink callback. The corpus HASH index is built and persisted
    * ONCE (16 bytes/doc — corpus text is never re-hashed per batch);
    * micro-batches broadcast their own hashes into it, so per-batch
    * cost ∝ batch. The index's lifecycle is owned by the QUERY: a
    * termination listener unpersists it when the query stops (for
    * any reason), so a stopped gauntlet leaks no executor storage. */
  def curateQuery(stream: Dataset[Doc], corpus: DataFrame)(
      onBatch: DataFrame => Unit): StreamingQuery = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val corpusHashes = corpus
      .select(col("doc_id").as("__cid"), md5(col("text")).as("__h"))
      .persist(lvl)
    corpusHashes.count()
    val query = stream.writeStream.outputMode("append")
      .foreachBatch { (batch: Dataset[Doc], _: Long) =>
        val b = batch.toDF()
        val decided = decide(
          Dedup.exactIncrementalHashed(corpusHashes, b, "doc_id", "text"),
          b, 10, 50000, 0, -2.0, 0.6, -6.0, 0.1, -4.0, 0.12, 0.05)
          .persist(lvl)
        decided.count()
        try onBatch(decided)
        finally decided.unpersist(blocking = false)
      }
      .start()
    val spark = corpus.sparkSession
    val listener =
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        import org.apache.spark.sql.streaming.StreamingQueryListener._
        override def onQueryStarted(e: QueryStartedEvent): Unit = ()
        override def onQueryProgress(e: QueryProgressEvent): Unit = ()
        override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
          if (e.id == query.id) {
            corpusHashes.unpersist(blocking = false)
            spark.streams.removeListener(this)
          }
      }
    spark.streams.addListener(listener)
    // close the start→addListener race (r9 ADVICE): a query that
    // terminated before the listener registered never receives its
    // QueryTerminatedEvent — clean up inline in that case. (If the
    // event DID also fire, the double-unpersist/remove are no-ops.)
    if (!query.isActive) {
      corpusHashes.unpersist(blocking = false)
      spark.streams.removeListener(listener)
    }
    query
  }
}
