package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.Text

/** The end-to-end batch curation pipeline: the composition a real
  * corpus run ships, built from the individually-gated stages —
  *
  *   raw corpus
  *     → near-dup removal        ([[Dedup.ngramJaccardPairs]] +
  *                                 [[Clusters.connectedComponents]],
  *                                 keep min-id representative)
  *     → quality gate            ([[Curation.qualityEnsemble]]:
  *                                 C4 ∧ classifier ∧ repetition)
  *     → decontamination         ([[Curation.contaminationFlagsBloom]]
  *                                 vs a held-out benchmark)
  *     → language-mix rebalance  ([[Curation.mixtureSample]])
  *     → source repeat factors   ([[Curation.epochsSample]], docs
  *                                 expanded to their epoch copies)
  *     → shard assignment        ([[Curation.shardAssign]] on
  *                                 (copy, content) so a doc's copies
  *                                 spread across shards)
  *     → sequence packing        ([[Curation.packSequences]] per
  *                                 shard in deterministic pos order)
  *
  * Every stage is the SAME operator its standalone gate runs — this
  * object only wires survivor sets through, so the composed oracle is
  * the component oracles' CTEs nested in sequence. The reference
  * pipeline ships its stages as separate Airflow tasks
  * (main_dag.py:16-47 task graph); here the whole funnel is ONE
  * declarative plan per output.
  *
  * Scale shape: the expensive stage (shingle pair-join + CC) runs
  * once; downstream gates are per-doc scans or broadcast probes over
  * the shrinking survivor set. Stage boundaries that feed multiple
  * downstream aggregates (dedup survivors; post-decon survivors,
  * whose lang/source sums parameterize mixture and epochs) are
  * persisted MEMORY_AND_DISK — the in-session stand-in for the
  * intermediate tables a 100 TB run would checkpoint between stages.
  * Callers own the lifecycle via [[Curated.release]].
  */
object CuratePipeline {

  /** Stage outputs of one curation run. `packed` is the shipping
    * artifact: one row per (doc copy) with its shard, within-shard
    * position and pack id. `report` is the one-row funnel. All
    * frames are lazy; `release()` drops the cached stage
    * boundaries once the caller has materialized what it needs. */
  final case class Curated(
      deduped: DataFrame,
      quality: DataFrame,
      deconned: DataFrame,
      mixed: DataFrame,
      epochs: DataFrame,
      packed: DataFrame,
      report: DataFrame,
      private val cached: Seq[DataFrame]) {
    def release(): Unit = cached.foreach(_.unpersist())

    /** True while every persisted stage boundary is still registered
      * with the cache manager. A harness-side `clearCache()` (the
      * Verify/Bench isolation step) deregisters them behind our back;
      * a memoizing caller must treat such an instance as STALE —
      * reusing it would recompute the dedup subtree once per
      * downstream reference instead of once total. */
    def isLive: Boolean = cached.forall(
      _.storageLevel != org.apache.spark.storage.StorageLevel.NONE)
  }

  /** Run the full funnel. Parameters are the standalone gates'
    * parameters, unchanged (see each stage's scaladoc for semantics
    * and scale notes). `benchSources` marks the held-out benchmark:
    * those docs feed the decon Bloom filter and are themselves
    * excluded from the training corpus at the decon stage. */
  def curate(docs: DataFrame, idCol: String, textCol: String,
      langCol: String, srcCol: String, weight: Column,
      benchSources: Seq[String],
      shingleK: Int, tau: Double,
      minWords: Int, maxWords: Int, minSentences: Int,
      bias: Double, wLogTokens: Double, wStopDev: Double,
      wTokenLen: Double, wPunct: Double,
      maxTopTokenRatio: Double, maxDupTrigramRatio: Double,
      deconN: Int, bloomBits: Int, bloomHashes: Int,
      langShares: Map[String, Double], defaultRate: Double,
      epochShares: Map[String, Double], budgetFactor: Double,
      maxEpochs: Double,
      nShards: Int, packBudget: Int,
      persistStages: Boolean = true,
      deconIndex: Option[DeconIndex.DeconIndex] = None): Curated = {
    // copies are folded into a synthetic unique id (uid = doc_id *
    // stride + copy) so downstream orderings stay total; the stride
    // bounds n_copies, which epochs clamps at maxEpochs (+1 for the
    // fractional-epoch draw)
    val uidStride = 16
    require(maxEpochs + 1 <= uidStride,
      s"maxEpochs $maxEpochs too large for uid stride $uidStride")

    def stage(df: DataFrame): DataFrame =
      if (persistStages) df.persist(StorageLevel.MEMORY_AND_DISK) else df

    // 1. near-dup removal: keep each cluster's min-id representative
    val drop = Clusters.connectedComponents(
        Dedup.ngramJaccardPairs(docs, idCol, textCol, shingleK, tau),
        "doc_a", "doc_b")
      .filter(col("node") =!= col("cluster_id"))
      .select(col("node").as("__drop"))
    val d1 = stage(docs.join(drop, docs(idCol) === col("__drop"), "left_anti"))

    // 2. quality ensemble over the dedup survivors
    val keepIds = Curation.qualityEnsemble(d1, idCol, textCol,
        minWords, maxWords, minSentences, bias, wLogTokens, wStopDev,
        wTokenLen, wPunct, maxTopTokenRatio, maxDupTrigramRatio)
      .filter(col("keep"))
      .select(col("doc_id").as(idCol))
    val d2 = d1.join(keepIds, Seq(idCol), "left_semi")

    // 3. decontamination: benchmark docs (from the RAW corpus — the
    // benchmark is a fixed external artifact, not subject to the
    // funnel) feed the Bloom filter; survivors sharing any shingle
    // are dropped, and benchmark-source docs never train
    val isBench = col(srcCol).isin(benchSources.map(lit): _*)
    val corpus2 = d2.filter(!isBench)
    // with a STANDING benchmark index ([[DeconIndex]]) the filter
    // re-aggregates from the stored distinct shingle hashes instead
    // of re-shingling benchmark text — flag-identical (a Bloom bitset
    // ORs, so occurrence multiplicity never changes a bit;
    // spec-proven), which is why the oracle needs no second form
    val flaggedIds = (deconIndex match {
      case Some(ix) =>
        require(ix.n == deconN,
          s"standing decon index shingle width ${ix.n} != pipeline deconN $deconN")
        DeconIndex.deconBloomFromIndex(ix, corpus2, idCol, textCol,
          bloomBits, bloomHashes)
      case None => Curation.contaminationFlagsBloom(
        corpus2, docs.filter(isBench), idCol, textCol,
        deconN, bloomBits, bloomHashes)
    })
      .filter(col("flagged"))
      .select(col("doc_id").as(idCol))
    val d3 = stage(corpus2.join(flaggedIds, Seq(idCol), "left_anti"))

    // 4. language-mix rebalance (rates derive from the SURVIVOR
    // corpus's per-lang weight — a genuine cross-stage dependency)
    val d4 = stage(Curation.mixtureSample(d3, langCol, weight,
      col(textCol), langShares, defaultRate))

    // 5. source repeat factors over the mixed corpus
    val ep = Curation.epochsSample(d4, srcCol, idCol,
      Text.tokenCount(col(textCol)), epochShares, budgetFactor, maxEpochs)

    // 6. expand to epoch copies; shard on (copy, content) so the
    // copies of an up-sampled doc land in different shards
    val expanded = d4.select(col(idCol), col(textCol))
      .join(ep.select(col(idCol), col("n_copies")), Seq(idCol))
      .filter(col("n_copies") >= 1)
      .select(col(idCol), col(textCol),
        explode(sequence(lit(0), col("n_copies") - 1)).as("copy"))
      .withColumn("__uid", col(idCol) * uidStride + col("copy"))
    val sharded = Curation.shardAssign(expanded, "__uid",
      concat(col("copy").cast("string"), lit(":"), col(textCol)), nShards)

    // 7. pack fixed-budget sequences per shard in pos order
    val packed = Curation.packSequences(sharded, "shard", "pos",
        Text.tokenCount(col(textCol)), packBudget,
        passthrough = Seq(idCol, "copy"))
      .select(col(idCol), col("copy"), col("shard"), col("pos"),
        col("n_tokens"), col("pack_id"))

    // the one-row funnel: per-stage survivor counts plus the final
    // sequence-writer stats — each term a 1-row aggregate
    def cnt(df: DataFrame, as: String) = df.agg(count(lit(1)).as(as))
    val report = cnt(docs, "n_raw")
      .crossJoin(cnt(d1, "n_dedup"))
      .crossJoin(cnt(d2, "n_quality"))
      .crossJoin(cnt(d3, "n_decon"))
      .crossJoin(cnt(d4, "n_mixture"))
      .crossJoin(packed.agg(count(lit(1)).as("n_copies"),
        countDistinct(col("shard"), col("pack_id")).as("n_packs"),
        sum(col("n_tokens").cast("long")).as("n_tokens")))

    Curated(d1, d2, d3, d4, ep, packed, report,
      cached = if (persistStages) Seq(d1, d3, d4) else Nil)
  }
}
