package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{Clusters, Dedup}

/** The continuous SemDeDup LOOP — the wired composition the probe
  * operators feed: a STANDING (node, cluster_id) labeling kept
  * current per micro-batch, with keep/drop DECISION DELTAS emitted as
  * each batch lands.
  *
  * Per batch:
  *   1. the standing embedding-LSH index is extended with the batch
  *      ([[Dedup.embeddingIndexAppend]] — replay-idempotent, so
  *      at-least-once foreachBatch delivery cannot duplicate index
  *      rows);
  *   2. the batch is probed against the EXTENDED index
  *      ([[Dedup.embeddingProbe]] — batch-only signing, probe keys
  *      broadcast), which surfaces corpus×batch AND batch×batch
  *      near-dup pairs in one pass (self-hits filtered, unordered
  *      pairs normalized);
  *   3. the new pairs fold into the standing labeling through the
  *      label-quotient graph ([[Clusters.incrementalComponents]] —
  *      CC rounds on the frontier-sized cluster graph, ONE remap join
  *      over the labeling); batch docs with no near-dup become their
  *      own singleton clusters;
  *   4. the emitted DELTA is every node whose (node → cluster_id)
  *      mapping is new or changed, with `keep = (node = cluster_id)`
  *      (min-id representative). That is the full decision feed: a
  *      newly-arrived duplicate emits `keep=false`; a batch that
  *      bridges two standing clusters re-labels the absorbed cluster,
  *      INCLUDING flipping its old representative to `keep=false` —
  *      the non-local effect a per-batch-only probe cannot express.
  *      A REPLAYED batch changes no mapping and emits an empty delta
  *      (idempotent against an upsert sink).
  *
  * State shape at 100 TB: the labeling is one (long, long) row per
  * corpus doc and the index one vector + `tables` band rows per doc —
  * both partitioned data, never driver state. Each batch touches the
  * corpus only in the one remap join and the id-projection anti-join
  * of the append; everything else is ∝ batch (probe candidates,
  * quotient CC). Standing frames are re-materialized lineage-free per
  * batch (`localCheckpoint`, the generation-swap pattern) so lineage
  * cannot grow with stream length; the durable cross-session twin is
  * [[checkpointTo]] / [[ClusterStream.resume]] on the
  * [[Clusters.clustersWrite]] bucketed table.
  */
final class ClusterStream private (
    @volatile private var index: Dedup.EmbeddingLshIndex,
    @volatile private var labelsState: DataFrame,
    idCol: String, vecCol: String, tau: Double, probeRadius: Int) {

  /** The standing (node, cluster_id) labeling (read-only view). */
  def labels: DataFrame = labelsState

  /** The standing embedding index (read-only view; lifecycle owned
    * by this loop — [[release]]). */
  def standingIndex: Dedup.EmbeddingLshIndex = index

  /** Fold one micro-batch of (id, vector) docs into the standing
    * state and return the decision delta:
    * `(node, cluster_id, keep)` for every node whose mapping is new
    * or changed. The delta is eagerly persisted (the pair-operator
    * caching contract) — callers unpersist when consumed. */
  def ingest(batch: DataFrame): DataFrame = {
    val prev = labelsState
    val prevIndex = index
    val ids = batch.select(col(idCol).cast("long").as("node")).distinct()

    val extended = Dedup.embeddingIndexAppend(prevIndex, batch, idCol, vecCol)
    // probe AGAINST THE EXTENDED index: one pass yields corpus×batch
    // and batch×batch pairs (a batch doc meets itself — filtered —
    // and each batch-internal pair meets in both orientations —
    // normalized + deduped)
    val pairs = Dedup.embeddingProbe(extended, batch, idCol, vecCol, tau, probeRadius)
      .filter(col("vec_a") =!= col("vec_b"))
      .select(least(col("vec_a"), col("vec_b")).as("vec_a"),
        greatest(col("vec_a"), col("vec_b")).as("vec_b"))
      .dropDuplicates("vec_a", "vec_b")

    val merged = Clusters.incrementalComponents(prev, pairs, "vec_a", "vec_b")
    val singletons = ids.join(merged.select("node"), Seq("node"), "left_anti")
      .select(col("node"), col("node").as("cluster_id"))
    // generation swap: materialize the new labeling lineage-free
    // BEFORE releasing the old one (foreachBatch frames are not
    // replayable after the micro-batch ends)
    val next = merged.union(singletons).localCheckpoint(true)

    val delta = next.as("n")
      .join(prev.select(col("node"), col("cluster_id").as("old_cid")).as("p"),
        Seq("node"), "left")
      .filter(col("old_cid").isNull || col("old_cid") =!= col("cluster_id"))
      .select(col("node"), col("cluster_id"),
        (col("node") === col("cluster_id")).as("keep"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    delta.count() // materialize while prev is still alive
    pairs.unpersist(blocking = false)
    prev.unpersist(blocking = false)
    index = extended
    labelsState = next
    delta
  }

  /** RETRACT documents from the standing state — the takedown path
    * (deleted/redacted corpus docs must stop matching probes AND
    * leave the clustering as if they never arrived). Removal from a
    * labeling is not a row delete: dropping a BRIDGE doc must SPLIT
    * its cluster, and dropping a representative renames the cluster
    * to its new min member. Both fall out of a LOCALIZED recompute:
    *
    *   1. the index retracts the ids ([[Dedup.embeddingIndexRemove]]);
    *   2. only the TOUCHED clusters (those containing a retracted
    *      node) are re-clustered: their remaining members' pairs are
    *      re-derived from the retracted index restricted to exactly
    *      those ids ([[Dedup.embeddingPairsFromIndex]] over a
    *      filtered view — work ∝ touched-cluster membership, not
    *      corpus), and CC re-runs on that subgraph;
    *   3. untouched clusters pass through without recompute — the
    *      corpus-sized work is the two labeling anti-joins/scans.
    *
    * Returns the decision delta: retracted nodes as tombstones
    * (`cluster_id` NULL, `keep` false), plus every surviving node
    * whose mapping changed (splits, representative renames) with the
    * usual `keep = (node = cluster_id)`. Retracting unknown ids is a
    * no-op. Eagerly persisted — callers unpersist. */
  def retract(ids: DataFrame): DataFrame = {
    val prev = labelsState
    val prevIndex = index
    val del = ids.select(col(ids.columns.head).cast("long").as("node")).distinct()

    val extended = Dedup.embeddingIndexRemove(prevIndex, del.select(col("node").as("id")), "id")
    val touched = prev.join(del, Seq("node"), "left_semi")
      .select(col("cluster_id")).distinct()
    val members = prev.join(touched, Seq("cluster_id"))
    val remaining = members.join(del, Seq("node"), "left_anti")
    // pairs among the remaining members of touched clusters, from the
    // already-retracted index restricted to those ids — candidate
    // join + cosine verify scoped to the touched membership
    val remIds = remaining.select(col("node").as("id"))
    val sub = Dedup.EmbeddingLshIndex(
      extended.vecs.join(remIds, Seq("id"), "left_semi"),
      extended.banded.join(remIds, Seq("id"), "left_semi"),
      extended.dim, extended.bits, extended.tables, extended.seed)
    val pairs = Dedup.embeddingPairsFromIndex(sub, tau, probeRadius)
    val cc = Clusters.connectedComponents(pairs, "vec_a", "vec_b")
    val singles = remaining.select("node")
      .join(cc.select("node"), Seq("node"), "left_anti")
      .select(col("node"), col("node").as("cluster_id"))
    val untouched = prev.join(touched, Seq("cluster_id"), "left_anti")
      .select(col("node"), col("cluster_id"))
    val next = untouched.union(cc.select(col("node"), col("cluster_id")))
      .union(singles).localCheckpoint(true)

    val changed = next.as("n")
      .join(prev.select(col("node"), col("cluster_id").as("old_cid")).as("p"),
        Seq("node"), "left")
      .filter(col("old_cid").isNull || col("old_cid") =!= col("cluster_id"))
      .select(col("node"), col("cluster_id"),
        (col("node") === col("cluster_id")).as("keep"))
    val tombstones = del.join(prev, Seq("node"), "left_semi")
      .select(col("node"), lit(null).cast("long").as("cluster_id"),
        lit(false).as("keep"))
    val delta = changed.union(tombstones)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    delta.count() // materialize while prev is still alive
    pairs.unpersist(blocking = false)
    prev.unpersist(blocking = false)
    index = extended
    labelsState = next
    delta
  }

  /** Land the standing labeling durably ([[Clusters.clustersWrite]]
    * contract — node-bucketed, similarity-regime params stamped). */
  def checkpointTo(table: String, sourceParams: Map[String, String],
      buckets: Int = 16): Unit =
    Clusters.clustersWrite(labelsState, table, sourceParams, buckets)

  def release(): Unit = {
    index.release()
    labelsState.unpersist(blocking = false)
  }
}

object ClusterStream {

  /** Start a loop from an already-labeled standing corpus: `index`
    * over the corpus vectors and `labels` its (node, cluster_id)
    * labeling (e.g. a previous [[Clusters.connectedComponents]] run
    * over [[Dedup.embeddingPairsFromIndex]] pairs). The loop takes
    * ownership of both. */
  def apply(index: Dedup.EmbeddingLshIndex, labels: DataFrame,
      idCol: String, vecCol: String, tau: Double,
      probeRadius: Int = 0): ClusterStream =
    new ClusterStream(index,
      labels.select(col("node"), col("cluster_id")).localCheckpoint(true),
      idCol, vecCol, tau, probeRadius)

  /** Start a loop from EMPTY state (cold start: the first batches
    * build the corpus). */
  def empty(spark: org.apache.spark.sql.SparkSession,
      idCol: String, vecCol: String,
      dim: Int, bits: Int, tables: Int, seed: Long, tau: Double,
      probeRadius: Int = 0): ClusterStream = {
    import spark.implicits._
    val noVecs = Seq.empty[(Long, Seq[Double], Double)].toDF("id", "v", "n2")
    val noBands = Seq.empty[(Long, Int, Long)].toDF("id", "tbl", "bucket")
    val noLabels = Seq.empty[(Long, Long)].toDF("node", "cluster_id")
    new ClusterStream(
      Dedup.EmbeddingLshIndex(noVecs, noBands, dim, bits, tables, seed),
      noLabels, idCol, vecCol, tau, probeRadius)
  }

  /** Resume a loop from the durable pair: a
    * [[Dedup.embeddingIndexLoad]]ed index and a
    * [[Clusters.clustersLoad]]ed labeling (params validated by those
    * loaders — a similarity-regime mismatch throws there). */
  def resume(spark: org.apache.spark.sql.SparkSession,
      vecsTable: String, bandTable: String, clustersTable: String,
      clusterParams: Map[String, String], idCol: String, vecCol: String,
      dim: Int, bits: Int, tables: Int, seed: Long, tau: Double,
      probeRadius: Int = 0): ClusterStream =
    apply(Dedup.embeddingIndexLoad(spark, vecsTable, bandTable, dim, bits, tables, seed),
      Clusters.clustersLoad(spark, clustersTable, clusterParams),
      idCol, vecCol, tau, probeRadius)

  /** Drive the loop from a stream: one [[ClusterStream.ingest]] per
    * micro-batch, the decision delta handed to `onBatch` (an
    * idempotent upsert sink in production — replays emit empty
    * deltas). The delta's persist is released when `onBatch`
    * returns. */
  def semdedupQuery(stream: Dataset[DedupStream.EmbDoc], loop: ClusterStream)
      (onBatch: DataFrame => Unit): StreamingQuery =
    stream.writeStream.outputMode("append")
      .foreachBatch { (batch: Dataset[DedupStream.EmbDoc], _: Long) =>
        val delta = loop.ingest(batch.toDF())
        try onBatch(delta) finally delta.unpersist(blocking = false)
      }
      .start()
}
