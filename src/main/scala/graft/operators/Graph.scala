package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-analysis operators over edge lists. PageRank is the
  * web-corpus quality signal (a crawl-curation staple: rank domains /
  * pages before sampling) and the canonical iterative-join workload —
  * the shape that separates an engine that can only run DAGs from one
  * that can run fixpoint algorithms at scale.
  */
object Graph {

  /** Fixed-iteration PageRank over a directed edge list.
    *
    * rank₀ = 1/N; rankₖ₊₁(v) = (1−d)/N + d · Σ_{(u,v)∈E} rankₖ(u)/outdeg(u).
    *
    * Scale shape: the edge list is joined to the (node, rank) frame
    * once per iteration on the SAME src key — both sides
    * hash-partition on src, so on a real cluster each iteration is
    * one co-partitioned join + one aggregate on dst (the inflow
    * shuffle). Ranks are ∝ |V| rows, always the small side; edges are
    * scanned, never re-shuffled after the first iteration's exchange
    * is reused. Lineage is truncated per iteration (the Clusters
    * pattern) so the plan stays flat for any iteration count. N is
    * the one driver scalar (a count, as GraphX's PageRank also
    * materializes) — no other driver state.
    *
    * Dangling nodes (appearing only as dst) receive teleport + inflow
    * but emit nothing — their mass is dropped, the behavior of the
    * original formulation. Feed a symmetrized edge list (undirected
    * graphs) or pre-prune danglers when strict mass conservation
    * matters.
    *
    * @return (node, rank) — one row per distinct node in `edges`.
    */
  def pagerank(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int, damping: Double = 0.85,
      truncateEvery: Int = 1): DataFrame = {
    require(iterations >= 1, s"iterations $iterations must be >= 1")
    require(damping > 0.0 && damping < 1.0, s"damping $damping outside (0, 1)")
    require(truncateEvery >= 1, s"truncateEvery $truncateEvery must be >= 1")
    // reliable checkpoints when a dir is configured (executor loss
    // mid-iteration survives on a real cluster), executor-local
    // otherwise — the Clusters.connectedComponents contract; bounded
    // iteration counts keep the checkpoint footprint trivial
    val reliable = edges.sparkSession.sparkContext.getCheckpointDir.isDefined
    def truncate(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint(true) else df.localCheckpoint(true)

    // the raw edge list is truncated FIRST: everything below (degree
    // join input AND node set) derives from the materialized blocks,
    // so an expensive upstream edge derivation (pair explosion,
    // dedup) runs exactly once, not once per consumer
    val e = truncate(edges.select(col(srcCol).as("src"), col(dstCol).as("dst")))
    // (src, dst, outdeg): the per-iteration join input, materialized
    // once. count("*") over src = outdegree (parallel edges count,
    // as in the matrix formulation).
    val deg = e.groupBy("src").agg(count("*").as("__outdeg"))
    val ew = truncate(e.join(deg, "src"))
    val nodes = truncate(
      e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node")))
        .distinct())
    val n = nodes.count()
    // truncateEvery > 1 trades bounded lineage growth (plan depth ∝
    // truncateEvery) against fewer materialization barriers — each
    // skipped truncation saves one full rank-frame job; ranks are
    // ∝ |V| rows so the recompute inside a window is cheap
    var ranks = nodes.withColumn("rank", lit(1.0 / n))
    for (i <- 1 to iterations) {
      val inflow = ew.join(ranks, ew("src") === ranks("node"))
        .select(col("dst"), (col("rank") / col("__outdeg")).as("__c"))
        .groupBy("dst").agg(sum("__c").as("__in"))
      val next = nodes.join(inflow, nodes("node") === inflow("dst"), "left")
        .select(col("node"),
          (lit((1.0 - damping) / n) +
            lit(damping) * coalesce(col("__in"), lit(0.0))).as("rank"))
      ranks = if (i % truncateEvery == 0 || i == iterations) truncate(next) else next
    }
    ranks
  }
}
