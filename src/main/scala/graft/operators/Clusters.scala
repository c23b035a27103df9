package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-duplicate pair list — the step
  * that turns pairwise dedup output into dedup decisions (keep one
  * doc per cluster, drop the rest).
  *
  * Iterative min-label propagation: every node starts as its own
  * label; each round every node takes the min of its own and its
  * neighbors' labels; fixpoint = each node holds the min id of its
  * component. Each round is one co-partitioned join + aggregate (the
  * Pregel step of Kiveris et al.'s "Connected Components in
  * MapReduce"-family algorithms); rounds ∝ component diameter, and
  * near-dup clusters are dense and tiny, so 3-4 rounds is typical.
  * Lineage is truncated per round (localCheckpoint), so plans stay
  * flat no matter the iteration count.
  */
object Clusters {

  /** @return (node, cluster_id) for every node appearing in `pairs`,
    *         cluster_id = min node id of the component. */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 25): DataFrame = {
    // undirected: propagate both ways
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .localCheckpoint(true)
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("cluster_id", col("node"))
      .localCheckpoint(true)
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      val neighborMin = edges.join(labels, edges("dst") === labels("node"))
        .groupBy(col("src").as("nb_node"))
        .agg(min("cluster_id").as("nb_min"))
      val next = labels.join(neighborMin, col("node") === col("nb_node"), "left")
        .select(col("node"),
          least(col("cluster_id"), coalesce(col("nb_min"), col("cluster_id"))).as("cluster_id"),
          (coalesce(col("nb_min"), col("cluster_id")) < col("cluster_id")).as("chg"))
        .localCheckpoint(true) // truncate lineage: plans stay O(1) deep
      changed = next.filter(col("chg")).count()
      labels = next.drop("chg")
      iter += 1
    }
    require(changed == 0, s"connectedComponents did not converge in $maxIter rounds")
    labels
  }
}
