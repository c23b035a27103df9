package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-duplicate pair list — the step
  * that turns pairwise dedup output into dedup decisions (keep one
  * doc per cluster, drop the rest).
  *
  * Min-label propagation with pointer jumping: every node starts as
  * its own label; each round every node takes the min of its own, its
  * neighbors', and its label's label (the shortcut step — following
  * the current label's own label halves chain depth, so convergence
  * is O(log diameter) rounds, not O(diameter): a 2^20-doc chain
  * resolves in ~20 rounds). Each round is two co-partitioned joins +
  * an aggregate — the Pregel/"shortcutting" step of Kiveris et al.'s
  * MapReduce connected-components family. Lineage is truncated per
  * round (reliable checkpoint when a checkpoint dir is configured —
  * the right choice on a real cluster, where executor loss must not
  * kill the lineage-truncated frame — else an executor-local
  * checkpoint), so plans stay flat no matter the iteration count.
  */
object Clusters {

  private def truncate(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint(true)
    else df.localCheckpoint(true)

  /** @return (node, cluster_id) for every node appearing in `pairs`,
    *         cluster_id = min node id of the component. */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 50): DataFrame = {
    // undirected: propagate both ways
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
    val e = truncate(edges)
    var labels = truncate(
      e.select(col("src").as("node")).distinct()
        .withColumn("cluster_id", col("node")))
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      // neighbor min
      val nbMin = e.join(labels, e("dst") === labels("node"))
        .groupBy(col("src").as("nb_node"))
        .agg(min("cluster_id").as("nb_min"))
      val prop = labels.join(nbMin, col("node") === col("nb_node"), "left")
        .select(col("node"), col("cluster_id").as("old_cluster"),
          least(col("cluster_id"), coalesce(col("nb_min"), col("cluster_id"))).as("mid"))
      // dense near-dup clusters converge in ≤2 plain rounds — pay for
      // the pointer-jumping self-join only once a long chain is the
      // plausible remaining shape
      val stepped =
        if (iter < 2) prop
        else {
          val jump = prop.select(col("node").as("j_node"), col("mid").as("j_mid"))
          prop.join(jump, col("mid") === col("j_node"), "left")
            .select(col("node"), col("old_cluster"),
              least(col("mid"), coalesce(col("j_mid"), col("mid"))).as("mid"))
        }
      val next = truncate(stepped.select(col("node"),
        col("mid").as("cluster_id"),
        (col("mid") < col("old_cluster")).as("chg")))
      changed = next.filter(col("chg")).count()
      labels = next.drop("chg")
      iter += 1
    }
    require(changed == 0,
      s"connectedComponents did not converge in $maxIter rounds " +
        s"(pointer jumping bounds rounds by ~log2(component size); " +
        s"$maxIter covers components beyond practical corpus sizes)")
    labels
  }
}
