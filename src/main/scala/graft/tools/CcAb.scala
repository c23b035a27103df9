package graft.tools

import graft.operators.{Clusters, Dedup}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** Same-JVM A/B of the r14 adaptive-CC dispatch (single-task
  * union-find when the measured graph fits one task) against the
  * distributed convergence loop it replaces below the threshold —
  * alternating reps so ambient drift hits both arms equally, with
  * driver-scheduled job counts per rep (the quantity the local
  * strategy exists to cut). Run at sf0.1 in a quiet window; results
  * recorded in SURVEY §6.
  *
  * Usage: runMain graft.tools.CcAb [sfDir]
  */
object CcAb {
  @volatile private var jobs = 0

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Sessions.build(32, appName = "graft-cc-ab")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs += 1
    })

    def docs = Tables.documents(spark, sfDir)
    def pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", k = 3, tau = 0.6)

    def clustersQ(thr: Long): DataFrame =
      Clusters.connectedComponents(pairs, "doc_a", "doc_b",
          localEdgeThreshold = thr)
        .select(col("node").as("doc_id"), col("cluster_id"))

    def keepQ(thr: Long): DataFrame = {
      val d = docs
      val drop = Clusters.connectedComponents(
          Dedup.ngramJaccardPairs(d, "doc_id", "text", k = 3, tau = 0.6),
          "doc_a", "doc_b", localEdgeThreshold = thr)
        .filter(col("node") =!= col("cluster_id"))
      d.join(drop, d("doc_id") === drop("node"), "left_anti").select("doc_id")
    }

    def incQ(thr: Long): DataFrame = {
      val allPairs = pairs
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val newA = pmod(col("doc_a"), lit(10)) === 3
      val newB = pmod(col("doc_b"), lit(10)) === 3
      val labels = Clusters.connectedComponents(
        allPairs.filter(!newA && !newB), "doc_a", "doc_b",
        localEdgeThreshold = thr)
      val out = Clusters.incrementalComponents(labels,
          allPairs.filter(newA || newB), "doc_a", "doc_b",
          localEdgeThreshold = thr)
        .select(col("node").as("doc_id"), col("cluster_id"))
        .localCheckpoint(true)
      allPairs.unpersist(blocking = false)
      out
    }

    def lpaQ(thr: Long): DataFrame =
      graft.operators.Graph.labelPropagation(
          graft.SparkEntry.hotSupplierGraph(spark, sfDir), "sa", "sb",
          iterations = 3, localEdgeThreshold = thr)
        .select(col("node").as("suppkey"), col("community"))

    val queries: Seq[(String, Long => DataFrame)] = Seq(
      "dedup_clusters" -> clustersQ _,
      "dedup_keep" -> keepQ _,
      "dedup_clusters_inc" -> incQ _,
      "graph_lpa" -> lpaQ _)

    // warm both arms (codegen + JIT) untimed
    queries.foreach { case (_, q) =>
      Seq(0L, Clusters.defaultLocalEdgeThreshold).foreach { thr =>
        q(thr).count(); spark.catalog.clearCache()
      }
    }

    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    queries.foreach { case (name, q) =>
      for (r <- 1 to reps; (arm, thr) <- Seq(
          "loop" -> 0L, "local" -> Clusters.defaultLocalEdgeThreshold)) {
        jobs = 0
        val t0 = System.nanoTime()
        val n = q(thr).count()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        println(f"[cc-ab] $name%-20s $arm%-6s rep$r: $dt%6.2f s  " +
          f"jobs=$jobs%3d  rows=$n")
      }
    }

    // DISTRIBUTED-strategy A/B (the r13 verdict's named ask): the
    // pointer-jumping min-label loop vs Kiveris large-star/small-star
    // alternation, on the real dedup pair graph (dense tiny clusters)
    // and on deep chains (pointer jumping's designed-for shape).
    // Timed as pure CC over a pre-materialized edge frame — the pair
    // derivation is shared cost, not part of the strategy choice.
    import spark.implicits._
    val realPairs = pairs.localCheckpoint(true)
    val chain = (1L until 4096L).map(i => (i, i + 1))
      .toDF("doc_a", "doc_b").localCheckpoint(true)
    for ((gname, g) <- Seq("dedup-pairs" -> realPairs, "chain4096" -> chain);
         r <- 1 to reps;
         (arm, run) <- Seq[(String, DataFrame => DataFrame)](
           "pj-loop" -> (d => Clusters.connectedComponents(d, "doc_a", "doc_b",
             localEdgeThreshold = 0)),
           "lsstars" -> (d => Clusters.connectedComponentsStars(d, "doc_a", "doc_b")))) {
      jobs = 0
      val t0 = System.nanoTime()
      val n = run(g).count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      println(f"[cc-ab] cc:$gname%-16s $arm%-7s rep$r: $dt%6.2f s  " +
        f"jobs=$jobs%3d  rows=$n")
    }
    spark.stop()
  }
}
