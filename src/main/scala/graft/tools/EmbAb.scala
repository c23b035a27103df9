package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Same-JVM A/B: the embedding-LSH pair pipeline under Spark's
  * default sort-merge preference vs shuffled-hash
  * (spark.sql.join.preferSortMergeJoin toggled per rep) — the
  * vector-carrying joins sort 256-byte array rows under SMJ.
  *
  * Usage: runMain graft.tools.EmbAb [sfDir] [reps]
  */
object EmbAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = graft.Sessions.build(32, appName = "graft-emb-ab")

    def emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

    def run(): Long = {
      val p = Dedup.embeddingPairsLsh(emb, "vec_id", "embedding",
        dim = 64, bits = 4, tables = 8, seed = 42L, tau = 0.4,
        localVecThreshold = 0) // pin: this A/B measures the distributed plan
      val n = p.count()
      spark.catalog.clearCache()
      n
    }

    // warm both regimes
    for (pref <- Seq("true", "false")) {
      spark.conf.set("spark.sql.join.preferSortMergeJoin", pref); run()
    }
    for (r <- 1 to reps; (arm, pref) <- Seq("smj" -> "true", "shj" -> "false")) {
      spark.conf.set("spark.sql.join.preferSortMergeJoin", pref)
      val t0 = System.nanoTime()
      val n = run()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[emb-ab] $arm rep$r: $dt%6.2f s  rows=$n")
    }
    spark.stop()
  }
}
