package graft.tools

import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Same-JVM A/B: the shingle-index self-join as sort-merge (Spark's
  * default) vs shuffled-hash (hinted) — the dominant stage of every
  * jaccard/containment pair derivation. Run at sf0.1, quiet window.
  *
  * Usage: runMain graft.tools.PairsAb [sfDir] [reps]
  */
object PairsAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = graft.Sessions.build(32, appName = "graft-pairs-ab")

    def docs = Tables.documents(spark, sfDir)
    def index = docs.select(col("doc_id"),
      explode(graft.functions.expr.NativeFunctions
        .shingle_hashes(col("text"), 3)).as("s"))

    def pairs(hint: Option[String]): Long = {
      val sh = index.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val rhs = hint.fold(sh.as("b"))(h => sh.as("b").hint(h))
      val n = sh.as("a")
        .join(rhs, col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id"), col("b.doc_id"))
        .agg(count("*").as("shared"))
        .count()
      sh.unpersist(blocking = false)
      n
    }

    // warm both
    pairs(None); pairs(Some("shuffle_hash")); spark.catalog.clearCache()
    for (r <- 1 to reps; (arm, h) <- Seq(
        "smj" -> None, "shj" -> Some("shuffle_hash"))) {
      val t0 = System.nanoTime()
      val n = pairs(h)
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      println(f"[pairs-ab] $arm rep$r: $dt%6.2f s  rows=$n")
    }
    spark.stop()
  }
}
