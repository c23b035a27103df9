package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Same-JVM A/B for the r18 verdict item-4 question: containment and
  * Jaccard share the whole shingle → inverted-index → shared-count
  * derivation — how much of the two queries' combined cost would a
  * shared-persist composition save when both run in one session?
  *
  * Arms (reps each, cache cleared between arms):
  *   a) dedup_ngram_jaccard as declared (full derivation)
  *   b) dedup_containment as declared (full derivation)
  *   c) SHARED: one derivation builds the (shared, n_a, n_b) frame,
  *      persisted; both scorings read the cache. c_total vs (a + b)
  *      is the reuse headroom the verdict asked to measure.
  *
  * Usage: runMain graft.tools.JaccReuseAb [sfDir] [reps]
  */
object JaccReuseAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = graft.Sessions.build(32, appName = "graft-jacc-reuse-ab")

    def docs = Tables.documents(spark, sfDir)
    def time(label: String)(f: => Long): Double = {
      val t0 = System.nanoTime()
      val n = f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[ab] $label%-28s $dt%7.3f s   ($n rows)")
      dt
    }

    // the shared derivation, replicated from the operators (k=3,
    // Auto cap, pruned sizes, a<b shuffled-hash self-join)
    def bothFrame(): DataFrame = {
      val dfCap = graft.operators.Dedup.autoCap(docs)
      val sh = docs
        .select(col("doc_id"),
          explode(graft.functions.expr.NativeFunctions
            .shingle_hashes(col("text"), 3)).as("s"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      sh.count()
      val hot = sh.groupBy("s").agg(count("*").as("df"))
        .filter(col("df") > dfCap).select("s")
      val shPruned = sh.join(broadcast(hot), Seq("s"), "left_anti")
      val sizes = shPruned.groupBy("doc_id").agg(count("*").as("n_sh"))
      val shared = shPruned.as("a")
        .join(shPruned.as("b").hint("shuffle_hash"),
          col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count("*").as("shared"))
      val both = shared
        .join(sizes.withColumnRenamed("doc_id", "doc_a")
          .withColumnRenamed("n_sh", "n_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b")
          .withColumnRenamed("n_sh", "n_b"), "doc_b")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      both.count()
      sh.unpersist(blocking = false)
      both
    }

    (1 to reps).foreach { r =>
      println(s"== rep $r ==")
      val a = time("a: jaccard declared") {
        val out = graft.operators.Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.6)
        val n = out.count(); out.unpersist(blocking = false); n
      }
      spark.catalog.clearCache()
      val b = time("b: containment declared") {
        val out = graft.operators.Dedup.containmentPairs(docs, "doc_id", "text", 3, 0.8)
        val n = out.count(); out.unpersist(blocking = false); n
      }
      spark.catalog.clearCache()
      var shared: DataFrame = null
      val cDerive = time("c: shared derivation") { shared = bothFrame(); shared.count() }
      val cJacc = time("c: jaccard from shared") {
        shared
          .withColumn("jaccard",
            round(col("shared") / (col("n_a") + col("n_b") - col("shared")), 4))
          .filter(col("jaccard") >= 0.6)
          .count()
      }
      val cCont = time("c: containment from shared") {
        shared
          .filter(col("shared") >= lit(0.8 - 0.6e-4) * least(col("n_a"), col("n_b")))
          .select(explode(array(
            struct(col("doc_a").as("doc_inner"), col("doc_b").as("doc_outer"),
              round(col("shared") / col("n_a"), 4).as("containment")),
            struct(col("doc_b").as("doc_inner"), col("doc_a").as("doc_outer"),
              round(col("shared") / col("n_b"), 4).as("containment")))).as("p"))
          .select(col("p.doc_inner"), col("p.doc_outer"), col("p.containment"))
          .filter(col("containment") >= 0.8)
          .count()
      }
      spark.catalog.clearCache()
      println(f"[ab] a+b=${a + b}%7.3f s  c_total=${cDerive + cJacc + cCont}%7.3f s  " +
        f"reuse_saves=${(a + b) - (cDerive + cJacc + cCont)}%7.3f s")
    }
    spark.stop()
  }
}
