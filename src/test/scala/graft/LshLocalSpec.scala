package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}
import graft.sources.Tables

/** The adaptive-dispatch contract of the embedding-LSH family (the
  * Clusters r14 pattern): the single-task kernel is an EXACT twin of
  * the distributed plan — same seeded hyperplanes, same signature
  * fold, same cosine association, same tie order. */
class LshLocalSpec extends SparkSpec {
  import spark.implicits._

  test("embeddingPairsLsh: local strategy ≡ distributed (exact probes)") {
    val e = Tables.embeddings(spark, sfDir)
    def run(thr: Long) = Dedup.embeddingPairsLsh(e, "vec_id", "embedding",
        dim = 64, bits = 4, tables = 8, seed = 42L, tau = 0.4,
        localVecThreshold = thr)
      .as[(Long, Long)].collect().toSet
    val local = run(Long.MaxValue)
    val dist = run(0)
    assert(local.nonEmpty && local === dist)
  }

  test("embeddingPairsLsh: local strategy ≡ distributed (multi-probe r=1)") {
    val e = Tables.embeddings(spark, sfDir)
    def run(thr: Long) = Dedup.embeddingPairsLsh(e, "vec_id", "embedding",
        dim = 64, bits = 4, tables = 3, seed = 42L, tau = 0.4,
        probeRadius = 1, localVecThreshold = thr)
      .as[(Long, Long)].collect().toSet
    val local = run(Long.MaxValue)
    val dist = run(0)
    assert(local.nonEmpty && local === dist)
  }

  test("lshTopK: local strategy ≡ distributed (ranks included)") {
    val e = Tables.embeddings(spark, sfDir)
    val corpus = e.filter(col("vec_id") >= 8)
    val queries = e.filter(col("vec_id") < 8)
    def run(thr: Long) = Similarity.lshTopK(corpus, queries, "vec_id",
        "embedding", dim = 64, bits = 4, tables = 8, seed = 42L, k = 5,
        localVecThreshold = thr)
      .as[(Long, Int, Long)].collect().toSet
    val local = run(Long.MaxValue)
    val dist = run(0)
    assert(local.nonEmpty && local === dist)
  }

  test("local dispatch plan is single-task (Coalesce(1), no exchange)") {
    val e = Tables.embeddings(spark, sfDir)
    val plan = Dedup.embeddingPairsLsh(e, "vec_id", "embedding",
        dim = 64, bits = 4, tables = 8, seed = 42L, tau = 0.4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Coalesce 1"), plan)
    assert(!plan.contains("Exchange"), plan)
  }
}
