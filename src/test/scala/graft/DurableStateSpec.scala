package graft

import org.apache.spark.sql.functions._
import graft.operators.{Clusters, Dedup}
import graft.sources.Tables

/** Durable standing-state contracts added in round 6 and hardened in
  * round 7: the cluster-state table (clustersWrite/clustersLoad), the
  * index-side self-dedup, and idempotent index append. */
class DurableStateSpec extends SparkSpec {
  import spark.implicits._

  private val (dim, bits, tables, seed, tau) = (64, 4, 8, 42L, 0.4)

  test("embeddingPairsFromIndex ≡ embeddingPairsLsh on the same corpus") {
    val emb = Tables.embeddings(spark, sfDir)
    val direct = Dedup.embeddingPairsLsh(emb, "vec_id", "embedding",
      dim, bits, tables, seed, tau)
    val index = Dedup.embeddingIndex(emb, "vec_id", "embedding",
      dim, bits, tables, seed)
    val viaIndex = Dedup.embeddingPairsFromIndex(index, tau)
    val a = direct.as[(Long, Long)].collect().toSet
    val b = viaIndex.as[(Long, Long)].collect().toSet
    assert(a.nonEmpty, "gate corpus should contain near-dups")
    assert(a === b)
    direct.unpersist(blocking = false)
    viaIndex.unpersist(blocking = false)
    index.release()
  }

  test("embeddingIndexAppend is idempotent under batch replay") {
    val emb = Tables.embeddings(spark, sfDir)
    val corpus = emb.filter(pmod(col("vec_id"), lit(10)) =!= 3)
    val batch = emb.filter(pmod(col("vec_id"), lit(10)) === 3)

    // reference: one append over a fresh index
    val ref = Dedup.embeddingIndexAppend(
      Dedup.embeddingIndex(corpus, "vec_id", "embedding", dim, bits, tables, seed),
      batch, "vec_id", "embedding")
    val refPairs = Dedup.embeddingPairsFromIndex(ref, tau)
    val expected = refPairs.as[(Long, Long)].collect().toSet
    val (refVecs, refBands) = (ref.vecs.count(), ref.banded.count())
    refPairs.unpersist(blocking = false)
    ref.release()

    // at-least-once delivery: the same batch re-delivered → no
    // duplicate index rows, no duplicate pairs
    val replayed = Dedup.embeddingIndexAppend(
      Dedup.embeddingIndexAppend(
        Dedup.embeddingIndex(corpus, "vec_id", "embedding", dim, bits, tables, seed),
        batch, "vec_id", "embedding"),
      batch, "vec_id", "embedding")
    assert(replayed.vecs.count() === refVecs)
    assert(replayed.banded.count() === refBands)
    val replayedPairs = Dedup.embeddingPairsFromIndex(replayed, tau)
    assert(replayedPairs.as[(Long, Long)].collect().toSet === expected)
    replayedPairs.unpersist(blocking = false)
    replayed.release()

    // and the appended index ≡ an index built over the union outright
    val full = Dedup.embeddingIndex(emb, "vec_id", "embedding",
      dim, bits, tables, seed)
    val fullPairs = Dedup.embeddingPairsFromIndex(full, tau)
    assert(fullPairs.as[(Long, Long)].collect().toSet === expected)
    fullPairs.unpersist(blocking = false)
    full.release()
  }

  test("minhashIndexAppend is idempotent and ≡ build-over-union") {
    val docs = Tables.documents(spark, sfDir)
    val corpus = docs.filter(pmod(col("doc_id"), lit(10)) =!= 3)
    val batch = docs.filter(pmod(col("doc_id"), lit(10)) === 3)
    val (k, perms, bands, mtau) = (3, 64, 16, 0.5)

    val ref = Dedup.minhashIndexAppend(
      Dedup.minhashIndex(corpus, "doc_id", "text", k, perms, bands),
      batch, "doc_id", "text")
    val refPairs = Dedup.minhashPairsFromIndex(ref, mtau)
    val expected = refPairs.select("doc_a", "doc_b")
      .as[(Long, Long)].collect().toSet
    val (refSigs, refBands) = (ref.sigs.count(), ref.banded.count())
    assert(expected.nonEmpty, "gate corpus should contain near-dups")
    refPairs.unpersist(blocking = false)
    ref.release()

    // re-delivered batch → no duplicate sig/band rows, same pairs
    val replayed = Dedup.minhashIndexAppend(
      Dedup.minhashIndexAppend(
        Dedup.minhashIndex(corpus, "doc_id", "text", k, perms, bands),
        batch, "doc_id", "text"),
      batch, "doc_id", "text")
    assert(replayed.sigs.count() === refSigs)
    assert(replayed.banded.count() === refBands)
    val replayedPairs = Dedup.minhashPairsFromIndex(replayed, mtau)
    assert(replayedPairs.select("doc_a", "doc_b")
      .as[(Long, Long)].collect().toSet === expected)
    replayedPairs.unpersist(blocking = false)
    replayed.release()

    // appended ≡ an index built over the union outright
    val full = Dedup.minhashIndex(docs, "doc_id", "text", k, perms, bands)
    val fullPairs = Dedup.minhashPairsFromIndex(full, mtau)
    assert(fullPairs.select("doc_a", "doc_b")
      .as[(Long, Long)].collect().toSet === expected)
    fullPairs.unpersist(blocking = false)
    full.release()
  }

  test("index removal: retract ≡ build-without, unknown ids no-op, re-admit works") {
    val docs = Tables.documents(spark, sfDir)
    val victims = docs.filter(pmod(col("doc_id"), lit(10)) === 7)
    val survivors = docs.filter(pmod(col("doc_id"), lit(10)) =!= 7)
    val (k, perms, bands, mtau) = (3, 64, 16, 0.5)

    // minhash: remove ≡ build over the survivors
    val removed = Dedup.minhashIndexRemove(
      Dedup.minhashIndex(docs, "doc_id", "text", k, perms, bands),
      victims.select("doc_id"), "doc_id")
    val direct = Dedup.minhashIndex(survivors, "doc_id", "text", k, perms, bands)
    val pr = Dedup.minhashPairsFromIndex(removed, mtau)
    val pd = Dedup.minhashPairsFromIndex(direct, mtau)
    val got = pr.select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(got === pd.select("doc_a", "doc_b").as[(Long, Long)].collect().toSet)
    pr.unpersist(blocking = false); pd.unpersist(blocking = false)
    direct.release()
    // unknown ids: no-op
    val again = Dedup.minhashIndexRemove(removed,
      Seq(999999990L, 999999991L).toDF("doc_id"), "doc_id")
    val pa = Dedup.minhashPairsFromIndex(again, mtau)
    assert(pa.select("doc_a", "doc_b").as[(Long, Long)].collect().toSet === got)
    pa.unpersist(blocking = false)
    // re-admit: append restores the removed docs
    val readmitted = Dedup.minhashIndexAppend(again, victims, "doc_id", "text")
    val full = Dedup.minhashIndex(docs, "doc_id", "text", k, perms, bands)
    assert(readmitted.sigs.count() === full.sigs.count())
    val prr = Dedup.minhashPairsFromIndex(readmitted, mtau)
    val pf = Dedup.minhashPairsFromIndex(full, mtau)
    assert(prr.select("doc_a", "doc_b").as[(Long, Long)].collect().toSet ===
      pf.select("doc_a", "doc_b").as[(Long, Long)].collect().toSet)
    prr.unpersist(blocking = false); pf.unpersist(blocking = false)
    readmitted.release(); full.release()

    // embedding twin: remove ≡ build over the survivors
    val emb = Tables.embeddings(spark, sfDir)
    val eRemoved = Dedup.embeddingIndexRemove(
      Dedup.embeddingIndex(emb, "vec_id", "embedding", dim, bits, tables, seed),
      emb.filter(pmod(col("vec_id"), lit(10)) === 7).select("vec_id"), "vec_id")
    val eDirect = Dedup.embeddingIndex(
      emb.filter(pmod(col("vec_id"), lit(10)) =!= 7),
      "vec_id", "embedding", dim, bits, tables, seed)
    val er = Dedup.embeddingPairsFromIndex(eRemoved, tau)
    val ed = Dedup.embeddingPairsFromIndex(eDirect, tau)
    assert(er.as[(Long, Long)].collect().toSet ===
      ed.as[(Long, Long)].collect().toSet)
    er.unpersist(blocking = false); ed.unpersist(blocking = false)
    eRemoved.release(); eDirect.release()
  }

  test("clustersWrite/clustersLoad roundtrip, param guards both directions") {
    val params = Map("pairs" -> "ngram_jaccard", "k" -> "3", "tau" -> "0.6")
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 3L)).toDF("node", "cluster_id")
    spark.sql("DROP TABLE IF EXISTS clusters_spec")
    try {
      Clusters.clustersWrite(labels, "clusters_spec", params)
      val back = Clusters.clustersLoad(spark, "clusters_spec", params)
      assert(back.select("node", "cluster_id").as[(Long, Long)]
        .collect().toSet === Set((1L, 1L), (2L, 1L), (3L, 3L)))
      // wrong value → throw
      intercept[IllegalArgumentException] {
        Clusters.clustersLoad(spark, "clusters_spec", params + ("tau" -> "0.9"))
      }
      // requested-but-unstamped key → throw
      intercept[IllegalArgumentException] {
        Clusters.clustersLoad(spark, "clusters_spec", params + ("perms" -> "128"))
      }
      // stamped-but-unrequested key (subset load) → throw: unstated
      // params could encode a different similarity regime
      intercept[IllegalArgumentException] {
        Clusters.clustersLoad(spark, "clusters_spec", params - "k")
      }
      // not a clustersWrite table → throw
      spark.sql("DROP TABLE IF EXISTS clusters_alien")
      Seq((1L, 1L)).toDF("node", "cluster_id")
        .write.mode("overwrite").saveAsTable("clusters_alien")
      intercept[IllegalArgumentException] {
        Clusters.clustersLoad(spark, "clusters_alien", Map.empty)
      }
      spark.sql("DROP TABLE IF EXISTS clusters_alien")
    } finally spark.sql("DROP TABLE IF EXISTS clusters_spec")
  }

  test("clustersWrite survives quote/backslash metacharacters in values") {
    val params = Map("note" -> """it's a 'quoted' \ value""")
    val labels = Seq((7L, 7L)).toDF("node", "cluster_id")
    spark.sql("DROP TABLE IF EXISTS clusters_quote_spec")
    try {
      Clusters.clustersWrite(labels, "clusters_quote_spec", params)
      val back = Clusters.clustersLoad(spark, "clusters_quote_spec", params)
      assert(back.count() === 1L)
      // a key that could escape the property-name literal is rejected
      intercept[IllegalArgumentException] {
        Clusters.clustersWrite(labels, "clusters_quote_spec",
          Map("bad'key" -> "v"))
      }
    } finally spark.sql("DROP TABLE IF EXISTS clusters_quote_spec")
  }
}
