package graft

/** Driver-contract smoke: the exact checks the round driver performs. */
class EntrySpec extends SparkSpec {

  test("entry() returns rows on sf0.001 (driver t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("oracle coverage stays high (rows-only checks are weaker)") {
    val rowsOnly = SparkEntry.queries.keySet.diff(SparkEntry.oracleSql.keySet)
    // the only rows-gated queries are the genuinely approximate /
    // engine-specific ones: LSH/IVF ANN variants (recall-tested
    // against ann_topk in SimilaritySpec), the HLL cardinality,
    // KLL-style quantile, and Count-Min frequency sketches (estimates
    // are engine-specific; accuracy-tested vs exact in EventsSpec /
    // CurationNewSpec / SketchSpec), and k-means (float-summation-
    // order-dependent centroids; separation/determinism/inertia
    // spec-tested). Every deterministic operator — including the
    // minhash and simhash sketches, whose hash pipelines the oracles
    // reproduce in HUGEINT arithmetic — is hash-verified.
    assert(rowsOnly === Set("ann_lsh", "ann_ivf", "ann_pq", "approx_distinct",
        "emb_kmeans", "approx_quantiles", "approx_topk"),
      s"unexpected rows-only queries: $rowsOnly")
  }
}
