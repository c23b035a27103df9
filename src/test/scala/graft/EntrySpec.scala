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
    // the only rows-gated queries are the genuinely engine-specific
    // sketches: HLL cardinality and the GK quantile sketch in its
    // genuinely-approximate regime (both accuracy-tested vs exact in
    // EventsSpec / SketchSpec; the exact-regime twins q21a/q47a/q48a
    // ARE hash-gated). Everything else — including ann_lsh (seeded
    // ±1 hyperplanes as literals), ann_ivf (struct-min probe
    // replay), emb_kmeans (unrolled Lloyd with edge-rounded
    // centroids), approx_topk (the full Count-Min counter pipeline
    // in HUGEINT SQL) and, since r4, ann_pq (codebook re-derived in
    // SQL via unrolled per-subspace Lloyd) — is hash-verified
    // against a full-pipeline SQL oracle.
    assert(rowsOnly === Set("approx_distinct", "approx_quantiles"),
      s"unexpected rows-only queries: $rowsOnly")
    // coverage floor: a refactor that silently drops registered
    // queries (or their oracles) must fail loudly here, not at the
    // driver's gate
    assert(SparkEntry.queries.size >= 110,
      s"query count regressed: ${SparkEntry.queries.size}")
    assert(SparkEntry.oracleSql.size >= 108,
      s"oracle count regressed: ${SparkEntry.oracleSql.size}")
  }
}
