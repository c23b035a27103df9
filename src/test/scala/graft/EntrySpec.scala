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
    // ones: PQ (driver-trained float codebook, summation-order-
    // dependent), the HLL cardinality sketch, and the GK quantile
    // sketch in its genuinely-approximate regime (accuracy-tested vs
    // exact in EventsSpec / SketchSpec; the exact-regime twins
    // q21a/q47a/q48a ARE hash-gated). Everything else — including
    // ann_lsh (seeded ±1 hyperplanes as literals), ann_ivf
    // (struct-min probe replay), emb_kmeans (unrolled Lloyd with
    // edge-rounded centroids) and approx_topk (the full Count-Min
    // counter pipeline in HUGEINT SQL) — is hash-verified against a
    // full-pipeline SQL oracle.
    assert(rowsOnly === Set("approx_distinct", "approx_quantiles"),
      s"unexpected rows-only queries: $rowsOnly")
  }
}
