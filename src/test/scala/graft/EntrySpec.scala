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
    // the only rows-gated query left is the GK quantile sketch in its
    // genuinely-approximate regime (merge-order-dependent, so no SQL
    // replay exists; accuracy-tested vs exact in SketchSpec — the
    // exact-regime twins q21a/q47a/q48a ARE hash-gated). Every other
    // sketch is hash-verified against a full-pipeline SQL oracle:
    // approx_topk (Count-Min counters in HUGEINT), ann_pq (codebook
    // re-derived via unrolled Lloyd) and, since r5, approx_distinct
    // (the deterministic-HLL register array — order-independent
    // max-of-rho — replayed end to end, estimator included).
    assert(rowsOnly === Set("approx_quantiles"),
      s"unexpected rows-only queries: $rowsOnly")
    // coverage floor: a refactor that silently drops registered
    // queries (or their oracles) must fail loudly here, not at the
    // driver's gate
    assert(SparkEntry.queries.size >= 118,
      s"query count regressed: ${SparkEntry.queries.size}")
    assert(SparkEntry.oracleSql.size >= 117,
      s"oracle count regressed: ${SparkEntry.oracleSql.size}")
  }
}
