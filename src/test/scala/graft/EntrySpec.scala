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
    // known non-SQL-expressible: the xxhash64-based simhash (DuckDB
    // has no xxhash64), the LSH/IVF approximate variants (recall-
    // tested against ann_topk in SimilaritySpec instead), and the HLL
    // cardinality sketch (estimates are engine-specific; accuracy-
    // tested vs exact in EventsSpec). dedup_minhash_lsh IS oracle-
    // gated: its hash pipeline is reproduced in HUGEINT arithmetic.
    assert(rowsOnly === Set("dedup_simhash", "ann_lsh",
      "ann_ivf", "approx_distinct"),
      s"unexpected rows-only queries: $rowsOnly")
  }
}
