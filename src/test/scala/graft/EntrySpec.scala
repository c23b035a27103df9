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
    // known non-SQL-expressible: sketch/LSH/heuristic operators
    assert(rowsOnly === Set("dedup_minhash_lsh", "dedup_simhash", "ann_lsh",
      "ann_ivf", "text_langid", "text_rolling_fp"),
      s"unexpected rows-only queries: $rowsOnly")
  }
}
