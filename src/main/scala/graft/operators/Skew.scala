package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY.md §5). First line of defense is AQE's
  * runtime skew-join splitting (on in every session this library
  * builds); this manual salted join is for the cases AQE can't fix —
  * e.g. a single key holding >1 executor's worth of rows on BOTH
  * sides, or aggregations keyed by a pathological hot value.
  */
object Skew {

  /** Equi-join where `fact`'s `key` distribution is heavily skewed:
    * replicate each `small` row `salts` ways and scatter the fact
    * rows across the replicas by a deterministic hash of a unique
    * column — a hot key's rows land in `salts` different shuffle
    * partitions instead of one.
    *
    * `factUniqueCol` drives the scatter; it must be non-null (a row
    * id / primary key). Deterministic — safe under task retries
    * (never use rand() for salting: a retried task would re-salt
    * differently and drop/duplicate rows).
    */
  def saltedJoin(fact: DataFrame, small: DataFrame, key: String,
      salts: Int, factUniqueCol: String): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(col(factUniqueCol)), lit(salts)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase aggregation for a skewed group key: partial-aggregate
    * by (key, salt) first, then finish by key. The heavy key's input
    * is reduced `salts`-fold before the final single-partition
    * reduction. `agg` must be decomposable (sum/count/min/max —
    * supply both phases).
    */
  def saltedCount(df: DataFrame, key: String, salts: Int, uniqueCol: String): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(col(uniqueCol)), lit(salts)))
      .groupBy(col(key), col("__salt"))
      .agg(count("*").as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("n"))
}
