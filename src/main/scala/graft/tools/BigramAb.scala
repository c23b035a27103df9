package graft.tools

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Same-JVM A/B for the bigram-hash kernel (r15): the old form —
  * interpreted `zip_with` over two sliced copies of the token array
  * with three `xxhash64` calls per element — vs the new one-pass
  * [[graft.functions.expr.BigramHashes]] expression (per-token seed-1L
  * hash computed once, Spark's own XxHash64Function kernel).
  *
  * Both arms explode the documents table's bigram triples and reduce
  * to one xor-checksum per hash column, so the measured work is
  * exactly the per-row kernel plus one scan, and identical checksums
  * prove bit-identity on the real corpus. Arms alternate within one
  * JVM per the measurement discipline.
  *
  * Usage: runMain graft.tools.BigramAb [sfDir] [reps]
  */
object BigramAb {
  /** The pre-r15 composition, reconstructed verbatim for the A arm. */
  private def oldTriples(t: Column): Column = zip_with(
    slice(t, lit(1), size(t) - 1),
    slice(t, lit(2), size(t) - 1),
    (a, b) => struct(xxhash64(lit(1L), a).as("prefix_h"),
      xxhash64(lit(2L), a, b).as("bigram_h"),
      xxhash64(lit(1L), b).as("token_h")))

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = graft.Sessions.build(32, appName = "graft-bigram-ab")

    val toks = array_remove(graft.functions.Text.tokens(col("text")), "")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(toks.as("__t")).filter(size(col("__t")) >= 2)

    def run(f: Column => Column): (Long, Long, Long) = {
      val r = docs.select(explode(f(col("__t"))).as("p"))
        .select(col("p.prefix_h").as("ph"), col("p.bigram_h").as("bh"),
          col("p.token_h").as("th"))
        .agg(sum(col("ph").bitwiseAND(lit(0xffffL))).as("a"),
          sum(col("bh").bitwiseAND(lit(0xffffL))).as("b"),
          sum(col("th").bitwiseAND(lit(0xffffL))).as("c")).collect()(0)
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }

    val native = graft.functions.expr.NativeFunctions.bigram_hashes _
    run(oldTriples); run(native) // warm both paths
    for (r <- 1 to reps; (arm, f) <- Seq(
        "old-zipwith" -> (oldTriples _), "new-1pass" -> native)) {
      val t0 = System.nanoTime()
      val chk = run(f)
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[bigram-ab] $arm rep$r: $dt%6.3f s  checksum=$chk")
    }
    spark.stop()
  }
}
