package graft

import org.apache.spark.sql.functions._

import graft.functions.Text
import graft.functions.expr.SketchAggregates.{cms_agg, cms_estimate}
import graft.operators.Curation

/** Count-Min sketch properties against exact counts on real corpus
  * data (sf0.001 documents). */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private val depth = 4
  private val width = 2048

  private lazy val toks = graft.sources.Tables.documents(spark, sfDir)
    .select(explode(Text.tokens(col("text"))).as("token"))
    .filter(col("token") =!= "")

  test("CMS never under-counts and over-counts within the epsilon bound") {
    val n = toks.count()
    val sketch = toks.agg(cms_agg(xxhash64(col("token")), depth, width).as("sk"))
    val est = toks.groupBy("token").agg(count("*").as("exact"))
      .crossJoin(broadcast(sketch))
      .select(col("token"), col("exact"),
        cms_estimate(col("sk"), xxhash64(col("token")), depth, width).as("est"))
      .as[(String, Long, Long)].collect()
    assert(est.nonEmpty)
    est.foreach { case (t, exact, e) =>
      assert(e >= exact, s"CMS under-counted '$t': $e < $exact")
      // classic bound: overcount <= 2N/width w.p. >= 1-2^-depth per
      // query; allow 4x slack so the suite never flakes on the tail
      assert(e - exact <= 8L * n / width, s"'$t' overcount ${e - exact} (N=$n)")
    }
  }

  test("bloom decon: no false negatives vs the exact probe, few false positives") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val isBench = col("source").isin("src0", "src1")
    val corpus = docs.filter(!isBench)
    val bench = docs.filter(isBench)
    val exact = Curation.contaminationFlags(corpus, bench, "doc_id", "text", k = 5)
      .select("doc_id").as[Long].collect().toSet
    val bloom = Curation.contaminationFlagsBloom(corpus, bench, "doc_id", "text",
      n = 5, numBits = 1 << 22, kHashes = 3)
      .as[(Long, Boolean)].collect()
    val flagged = bloom.filter(_._2).map(_._1).toSet
    assert(bloom.length === corpus.count(), "one row per corpus doc")
    assert(exact.subsetOf(flagged),
      s"false negatives: ${exact.diff(flagged)} — Bloom filters cannot have any")
    val fps = flagged.diff(exact).size
    // m=4M bits vs a few hundred k inserted bits: FP rate ~1e-5; 1% of
    // the corpus is an order-of-magnitude-safe ceiling
    assert(fps <= math.max(1, bloom.length / 100), s"$fps false positives")
  }

  test("approxTopTokens finds the exact top token, deterministically") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val run = () => Curation.approxTopTokens(docs, Text.tokens(col("text")),
      col("text"), depth, width, sampleBuckets = 10, takeBuckets = 2, k = 20)
      .as[(String, Long)].collect()
    val a = run()
    val exactTop = toks.groupBy("token").agg(count("*").as("n"))
      .orderBy(col("n").desc, col("token")).as[(String, Long)].head()
    assert(a.head._1 === exactTop._1,
      s"CMS top-1 ${a.head} != exact top-1 $exactTop")
    // estimates rank by true frequency within sketch error; the exact
    // top token's estimate must dominate
    assert(a.head._2 >= exactTop._2)
    assert(run() === a, "CMS pipeline must be deterministic across runs")
  }
}
