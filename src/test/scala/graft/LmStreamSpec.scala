package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.functions.Text
import graft.sources.Tables
import graft.streaming.LmStream
import graft.streaming.LmStream.Doc

/** Frozen-LM streaming quality scoring: the model is trained once on
  * the corpus; arriving docs score against it, batch-independently. */
class LmStreamSpec extends SparkSpec {
  import spark.implicits._

  implicit private def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("frozen LM scores: corpus-typical order beats scrambled, OOV stays finite") {
    val phrase = "the quick brown fox jumps over the lazy dog"
    val corpus = (1L to 20L).map(i => (i, phrase)).toDF("doc_id", "text")
    val model = LmStream.trainLm(corpus, "doc_id", Text.tokens(col("text")))
    try {
      val probe = Seq(
        Doc(100L, phrase),
        Doc(101L, "dog the brown lazy jumps fox quick over the"),
        Doc(102L, "entirely unseen vocabulary right here today")).toDF()
      val out = LmStream.scoreBatch(model, probe, "doc_id",
          Text.tokens(col("text")), lambda = 0.9)
        .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
      assert(out(100L) > out(101L), "frozen LM must prefer corpus word order")
      assert(out(101L) > out(102L), "in-vocab beats out-of-vocab")
      assert(!out(102L).isNegInfinity && !out(102L).isNaN,
        "OOV must stay finite (add-one floor)")
    } finally model.release()
  }

  test("streamed scoring over batches ≡ one-shot batch scoring (frozen model)") {
    val docs = Tables.documents(spark, sfDir)
    val corpus = docs.filter(pmod(col("doc_id"), lit(10)) =!= 3)
    val streamDocs = docs.filter(pmod(col("doc_id"), lit(10)) === 3)
      .select(col("doc_id"), col("text")).as[Doc].collect().sortBy(_.doc_id).toSeq
    val model = LmStream.trainLm(corpus, "doc_id", Text.tokens(col("text")))
    try {
      val expected = LmStream.scoreBatch(model, streamDocs.toDF(), "doc_id",
          Text.tokens(col("text")), lambda = 0.9)
        .as[(Long, Long, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(expected.nonEmpty)
      val got = scala.collection.mutable.Map.empty[Long, (Long, Double)]
      val mem = MemoryStream[Doc]
      val q = LmStream.scoreQuery(mem.toDS(), model, lambda = 0.9) { scored =>
        scored.as[(Long, Long, Double)].collect()
          .foreach(r => got(r._1) = (r._2, r._3))
      }
      try {
        val size = math.max(1, streamDocs.size / 3)
        streamDocs.grouped(size).foreach { b => mem.addData(b); q.processAllAvailable() }
      } finally q.stop()
      // exact-equality caveat: avg() folds a doc's log terms in
      // partial-aggregation order, so the two runs can differ at the
      // ulp and, on a .00005 rounding boundary, by one 4dp step —
      // compare with that tolerance, not set equality
      assert(got.keySet === expected.keySet)
      got.foreach { case (id, (n, score)) =>
        assert(n === expected(id)._1, s"doc $id bigram count")
        assert(math.abs(score - expected(id)._2) <= 1e-4 + 1e-9,
          s"doc $id: streamed $score vs batch ${expected(id)._2}")
      }
    } finally model.release()
  }
}
