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
        .as[(Long, Long, Double)].collect().toSet
      assert(expected.nonEmpty)
      val got = scala.collection.mutable.Set.empty[(Long, Long, Double)]
      val mem = MemoryStream[Doc]
      val q = LmStream.scoreQuery(mem.toDS(), model, lambda = 0.9) { scored =>
        got ++= scored.as[(Long, Long, Double)].collect()
      }
      try {
        val size = math.max(1, streamDocs.size / 3)
        streamDocs.grouped(size).foreach { b => mem.addData(b); q.processAllAvailable() }
      } finally q.stop()
      assert(got.toSet === expected, "batching must not change frozen-LM scores")
    } finally model.release()
  }
}
