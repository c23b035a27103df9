package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.streaming.CurationStream
import graft.streaming.CurationStream.Doc

/** The end-to-end continuous curation gauntlet: streamed batches
  * must compose to the one-shot batch pipeline on their union. */
class CurationStreamSpec extends SparkSpec {
  import spark.implicits._

  implicit private def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private type Decision = (Long, Option[Long], Boolean, Boolean, Boolean, Boolean)

  test("curateBatch: duplicates of the corpus are cut, quality flags attribute") {
    val corpus = Seq((1L, "the corpus canonical passage with plenty of " +
      "words in it to pass the gate and then some more words")).toDF("doc_id", "text")
    val batch = Seq(
      // exact dup of corpus doc 1 → cut regardless of quality
      (10L, "the corpus canonical passage with plenty of " +
        "words in it to pass the gate and then some more words"),
      // clean novel doc → keeps (word count ok, classifier-friendly)
      (11L, "a perfectly reasonable fresh document that is written " +
        "in the plain style of the corpus and has a good number of words"),
      // too short → c4 gate kills it, dedup does not
      (12L, "too short")).toDF("doc_id", "text")
    val out = CurationStream.curateBatch(corpus, batch)
      .as[Decision].collect().map(r => r._1 -> r).toMap
    assert(out(10L)._2 === Some(1L) && !out(10L)._6, "corpus dup must be cut")
    assert(out(11L)._2.isEmpty && out(11L)._6, s"clean doc must keep: ${out(11L)}")
    assert(out(12L)._2.isEmpty && !out(12L)._3 && !out(12L)._6,
      "short doc must fail the C4 gate, not the dedup gate")
  }

  test("streamed micro-batches ≡ the batch gauntlet on their union") {
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val corpus = docs.filter(pmod(col("doc_id"), lit(10)) =!= 3)
    // plant one guaranteed corpus duplicate so the dup path is live
    val copied = corpus.orderBy("doc_id").limit(1)
      .as[(Long, String)].collect().head._2
    val arriving = docs.filter(pmod(col("doc_id"), lit(10)) === 3)
      .as[(Long, String)].collect().map { case (id, t) => Doc(id, t) } :+
      Doc(999999L, copied)
    val (b1, b2) = arriving.splitAt(arriving.length / 2)
    val got = scala.collection.mutable.Map.empty[Long, Decision]
    val mem = MemoryStream[Doc]
    val q = CurationStream.curateQuery(mem.toDS(), corpus) { decided =>
      decided.as[Decision].collect().foreach(r => got(r._1) = r)
    }
    try {
      mem.addData(b1.toSeq); q.processAllAvailable()
      mem.addData(b2.toSeq); q.processAllAvailable()
    } finally q.stop()
    val reference = CurationStream.curateBatch(corpus,
        arriving.toSeq.toDF("doc_id", "text"))
      .as[Decision].collect().map(r => r._1 -> r).toMap
    assert(got.keySet === reference.keySet)
    got.foreach { case (id, d) =>
      assert(d === reference(id), s"doc $id diverged: $d vs ${reference(id)}")
    }
    // the gauntlet is non-trivial: the planted dup is cut, and at
    // least one arriving doc survives every gate
    assert(got(999999L)._2.nonEmpty && !got(999999L)._6)
    assert(got.values.exists(_._6))
  }

  test("curateQuery releases the corpus hash index when the query stops") {
    val corpus = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).limit(50)
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val mem = MemoryStream[Doc]
    val q = CurationStream.curateQuery(mem.toDS(), corpus)(_ => ())
    try {
      mem.addData(Doc(1L, "hello streaming world of ample words"))
      q.processAllAvailable()
      assert(spark.sparkContext.getPersistentRDDs.keySet
        .diff(before).nonEmpty, "the corpus hash index never persisted")
    } finally q.stop()
    // the termination listener fires asynchronously on the event bus
    val deadline = System.currentTimeMillis() + 30000
    def leaked = spark.sparkContext.getPersistentRDDs.keySet.diff(before)
    while (leaked.nonEmpty && System.currentTimeMillis() < deadline)
      Thread.sleep(200)
    assert(leaked.isEmpty,
      s"corpus hash index leaked after query termination: $leaked")
  }
}
