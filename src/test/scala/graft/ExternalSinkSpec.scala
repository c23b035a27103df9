package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._

import graft.sources.ExternalSink
import graft.sources.ExternalSink.{InMemoryStore, Mutation, VersionedStore}

/** Replay-safety contract of the external upsert/delete sink
  * (reference load step main_dag.py:313-396): version-guarded
  * mutations make at-least-once execution produce exactly-once
  * effects per key. */
object ExternalSinkSpec {
  val failuresToInject = new AtomicInteger(0)
  private val alreadyFailed =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  def resetFlaky(n: Int): Unit = { failuresToInject.set(n); alreadyFailed.clear() }

  /** Applies a PREFIX of the batch, then dies — the worst partial-
    * failure shape a retry has to recover from. Each batch fails at
    * most once (its RETRY must be allowed to succeed — the sink's
    * bounded per-batch retry is what's under test, not an
    * always-down store). */
  class Flaky(inner: VersionedStore) extends VersionedStore {
    override def applyBatch(batch: Seq[Mutation]): Unit = {
      val firstAttempt = alreadyFailed.add(batch.head.key)
      if (firstAttempt && failuresToInject.getAndDecrement() > 0) {
        inner.applyBatch(batch.take(batch.size / 2 + 1)) // lands half…
        throw new RuntimeException("store fell over mid-batch")
      }
      inner.applyBatch(batch)
    }
    override def close(): Unit = inner.close()
  }
}

class ExternalSinkSpec extends SparkSpec {
  import spark.implicits._

  private def changelog(rows: Seq[(String, Long, Boolean, String)]) =
    rows.toDF("key", "version", "is_delete", "body")
      .withColumn("payload", encode(col("body"), "UTF-8")).drop("body")

  private def write(name: String, df: org.apache.spark.sql.DataFrame,
      batchSize: Int = 500, flaky: Boolean = false): Unit =
    ExternalSink.writeChangelog(df, "key", "version", "is_delete", "payload",
      () => if (flaky) new ExternalSinkSpec.Flaky(InMemoryStore(name))
            else InMemoryStore(name),
      batchSize = batchSize, backoffMs = _ => ())

  private def liveBodies(name: String): Map[String, (Long, String)] =
    InMemoryStore.live(name).map { case (k, (v, p)) =>
      k -> ((v, new String(p.toArray, "UTF-8"))) }

  test("changelog lands highest version per key; deletes tombstone") {
    val name = "t_basic"; InMemoryStore.drop(name)
    write(name, changelog(Seq(
      ("a", 1L, false, "a1"), ("a", 3L, false, "a3"), ("a", 2L, false, "a2"),
      ("b", 1L, false, "b1"),
      ("c", 1L, false, "c1"), ("c", 2L, true, ""))))
    assert(liveBodies(name) === Map("a" -> ((3L, "a3")), "b" -> ((1L, "b1"))))
  }

  test("whole-job replay is a no-op on the landed state (exactly-once effect)") {
    val name = "t_replay"; InMemoryStore.drop(name)
    val df = changelog(Seq(
      ("a", 5L, false, "a5"), ("b", 2L, true, ""), ("c", 7L, false, "c7")))
    write(name, df)
    val once = liveBodies(name)
    val (_, mutationsAfterFirst) = InMemoryStore.stats(name)
    write(name, df) // the replay: same changelog, full re-run
    assert(liveBodies(name) === once)
    val (_, mutationsAfterSecond) = InMemoryStore.stats(name)
    // the replay really did hit the store again — and changed nothing
    assert(mutationsAfterSecond === 2 * mutationsAfterFirst)
  }

  test("mid-batch store failure + retry converges to the clean-run state") {
    val clean = "t_clean"; val dirty = "t_dirty"
    InMemoryStore.drop(clean); InMemoryStore.drop(dirty)
    val df = changelog((1 to 40).map(i => (f"k$i%02d", i.toLong, i % 7 == 0, s"v$i")))
    write(clean, df)
    ExternalSinkSpec.resetFlaky(3) // several batches die mid-apply once
    write(dirty, df, batchSize = 8, flaky = true)
    assert(liveBodies(dirty) === liveBodies(clean))
    ExternalSinkSpec.resetFlaky(0)
  }

  test("a replayed stale upsert cannot resurrect a deleted key") {
    val name = "t_tombstone"; InMemoryStore.drop(name)
    val store = InMemoryStore(name)
    store.applyBatch(Seq(Mutation("k", 3L, delete = false, "v3".getBytes)))
    store.applyBatch(Seq(Mutation("k", 5L, delete = true, Array.emptyByteArray)))
    // the at-least-once redelivery of the old upsert:
    store.applyBatch(Seq(Mutation("k", 3L, delete = false, "v3".getBytes)))
    assert(InMemoryStore.live(name) === Map.empty)
  }

  test("rows flow in bounded key-ordered batches") {
    val name = "t_batches"; InMemoryStore.drop(name)
    val df = changelog((1 to 100).map(i => (f"k$i%03d", 1L, false, s"v$i")))
      .repartition(1) // one writer → batch count is deterministic
    write(name, df, batchSize = 30)
    val (batches, mutations) = InMemoryStore.stats(name)
    assert(mutations === 100)
    assert(batches === 4) // ceil(100/30)
  }

  test("malformed changelog rows fail fast with a clear message, not an executor NPE") {
    val name = "t_nulls"; InMemoryStore.drop(name)
    val nullKey = Seq(("a", 1L, false, "x")).toDF("key", "version", "is_delete", "body")
      .withColumn("payload", encode(col("body"), "UTF-8")).drop("body")
      .withColumn("key", lit(null).cast("string"))
    val e1 = intercept[Exception] { write(name, nullKey) }
    assert(e1.getMessage.contains("null key") ||
      Option(e1.getCause).exists(_.getMessage.contains("null key")))
    val nullVersion = changelog(Seq(("a", 1L, false, "x")))
      .withColumn("version", lit(null).cast("long"))
    val e2 = intercept[Exception] { write(name, nullVersion) }
    assert(e2.getMessage.contains("null version") ||
      Option(e2.getCause).exists(_.getMessage.contains("null version")))
  }

  test("collapse happens before store traffic: one mutation per key, not per delta row") {
    val name = "t_collapse"; InMemoryStore.drop(name)
    write(name, changelog((1 to 50).map(i => ("hot", i.toLong, false, s"v$i"))))
    val (_, mutations) = InMemoryStore.stats(name)
    assert(mutations === 1, "50 versions of one key must land as ONE store write")
    assert(liveBodies(name) === Map("hot" -> ((50L, "v50"))))
  }
}
