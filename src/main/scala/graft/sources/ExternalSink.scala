package graft.sources

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Idempotent external upsert/delete sink — the reference's load step
  * (main_dag.py:313-396: a driver-side loop of row-wise Cassandra
  * INSERTs plus a DELETE per removed key) re-shaped as a distributed,
  * replay-safe `foreachPartition` writer.
  *
  * The contract a JDBC / key-value load needs at scale:
  *
  *  - **one writer per key**: the changelog is repartitioned on key,
  *    so no two tasks ever race on the same key;
  *  - **latest-version-per-key collapse** before writing: a job
  *    writes each key at most once, whatever the delta contained;
  *  - **version-guarded mutations**: the store applies (key, version)
  *    only if version exceeds what it already holds — so a REPLAYED
  *    task (retry, speculation, whole-job re-run) re-applies the same
  *    mutations as no-ops: exactly-once EFFECT per key on top of
  *    at-least-once execution, without distributed transactions;
  *  - **versioned delete tombstones**: a replayed earlier upsert
  *    cannot resurrect a deleted key;
  *  - **ordered bounded batches**: rows flow key-sorted in
  *    `batchSize` chunks (bounded writer memory; a deterministic key
  *    order is what real stores need to avoid deadlocking concurrent
  *    batch writers), with deterministic bounded retry per batch.
  */
object ExternalSink {

  /** One store mutation: an upsert carrying a payload, or a delete
    * tombstone. `version` is the monotonic per-key guard.
    *
    * Version contract ACROSS jobs: versions must be STRICTLY
    * increasing per key over the lifetime of the store — deletes
    * included. The store guard is strictly-newer (equal versions are
    * no-ops, which is what makes replays idempotent), and the
    * delete-wins tiebreak in [[collapse]] only arbitrates within one
    * job — a later job issuing a delete that REUSES the version of an
    * already-landed upsert is silently dropped. Event-time or a
    * monotonic change-log sequence as the version satisfies this;
    * per-job counters restarting from 0 do not. */
  case class Mutation(key: String, version: Long, delete: Boolean,
      payload: Array[Byte])

  /** The collapse plan [[writeChangelog]] writes from — exposed so
    * plan-shape specs assert on the PRODUCTION window (rank-1 over
    * (key → version desc, delete-wins tiebreak)), not a private
    * re-implementation. One shuffle, which doubles as the
    * one-writer-per-key partitioning; the rank-1 filter sits directly
    * on the window so WindowGroupLimit prunes rank>1 map-side; the
    * sort feeds key-ordered batches for free. */
  private[graft] def collapse(changes: DataFrame, keyCol: String,
      versionCol: String, deleteCol: String, payloadCol: String): DataFrame = {
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__v").desc, col("__d").desc)
    changes
      .select(col(keyCol).cast("string").as("__k"),
        col(versionCol).cast("long").as("__v"),
        col(deleteCol).cast("boolean").as("__d"),
        col(payloadCol).cast("binary").as("__p"))
      // fail fast, loudly, on malformed changelog rows: a null key /
      // version / flag would otherwise surface as an opaque NPE deep
      // inside an executor write task (null ConcurrentHashMap key,
      // getLong on null) — same loud-fail stance as mergeApply
      .withColumn("__k", when(col("__k").isNotNull, col("__k")).otherwise(
        raise_error(concat(lit("ExternalSink: null key in changelog (version="),
          coalesce(col("__v").cast("string"), lit("null")), lit(")")))))
      .withColumn("__v", when(col("__v").isNotNull, col("__v")).otherwise(
        raise_error(concat(lit("ExternalSink: null version for key "), col("__k")))))
      .withColumn("__d", when(col("__d").isNotNull, col("__d")).otherwise(
        raise_error(concat(lit("ExternalSink: null delete flag for key "), col("__k")))))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
      .sortWithinPartitions("__k")
  }

  /** The external store contract. One instance per partition task
    * (created by the factory passed to [[writeChangelog]] — never
    * serialized), closed on task completion. `applyBatch` must be
    * individually idempotent per mutation (version guard); it may
    * fail midway — the sink retries the whole batch, and the guard
    * makes the re-application of the already-landed prefix a no-op.
    */
  trait VersionedStore extends AutoCloseable {
    def applyBatch(batch: Seq[Mutation]): Unit
    override def close(): Unit = ()
  }

  /** Write a changelog frame (`keyCol`: string key, `versionCol`:
    * monotonic long, `deleteCol`: boolean, `payloadCol`: binary) to
    * an external store. Safe to re-run in full (idempotent job), safe
    * under task retry/speculation (idempotent task). */
  def writeChangelog(changes: DataFrame, keyCol: String, versionCol: String,
      deleteCol: String, payloadCol: String,
      newStore: () => VersionedStore,
      batchSize: Int = 500, maxAttempts: Int = 3,
      backoffMs: Long => Unit = Thread.sleep): Unit = {
    require(batchSize >= 1 && maxAttempts >= 1, "bad sink config")
    val winners = collapse(changes, keyCol, versionCol, deleteCol, payloadCol)

    winners.foreachPartition { (rows: Iterator[Row]) =>
      val store = newStore() // one store client per partition task
      try {
        rows.map(r => Mutation(r.getString(0), r.getLong(1), r.getBoolean(2),
            if (r.isNullAt(3)) Array.emptyByteArray else r.getAs[Array[Byte]](3)))
          .grouped(batchSize)
          .foreach { batch =>
            var attempt = 0
            var done = false
            while (!done) {
              attempt += 1
              try { store.applyBatch(batch); done = true }
              catch { case e: Exception =>
                if (attempt >= maxAttempts) throw e
                // deterministic bounded backoff (same rule as Fetch)
                backoffMs(math.min(5000L, 50L << math.min(attempt - 1, 30)))
              }
            }
          }
      } finally store.close()
    }
  }

  /** Embedded reference implementation of [[VersionedStore]]: an
    * in-JVM named store (local-mode executors share the JVM, so specs
    * can inspect the landed state). The version-guard semantics here
    * are EXACTLY what a production implementation must provide over
    * JDBC (`MERGE ... WHEN version < ?`) or a CAS-capable KV store —
    * this class is the executable spec of that contract.
    */
  final class InMemoryStore private (name: String) extends VersionedStore {
    import InMemoryStore._
    override def applyBatch(batch: Seq[Mutation]): Unit = {
      val st = states.computeIfAbsent(name, _ => new State)
      st.batches.incrementAndGet()
      batch.foreach { m =>
        st.cells.compute(m.key, (_, cur) =>
          // the guard: strictly-newer versions win; replays and
          // stale mutations are no-ops (cur == null means unseen)
          if (cur != null && m.version <= cur.version) cur
          else Cell(m.version, m.delete, m.payload))
        st.mutationsSeen.incrementAndGet()
      }
    }
  }

  object InMemoryStore {
    final case class Cell(version: Long, deleted: Boolean, payload: Array[Byte])
    final class State {
      val cells = new java.util.concurrent.ConcurrentHashMap[String, Cell]()
      val batches = new java.util.concurrent.atomic.AtomicInteger(0)
      val mutationsSeen = new java.util.concurrent.atomic.AtomicInteger(0)
    }
    private val states =
      new java.util.concurrent.ConcurrentHashMap[String, State]()

    def apply(name: String): InMemoryStore = new InMemoryStore(name)

    /** Landed live rows (tombstones excluded) — spec inspection. */
    def live(name: String): Map[String, (Long, Seq[Byte])] = {
      import scala.jdk.CollectionConverters._
      Option(states.get(name)).map(_.cells.asScala.collect {
        case (k, c) if !c.deleted => k -> ((c.version, c.payload.toSeq))
      }.toMap).getOrElse(Map.empty)
    }
    def stats(name: String): (Int, Int) =
      Option(states.get(name)).map(s => (s.batches.get(), s.mutationsSeen.get()))
        .getOrElse((0, 0))
    def drop(name: String): Unit = states.remove(name)
  }
}
