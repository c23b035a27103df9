package graft

import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger

import scala.jdk.CollectionConverters._

import graft.operators.Fetch
import graft.operators.Fetch.{FetchRequest, Response, RetryPolicy, Transport}

/** The distributed fetch contract: per-partition client lifecycle,
  * deterministic retry/backoff, politeness floor, and one accounted
  * result row per request (reference main_dag.py:16-47 reshaped).
  * Transports are deterministic in-JVM fakes (no egress here); the
  * shared-JVM counters work because tests run local-mode. */
object FetchSpec {
  val inits = new AtomicInteger(0)
  val closes = new AtomicInteger(0)
  val sleeps = new ConcurrentLinkedQueue[Long]()
  val attemptsSeen = new java.util.concurrent.ConcurrentHashMap[String, AtomicInteger]()

  def countingAttempt(url: String): Int =
    attemptsSeen.computeIfAbsent(url, _ => new AtomicInteger(0)).incrementAndGet()

  def reset(): Unit = { inits.set(0); closes.set(0); sleeps.clear(); attemptsSeen.clear() }

  /** Scripted by URL path: /ok/N → 200, /missing/N → 404,
    * /down/N → 503 always, /flaky2/N → 503 twice then 200,
    * /ioerr/N → throws always. */
  class Scripted extends Transport {
    inits.incrementAndGet()
    override def get(url: String): Response = {
      val attempt = countingAttempt(url)
      if (url.contains("/ok/")) Response(200, s"body:$url".getBytes("UTF-8"))
      else if (url.contains("/missing/")) Response(404, Array.emptyByteArray)
      else if (url.contains("/down/")) Response(503, Array.emptyByteArray)
      else if (url.contains("/flaky2/"))
        if (attempt <= 2) Response(503, Array.emptyByteArray)
        else Response(200, s"late:$url".getBytes("UTF-8"))
      else if (url.contains("/ioerr/")) throw new java.io.IOException("boom")
      else Response(400, Array.emptyByteArray)
    }
    override def close(): Unit = { closes.incrementAndGet() }
  }

  val recordSleep: Long => Unit = ms => sleeps.add(ms)
}

class FetchSpec extends SparkSpec {
  import spark.implicits._
  import FetchSpec._

  implicit private val s: org.apache.spark.sql.SparkSession = spark

  private def run(urls: Seq[String], policy: RetryPolicy = RetryPolicy(maxAttempts = 3)) = {
    reset()
    val reqs = urls.zipWithIndex.map { case (u, i) => FetchRequest(i.toLong, u) }
      .toDS().repartition(2)
    Fetch.fetchAll(reqs, () => new Scripted, policy, recordSleep)
      .collect().sortBy(_.request_id)
  }

  test("every request yields exactly one accounted row; successes carry payload") {
    val out = run(Seq("a://x/ok/1", "a://x/missing/2", "a://x/ok/3"))
    assert(out.length === 3)
    assert(out(0).ok && out(0).status === 200 &&
      new String(out(0).payload, "UTF-8") === "body:a://x/ok/1")
    assert(!out(1).ok && out(1).status === 404 && out(1).error === "http_404")
    assert(out(1).attempts === 1) // permanent failure: no retry burn
    assert(out(2).ok)
  }

  test("transient 503s retry with deterministic exponential backoff, then succeed") {
    val out = run(Seq("a://x/flaky2/1"),
      RetryPolicy(maxAttempts = 5, baseBackoffMs = 100, maxBackoffMs = 5000))
    assert(out.head.ok && out.head.attempts === 3)
    // backoff schedule is exactly base, 2*base (no jitter baked in)
    assert(sleeps.asScala.toSeq.sorted === Seq(100L, 200L))
  }

  test("retry budget exhausts into an accounted failure, never an exception") {
    val out = run(Seq("a://x/down/1"), RetryPolicy(maxAttempts = 3, baseBackoffMs = 10))
    assert(!out.head.ok && out.head.status === 503 &&
      out.head.error === "http_503" && out.head.attempts === 3)
    val io = run(Seq("a://x/ioerr/1"), RetryPolicy(maxAttempts = 2, baseBackoffMs = 10))
    assert(!io.head.ok && io.head.status === -1 && io.head.error === "io:IOException")
    assert(io.head.attempts === 2)
  }

  test("backoff caps at maxBackoffMs") {
    assert(Fetch.backoffMs(RetryPolicy(maxAttempts = 9, baseBackoffMs = 100,
      maxBackoffMs = 500), attempt = 4) === 500L)
    assert(Fetch.backoffMs(RetryPolicy(maxAttempts = 99, baseBackoffMs = 100,
      maxBackoffMs = Long.MaxValue), attempt = 64) === (100L << 30)) // shift clamp
  }

  test("one transport per partition, closed on task completion") {
    run(Seq.tabulate(8)(i => s"a://x/ok/$i"))
    assert(inits.get() === 2, s"expected 2 partition clients, got ${inits.get()}")
    assert(closes.get() === 2)
  }

  test("politeness floor sleeps between consecutive requests in a partition") {
    reset()
    val reqs = Seq.tabulate(4)(i => FetchRequest(i.toLong, s"a://x/ok/$i"))
      .toDS().repartition(1)
    Fetch.fetchAll(reqs, () => new Scripted,
      RetryPolicy(maxAttempts = 1, minRequestIntervalMs = 50), recordSleep).collect()
    // 3 gaps between 4 requests; scripted transport is instant so each
    // recorded wait is the (near-)full floor
    val waits = sleeps.asScala.toSeq
    assert(waits.length === 3, s"expected 3 politeness sleeps, got $waits")
    assert(waits.forall(w => w > 0 && w <= 50))
  }

  test("fetchSummary accounts successes, failures, attempts and bytes") {
    reset()
    val reqs = Seq("a://x/ok/1", "a://x/down/2", "a://x/missing/3")
      .zipWithIndex.map { case (u, i) => FetchRequest(i.toLong, u) }.toDS()
    val res = Fetch.fetchAll(reqs, () => new Scripted,
      RetryPolicy(maxAttempts = 2, baseBackoffMs = 1), recordSleep)
    val row = Fetch.fetchSummary(res).as[(Long, Long, Long, Long, Long)].head()
    val okBytes = "body:a://x/ok/1".getBytes("UTF-8").length.toLong
    assert(row === ((3L, 1L, 2L, 1L + 2L + 1L, okBytes)))
  }
}
