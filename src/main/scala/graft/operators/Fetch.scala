package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed HTTP extract — the reference's download step
  * (main_dag.py:16-47 `extract`/`download_a_xml`: one GET per
  * researcher against a public API, written to local files) re-shaped
  * for a cluster: the request list is a Dataset, each PARTITION owns
  * one client + politeness state, and every request produces exactly
  * one result row (success or accounted failure — a 100 TB crawl
  * cannot throw away an executor's batch because one URL 404'd).
  *
  * The transport is an injected factory (this environment has no
  * network egress, so specs drive deterministic in-JVM fakes); the
  * distributed plumbing — per-partition client init, bounded request
  * rate, deterministic exponential backoff, retry classification,
  * failure accounting — is the real contract a production fetch
  * operator needs, independent of the wire protocol.
  */
object Fetch {

  case class FetchRequest(request_id: Long, url: String)

  /** One row per request, success or not: `ok` requests carry the
    * payload; failures carry the terminal status/error and how many
    * attempts were burned. Nothing is dropped, nothing throws past
    * the task — failure accounting is data, not control flow. */
  case class FetchResult(request_id: Long, url: String, status: Int,
      payload: Array[Byte], attempts: Int, ok: Boolean, error: String)

  case class Response(status: Int, body: Array[Byte])

  /** Per-partition client. Created once per partition by the factory
    * passed to [[fetchAll]] (connection pools / auth contexts are
    * per-executor-thread state, never serialized), closed when the
    * partition's task completes. */
  trait Transport extends AutoCloseable {
    def get(url: String): Response
    override def close(): Unit = ()
  }

  /** Retry/politeness policy. Backoff is DETERMINISTIC — attempt k
    * sleeps min(maxBackoffMs, baseBackoffMs·2^(k−1)) — so a replayed
    * task issues the identical request schedule (speculative
    * execution and retries stay reproducible; randomized jitter is a
    * per-deployment choice layered on top, not baked in).
    * `minRequestIntervalMs` is the per-partition politeness floor
    * between request STARTS (the reference hits a public API
    * serially; a 1000-executor fetch without a rate floor is a DDoS).
    */
  case class RetryPolicy(maxAttempts: Int = 3, baseBackoffMs: Long = 100L,
      maxBackoffMs: Long = 5000L, minRequestIntervalMs: Long = 0L) {
    require(maxAttempts >= 1, s"maxAttempts $maxAttempts must be >= 1")
  }

  /** 429 (throttled) and 5xx are transient — retry; other non-200s
    * are permanent (a 404 will 404 again; burning the retry budget on
    * it just slows the crawl). */
  def isRetryable(status: Int): Boolean = status == 429 || status >= 500

  def backoffMs(policy: RetryPolicy, attempt: Int): Long =
    math.min(policy.maxBackoffMs,
      policy.baseBackoffMs << math.min(attempt - 1, 30))

  /** Fetch every request, one result row each. `newTransport` runs
    * once per partition; `sleep` is injectable so specs can assert
    * the exact backoff/politeness schedule without wall-clock waits.
    */
  def fetchAll(reqs: Dataset[FetchRequest], newTransport: () => Transport,
      policy: RetryPolicy = RetryPolicy(),
      sleep: Long => Unit = Thread.sleep)(
      implicit spark: SparkSession): Dataset[FetchResult] = {
    import spark.implicits._
    reqs.mapPartitions { it =>
      val transport = newTransport() // ONE client per partition
      Option(TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit](_ => transport.close()))
      var lastStartMs = Long.MinValue // per-partition politeness state
      it.map { r =>
        var attempt = 0
        var result: FetchResult = null
        while (result == null) {
          attempt += 1
          if (lastStartMs != Long.MinValue) {
            val wait = policy.minRequestIntervalMs -
              (System.currentTimeMillis() - lastStartMs)
            if (wait > 0) sleep(wait)
          }
          lastStartMs = System.currentTimeMillis()
          val outcome =
            try Right(transport.get(r.url))
            catch { case e: Exception => Left(e) }
          outcome match {
            case Right(Response(status, body)) if status == 200 =>
              result = FetchResult(r.request_id, r.url, status, body,
                attempt, ok = true, error = null)
            case Right(Response(status, _)) if !isRetryable(status) =>
              result = FetchResult(r.request_id, r.url, status,
                Array.emptyByteArray, attempt, ok = false, s"http_$status")
            case transient => // retryable status or thrown I/O error
              if (attempt >= policy.maxAttempts) {
                val (status, err) = transient match {
                  case Right(Response(s, _)) => (s, s"http_$s")
                  case Left(e) => (-1, s"io:${e.getClass.getSimpleName}")
                }
                result = FetchResult(r.request_id, r.url, status,
                  Array.emptyByteArray, attempt, ok = false, err)
              } else sleep(backoffMs(policy, attempt))
          }
        }
        result
      }
    }
  }

  /** Run-level failure accounting — the crawl health row a scheduler
    * gates re-runs on (the reference writes a timestamp.csv run
    * marker; this is that idea with numbers in it). One wide agg. */
  def fetchSummary(results: Dataset[FetchResult]): DataFrame =
    results.toDF().agg(
      count("*").as("n_requests"),
      sum(when(col("ok"), 1L).otherwise(0L)).as("n_ok"),
      sum(when(!col("ok"), 1L).otherwise(0L)).as("n_failed"),
      sum(col("attempts").cast("long")).as("total_attempts"),
      sum(when(col("ok"), length(col("payload")).cast("long"))
        .otherwise(0L)).as("bytes_fetched"))
}
