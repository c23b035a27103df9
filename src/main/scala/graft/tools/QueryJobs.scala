package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

/** Noise-free cost profile of registered queries: driver-scheduled
  * job count, stage count, task count, wall seconds AND the summed
  * executor run/CPU time per query (the SparkListener signal the
  * measurement discipline prefers over raw wall clock on this
  * ambient-noisy VM). executor_run_ms vs wall is the floor evidence:
  * when Σ executor task time is a small fraction of wall × 1 core,
  * the row's cost is per-job scheduling/compile latency, not work.
  *
  * Usage: runMain graft.tools.QueryJobs [sfDir] [names-csv] [reps]
  * Env:   GRAFT_JOBS_VERBOSE=1   per-job lines
  *        GRAFT_JOBS_OUT=path    write the machine-readable artifact
  *                               (jobs_rN.json schema: query →
  *                               {reps: [{wall_s, jobs, stages,
  *                               tasks, executor_run_ms,
  *                               executor_cpu_ms, rows}]})
  */
object QueryJobs {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val only: Option[Set[String]] = args.lift(1).map(_.split(",").toSet)
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val spark = graft.Sessions.build(32, appName = "graft-queryjobs")

    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    val runMs = new java.util.concurrent.atomic.AtomicLong
    val cpuNs = new java.util.concurrent.atomic.AtomicLong
    val verbose = sys.env.get("GRAFT_JOBS_VERBOSE").contains("1")
    val jobStarts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); stages.addAndGet(j.stageInfos.size)
        tasks.addAndGet(j.stageInfos.map(_.numTasks).sum)
        if (verbose) jobStarts.put(j.jobId,
          (System.nanoTime(), s"tasks=${j.stageInfos.map(_.numTasks).sum} " +
            j.stageInfos.map(_.name.takeWhile(_ != '\n')).mkString(" | ")))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = if (verbose) {
        Option(jobStarts.remove(j.jobId)).foreach { case (t0, desc) =>
          println(f"    job ${j.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%6.3f s  $desc")
        }
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val m = s.stageInfo.taskMetrics
        if (m != null) { runMs.addAndGet(m.executorRunTime); cpuNs.addAndGet(m.executorCpuTime) }
      }
    })

    val out = new scala.collection.mutable.LinkedHashMap[
      String, Vector[Map[String, Any]]]()
    for ((name, q) <- graft.SparkEntry.queries.toSeq.sortBy(_._1)
         if only.forall(_.contains(name)); r <- 1 to reps) {
      spark.catalog.clearCache()
      jobs.set(0); stages.set(0); tasks.set(0); runMs.set(0); cpuNs.set(0)
      val t0 = System.nanoTime()
      val n = q(spark, dir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      // listener events are posted asynchronously (the bus drain API
      // is private[spark]): wait until the status tracker — fed by
      // the same bus — reports no active jobs (so job-end events have
      // been processed), then a short settle for trailing
      // stage-completed metrics. Bounded so a wedged bus cannot hang
      // the tool.
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (spark.sparkContext.statusTracker.getActiveJobIds().nonEmpty &&
          System.nanoTime() < deadline)
        Thread.sleep(20)
      Thread.sleep(200)
      println(f"[query-jobs] $name rep$r: $dt%6.3f s  jobs=${jobs.get}%3d " +
        f"stages=${stages.get}%3d tasks=${tasks.get}%5d rows=$n " +
        f"run=${runMs.get}%5d ms cpu=${cpuNs.get / 1000000}%5d ms")
      out.update(name, out.getOrElse(name, Vector.empty) :+ Map(
        "wall_s" -> BigDecimal(dt).setScale(3, BigDecimal.RoundingMode.HALF_UP),
        "jobs" -> jobs.get, "stages" -> stages.get, "tasks" -> tasks.get,
        "executor_run_ms" -> runMs.get, "executor_cpu_ms" -> cpuNs.get / 1000000,
        "rows" -> n))
    }
    sys.env.get("GRAFT_JOBS_OUT").foreach { path =>
      def jv(v: Any): String = v match {
        case s: String => JsonOut.str(s)
        case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
          .map { case (k, x) => JsonOut.str(k) + ":" + jv(x) }.mkString("{", ",", "}")
        case xs: Vector[_] => xs.map(jv).mkString("[", ",", "]")
        case other => other.toString
      }
      val body = out.map { case (k, v) => JsonOut.str(k) + ":" + jv(v) }
        .mkString("{\"sf_dir\":" + JsonOut.str(dir) + ",\"reps\":" + reps + ",\"queries\":{", ",", "}}")
      java.nio.file.Files.write(java.nio.file.Paths.get(path),
        body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[query-jobs] wrote $path")
    }
    spark.stop()
  }
}
