package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

/** Noise-free cost profile of registered queries: driver-scheduled
  * job count, stage count, task count, and wall seconds per query
  * (the SparkListener signal the measurement discipline prefers over
  * raw wall clock on this ambient-noisy VM).
  *
  * Usage: runMain graft.tools.QueryJobs [sfDir] [names-csv] [reps]
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
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = ()
    })

    for ((name, q) <- graft.SparkEntry.queries.toSeq.sortBy(_._1)
         if only.forall(_.contains(name)); r <- 1 to reps) {
      spark.catalog.clearCache()
      jobs.set(0); stages.set(0); tasks.set(0)
      val t0 = System.nanoTime()
      val n = q(spark, dir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[query-jobs] $name rep$r: $dt%6.3f s  jobs=${jobs.get}%3d " +
        f"stages=${stages.get}%3d tasks=${tasks.get}%5d rows=$n")
    }
    spark.stop()
  }
}
