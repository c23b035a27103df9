package graft.tools

/** Physical-plan audit: print the executed plan of named registered
  * queries (default: every query) plus red-flag grep lines —
  * CartesianProduct, non-broadcast NestedLoop, global single-partition
  * Sort/Window, codegen fallbacks. The per-round discipline: after a
  * query goes green, read its plan and keep reading it.
  *
  * Usage: runMain graft.tools.PlanAudit [sfDir] [names-csv]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val only: Option[Set[String]] = args.lift(1).map(_.split(",").toSet)
    val spark = graft.Sessions.build(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt,
      appName = "graft-planaudit")
    val flags = Seq(
      "CartesianProduct",
      "BroadcastNestedLoopJoin LeftOuter",
      "BroadcastNestedLoopJoin Inner, BuildLeft", // non-broadcast-side scans
      "codegen is disabled")
    for ((name, q) <- graft.SparkEntry.queries.toSeq.sortBy(_._1)
         if only.forall(_.contains(name))) {
      val plan = q(spark, dir).queryExecution.executedPlan.toString
      val hits = flags.filter(plan.contains)
      val globalSort = plan.linesIterator.exists(l =>
        l.contains("Sort [") && l.contains("global=true") &&
          !l.contains("TakeOrdered"))
      println(s"===== $name${if (hits.nonEmpty) s"  ⚠ ${hits.mkString(";")}" else ""}" +
        (if (globalSort) "  [global sort]" else ""))
      if (only.isDefined) println(plan)
    }
    spark.stop()
  }
}
