package graft.tools

/** The cross-window wall-time envelope as a COMMITTED ARTIFACT (r16
  * verdict item 4): this VM's ambient load swings identical-code
  * bench walls 84→111 s, so per-query minima across windows — not a
  * single window — are what grade the watch/weak rows. Until r16
  * that envelope lived as a prose table in SURVEY §6; each run of
  * this tool APPENDS one window (per-query walls, total, load
  * average at sample time, epoch) to a JSON-array artifact
  * (windows_rN.json), making the minima diffable evidence.
  *
  * Measurement style: one untimed full pass first (a fresh JVM's
  * first query otherwise absorbs ALL the interpreter/codegen warm-up
  * that a 173-query BENCH run amortizes invisibly), then clearCache +
  * one timed count() per query. Windows are therefore warm-JVM,
  * cold-data — the jobs_rN best-rep convention, slightly kinder than
  * a mid-BENCH sample (per-query generated classes are already
  * compiled) and honest for the minima these windows exist to grade.
  *
  * Usage: runMain graft.tools.WindowEnvelope [sfDir] [names-csv]
  * Env:   WINDOWS_OUT=path   the artifact to append to (required
  *                           for recording; prints only if unset)
  */
object WindowEnvelope {

  /** The watch/weak set the r16 verdict graded on minima. */
  private val defaultSet = Vector(
    "dedup_containment", "dedup_ngram_jaccard", "graph_lpa",
    "graph_pagerank", "crawl_hostrank",
    "text_pmi", "text_bigram_lm", "text_interp_lm", "quality_perplexity")

  private def loadAvg(): Double =
    try scala.io.Source.fromFile("/proc/loadavg").mkString
      .split("\\s+").head.toDouble
    catch { case _: Exception => -1.0 }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.lift(1).map(_.split(",").toVector).getOrElse(defaultSet)
    val spark = graft.Sessions.build(32, appName = "graft-windows")
    val qs = graft.SparkEntry.queries

    for (n <- names) { // untimed warm pass (JVM + per-query codegen)
      spark.catalog.clearCache()
      qs(n)(spark, dir).count()
    }
    val load0 = loadAvg()
    val epoch = System.currentTimeMillis() / 1000
    val walls = new scala.collection.mutable.LinkedHashMap[String, Double]()
    val tTot0 = System.nanoTime()
    for (n <- names) {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      qs(n)(spark, dir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      walls.update(n, dt)
      println(s"[windows] $n: ${JsonOut.num(dt, 3)} s")
    }
    val total = (System.nanoTime() - tTot0) / 1e9
    val load1 = loadAvg()
    val window =
      s"""{"t_epoch":$epoch,"sf_dir":${JsonOut.str(dir)},""" +
        s""""load_avg_start":${JsonOut.num(load0, 2)},""" +
        s""""load_avg_end":${JsonOut.num(load1, 2)},""" +
        s""""total_s":${JsonOut.num(total, 3)},"queries":{""" +
        walls.map { case (k, v) => JsonOut.str(k) + ":" + JsonOut.num(v, 3) }
          .mkString(",") + "}}"
    println(s"[windows] window: $window")

    sys.env.get("WINDOWS_OUT").foreach { path =>
      val p = java.nio.file.Paths.get(path)
      val utf8 = java.nio.charset.StandardCharsets.UTF_8
      val body =
        if (java.nio.file.Files.exists(p)) {
          val prev = new String(java.nio.file.Files.readAllBytes(p), utf8).trim
          require(prev.startsWith("[") && prev.endsWith("]"),
            s"$path is not the windows artifact this tool writes")
          prev.dropRight(1).trim + ",\n" + window + "\n]"
        } else "[\n" + window + "\n]"
      java.nio.file.Files.write(p, body.getBytes(utf8))
      println(s"[windows] appended to $path")
    }
    spark.stop()
  }
}
