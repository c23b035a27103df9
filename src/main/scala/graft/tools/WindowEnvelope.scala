package graft.tools

/** The cross-window wall-time envelope as a COMMITTED ARTIFACT (r16
  * verdict item 4): this VM's ambient load swings identical-code
  * bench walls 84→111 s, so per-query minima across windows — not a
  * single window — are what grade the watch/weak rows. Until r16
  * that envelope lived as a prose table in SURVEY §6.
  *
  * A window IS an unforced full graft.Bench run (the same
  * measurement the driver's BENCH_rN samples — min-of-2 per query,
  * deep-warm JVM; a dedicated 9-query runner read systematically
  * slower because one warm pass cannot match a 173-query run's JIT
  * depth, so that first-cut design was dropped). This tool INGESTS a
  * bench artifact (bench_full.latest.json / bench_full.json) and
  * appends the watch/weak-set walls + total + the load averages the
  * bench itself sampled to the JSON-array envelope artifact.
  *
  * Usage: runMain graft.tools.WindowEnvelope [benchJson] [names-csv]
  * Env:   WINDOWS_OUT=path   the artifact to append to (required
  *                           for recording; prints only if unset)
  */
object WindowEnvelope {

  /** The watch/weak set the r16 verdict graded on minima. */
  private val defaultSet = Vector(
    "dedup_containment", "dedup_ngram_jaccard", "graph_lpa",
    "graph_pagerank", "crawl_hostrank",
    "text_pmi", "text_bigram_lm", "text_interp_lm", "quality_perplexity")

  def main(args: Array[String]): Unit = {
    val benchPath = args.headOption.getOrElse("bench_full.latest.json")
    val names = args.lift(1).map(_.split(",").toVector).getOrElse(defaultSet)

    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val bench = JsonMethods.parse(
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(benchPath)),
        java.nio.charset.StandardCharsets.UTF_8))
    def num(v: JValue): Double = v match {
      case JDouble(d) => d
      case JInt(i) => i.toDouble
      case JDecimal(d) => d.toDouble
      case JLong(l) => l.toDouble
      case _ => -1.0
    }
    val total = num(bench \ "value")
    val tEpoch = (bench \ "t_epoch") match {
      case JInt(i) => i.toLong
      case JLong(l) => l
      // pre-r17 bench artifacts carry no timestamp: fall back to mtime
      case _ => java.nio.file.Files.getLastModifiedTime(
        java.nio.file.Paths.get(benchPath)).toMillis / 1000
    }
    val load0 = num(bench \ "load_avg_start")
    val load1 = num(bench \ "load_avg_end")
    val qmap = (bench \ "queries").asInstanceOf[JObject].obj.toMap
    val walls = names.flatMap(n => qmap.get(n).map(v => n -> num(v)))

    val window =
      s"""{"t_epoch":$tEpoch,"bench":${JsonOut.str(benchPath)},""" +
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
          val core = prev.dropRight(1).trim
          // an existing-but-empty artifact ("[]") must not gain a
          // leading comma — "[,\n{...}]" is invalid JSON
          if (core == "[") core + "\n" + window + "\n]"
          else core + ",\n" + window + "\n]"
        } else "[\n" + window + "\n]"
      java.nio.file.Files.write(p, body.getBytes(utf8))
      println(s"[windows] appended to $path")
    }
  }
}
