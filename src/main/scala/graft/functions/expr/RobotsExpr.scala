package graft.functions.expr

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** robots.txt evaluation (RFC 9309) — the crawl-politeness gate that
  * sits beside URL canonicalization at the front of a crawl pipeline:
  * given a host's robots.txt payload and a request path, may `agent`
  * fetch it?
  *
  * Implemented contract (the RFC's normative core):
  *   - GROUP SELECTION: lines group as consecutive `User-agent`
  *     names followed by their rules — header runs STACK across
  *     blank lines (only a rule line ends a run), so a zero-rule
  *     group can only exist at end-of-file. The crawler uses the groups
  *     whose product token equals `agent` case-insensitively; only
  *     when NO specific group exists does it fall back to the `*`
  *     groups. A specific group with zero rules means allow-all (no
  *     star fallback). Multiple groups for the same token merge.
  *   - RULE MATCHING: `Allow`/`Disallow` values match the path from
  *     its first octet, with `*` matching any octet sequence and a
  *     trailing `$` anchoring the end (both REQUIRED by RFC 9309
  *     §2.2.3). An empty rule value is a no-op (`Disallow:` = allow
  *     all). Comments (`#`), unknown directives (Sitemap,
  *     Crawl-delay, ...) and CR are ignored.
  *   - PRECEDENCE: the matching rule with the MOST OCTETS in its
  *     pattern wins; on a length tie, allow wins (RFC 9309 §2.2.2).
  *     No matching rule → allowed.
  *
  * The agent token is a PLAN-TIME literal (a crawler knows who it
  * is), so group selection burns into the generated call; the
  * robots payload is a per-row column — at scale robots.txt is
  * per-HOST state: join the host's payload onto the frontier (it is
  * kilobytes; AQE broadcasts the host table) and this expression
  * evaluates at scan speed. Parsing is a single forward scan; the
  * matcher is the classic backtracking glob (no regex compilation
  * per row).
  */
case class RobotsAllowed(left: Expression, right: Expression, agent: String)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "robots_allowed"

  override protected def nullSafeEval(robots: Any, path: Any): Any =
    Robots.allowed(robots.asInstanceOf[UTF8String].toString,
      path.asInstanceOf[UTF8String].toString, agent)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val agentRef = ctx.addReferenceObj("agent", agent, "java.lang.String")
    nullSafeCodeGen(ctx, ev, (r, p) =>
      s"${ev.value} = graft.functions.expr.Robots.allowed($r.toString(), $p.toString(), $agentRef);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object Robots {

  private[graft] final case class Rule(allow: Boolean, pattern: String)

  /** Groups matching `agent` (exact token, case-insensitive), else
    * the `*` groups; flag says whether a specific group existed. */
  private[graft] def rulesFor(robots: String, agent: String): Seq[Rule] = {
    val agentLc = agent.toLowerCase
    val spec = scala.collection.mutable.ArrayBuffer[Rule]()
    val star = scala.collection.mutable.ArrayBuffer[Rule]()
    var sawSpec = false
    var curAgents = List.empty[String]
    val curRules = scala.collection.mutable.ArrayBuffer[Rule]()
    var inRules = false
    def flush(): Unit = {
      if (curAgents.contains(agentLc)) { sawSpec = true; spec ++= curRules }
      else if (curAgents.contains("*")) star ++= curRules
      curAgents = Nil; curRules.clear(); inRules = false
    }
    robots.split("\n", -1).foreach { line0 =>
      val hash = line0.indexOf('#')
      val line = (if (hash >= 0) line0.substring(0, hash) else line0).trim
      val ci = line.indexOf(':')
      if (ci > 0) {
        val key = line.substring(0, ci).trim.toLowerCase
        val value = line.substring(ci + 1).trim
        key match {
          case "user-agent" =>
            if (inRules) flush()
            curAgents ::= value.toLowerCase
          case "allow" | "disallow" =>
            inRules = true
            // empty value = no-op rule (RFC: "Disallow:" allows all)
            if (value.nonEmpty) curRules += Rule(key == "allow", value)
          case _ => () // sitemap / crawl-delay / unknown: ignored
        }
      }
    }
    flush()
    (if (sawSpec) spec else star).toSeq
  }

  /** Anchored-at-start glob: `*` = any octets; trailing `$` anchors
    * the end; otherwise a prefix match suffices (implicit trailing
    * `*`). Classic two-pointer backtracking — linear in practice. */
  private[graft] def pathMatches(pattern: String, path: String): Boolean = {
    val anchored = pattern.nonEmpty && pattern.charAt(pattern.length - 1) == '$'
    val base = if (anchored) pattern.substring(0, pattern.length - 1) else pattern
    val p = if (anchored) base else base + "*"
    var pi = 0; var si = 0; var starPi = -1; var starSi = -1
    while (si < path.length) {
      if (pi < p.length && p.charAt(pi) == '*') { starPi = pi; pi += 1; starSi = si }
      else if (pi < p.length && p.charAt(pi) == path.charAt(si)) { pi += 1; si += 1 }
      else if (starPi >= 0) { starSi += 1; si = starSi; pi = starPi + 1 }
      else return false
    }
    while (pi < p.length && p.charAt(pi) == '*') pi += 1
    pi == p.length
  }

  /** The RFC 9309 decision (scaladoc above). */
  def allowed(robots: String, path: String, agent: String): Boolean = {
    var bestLen = -1
    var bestAllow = true
    rulesFor(robots, agent).foreach { r =>
      if (pathMatches(r.pattern, path)) {
        // precedence = octet count of the PATH PATTERN (RFC 9309
        // §2.2.2): a trailing '$' anchor is match syntax, not a path
        // octet, so it must not outrank an equally-long prefix rule
        val len =
          if (r.pattern.nonEmpty && r.pattern.charAt(r.pattern.length - 1) == '$')
            r.pattern.length - 1
          else r.pattern.length
        if (len > bestLen || (len == bestLen && r.allow && !bestAllow)) {
          bestLen = len; bestAllow = r.allow
        }
      }
    }
    bestLen < 0 || bestAllow
  }
}
