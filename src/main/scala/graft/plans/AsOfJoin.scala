package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute,
  Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder,
  UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution,
  Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.graft.ColumnBridge

/** Whole-operator as-of join: the custom LogicalPlan → SparkStrategy →
  * SparkPlan path (SURVEY.md §2d). Latest right row of the same key
  * with right.ts <= left.ts (reference point-in-time lookup shape,
  * /root/reference/main_dag.py:242-262 merges snapshots the same way)
  * — the composed [[graft.operators.Events.asOfJoin]] computes the
  * same result on null-free keys/timestamps; on nulls THIS operator
  * follows SQL join semantics (null key / null ts never matches),
  * where the window formulation groups null keys into one partition
  * and can synthesize matches. Expressed as a first-class operator:
  *
  *   - `AsOfJoinPlan` — a resolved logical node Catalyst optimizes
  *     around (column pruning below it, filters above it).
  *   - `AsOfJoinStrategy` — plans it into the exec node.
  *   - `AsOfJoinExec` — declares `ClusteredDistribution` on each side's
  *     key and `(key, ts)` ascending child ordering, so EnsureRequirements
  *     inserts exactly one co-partitioning shuffle + sort per side
  *     (spill-safe SortExec — never an in-memory hash of the right
  *     side), then streams a single-pass per-partition merge.
  *
  * Versus the composed union+window form: no null-padded union rows
  * travel through the shuffle (each side shuffles only its own
  * columns), and the right side never re-emerges — the merge emits
  * left rows directly. At 100 TB that halves the shuffled width of the
  * window formulation.
  *
  * Scale notes: both sides shuffle once on the key and sort by
  * (key, ts) — identical movement to a sort-merge join. AQE still
  * coalesces the two exchanges' small partitions, but its skew-join
  * SPLITTING only rewrites the built-in join execs — a pathologically
  * hot key here needs the same salting treatment as
  * [[graft.operators.Skew.saltedJoin]]. The merge itself is
  * O(|left| + |right|) per partition and holds ONE candidate row, not
  * a per-key buffer.
  */
object AsOf {

  /** As-of join `left` to `right` on `key`, attaching `rightPayload`
    * columns of the latest right row with `right.ts <= left.ts`
    * (null-padded when no such row). Right rows should be unique per
    * (key, ts) for deterministic output — ties take an arbitrary one.
    */
  def join(left: DataFrame, right: DataFrame, key: String, ts: String,
      rightPayload: Seq[String]): DataFrame = {
    val spark = left.sparkSession
    ColumnBridge.addStrategy(spark, AsOfJoinStrategy)
    val lp = left.queryExecution.analyzed
    // self-join safety: re-alias the right side when it shares lineage
    // (and thus attribute ids) with the left — the analyzer's
    // DeduplicateRelations never sees this hand-built node
    val rp0 = right.queryExecution.analyzed
    val rp = if (lp.outputSet.intersect(rp0.outputSet).isEmpty) rp0
      else Project(rp0.output.map(a => Alias(a, a.name)()), rp0)
    def attr(plan: LogicalPlan, name: String, side: String): Attribute =
      plan.output.find(_.name == name).getOrElse(throw new IllegalArgumentException(
        s"asOfJoin: $side column '$name' not found in [${plan.output.map(_.name).mkString(", ")}]"))
    val bad = rightPayload.filter(c => left.columns.contains(c))
    if (bad.nonEmpty) throw new IllegalArgumentException(
      s"asOfJoin: payload columns ${bad.mkString(", ")} collide with left columns")
    val (lk, rk) = (attr(lp, key, "left"), attr(rp, key, "right"))
    val (lt, rt) = (attr(lp, ts, "left"), attr(rp, ts, "right"))
    // the exec's orderings come from the LEFT types; a silent type
    // mismatch (Long vs Int key, Timestamp vs Date ts) would compare
    // raw unsafe-row slots of different widths and return garbage
    def sameType(a: Attribute, b: Attribute, what: String): Unit =
      if (a.dataType != b.dataType) throw new IllegalArgumentException(
        s"asOfJoin: $what types differ: left ${a.dataType.simpleString} " +
          s"vs right ${b.dataType.simpleString} — cast one side first")
    sameType(lk, rk, s"key '$key'")
    sameType(lt, rt, s"ts '$ts'")
    ColumnBridge.ofRows(spark, AsOfJoinPlan(
      lp, rp, lk, rk, lt, rt, rightPayload.map(attr(rp, _, "right"))))
  }
}

/** Logical as-of join node. Already resolved at construction (built
  * from analyzed child plans), so it passes straight through analysis;
  * the optimizer treats it as an opaque binary node. */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTs: Attribute, rightTs: Attribute,
    payload: Seq[Attribute]) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lts, rts, pay) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts, pay) :: Nil
    case _ => Nil
  }
}

/** Sort-based as-of join exec. Children arrive co-partitioned on the
  * key and sorted by (key, ts) — EnsureRequirements materializes that
  * from the declared requirements — so each partition is a single
  * forward merge holding one candidate right row.
  */
case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTs: Attribute, rightTs: Attribute,
    payload: Seq[Attribute]) extends SparkPlan with BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  // left rows pass through partition-intact; downstream ops keyed on
  // the left key reuse this exchange
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext, "number of matched left rows"))

  protected override def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val lKeyE = leftKey; val rKeyE = rightKey
    val lTsE = leftTs; val rTsE = rightTs
    val pay = payload
    val outAttrs = output
    val keyType = leftKey.dataType
    val tsType = leftTs.dataType
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    left.execute().zipPartitions(right.execute(), preservesPartitioning = true) {
      (lIter, rIter) =>
        if (!lIter.hasNext) Iterator.empty
        else {
          val lKeyProj = UnsafeProjection.create(Seq(lKeyE: Expression), leftOut)
          val rKeyProj = UnsafeProjection.create(Seq(rKeyE: Expression), rightOut)
          val lTsProj = UnsafeProjection.create(Seq(lTsE: Expression), leftOut)
          val rTsProj = UnsafeProjection.create(Seq(rTsE: Expression), rightOut)
          val payProj = UnsafeProjection.create(pay, rightOut)
          // bind the payload slots as NULLABLE: left rows with no match
          // read the null-pad row, and a non-nullable binding would
          // skip the null check and read garbage zeros
          val resultProj = UnsafeProjection.create(
            outAttrs, leftOut ++ pay.map(_.withNullability(true)))
          val keyOrd = RowOrdering.createNaturalAscendingOrdering(Seq(keyType))
          val tsOrd = RowOrdering.createNaturalAscendingOrdering(Seq(tsType))
          val nullPay: InternalRow = new GenericInternalRow(pay.size)
          val joined = new JoinedRow
          var rRow: InternalRow = if (rIter.hasNext) rIter.next() else null
          // ONE retained candidate (copied — sorter iterators reuse the
          // row object); valid while its key still equals the left key
          var candKey: UnsafeRow = null
          var candPay: UnsafeRow = null
          def advance(): Unit = rRow = if (rIter.hasNext) rIter.next() else null
          lIter.map { lRow =>
            val lKey = lKeyProj(lRow)
            var payRow: InternalRow = nullPay
            // SQL match semantics: null keys / null ts never match
            if (!lKey.isNullAt(0)) {
              val lTs = lTsProj(lRow)
              if (!lTs.isNullAt(0)) {
                var done = false
                while (!done && rRow != null) {
                  val rKey = rKeyProj(rRow)
                  if (rKey.isNullAt(0)) advance()
                  else {
                    val c = keyOrd.compare(rKey, lKey)
                    if (c < 0) advance()
                    else if (c == 0) {
                      val rTs = rTsProj(rRow)
                      if (rTs.isNullAt(0)) advance()
                      else if (tsOrd.compare(rTs, lTs) <= 0) {
                        candKey = rKey.copy(); candPay = payProj(rRow).copy()
                        advance()
                      } else done = true
                    } else done = true
                  }
                }
                if (candKey != null && keyOrd.compare(candKey, lKey) == 0) {
                  payRow = candPay
                  numMatched += 1
                }
              }
            }
            numOutputRows += 1
            resultProj(joined(lRow, payRow))
          }
        }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}
