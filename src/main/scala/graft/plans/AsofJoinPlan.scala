package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** Native as-of join — the whole-operator Catalyst tier (logical node +
  * planner strategy + physical exec), for the one temporal operator
  * Spark's built-in surface lacks outright.
  *
  * [[graft.ops.TemporalJoins.asOfJoin]] already expresses the
  * semantics scalably by composition: UNION both sides onto one time
  * axis, then a per-key window carries the latest right struct
  * forward. That form is correct and single-shuffle, but it pays two
  * real costs a dedicated operator does not:
  *
  *   - **Shuffle width.** The union pads every row to the COMBINED
  *     schema (left columns + right-struct + tiebreak), so both
  *     sides shuffle at the widened width. Here each side shuffles
  *     its own columns only.
  *   - **Window machinery.** The carried struct rides a
  *     `last(_, ignoreNulls)` running frame through `WindowExec`'s
  *     buffering; here the merge is a single forward pass holding ONE
  *     candidate row per key — O(1) state, no frame buffer.
  *
  * Physical contract (the sort-merge-join template):
  * `requiredChildDistribution` clusters both children on the equi
  * keys (EnsureRequirements co-partitions them exactly as it does for
  * `SortMergeJoinExec`), `requiredChildOrdering` sorts each partition
  * by (keys, time) — tiebreak last on the right, so among equal
  * (key, time) right rows the LAST seen (= tiebreak maximum) is the
  * carried one, matching the composed form's
  * `ORDER BY t DESC, tiebreak DESC LIMIT 1` oracle. The merge then
  * zips co-partitioned iterators with one cursor per side.
  *
  * Null semantics match SQL equality joins and the composed form:
  * null-keyed or null-time right rows match nothing (callers should
  * pre-filter them to save shuffle; the merge skips them regardless —
  * ascending nulls-first ordering parks them at the head of each
  * partition where the skip loop drains them); null-keyed or
  * null-time LEFT rows keep their row with null right columns, like a
  * left-outer join.
  *
  * Output partitioning/ordering are the left child's (keys-clustered,
  * (keys, time)-sorted), so a downstream per-key aggregation or a
  * second as-of join on the same keys reuses the exchange and sort.
  *
  * At 100 TB: one shuffle per side at native row width, per-partition
  * state is one candidate row, and keys parallelize horizontally —
  * strictly the composed form's scaling story minus the union
  * widening and the window buffer.
  */
case class AsofJoin(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightTiebreak: Option[Expression],
    strict: Boolean,
    forward: Boolean,
    left: LogicalPlan,
    right: LogicalPlan) extends BinaryNode {

  require(leftKeys.length == rightKeys.length && leftKeys.nonEmpty,
    "asof join: left/right key lists must be non-empty and same length")
  require(leftTime.dataType == rightTime.dataType,
    s"asof join: time types differ (${leftTime.dataType} vs ${rightTime.dataType})")
  // no analyzer coercion reaches a custom node: mismatched key types
  // would hash-partition each side under its OWN type (equal values on
  // different partitions) and the merge ordering would misread slots —
  // silently wrong results, so fail loudly instead. Cast upstream.
  leftKeys.zip(rightKeys).foreach { case (l, r) =>
    require(l.dataType == r.dataType,
      s"asof join: key types differ (${l.dataType} vs ${r.dataType}) — cast first")
  }
  // NormalizeFloatingNumbers (-0.0/NaN canonicalization) also targets
  // only built-in join nodes; float keys would diverge from SQL equality
  leftKeys.foreach { k =>
    require(k.dataType != org.apache.spark.sql.types.DoubleType &&
      k.dataType != org.apache.spark.sql.types.FloatType,
      s"asof join: floating-point key type ${k.dataType} unsupported (-0.0/NaN " +
        "normalization does not reach custom nodes) — cast or quantize first")
  }

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsofJoin]] as [[AsofJoinExec]]; injected via
  * `SparkSessionExtensions.injectPlannerStrategy` (config path) or
  * `spark.experimental.extraStrategies` (live session) — both wired
  * by [[graft.GraftExtensions]].
  */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoin(lk, rk, lt, rt, tb, strict, fwd, l, r) =>
      AsofJoinExec(lk, rk, lt, rt, tb, strict, fwd,
        planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightTiebreak: Option[Expression],
    strict: Boolean,
    forward: Boolean,
    left: SparkPlan,
    right: SparkPlan) extends SparkPlan with BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) ++
      (SortOrder(rightTime, Ascending) +:
        rightTiebreak.map(SortOrder(_, Ascending)).toSeq))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext, "number of matched left rows"))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    val nOut = longMetric("numOutputRows")
    val nHit = longMetric("numMatched")
    val isStrict = strict
    val isFwd = forward
    val lOut = left.output
    val rOut = right.output
    val lk = leftKeys; val rk = rightKeys; val lt = leftTime; val rt = rightTime
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lk, lOut)
      val rKeyProj = UnsafeProjection.create(rk, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lt), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rt), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(timeType))
      val nullRight = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow
      // bind against the NULLABILITY-WIDENED output attrs (same ids as
      // lOut ++ rOut): binding against the raw right attrs would stamp
      // non-nullable BoundReferences that read 0/false instead of null
      // from the null-extended row
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)

      // one-row-lookahead cursor over the right side; rows with a null
      // key or null time are never candidates and are drained inline
      var rRow: InternalRow = null
      var rKey: InternalRow = null   // projection view, valid until advance
      var rTime: InternalRow = null
      def advanceRight(): Unit = {
        rRow = null
        while (rRow == null && rIter.hasNext) {
          val r = rIter.next()
          val k = rKeyProj(r)
          if (!k.anyNull) {
            val t = rTimeProj(r)
            if (!t.isNullAt(0)) { rRow = r; rKey = k; rTime = t }
          }
        }
      }
      advanceRight()

      // last qualifying right row for the current key, if any; right
      // rows are consumed monotonically (later left rows of the same
      // key have >= time, so the qualifying set only grows) and the
      // sort puts the winning tiebreak last, so plain overwrite wins
      var candidate: InternalRow = null   // copied — iterators reuse rows
      var candidateKey: InternalRow = null

      lIter.map { lRow =>
        val lKey = lKeyProj(lRow)
        if (lKey.anyNull || lTimeProj(lRow).isNullAt(0)) {
          nOut += 1
          resultProj(joined(lRow, nullRight))
        } else if (isFwd) {
          // FORWARD: the earliest right row at-or-after (after, when
          // strict) the left time — a PEEK, not a consume: rights
          // strictly before this left's cutoff can never serve a later
          // (time-ascending) left, so the pointer only moves past
          // rights no left will ever need; the peeked row is projected
          // into the result buffer immediately, so its reuse on the
          // next advance is safe. Equal-(key, time) ties resolve to the
          // LOWEST tiebreak (ascending sort, first peek) — the mirror
          // of backward's highest.
          while (rRow != null && keyOrd.compare(rKey, lKey) < 0) advanceRight()
          val lTime = lTimeProj(lRow)
          var cont = rRow != null && keyOrd.compare(rKey, lKey) == 0
          while (cont) {
            val c = timeOrd.compare(rTime, lTime)
            if (if (isStrict) c <= 0 else c < 0) {
              advanceRight()
              cont = rRow != null && keyOrd.compare(rKey, lKey) == 0
            } else cont = false
          }
          nOut += 1
          if (rRow != null && keyOrd.compare(rKey, lKey) == 0) {
            nHit += 1
            resultProj(joined(lRow, rRow))
          } else resultProj(joined(lRow, nullRight))
        } else {
          if (candidate != null && keyOrd.compare(candidateKey, lKey) != 0) {
            candidate = null; candidateKey = null
          }
          while (rRow != null && keyOrd.compare(rKey, lKey) < 0) advanceRight()
          val lTime = lTimeProj(lRow)
          var more = rRow != null && keyOrd.compare(rKey, lKey) == 0
          while (more) {
            val c = timeOrd.compare(rTime, lTime)
            if (if (isStrict) c < 0 else c <= 0) {
              candidate = rRow.copy()
              if (candidateKey == null) candidateKey = lKey.copy()
              advanceRight()
              more = rRow != null && keyOrd.compare(rKey, lKey) == 0
            } else more = false
          }
          nOut += 1
          if (candidate != null) {
            nHit += 1
            resultProj(joined(lRow, candidate))
          } else resultProj(joined(lRow, nullRight))
        }
      }
    }
  }
}
