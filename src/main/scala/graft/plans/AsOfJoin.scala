package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of join (SURVEY.md §2 #25a, preference (c): a whole
  * operator Spark lacks, expressed as LogicalPlan + Strategy +
  * SparkPlan).
  *
  * Semantics: for every left row, attach the LAST right row of the
  * same key whose time is <= the left row's time (pandas
  * `merge_asof`, kdb `aj`, DuckDB `ASOF LEFT JOIN`). Unmatched left
  * rows keep nulls on the right. An optional `toleranceUs` bounds
  * staleness (pandas merge_asof `tolerance`): a candidate older than
  * leftTime - toleranceUs is treated as no match for THAT left row
  * (it still advances the merge cursor for later left rows).
  *
  * Physical shape: both sides hash-partitioned by key and sorted by
  * (key, time) — declared via `requiredChildDistribution` /
  * `requiredChildOrdering`, so Catalyst plants the exchanges and
  * sorts (and AQE tunes them) — then a single streaming merge pass
  * per partition. O(|L|+|R|) per partition, no buffering beyond one
  * candidate row, no window state: the shape that survives billions
  * of rows per key-range at 100 TB.
  *
  * v1 restriction: key and time expressions must evaluate to
  * LongType (ids + epoch micros — graft's event model).
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    toleranceUs: Option[Long] = None,
    allowExactMatches: Boolean = true) extends BinaryNode {

  toleranceUs.foreach(t => require(t >= 0,
    s"AsOfJoin tolerance must be non-negative, got $t"))

  // Contract: keys/times must be long-backed internally (LongType, or
  // TimestampType/TimestampNTZType whose Catalyst representation is
  // epoch micros as Long — getLong reads them directly and ordering
  // is preserved). Narrower integral columns are widened by a
  // plan-time Cast in AsOf.join; anything else would
  // ClassCastException at executor runtime, so fail at construction.
  // Key/time types must also MATCH across sides: the two children are
  // hash-partitioned independently, and Murmur3 of Int 5 != Long 5 —
  // mixed types would silently mis-co-partition, not just mis-compare.
  {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val longBacked = Set[org.apache.spark.sql.types.DataType](
      LongType, TimestampType, TimestampNTZType)
    for ((e, role) <- Seq(leftKey -> "leftKey", rightKey -> "rightKey",
        leftTime -> "leftTime", rightTime -> "rightTime")) {
      require(longBacked(e.dataType),
        s"AsOfJoin $role must be LongType/TimestampType, got ${e.dataType.simpleString} ($e)")
    }
    require(leftKey.dataType == rightKey.dataType,
      s"AsOfJoin key types must match: ${leftKey.dataType.simpleString} vs ${rightKey.dataType.simpleString}")
    require(leftTime.dataType == rightTime.dataType,
      s"AsOfJoin time types must match: ${leftTime.dataType.simpleString} vs ${rightTime.dataType.simpleString}")
  }

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    toleranceUs: Option[Long],
    allowExactMatches: Boolean) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] = Seq(
    ClusteredDistribution(Seq(leftKey)),
    ClusteredDistribution(Seq(rightKey)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(leftTime, org.apache.spark.sql.catalyst.expressions.Ascending)),
    Seq(SortOrder(rightKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(rightTime, org.apache.spark.sql.catalyst.expressions.Ascending)))

  /** Execution note on codegen: the merge LOOP is hand-written (like
    * SortMergeJoin's fallback path — a whole-stage-codegen'd two-sided
    * merge needs produce/consume plumbing for both children and buys
    * little here, since the loop body is two long compares), but all
    * per-row EXPRESSION work is generated code: the (key, time)
    * accessors on each side and the output projection are codegen'd
    * UnsafeProjections, so no interpreted `eval`, boxing, or virtual
    * expression dispatch remains on the hot path. */
  override protected def doExecute(): RDD[InternalRow] = {
    val rightWidth = right.output.size
    val outputAttrs = output
    val lKeyTime = Seq(leftKey, leftTime).map(BindReferences.bindReference(_, left.output))
    val rKeyTime = Seq(rightKey, rightTime).map(BindReferences.bindReference(_, right.output))

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // generated (codegen'd) projections, instantiated per partition
      val lProj = UnsafeProjection.create(lKeyTime)
      val rProj = UnsafeProjection.create(rKeyTime)
      val project = UnsafeProjection.create(outputAttrs, outputAttrs)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightWidth)
      val rBuf = rIter.buffered

      // last right row (copied — iterators reuse row buffers) whose
      // (key, time) precedes the current left cursor, per key
      var candKey = 0L
      var candTime = 0L
      var cand: InternalRow = null
      val tol = toleranceUs.getOrElse(-1L) // -1 = unbounded

      lIter.map { lRow =>
        val lk = lProj(lRow) // reused buffer: read fields immediately
        if (lk.isNullAt(0) || lk.isNullAt(1)) {
          // null key/time never matches (SQL join semantics)
          project(joined(lRow, nullRight))
        } else {
          val k = lk.getLong(0)
          val t = lk.getLong(1)
          // advance the right side to the merge frontier (key, time<=t);
          // nulls sort first under Ascending, so null-keyed right rows
          // are consumed here but never become candidates
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val rk = rProj(rBuf.head)
            if (rk.isNullAt(0) || rk.isNullAt(1)) {
              rBuf.next() // skip, never a candidate
            } else {
              val hk = rk.getLong(0)
              val ht = rk.getLong(1)
              // pandas allow_exact_matches=False: an equal-time row is
              // ineligible for THIS left row but must stay buffered —
              // advancing the single-candidate cursor over it would
              // overwrite an older ELIGIBLE candidate. The strict
              // frontier (ht < t) leaves it in rBuf; the next left row
              // with t' > t admits it normally.
              if (hk < k || (hk == k && (ht < t || (allowExactMatches && ht == t)))) {
                candKey = hk
                candTime = ht
                cand = rBuf.next().copy()
              } else {
                advancing = false
              }
            }
          }
          // tolerance is a match-time check, NOT a frontier filter: a
          // stale candidate still advances the cursor (a later left row
          // of the same key may be within tolerance of it)
          val matched = cand != null && candKey == k &&
            (tol < 0 || t - candTime <= tol)
          project(joined(lRow, if (matched) cand else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy: logical AsOfJoin → AsOfJoinExec. Registered via
  * `spark.experimental.extraStrategies` (see graft.plans.AsOf.register)
  * or GraftExtensions. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, tol, exact) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tol, exact) :: Nil
    case _ => Nil
  }
}
