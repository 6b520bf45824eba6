package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.graftbridge.DatasetBridge

/** User-facing API for the native as-of join operator.
  *
  * Columns are named (not `Column` expressions) so keys resolve
  * unambiguously against each side — both sides usually carry a
  * same-named key column.
  */
object AsOf {

  /** Idempotently install the planner strategy + optimizer rule. */
  def register(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies = cur :+ AsOfJoinStrategy
    }
    val opts = spark.experimental.extraOptimizations
    if (!opts.contains(PushFilterThroughAsOfJoin)) {
      spark.experimental.extraOptimizations = opts :+ PushFilterThroughAsOfJoin
    }
  }

  /** n-way as-of: attach the latest at-or-before row from EACH right
    * side to the same left keys/times — `left ASOF JOIN r1 ASOF JOIN
    * r2 …` (kdb `aj` over multiple quote tables). Composes the binary
    * operator left-deep; every stage re-uses the left side's hash
    * partitioning on the (unchanged) key, so the extra sides add one
    * exchange+sort of THEIR input each, never of the accumulated
    * left. Right-side column names must not collide (alias them, as
    * with any join). */
  def joinMulti(left: DataFrame, leftKey: String, leftTime: String,
      rights: (DataFrame, String, String)*): DataFrame =
    rights.foldLeft(left) { case (acc, (r, rk, rt)) =>
      join(acc, r, leftKey, leftTime, rk, rt)
    }

  /** left ASOF LEFT JOIN right ON leftKey = rightKey AND
    * rightTime <= leftTime (latest such right row). Key/time columns
    * may be LongType, TimestampType/TimestampNTZType (epoch-micros
    * internal representation — compared and hashed natively), or any
    * narrower integral type (byte/short/int — widened to Long by a
    * plan-time Cast, inserted on BOTH sides so the two children
    * hash-partition compatibly). `toleranceUs` (pandas merge_asof
    * `tolerance`): when set, a right row older than
    * leftTime - toleranceUs does not match. */
  def join(
      left: DataFrame, right: DataFrame,
      leftKey: String, leftTime: String,
      rightKey: String, rightTime: String,
      toleranceUs: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val spark = left.sparkSession
    register(spark)
    val lPlan = DatasetBridge.analyzedPlan(left)
    val rPlan = DatasetBridge.analyzedPlan(right)
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"column $n not found in [${p.output.map(_.name).mkString(", ")}]"))
    // widen narrow integrals to Long (exact, order-preserving); other
    // types pass through and the logical node's contract checks them
    def widen(e: Expression): Expression = e.dataType match {
      case ByteType | ShortType | IntegerType => Cast(e, LongType)
      case _ => e
    }
    DatasetBridge.ofRows(spark,
      AsOfJoin(lPlan, rPlan,
        widen(attr(lPlan, leftKey)), widen(attr(rPlan, rightKey)),
        widen(attr(lPlan, leftTime)), widen(attr(rPlan, rightTime)),
        toleranceUs))
  }
}
