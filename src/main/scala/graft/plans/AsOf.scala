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
    * leftTime - toleranceUs does not match.
    *
    * `direction` (pandas merge_asof `direction`): "backward" (the
    * default — latest right at-or-before) or "forward" (EARLIEST
    * right at-or-after, tie inclusive). Forward is the same
    * streaming merge run over NEGATED times — latest −r ≤ −l ⟺
    * smallest r ≥ l, exact on epoch-micros longs — so the negation
    * is applied to the TIME EXPRESSIONS only (timestamps go through
    * an exact `PreciseTimestampConversion` to micros first); the
    * exec, its tolerance check (−r < −l − T ⟺ r > l + T, the pandas
    * forward-tolerance bound), and the output columns are untouched.
    * For 'nearest', compose both directions and pick per row —
    * `q_asof_nearest` shows the pattern.
    *
    * `allowExactMatches = false` (pandas): an equal-time right row
    * never matches — implemented as a strict merge frontier in the
    * exec (the equal-time row stays buffered so it cannot overwrite
    * an older eligible candidate, and remains available to later
    * left rows). Composes with tolerance (d ∈ [1, T]) and with
    * direction (strict-forward = strict-backward over the negated
    * times). */
  def join(
      left: DataFrame, right: DataFrame,
      leftKey: String, leftTime: String,
      rightKey: String, rightTime: String,
      toleranceUs: Option[Long] = None,
      direction: String = "backward",
      allowExactMatches: Boolean = true): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, PreciseTimestampConversion, UnaryMinus}
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, TimestampNTZType, TimestampType}
    require(direction == "backward" || direction == "forward",
      s"direction must be 'backward' or 'forward', got '$direction'")
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
    // forward = backward over negated micros; negation only touches
    // the comparison expressions, never the output columns
    def time(e: Expression): Expression = {
      val w = widen(e)
      if (direction == "backward") w
      else UnaryMinus(w.dataType match {
        case TimestampType | TimestampNTZType =>
          PreciseTimestampConversion(w, w.dataType, LongType)
        case _ => w
      })
    }
    DatasetBridge.ofRows(spark,
      AsOfJoin(lPlan, rPlan,
        widen(attr(lPlan, leftKey)), widen(attr(rPlan, rightKey)),
        time(attr(lPlan, leftTime)), time(attr(rPlan, rightTime)),
        toleranceUs, allowExactMatches))
  }
}
