package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.VectorFunctions

/** SparkSessionExtensions entry point: makes graft's native functions
  * available in any session via
  * `--conf spark.sql.extensions=graft.GraftExtensions`
  * (or `.withExtensions(new GraftExtensions)`), the standard way a
  * library ships Catalyst extensions to a cluster.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[VectorFunctions.DotProduct].getName, "dot_product"),
      (exprs: Seq[Expression]) => VectorFunctions.DotProduct(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("l2_norm"),
      new ExpressionInfo(classOf[VectorFunctions.L2Norm].getName, "l2_norm"),
      (exprs: Seq[Expression]) => VectorFunctions.L2Norm(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("md5_long"),
      new ExpressionInfo(classOf[graft.functions.Md5Long].getName, "md5_long"),
      (exprs: Seq[Expression]) => graft.functions.Md5Long(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("mg_topk"),
      new ExpressionInfo(classOf[graft.functions.MisraGries].getName, "mg_topk"),
      (exprs: Seq[Expression]) => graft.functions.MisraGries(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue())))
    // the whole-operator stack ships through the same entry point:
    // a cluster that sets spark.sql.extensions=graft.GraftExtensions
    // gets the as-of planner + its pushdown rule without any
    // driver-side AsOf.register call
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    e.injectOptimizerRule(_ => graft.plans.PushFilterThroughAsOfJoin)
  }
}
