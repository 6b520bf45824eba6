package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expressions for the vector hot path (SURVEY.md §2
  * E/F). The declarative forms (`zip_with` + `aggregate`) allocate an
  * intermediate array per pair; at millions of candidate pairs that
  * allocation dominates. These expressions loop directly over the
  * `ArrayData` with full whole-stage codegen (`doGenCode`), no
  * allocation, and keep the exact left-to-right IEEE fold order the
  * DuckDB oracles replicate.
  *
  * Registered as SQL functions (`dot_product`, `l2_norm`) via
  * `VectorFunctions.register` — the preference-order "(b) custom
  * Expression" path from SURVEY.md, one rung below composing
  * built-ins and far above a Scala UDF.
  */
object VectorFunctions {

  /** Σ a(i)·b(i), sequential, over two array<double> columns. */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var acc = 0.0
      var i = 0
      while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val acc = ctx.freshName("acc")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $acc += $a.getDouble($i) * $b.getDouble($i);
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)

    override def prettyName: String = "dot_product"
  }

  /** sqrt(Σ x(i)²), sequential, over an array<double> column. */
  case class L2Norm(child: Expression)
      extends UnaryExpression {

    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true

    override def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val n = x.numElements()
      var acc = 0.0
      var i = 0
      while (i < n) { val v = x.getDouble(i); acc += v * v; i += 1 }
      math.sqrt(acc)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val acc = ctx.freshName("acc")
        val v = ctx.freshName("v")
        s"""
           |int $n = $a.numElements();
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $v = $a.getDouble($i);
           |  $acc += $v * $v;
           |}
           |${ev.value} = java.lang.Math.sqrt($acc);
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)

    override def prettyName: String = "l2_norm"
  }

  /** Column-level API (classic backend). */
  def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    ColumnBridge.column(
      DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def norm(a: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    ColumnBridge.column(L2Norm(ColumnBridge.expression(a)))

  /** Idempotent per-session registration; afterwards the functions
    * are usable from any SQL/`expr(...)` in that session. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "l2_norm", exprs => L2Norm(exprs.head), "built-in")
  }
}
