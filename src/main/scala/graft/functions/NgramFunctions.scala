package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst form of the decontamination 5-gram builder
  * (guide §4): replaces the interpreted
  * `filter(split(text), x -> x != '')` token compaction plus the
  * `transform(t, (x, i) -> CASE WHEN i+4 < size(t) THEN concat_ws(' ',
  * …5 elements…) END)` / `filter(s -> s IS NOT NULL)` gram fold —
  * three HigherOrderFunction nodes with per-token lambda dispatch on
  * every corpus row. Semantics replicated exactly: tokens that are
  * null or empty are dropped first (the `x != ''` filter's
  * null-rejecting comparison), then one space-joined gram per window
  * of 5 consecutive surviving tokens. Output grams are the identical
  * strings, so every downstream join/hash (and oracle) is unchanged;
  * callers keep composing with the native `array_distinct`/`explode`.
  */
case class FivegramArray(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any): Any =
    NgramFunctions.fivegrams(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.NgramFunctions.fivegrams($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "fivegram_array"
}

object NgramFunctions {

  private val Space = UTF8String.fromString(" ")
  private val Empty = new GenericArrayData(Array.empty[Any])

  /** Shared loop of [[FivegramArray]] — one body for eval and codegen. */
  def fivegrams(in: ArrayData): ArrayData = {
    val n = in.numElements()
    // compact: drop null/empty tokens (the `x != ''` filter)
    val toks = new Array[UTF8String](n)
    var m = 0
    var i = 0
    while (i < n) {
      if (!in.isNullAt(i)) {
        val t = in.getUTF8String(i)
        if (t.numBytes() > 0) { toks(m) = t; m += 1 }
      }
      i += 1
    }
    if (m < 5) return Empty
    val out = new Array[AnyRef](m - 4)
    i = 0
    while (i <= m - 5) {
      out(i) = UTF8String.concatWs(Space,
        toks(i), toks(i + 1), toks(i + 2), toks(i + 3), toks(i + 4))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column wrapper: 5-grams over a raw (uncompacted) token array. */
  def fivegramArr(toks: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    ColumnBridge.column(FivegramArray(ColumnBridge.expression(toks)))
}
