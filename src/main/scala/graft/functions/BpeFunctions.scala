package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst form of the BPE trainer's per-round merge fold
  * (guide §4: no interpreted `aggregate` HOF in the hot path). One
  * round rewrites a symbol array by the greedy LEFT-TO-RIGHT
  * NON-OVERLAPPING merge of the adjacent pair (l, r) → l+r, exactly
  * the `aggregate` fold it replaces:
  *
  *   - the accumulator's LAST element is replaced when it equals `l`
  *     and the current element equals `r`; both comparisons are
  *     null-rejecting (a null last or current element never matches,
  *     and null elements pass through appended as-is);
  *   - the merged symbol l+r can itself be the LEFT side of a later
  *     match within the same round only if l+r == l, impossible for
  *     non-empty r — so no rescan of the replacement, like the fold;
  *   - a null input array yields null (the fold's null propagation).
  *
  * `l`/`r`/`merged` ride into codegen as referenced objects (not
  * inline literals), so the generated source is identical across
  * merge rounds and the janino cache hits — the NearestCentroidId
  * discipline; UTF8String fields have value equality, so expression
  * canonicalization and CSE keep working (ADVICE r18). */
case class BpeMergeSyms(child: Expression,
    l: UTF8String, r: UTF8String, merged: UTF8String)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  override def eval(input: InternalRow): Any = {
    val a = child.eval(input)
    if (a == null) null
    else BpeFunctions.mergePair(a.asInstanceOf[ArrayData], l, r, merged)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lRef = ctx.addReferenceObj("bpeL", l, "UTF8String")
    val rRef = ctx.addReferenceObj("bpeR", r, "UTF8String")
    val mRef = ctx.addReferenceObj("bpeM", merged, "UTF8String")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.BpeFunctions.mergePair($a, $lRef, $rRef, $mRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "bpe_merge_syms"
}

object BpeFunctions {

  /** Shared loop of [[BpeMergeSyms]] — one body for eval and codegen. */
  def mergePair(in: ArrayData, l: UTF8String, r: UTF8String,
      m: UTF8String): ArrayData = {
    val n = in.numElements()
    val out = new Array[AnyRef](n)
    var k = 0
    var i = 0
    while (i < n) {
      val x: UTF8String = if (in.isNullAt(i)) null else in.getUTF8String(i)
      if (k > 0 && x != null && out(k - 1) != null &&
          out(k - 1).equals(l) && x.equals(r)) {
        out(k - 1) = m
      } else {
        out(k) = x
        k += 1
      }
      i += 1
    }
    new GenericArrayData(
      if (k == n) out else java.util.Arrays.copyOf(out, k))
  }

  /** Column wrapper: one greedy merge round of (l, r) → l+r. */
  def bpeMerge(syms: org.apache.spark.sql.Column, l: String, r: String): org.apache.spark.sql.Column =
    ColumnBridge.column(BpeMergeSyms(ColumnBridge.expression(syms),
      UTF8String.fromString(l), UTF8String.fromString(r),
      UTF8String.fromString(l + r)))
}
