package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** Native Catalyst expressions for the multimodal byte-signature hot
  * path (SURVEY.md §2 G). The declarative twin of
  * [[NibbleHistFrames]] — hex → regexp nibble-strip → \G chunk split
  * → 16 `translate` scans per frame — allocates ~17 intermediate
  * strings PER FRAME (measured: 14 s at sf1, allocation-bound, flat
  * across string-op variants). This expression makes ONE pass over
  * the raw payload bytes per document inside whole-stage codegen and
  * allocates exactly the output arrays. Integer counts, so the
  * DuckDB oracle (which keeps the string form — fine at oracle SCALE)
  * stays exact.
  */
object MediaFunctions {

  /** Per-frame 16-bin histograms of the HIGH NIBBLE of every payload
    * byte: `array<array<int>>`, one inner array per `frameBytes`
    * slice (last slice partial). The high nibble is the hex-digit
    * signature [[graft.operators.Multimodal.featureBatch]] also bins
    * — kept as raw integer counts so downstream L1 arithmetic is
    * cross-engine exact. */
  case class NibbleHistFrames(child: Expression, frameBytes: Int)
      extends UnaryExpression {
    require(frameBytes >= 1, s"frameBytes must be >= 1, got $frameBytes")

    override def dataType: DataType = ArrayType(ArrayType(IntegerType, false), false)
    override def nullIntolerant: Boolean = true

    override def nullSafeEval(a: Any): Any = {
      val b = a.asInstanceOf[Array[Byte]]
      val nFrames = (b.length + frameBytes - 1) / frameBytes
      val frames = new Array[Any](nFrames)
      var f = 0
      while (f < nFrames) {
        val h = new Array[Int](16)
        var i = f * frameBytes
        val end = math.min(i + frameBytes, b.length)
        while (i < end) { h((b(i) & 0xff) >> 4) += 1; i += 1 }
        frames(f) = UnsafeArrayData.fromPrimitiveArray(h)
        f += 1
      }
      new GenericArrayData(frames)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val n = ctx.freshName("nFrames")
        val frames = ctx.freshName("frames")
        val f = ctx.freshName("f")
        val h = ctx.freshName("hist")
        val i = ctx.freshName("i")
        val end = ctx.freshName("end")
        s"""
           |int $n = ($a.length + ${frameBytes - 1}) / $frameBytes;
           |org.apache.spark.sql.catalyst.util.ArrayData[] $frames =
           |  new org.apache.spark.sql.catalyst.util.ArrayData[$n];
           |for (int $f = 0; $f < $n; $f++) {
           |  int[] $h = new int[16];
           |  int $end = java.lang.Math.min(($f + 1) * $frameBytes, $a.length);
           |  for (int $i = $f * $frameBytes; $i < $end; $i++) {
           |    $h[($a[$i] & 0xff) >> 4]++;
           |  }
           |  $frames[$f] = org.apache.spark.sql.catalyst.expressions
           |    .UnsafeArrayData.fromPrimitiveArray($h);
           |}
           |${ev.value} =
           |  new org.apache.spark.sql.catalyst.util.GenericArrayData($frames);
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)

    override def prettyName: String = "nibble_hist_frames"
  }

  def nibbleHistFrames(bin: Column, frameBytes: Int): Column =
    ColumnBridge.column(
      NibbleHistFrames(ColumnBridge.expression(bin), frameBytes))
}
