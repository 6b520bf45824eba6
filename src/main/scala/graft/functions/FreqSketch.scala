package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters sketch as a `TypedImperativeAggregate` —
  * the imperative-buffer aggregate extension class (the form Spark's
  * own HLL/percentile sketches use; completes graft's Catalyst
  * extension coverage next to the native scalar Expressions, the
  * typed `Aggregator`, and the whole-operator plan stack).
  *
  * Finds the heavy hitters of a column in ONE pass with k counters
  * per partition — no per-key shuffle, no full aggregation state: the
  * way to ask "which tokens dominate this 100 TB corpus" when the
  * full wordcount (distinct-key-sized state) is not worth its
  * shuffle. Buffers merge per the mergeable-summaries construction
  * (combine counts, then subtract the (k+1)-th largest and drop ≤0),
  * so the guarantee survives arbitrary partitioning:
  *
  *   - every item with true count > n/(k+1) is in the output, and
  *   - each reported count is in [true − n/(k+1), true]
  *
  * where n = total rows aggregated. Reported counts (not membership
  * of true heavy hitters) can vary with merge order — approximate by
  * construction, so the operator is spec-verified against exact
  * counts (rows-only), like the HLL sketch.
  */
case class MisraGries(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with UnaryLike[Expression] {

  require(k >= 1, s"mg_topk needs k >= 1, got $k")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("token", StringType), StructField("min_count", LongType))))
  override def nullable: Boolean = false
  override def prettyName: String = "mg_topk"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) MgCore.add(buf, v.toString, k)
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] =
    MgCore.merge(buf, other, k)

  override def eval(buf: mutable.HashMap[String, Long]): Any =
    new GenericArrayData(
      MgCore.top(buf).map { case (s, c) =>
        InternalRow(UTF8String.fromString(s), c)
      })

  // length-prefixed UTF-8, NOT writeUTF: writeUTF caps strings at
  // 65535 bytes and a heavy hitter can be a whole boilerplate document
  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bytes = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bytes)
    out.writeInt(buf.size)
    buf.foreach { case (s, c) =>
      val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
    }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    (0 until n).foreach { _ =>
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(new String(b, java.nio.charset.StandardCharsets.UTF_8),
        in.readLong())
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGries =
    copy(child = newChild)
}

/** THE Misra-Gries buffer operations — single definitions shared by
  * the Catalyst aggregate above and the streaming sketch
  * (`StreamingJobs.mgTopkStream`), so the two surfaces cannot drift:
  * a sketch whose batch and streaming decrement steps disagreed would
  * carry two different error guarantees under one name. */
object MgCore {

  /** Keep ≤ k counters: subtract the (k+1)-th largest count from all
    * and drop the non-positive — the batched MG decrement step. The
    * per-row saturated path (an add pushed size to exactly k+1) takes
    * the O(k) min instead of the O(k log k) sort — at steady state
    * that path runs once per input row, so its cost IS the sketch's
    * throughput; the sort remains only for merge (size up to 2k),
    * which runs once per partition pair. */
  def prune(buf: mutable.HashMap[String, Long], k: Int): Unit =
    if (buf.size > k) {
      val cStar =
        if (buf.size == k + 1) buf.values.min
        else buf.values.toArray.sortInPlace()(Ordering[Long].reverse).apply(k)
      val dead = mutable.ArrayBuffer.empty[String]
      buf.mapValuesInPlace((_, c) => c - cStar)
      buf.foreach { case (s, c) => if (c <= 0) dead += s }
      dead.foreach(buf.remove)
    }

  /** One observation of `s`. */
  def add(buf: mutable.HashMap[String, Long], s: String, k: Int): Unit = {
    buf.update(s, buf.getOrElse(s, 0L) + 1L)
    prune(buf, k)
  }

  /** Mergeable-summaries combine: add counts, one decrement step. */
  def merge(buf: mutable.HashMap[String, Long],
      other: scala.collection.Map[String, Long], k: Int)
      : mutable.HashMap[String, Long] = {
    other.foreach { case (s, c) => buf.update(s, buf.getOrElse(s, 0L) + c) }
    prune(buf, k)
    buf
  }

  /** Deterministic output order: count desc, then token. */
  def top(buf: scala.collection.Map[String, Long]): Seq[(String, Long)] =
    buf.toSeq.sortBy { case (s, c) => (-c, s) }
}

object FreqSketch {

  /** Column-level API: `df.agg(FreqSketch.mgTopk(col("token"), 16))`. */
  def mgTopk(c: Column, k: Int): Column =
    ColumnBridge.column(
      MisraGries(ColumnBridge.expression(c), k).toAggregateExpression())

  /** Idempotent per-session SQL registration: `mg_topk(tok, 16)`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "mg_topk",
      exprs => MisraGries(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue()),
      "built-in")
}
