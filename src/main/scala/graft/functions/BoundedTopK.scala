package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StructField, StructType}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult

/** Mutable bounded top-k buffer: parallel primitive arrays kept
  * sorted by (score desc, id asc), never more than k entries. The
  * common case — a row that does not make the current top k — is one
  * O(1) compare against the worst kept entry; an accepted row is one
  * O(k) in-place shift (k is small: 3-5 in every caller). No
  * per-row allocation, unlike the immutable-Seq splicing of the typed
  * `TopKAggregator` buffer this replaces. */
final class TopKBuffer(val k: Int) {
  val ids = new Array[Long](k)
  val scores = new Array[Double](k)
  var n = 0

  /** True when (id1, s1) ranks strictly before (id2, s2).
    * Double.compare, not > / ==: primitive NaN comparisons are always
    * false, which would make NaN scores order-dependent. compare
    * treats NaN as the LARGEST value, matching Spark's own descending
    * sort order — the same contract as the typed TopKAggregator and
    * the row_number window oracle. */
  @inline private def before(id1: Long, s1: Double, id2: Long, s2: Double): Boolean = {
    val c = java.lang.Double.compare(s1, s2)
    c > 0 || (c == 0 && id1 < id2)
  }

  def insert(id: Long, s: Double): Unit = {
    if (n == k) {
      if (!before(id, s, ids(n - 1), scores(n - 1))) return
      n -= 1 // evict the current worst
    }
    var i = n
    while (i > 0 && before(id, s, ids(i - 1), scores(i - 1))) {
      ids(i) = ids(i - 1); scores(i) = scores(i - 1); i -= 1
    }
    ids(i) = id
    scores(i) = s
    n += 1
  }

  /** Merge `other` in — O(k²) repeated insert, but merges run once
    * per partition pair, never per row. */
  def mergeIn(other: TopKBuffer): Unit = {
    var i = 0
    while (i < other.n) { insert(other.ids(i), other.scores(i)); i += 1 }
  }
}

/** Native bounded top-k-per-group aggregate — the Catalyst
  * `TypedImperativeAggregate` form of `TopKAggregator` (round 19).
  *
  * Identical semantics and the same bounded-state scale property (the
  * buffer never exceeds k entries, so map-side partial aggregation
  * ships ≤ k rows per partition per group), but the update path reads
  * (id, score) straight from the `InternalRow`: no Dataset encoder,
  * no per-row Scala tuple materialization, no `AppendColumns` /
  * lambda-keyed `groupByKey` in the plan. On the pair-mass-bound
  * `ann_knn_join` the typed route's per-row encode/decode WAS the
  * query's cost (21.5 s at sf1, guide §1/§4: no interpreted per-row
  * machinery in the hot path).
  *
  * Ordering: score desc, then id asc; NaN sorts largest (see
  * TopKBuffer.before). Null id or score: the row is ignored, the
  * standard Spark aggregate null contract (the typed route crashed
  * its encoder on nulls, so no declared query depends on them). */
case class BoundedTopK(
    k: Int,
    id: Expression,
    score: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer]
  with BinaryLike[Expression] {

  require(k >= 1, s"bounded_topk needs k >= 1, got $k")

  override def left: Expression = id
  override def right: Expression = score

  // AbstractDataType (the ExpectsInputTypes route) is private[sql];
  // enforce the (long, double) input contract at analysis time here
  override def checkInputDataTypes(): TypeCheckResult =
    if (id.dataType == LongType && score.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bounded_topk needs (bigint, double) inputs, got " +
        s"(${id.dataType.simpleString}, ${score.dataType.simpleString})")

  override def dataType: DataType = StructType(Seq(
    StructField("ids", ArrayType(LongType, containsNull = false)),
    StructField("scores", ArrayType(DoubleType, containsNull = false))))
  override def nullable: Boolean = false
  override def prettyName: String = "bounded_topk"

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val i = id.eval(input)
    if (i != null) {
      val s = score.eval(input)
      if (s != null) buf.insert(i.asInstanceOf[Long], s.asInstanceOf[Double])
    }
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buf.mergeIn(other); buf
  }

  override def eval(buf: TopKBuffer): Any = new GenericInternalRow(Array[Any](
    new GenericArrayData(java.util.Arrays.copyOf(buf.ids, buf.n)),
    new GenericArrayData(java.util.Arrays.copyOf(buf.scores, buf.n))))

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.n * 16)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putLong(buf.ids(i)); i += 1 }
    i = 0
    while (i < buf.n) { bb.putDouble(buf.scores(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new TopKBuffer(k)
    var i = 0
    while (i < n) { buf.ids(i) = bb.getLong(); i += 1 }
    i = 0
    while (i < n) { buf.scores(i) = bb.getDouble(); i += 1 }
    buf.n = n
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BoundedTopK =
    copy(id = newLeft, score = newRight)
}

object BoundedTopK {
  /** Column-level API:
    * `df.groupBy("g").agg(BoundedTopK.topK(5, col("id"), col("score")))`
    * → struct<ids: array<long>, scores: array<double>>, ranked
    * (score desc, id asc), ≤ k entries. */
  def topK(k: Int, id: Column, score: Column): Column =
    ColumnBridge.column(
      BoundedTopK(k, ColumnBridge.expression(id), ColumnBridge.expression(score))
        .toAggregateExpression())
}
