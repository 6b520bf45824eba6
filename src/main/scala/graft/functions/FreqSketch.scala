package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.lit
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

/** Count-Min sketch as a `TypedImperativeAggregate`: a depth×width
  * counter matrix answering "about how often does item x occur?" for
  * ANY x in fixed memory — the point-frequency complement to
  * Misra-Gries (which only surfaces the heavy hitters) in the sketch
  * family (HLL distinct / MG heavy hitters / GK quantiles / CMS
  * frequencies).
  *
  * Each row i of the matrix is a hash-bucketed histogram: counter
  * [i][h_i(x)] accumulates every occurrence of every item hashing
  * there. An item's estimate is the MIN over rows of its counter —
  * ≥ the true count always (counters only over-count, by colliding
  * items). The classical ≤ true + εN with probability 1−δ bound
  * (width = e/ε, depth = ln(1/δ); Cormode & Muthukrishnan 2005)
  * assumes INDEPENDENT row hashes; here every row is an affine mix
  * of ONE 60-bit md5 base hash reduced mod p = 2³¹−1 (the
  * cross-engine determinism trade), so two items colliding in the
  * base hash collide in EVERY row and the bound holds only
  * approximately — base collisions become non-negligible as the
  * distinct-item count approaches √p ≈ 46k. The overestimate-only
  * guarantee is construction-level and unaffected; vocabularies
  * beyond that scale should salt independent md5s per row and give
  * up the shared-base oracle form.
  *
  * Unlike MG/HLL, the final matrix is merge-order INVARIANT — every
  * counter is an exact sum, and partial-buffer merge is element-wise
  * addition — so estimates are deterministic and the registered query
  * (`text_cms`) is fully ORACLE-CHECKED: the bucket hash is the
  * cross-engine md5 base hash + affine row mixes (the minhash
  * construction), so DuckDB can recompute every counter the sketch
  * builds. At 100 TB: one pass, depth×width longs per partition, no
  * distinct-key state, merge cost independent of data.
  */
case class CountMinMatrix(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  require(depth >= 1 && depth <= CmsCore.MaxDepth,
    s"cms depth must be in [1, ${CmsCore.MaxDepth}], got $depth")
  require(width >= 2, s"cms width must be >= 2, got $width")

  override def dataType: DataType =
    ArrayType(ArrayType(LongType, containsNull = false), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "cms_matrix"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h1 = CmsCore.baseMod(v.toString)
      var i = 0
      while (i < depth) {
        buf(i * width + CmsCore.bucket(i, h1, width)) += 1L
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData((0 until depth).map { i =>
      new GenericArrayData(
        java.util.Arrays.copyOfRange(buf, i * width, (i + 1) * width))
    })

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinMatrix =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinMatrix =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CountMinMatrix =
    copy(child = newChild)
}

/** THE CMS bucket hash, defined once for three JVM/plan consumers:
  * the aggregate's update path, the Column-side probe expressions
  * (estimate lookup), and the streaming job's state fold. All compute
  * bucket_i(x) = ((A(i) · (md5_60(x) mod P) + B(i)) mod P) mod width
  * with P = 2³¹−1 — the affine-mix-of-one-md5 construction the
  * minhash kernel established (Dedup.scala): one md5 per item, d
  * "independent" row hashes as integer mixes, every op exact on both
  * engines. The DuckDB oracle mirrors the formula from the SAME A/B
  * constant lists (interpolated into its seeds CTE), so the
  * constants are single-sourced even where the SQL text is not. */
object CmsCore {

  val P = 2147483647L // 2^31 - 1
  // distinct from Dedup's minhash seeds: a sketch sharing seeds with
  // the LSH bands would correlate their collision patterns
  val A: Seq[Long] = Seq(1299721L, 15485917L, 32452901L, 49979729L,
    67867979L, 86028157L)
  val B: Seq[Long] = Seq(104729L, 224737L, 350377L, 479939L,
    611957L, 746777L)
  val MaxDepth: Int = A.size

  /** md5 60-bit base hash reduced mod P — the JVM twin of
    * `CrossEngine.md5Long(c) % P` (first 15 lowercase hex digits of
    * the UTF-8 md5, parsed base 16). */
  def baseMod(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // first 15 hex digits = 7.5 bytes: 7 full bytes + the high nibble
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h = (h << 4) | ((d(7) & 0xf0L) >> 4)
    h % P
  }

  def bucket(i: Int, baseModP: Long, width: Int): Int =
    (((A(i) * baseModP + B(i)) % P) % width).toInt

  /** Column form of the same bucket, for probe lookups — on literal
    * probes Catalyst constant-folds it to an int. */
  def bucketCol(c: Column, i: Int, width: Int): Column =
    ((lit(A(i)) * (CrossEngine.md5Long(c) % P) + lit(B(i))) % P) % width
}

object FreqSketch {

  /** Column-level API: `df.agg(FreqSketch.mgTopk(col("token"), 16))`. */
  def mgTopk(c: Column, k: Int): Column =
    ColumnBridge.column(
      MisraGries(ColumnBridge.expression(c), k).toAggregateExpression())

  /** Column-level API: `df.agg(FreqSketch.cmsMatrix(col("token"), 4, 64))`
    * → `array<array<long>>`, the depth×width counter matrix. */
  def cmsMatrix(c: Column, depth: Int, width: Int): Column =
    ColumnBridge.column(
      CountMinMatrix(ColumnBridge.expression(c), depth, width)
        .toAggregateExpression())

  /** Idempotent per-session SQL registration: `mg_topk(tok, 16)`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "mg_topk",
      exprs => MisraGries(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue()),
      "built-in")
}
