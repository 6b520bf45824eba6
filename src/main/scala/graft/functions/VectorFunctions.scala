package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, SQLOrderingUtil}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

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

  // ---------------------------------------------------- native assign kernels
  //
  // Round-18 (guide §4 / §1.2 step 2): the per-row assign/encode hot
  // paths were `aggregate`/`zip_with` HOF folds — HigherOrderFunction
  // has no codegen, so every corpus row paid interpreted lambda
  // dispatch plus per-element boxing, and at 100 TB the assign IS the
  // dominant kmeans/IVF cost. Each expression below replicates its
  // fold's semantics BIT-FOR-BIT (same IEEE op order, same
  // SQLOrderingUtil comparison semantics the interpreted `<`/`>`
  // used, same null/NaN/degenerate-input behavior — documented per
  // kernel), so every oracle hash is untouched; the shared static
  // helpers are called from both `eval` and the generated code, which
  // makes interpreted and codegen paths identical by construction.

  /** Argmax-cosine centroid id for one row — the native form of the
    * [[graft.operators.Similarity.nearestCentroid]] fold. Semantics
    * (replicated exactly from the Column fold):
    *   - seed = lowest-id centroid; only a STRICTLY greater cosine
    *     replaces the incumbent (ties keep the lowest id);
    *   - cosine = dot(cv, v) / (cn * nrm) with try_divide semantics:
    *     null iff the denominator is ±0.0 (or v/nrm null);
    *   - comparison is Spark's interpreted double ordering
    *     (SQLOrderingUtil: NaN greatest, NaN==NaN, -0.0==0.0), plus
    *     the fold's null rescue: a null incumbent yields to the first
    *     non-null cosine;
    *   - null v or nrm ⇒ every cosine null ⇒ the seed id (never a
    *     null result).
    * `ids`/`cvs`/`cns` are parallel arrays sorted ascending by id;
    * they ride into codegen as ONE referenced object each (no inline
    * literal text, so generated source is identical across Lloyd
    * rounds and the janino cache hits). */
  case class NearestCentroidId(ids: Array[Int], cvs: Array[Array[Double]],
      cns: Array[Double], v: Expression, nrm: Expression)
      extends BinaryExpression {
    override def left: Expression = v
    override def right: Expression = nrm
    override def dataType: DataType = IntegerType
    override def nullable: Boolean = false

    override def eval(input: InternalRow): Any = {
      val va = v.eval(input)
      val na = nrm.eval(input)
      if (va == null || na == null) ids(0)
      else VectorFunctions.nearestCentroidId(ids, cvs, cns,
        va.asInstanceOf[ArrayData], na.asInstanceOf[Double])
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val idsRef = ctx.addReferenceObj("ncIds", ids, "int[]")
      val cvsRef = ctx.addReferenceObj("ncCvs", cvs, "double[][]")
      val cnsRef = ctx.addReferenceObj("ncCns", cns, "double[]")
      val vg = left.genCode(ctx)
      val ng = right.genCode(ctx)
      ev.copy(code =
        code"""
          ${vg.code}
          ${ng.code}
          int ${ev.value} = (${vg.isNull} || ${ng.isNull}) ? $idsRef[0] :
            graft.functions.VectorFunctions.nearestCentroidId(
              $idsRef, $cvsRef, $cnsRef, ${vg.value}, ${ng.value});
        """, isNull = FalseLiteral)
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(v = newLeft, nrm = newRight)

    // Array fields compare by reference under case-class equality,
    // which defeats semanticEquals/CSE/exchange-reuse for structurally
    // identical expressions built from separate collects (ADVICE r18)
    // — compare contents instead.
    override def equals(other: Any): Boolean = other match {
      case o: NearestCentroidId =>
        java.util.Arrays.equals(ids, o.ids) &&
        java.util.Arrays.deepEquals(
          cvs.asInstanceOf[Array[AnyRef]], o.cvs.asInstanceOf[Array[AnyRef]]) &&
        java.util.Arrays.equals(cns, o.cns) && v == o.v && nrm == o.nrm
      case _ => false
    }
    override def hashCode(): Int = java.util.Objects.hash(
      Int.box(java.util.Arrays.hashCode(ids)),
      Int.box(java.util.Arrays.deepHashCode(cvs.asInstanceOf[Array[AnyRef]])),
      Int.box(java.util.Arrays.hashCode(cns)), v, nrm)

    override def prettyName: String = "nearest_centroid_id"
  }

  /** Shared loop of [[NearestCentroidId]] — one body for eval and
    * codegen. Dot runs min-length left-to-right like [[DotProduct]]. */
  def nearestCentroidId(ids: Array[Int], cvs: Array[Array[Double]],
      cns: Array[Double], v: ArrayData, nrm: Double): Int = {
    var bestC = ids(0)
    var bestNull = false
    var bestS = 0.0
    val d0 = cns(0) * nrm
    if (d0 == 0.0) bestNull = true else bestS = dotArr(cvs(0), v) / d0
    var i = 1
    while (i < ids.length) {
      val di = cns(i) * nrm
      if (di != 0.0) { // ±0.0 denominator ⇒ null cosine ⇒ never replaces
        val sc = dotArr(cvs(i), v) / di
        if (bestNull || SQLOrderingUtil.compareDoubles(sc, bestS) > 0) {
          bestC = ids(i); bestS = sc; bestNull = false
        }
      }
      i += 1
    }
    bestC
  }

  private def dotArr(a: Array[Double], v: ArrayData): Double = {
    val n = math.min(a.length, v.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a(i) * v.getDouble(i); i += 1 }
    acc
  }

  /** Argmin-squared-L2 code within one PQ subspace — the native form
    * of the [[graft.operators.Similarity.pqCode]] fold. Semantics
    * (replicated exactly): d² = Σ (cw(j) − sub(j))² left-to-right;
    * only a STRICTLY smaller d² replaces (ties keep the lowest code);
    * comparison via SQLOrderingUtil (a NaN d² never wins over a
    * finite incumbent; a finite one beats a NaN incumbent); the
    * zip_with null-padding rule means a null `sub`, a null element,
    * or a length mismatch against codeword 0 yields a null seed d²
    * that nothing can replace ⇒ code 0; a length mismatch on a LATER
    * codeword only voids that candidate. Result is never null. */
  case class PqArgMin(cb: Array[Array[Double]], sub: Expression)
      extends UnaryExpression {
    override def child: Expression = sub
    override def dataType: DataType = IntegerType
    override def nullable: Boolean = false

    override def eval(input: InternalRow): Any = {
      val sa = sub.eval(input)
      if (sa == null) 0
      else VectorFunctions.pqArgMin(cb, sa.asInstanceOf[ArrayData])
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cbRef = ctx.addReferenceObj("pqCb", cb, "double[][]")
      val sg = child.genCode(ctx)
      ev.copy(code =
        code"""
          ${sg.code}
          int ${ev.value} = ${sg.isNull} ? 0 :
            graft.functions.VectorFunctions.pqArgMin($cbRef, ${sg.value});
        """, isNull = FalseLiteral)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(sub = newChild)

    // content equality for the codebook (see NearestCentroidId)
    override def equals(other: Any): Boolean = other match {
      case o: PqArgMin =>
        java.util.Arrays.deepEquals(
          cb.asInstanceOf[Array[AnyRef]], o.cb.asInstanceOf[Array[AnyRef]]) &&
        sub == o.sub
      case _ => false
    }
    override def hashCode(): Int = java.util.Objects.hash(
      Int.box(java.util.Arrays.deepHashCode(cb.asInstanceOf[Array[AnyRef]])), sub)

    override def prettyName: String = "pq_argmin"
  }

  /** Shared loop of [[PqArgMin]]. */
  def pqArgMin(cb: Array[Array[Double]], sub: ArrayData): Int = {
    val n = sub.numElements()
    var j = 0
    while (j < n) { if (sub.isNullAt(j)) return 0; j += 1 }
    if (cb(0).length != n) return 0 // null seed d²: nothing replaces it
    var best = 0
    var bestD = l2d2Arr(cb(0), sub, n)
    var c = 1
    while (c < cb.length) {
      if (cb(c).length == n) {
        val d = l2d2Arr(cb(c), sub, n)
        if (SQLOrderingUtil.compareDoubles(d, bestD) < 0) { best = c; bestD = d }
      }
      c += 1
    }
    best
  }

  private def l2d2Arr(a: Array[Double], sub: ArrayData, n: Int): Double = {
    var acc = 0.0
    var j = 0
    while (j < n) { val d = a(j) - sub.getDouble(j); acc += d * d; j += 1 }
    acc
  }

  /** Elementwise a−b / a+b over two array<double> columns — the
    * native form of `zip_with(a, b, (x, y) => x ∓ y)`. Replicates
    * zip_with exactly: result length = max(|a|, |b|), positions past
    * the shorter side and positions where either element is null are
    * null. The all-clean equal-length case (every real row) returns
    * an UnsafeArrayData with zero boxing. */
  case class VecSub(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
    override def nullIntolerant: Boolean = true

    override def nullSafeEval(a: Any, b: Any): Any =
      VectorFunctions.zipSubData(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.functions.VectorFunctions.zipSubData($a, $b);")

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)

    override def prettyName: String = "vec_sub"
  }

  /** See [[VecSub]]. */
  case class VecAdd(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
    override def nullIntolerant: Boolean = true

    override def nullSafeEval(a: Any, b: Any): Any =
      VectorFunctions.zipAddData(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.functions.VectorFunctions.zipAddData($a, $b);")

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)

    override def prettyName: String = "vec_add"
  }

  def zipSubData(x: ArrayData, y: ArrayData): ArrayData = zipData(x, y, add = false)
  def zipAddData(x: ArrayData, y: ArrayData): ArrayData = zipData(x, y, add = true)

  private def zipData(x: ArrayData, y: ArrayData, add: Boolean): ArrayData = {
    val nx = x.numElements()
    val ny = y.numElements()
    if (nx == ny) {
      var clean = true
      var i = 0
      while (clean && i < nx) {
        if (x.isNullAt(i) || y.isNullAt(i)) clean = false
        i += 1
      }
      if (clean) {
        val out = new Array[Double](nx)
        i = 0
        if (add) while (i < nx) { out(i) = x.getDouble(i) + y.getDouble(i); i += 1 }
        else while (i < nx) { out(i) = x.getDouble(i) - y.getDouble(i); i += 1 }
        return UnsafeArrayData.fromPrimitiveArray(out)
      }
    }
    val n = math.max(nx, ny)
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) =
        if (i >= nx || i >= ny || x.isNullAt(i) || y.isNullAt(i)) null
        else if (add) x.getDouble(i) + y.getDouble(i)
        else x.getDouble(i) - y.getDouble(i)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column wrappers. */
  def vecSub(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    ColumnBridge.column(VecSub(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def vecAdd(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    ColumnBridge.column(VecAdd(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Idempotent per-session registration; afterwards the functions
    * are usable from any SQL/`expr(...)` in that session. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "l2_norm", exprs => L2Norm(exprs.head), "built-in")
  }
}
