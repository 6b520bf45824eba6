package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.unsafe.types.UTF8String

/** Native 60-bit md5 hash: the first 15 hex digits of md5(input) as a
  * long — bit-identical to the declarative form
  * `conv(substring(md5(s), 1, 15), 16, 10)` (and to the DuckDB oracle
  * twin `cast(concat('0x', substr(md5(e), 1, 15)) as bigint)`), which
  * is THE hash primitive under every signature operator (minhash,
  * simhash, fingerprints, deterministic sampling).
  *
  * Why native: the declarative chain materializes a 32-char lowercase
  * hex string per hash, substrings it, then string-parses base-16 —
  * three UTF8String allocations and a digit loop per shingle. This
  * expression digests the raw UTF8 bytes and assembles the top 60
  * bits directly (first 8 digest bytes big-endian, >>> 4 — the same
  * bits the 15-hex-digit prefix spells), with full whole-stage
  * codegen. Probed at the minhash signature stage: the md5 chain is
  * the dominant per-row cost of the streaming dedup path.
  */
case class Md5Long(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"md5_long needs a string argument, got ${child.dataType}")

  override def nullSafeEval(s: Any): Any =
    Md5Long.hash60(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.Md5Long.hash60($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "md5_long"
}

object Md5Long {
  private val digestTL = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of md5(bytes of s), as a non-negative long. */
  def hash60(s: UTF8String): Long = {
    val md = digestTL.get()
    md.reset()
    val d = md.digest(s.getBytes)
    // big-endian first 8 bytes = first 16 hex digits; >>> 4 drops the
    // 16th digit, leaving exactly the 15-hex-digit (60-bit) prefix
    (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
      ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
      ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4
  }
}
