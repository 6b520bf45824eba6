package graft.functions

import org.apache.spark.util.AccumulatorV2

/** (row count, running XOR) accumulator — the fused form of the
  * iterative kernels' convergence fingerprint
  * `(count(*), bit_xor(xxhash64(...)))`. Both components are
  * order-independent and dup-free per input row, so accumulating them
  * during a checkpoint's materialization job yields bit-identical
  * values to the separate aggregate job it replaces. Accumulator
  * updates are applied by the scheduler once per successful result
  * partition (failed attempts are discarded), matching the agg's
  * exactly-once semantics. */
private[graft] class XorCountAcc extends AccumulatorV2[Long, (Long, Long)] {
  private var cnt = 0L
  private var x = 0L
  override def isZero: Boolean = cnt == 0L && x == 0L
  override def copy(): XorCountAcc = {
    val a = new XorCountAcc; a.cnt = cnt; a.x = x; a
  }
  override def reset(): Unit = { cnt = 0L; x = 0L }
  override def add(v: Long): Unit = { cnt += 1L; x ^= v }
  override def merge(other: AccumulatorV2[Long, (Long, Long)]): Unit =
    other match {
      case a: XorCountAcc => cnt += a.cnt; x ^= a.x
      case _ => throw new IllegalArgumentException(
        s"cannot merge ${other.getClass.getName} into XorCountAcc")
    }
  override def value: (Long, Long) = (cnt, x)
}
