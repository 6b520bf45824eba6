package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-level distributed prefix-sum scaffolding, shared by `mr_sort`
  * (global rank) and `pipeline_pack_sequences` (global running token
  * count): rows get a `monotonically_increasing_id` AFTER a range
  * exchange + local sort (column must be named `mid`), the partition
  * id lives in the id's upper bits, and the only globally-ordered
  * structure is the per-partition total table — one row per
  * partition regardless of corpus size, so no single-partition
  * window ever sees the full table. Centralized because the 33-bit
  * split is an implementation detail of `monotonically_increasing_id`
  * that must not drift between copies.
  */
object PrefixSum {

  /** Partition id from a `mid` column (`monotonically_increasing_id`
    * packs it above the 33-bit per-partition counter). */
  def pid: Column = expr("shiftright(mid, 33)")

  /** Per-partition local row index (lower 33 bits of `mid`). */
  def localIdx: Column = expr("mid & 8589934591")

  /** `(pid, off)` EXCLUSIVE offsets: off = Σ weight over all earlier
    * partitions. One row per partition — broadcast it back onto the
    * sorted frame and add the local prefix. */
  def partitionOffsets(sorted: DataFrame, weight: Column): DataFrame =
    sorted
      .groupBy(pid.as("pid"))
      .agg(sum(weight).as("w"))
      .withColumn("off", coalesce(sum(col("w")).over(
        Window.orderBy(col("pid")).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col("pid"), col("off"))
}
