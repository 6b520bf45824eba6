package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}
import graft.Tables

/** Relational / OLAP core (SURVEY.md §2 B).
  *
  * Cross-engine determinism rules (SURVEY.md §3): every floating
  * aggregate goes through an exact decimal sum (order-independent
  * across any shuffle/partitioning) and is only then cast to double
  * and rounded. Engine `avg` is never used — always rounded
  * sum/count. Every result has a total-order `orderBy` on a unique
  * key combination so row order matches the DuckDB oracle.
  */
object Relational {

  /** Exact, order-independent money sum: decimal in, rounded double out. */
  private def dsum(c: Column, scale: Int = 2): Column =
    round(sum(c.cast(DecimalType(18, 6))).cast(DoubleType), scale)

  /** q1_pricing_summary — TPC-H Q1-style multi-aggregate scan.
    * Reference analogue: the reduce-side aggregation model of
    * mr/src/worker.rs:124-140 (group values by key, fold) — here the
    * whole group-fold is one declarative hash aggregate with map-side
    * partial aggregation, no materialized intermediate files.
    */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q1Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  round(cast(sum(cast(l_quantity as decimal(18,6))) as double), 2) AS sum_qty,
      |  round(cast(sum(cast(l_extendedprice as decimal(18,6))) as double), 2) AS sum_base_price,
      |  round(cast(sum(cast(l_extendedprice * (1.0 - l_discount) as decimal(18,6))) as double), 2) AS sum_disc_price,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= timestamp '1998-09-01'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin
}
