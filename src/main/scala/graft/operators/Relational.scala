package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}
import graft.{QueryDef, Tables}
import graft.functions.CrossEngine.{dsum, dsumSql, rnd, rndSql}

/** Relational / OLAP core (SURVEY.md §2 B).
  *
  * Cross-engine determinism rules (SURVEY.md §3): every floating
  * aggregate goes through an exact decimal sum (order-independent
  * across any shuffle/partitioning) and is only then cast to double
  * and rounded; engine `avg` is never used; every result carries a
  * total-order `orderBy` over a unique key set.
  *
  * Scale notes (SURVEY.md §4): dimension tables (region, nation,
  * supplier, part, customer) are broadcast explicitly — at TPC-H
  * ratios they stay tiny relative to the fact tables, so the joins
  * below are shuffle-free on the fact side. Fact-side groupBys get
  * map-side partial aggregation from Catalyst. Top-k uses
  * orderBy+limit (TakeOrderedAndProject — no global sort).
  */
object Relational {

  // ---------------------------------------------------------------- q1
  /** TPC-H Q1-style multi-aggregate scan. Reference analogue: the
    * reduce-side group-fold of mr/src/worker.rs:124-140, here one
    * declarative hash aggregate with map-side combine. */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  private val q1Sql =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${dsumSql("l_quantity", "sum_qty")},
       |  ${dsumSql("l_extendedprice", "sum_base_price")},
       |  ${dsumSql("l_extendedprice * (1.0 - l_discount)", "sum_disc_price")},
       |  count(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= timestamp '1998-09-01'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------- q3
  /** 3-table join + group + top-10 revenue (TPC-H Q3 shape).
    * customer is broadcast; orders⋈lineitem shuffles on orderkey. */
  def q3ShippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
    val ord  = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < lit("1998-03-15").cast("timestamp"))
    val li   = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") > lit("1998-03-15").cast("timestamp"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(Tables.dimHint(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  private val q3Sql =
    s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
       |  ${dsumSql("l_extendedprice * (1.0 - l_discount)", "revenue")}
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |WHERE c_mktsegment = 'BUILDING'
       |  AND o_orderdate < timestamp '1998-03-15'
       |  AND l_shipdate > timestamp '1998-03-15'
       |GROUP BY l_orderkey, o_orderdate, o_orderpriority
       |ORDER BY revenue DESC, l_orderkey
       |LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- q5
  /** 6-table star join, revenue per nation (TPC-H Q5 shape). All
    * dims broadcast; only orders⋈lineitem shuffles. */
  def q5LocalSupplier(spark: SparkSession, dir: String): DataFrame = {
    val region = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
    val nation = Tables.nation(spark, dir)
    val cust   = Tables.customer(spark, dir)
    val supp   = Tables.supplier(spark, dir)
    val ord    = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp"))
      .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val li     = Tables.lineitem(spark, dir)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(Tables.dimHint(supp), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.dimHint(cust),
        col("o_custkey") === col("c_custkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(col("n_name"))
  }

  private val q5Sql =
    s"""SELECT n_name,
       |  ${dsumSql("l_extendedprice * (1.0 - l_discount)", "revenue")}
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
       |JOIN nation ON s_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |WHERE r_name = 'ASIA'
       |  AND o_orderdate >= timestamp '1996-01-01'
       |  AND o_orderdate < timestamp '1998-01-01'
       |GROUP BY n_name
       |ORDER BY n_name""".stripMargin

  // ---------------------------------------------------------------- q6
  /** Tight filter + single-row agg; every predicate reaches the
    * parquet scan (PushedFilters). */
  def q6ForecastRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp"))
      .filter(col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .filter(col("l_discount") >= 0.03 && col("l_discount") <= 0.07)
      .filter(col("l_quantity") < 24)
      .agg(
        dsum(col("l_extendedprice") * col("l_discount")).as("revenue"),
        count(lit(1)).as("n_items"))

  private val q6Sql =
    s"""SELECT ${dsumSql("l_extendedprice * l_discount", "revenue")},
       |  count(*) AS n_items
       |FROM lineitem
       |WHERE l_shipdate >= timestamp '1996-01-01'
       |  AND l_shipdate < timestamp '1997-01-01'
       |  AND l_discount >= 0.03 AND l_discount <= 0.07
       |  AND l_quantity < 24""".stripMargin

  // ---------------------------------------------------------------- topk
  /** orderBy+limit compiles to TakeOrderedAndProject: per-partition
    * heaps + driver merge, no global sort even at 100 TB. */
  def qTopk(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)

  private val qTopkSql =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- distinct
  def qDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .select(col("c_mktsegment")).distinct()
      .orderBy(col("c_mktsegment"))

  private val qDistinctSql =
    "SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment"

  // ---------------------------------------------------------------- semi join
  /** EXISTS as left_semi: no row multiplication, broadcastable. */
  def qSemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val bigOrders = Tables.orders(spark, dir).filter(col("o_totalprice") > 400000)
    Tables.customer(spark, dir)
      .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  private val qSemiJoinSql =
    """SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_totalprice > 400000)
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- anti join
  /** NOT EXISTS as left_anti: customers with no high-value order. */
  def qAntiJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir).filter(col("o_totalprice") > 400000),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  private val qAntiJoinSql =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- outer join
  /** Left outer preserving customers with zero orders. */
  def qOuterJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(count(col("o_orderkey")).as("n_orders"))
      .orderBy(col("c_custkey"))

  private val qOuterJoinSql =
    """SELECT c_custkey, c_name, count(o_orderkey) AS n_orders
      |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_custkey, c_name
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- window rank
  /** Top-3 orders per customer; window partitioned by a
    * high-cardinality key so state stays bounded per task. */
  def qWindowRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  private val qWindowRankSql =
    """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_custkey
      |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders)
      |WHERE rn <= 3
      |ORDER BY o_custkey, rn""".stripMargin

  // ---------------------------------------------------------------- window running
  /** Running per-user total over event time (decimal-exact). */
  def qWindowRunning(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .withColumn("running_value",
        round(sum(col("value").cast(DecimalType(18, 6))).over(w), 2).cast(DoubleType))
      .select(col("user_id"), col("event_id"), col("running_value"))
      .orderBy(col("user_id"), col("event_id"))
  }

  private val qWindowRunningSql =
    """SELECT user_id, event_id,
      |  cast(round(sum(cast(value as decimal(18,6)))
      |    OVER (PARTITION BY user_id ORDER BY ts, event_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) as double)
      |    AS running_value
      |FROM events
      |ORDER BY user_id, event_id""".stripMargin

  // ---------------------------------------------------------------- rollup
  /** Hierarchical region→nation rollup over customer balances. */
  def qRollup(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(dsum(col("c_acctbal")).as("total_bal"), count(lit(1)).as("n_cust"))
      .orderBy(asc_nulls_first("r_name"), asc_nulls_first("n_name"))

  private val qRollupSql =
    s"""SELECT r_name, n_name,
       |  ${dsumSql("c_acctbal", "total_bal")},
       |  count(*) AS n_cust
       |FROM customer
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |GROUP BY ROLLUP (r_name, n_name)
       |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------- cube
  /** Full cube over (region, segment): all 4 grouping combinations. */
  def qCube(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .cube(col("r_name"), col("c_mktsegment"))
      .agg(dsum(col("c_acctbal")).as("total_bal"), count(lit(1)).as("n_cust"))
      .orderBy(asc_nulls_first("r_name"), asc_nulls_first("c_mktsegment"))

  private val qCubeSql =
    s"""SELECT r_name, c_mktsegment,
       |  ${dsumSql("c_acctbal", "total_bal")},
       |  count(*) AS n_cust
       |FROM customer
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |GROUP BY CUBE (r_name, c_mktsegment)
       |ORDER BY r_name ASC NULLS FIRST, c_mktsegment ASC NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------- grouping sets
  /** EXPLICIT grouping sets — the shape rollup/cube can't express:
    * per-region totals and per-segment totals and the grand total,
    * WITHOUT the (region, segment) cross detail a cube would also
    * compute (at 100 TB, skipping the finest grouping is the whole
    * point of naming the sets). */
  def qGroupingSets(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .groupingSets(
        Seq(Seq(col("r_name")), Seq(col("c_mktsegment")), Seq()),
        col("r_name"), col("c_mktsegment"))
      .agg(dsum(col("c_acctbal")).as("total_bal"), count(lit(1)).as("n_cust"))
      .orderBy(asc_nulls_first("r_name"), asc_nulls_first("c_mktsegment"))

  private val qGroupingSetsSql =
    s"""SELECT r_name, c_mktsegment,
       |  ${dsumSql("c_acctbal", "total_bal")},
       |  count(*) AS n_cust
       |FROM customer
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |GROUP BY GROUPING SETS ((r_name), (c_mktsegment), ())
       |ORDER BY r_name ASC NULLS FIRST, c_mktsegment ASC NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------- not in
  /** NOT IN with subquery — exercises Spark's null-aware anti join
    * (LeftAnti is NOT the same operator: one null in the subquery
    * legally empties a NOT IN result under three-valued logic, so the
    * planner must prove null-freeness or fall back to the null-aware
    * variant). Also demonstrates the SQL surface over raw parquet
    * paths (`parquet.` table syntax) — no registered views needed. */
  def qNotIn(spark: SparkSession, dir: String): DataFrame =
    spark.sql(
      s"""SELECT c_custkey, c_name
         |FROM parquet.`$dir/customer.parquet`
         |WHERE c_custkey NOT IN (
         |  SELECT o_custkey FROM parquet.`$dir/orders.parquet`
         |  WHERE o_totalprice > 450000)
         |ORDER BY c_custkey""".stripMargin)

  private val qNotInSql =
    """SELECT c_custkey, c_name FROM customer
      |WHERE c_custkey NOT IN (
      |  SELECT o_custkey FROM orders WHERE o_totalprice > 450000)
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- case agg
  /** Pivot-style conditional aggregation per user. */
  def qCaseAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("n_click"),
        sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("n_view"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("n_purchase"),
        sum(when(col("event_type") === "signup", 1L).otherwise(0L)).as("n_signup"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("n_error"))
      .orderBy(col("user_id"))

  private val qCaseAggSql =
    """SELECT user_id,
      |  cast(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) as bigint) AS n_click,
      |  cast(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) as bigint) AS n_view,
      |  cast(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) as bigint) AS n_purchase,
      |  cast(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) as bigint) AS n_signup,
      |  cast(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) as bigint) AS n_error
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------- union
  def qUnion(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val hi = o.filter(col("o_totalprice") > 300000)
      .select(lit("high").as("bucket"), col("o_totalprice"))
    val lo = o.filter(col("o_totalprice") < 10000)
      .select(lit("low").as("bucket"), col("o_totalprice"))
    hi.unionAll(lo)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
      .orderBy(col("bucket"))
  }

  private val qUnionSql =
    s"""SELECT bucket, count(*) AS n, ${dsumSql("o_totalprice", "total")}
       |FROM (
       |  SELECT 'high' AS bucket, o_totalprice FROM orders WHERE o_totalprice > 300000
       |  UNION ALL
       |  SELECT 'low' AS bucket, o_totalprice FROM orders WHERE o_totalprice < 10000)
       |GROUP BY bucket ORDER BY bucket""".stripMargin

  // ---------------------------------------------------------------- intersect / except
  /** Set intersection: customers active in both halves of the order
    * history (compiles to a left-semi over distinct — dedup + join
    * in one shuffle). */
  def qIntersect(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val early = o.filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("o_custkey"))
    val late = o.filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp"))
      .select(col("o_custkey"))
    early.intersect(late).orderBy(col("o_custkey"))
  }

  private val qIntersectSql =
    """SELECT o_custkey FROM orders WHERE o_orderdate < timestamp '1998-01-01'
      |INTERSECT
      |SELECT o_custkey FROM orders WHERE o_orderdate >= timestamp '1998-01-01'
      |ORDER BY o_custkey""".stripMargin

  /** Set difference: customers active early but never late. */
  def qExcept(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val early = o.filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("o_custkey"))
    val late = o.filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp"))
      .select(col("o_custkey"))
    early.except(late).orderBy(col("o_custkey"))
  }

  private val qExceptSql =
    """SELECT o_custkey FROM orders WHERE o_orderdate < timestamp '1998-01-01'
      |EXCEPT
      |SELECT o_custkey FROM orders WHERE o_orderdate >= timestamp '1998-01-01'
      |ORDER BY o_custkey""".stripMargin

  // ---------------------------------------------------------------- having
  def qHaving(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey"))
      .agg(dsum(col("l_quantity")).as("total_qty"), count(lit(1)).as("n_lines"))
      .filter(col("n_lines") > 30)
      .orderBy(col("l_partkey"))

  private val qHavingSql =
    s"""SELECT l_partkey, ${dsumSql("l_quantity", "total_qty")},
       |  count(*) AS n_lines
       |FROM lineitem GROUP BY l_partkey
       |HAVING count(*) > 30 ORDER BY l_partkey""".stripMargin

  // ---------------------------------------------------------------- subquery avg
  /** Correlated-subquery semantics (price above brand average) as a
    * window — one shuffle instead of a self-join. */
  def qSubqueryAvg(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("p_brand"))
    Tables.part(spark, dir)
      .withColumn("brand_avg",
        sum(col("p_retailprice").cast(DecimalType(18, 6))).over(w)
          .cast(DoubleType) / count(lit(1)).over(w))
      .filter(col("p_retailprice") > col("brand_avg"))
      .select(col("p_partkey"), col("p_brand"), col("p_retailprice"),
        rnd(col("brand_avg"), 2).as("brand_avg_price"))
      .orderBy(col("p_partkey"))
  }

  private val qSubqueryAvgSql =
    """SELECT p_partkey, p_brand, p_retailprice,
      |  floor(brand_avg * 1e2 + 0.5) / 1e2 AS brand_avg_price
      |FROM (
      |  SELECT p_partkey, p_brand, p_retailprice,
      |    cast(sum(cast(p_retailprice as decimal(18,6))) OVER (PARTITION BY p_brand) as double)
      |      / count(*) OVER (PARTITION BY p_brand) AS brand_avg
      |  FROM part)
      |WHERE p_retailprice > brand_avg
      |ORDER BY p_partkey""".stripMargin

  // ---------------------------------------------------------------- string funcs
  def qStringFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_upper"),
        substring(col("p_name"), 1, 12).as("name_prefix"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        length(col("p_name")).as("name_len"))
      .orderBy(col("p_partkey"))

  private val qStringFuncsSql =
    """SELECT p_partkey,
      |  upper(p_brand) AS brand_upper,
      |  substr(p_name, 1, 12) AS name_prefix,
      |  concat(p_brand, '|', p_type) AS brand_type,
      |  length(p_name) AS name_len
      |FROM part ORDER BY p_partkey""".stripMargin

  // ---------------------------------------------------------------- date funcs
  def qDateFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(
        year(col("o_orderdate")).as("o_year"),
        month(col("o_orderdate")).as("o_month"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total"))
      .orderBy(col("o_year"), col("o_month"))

  private val qDateFuncsSql =
    s"""SELECT cast(year(o_orderdate) as int) AS o_year,
       |  cast(month(o_orderdate) as int) AS o_month,
       |  count(*) AS n_orders, ${dsumSql("o_totalprice", "total")}
       |FROM orders GROUP BY o_year, o_month
       |ORDER BY o_year, o_month""".stripMargin

  // ---------------------------------------------------------------- skew-salted join
  /** Skew-mitigated equi-join by SALTING (round 7; SURVEY §4's
    * "salting for skew" as a named API rather than advice): the
    * classic two-sided transform — hot fact keys get a per-ROW salt
    * in [0, salts) and the dim rows for those keys are exploded into
    * `salts` copies, so the join key becomes (key, salt) and one hot
    * key's rows spread over `salts` reducers instead of one giant
    * straggler partition. Cold keys keep salt 0 (dim side 1 copy) —
    * one join, no union, no broadcast requirement on either side.
    * The result multiset is exactly the plain join's (salts are
    * join-local and dropped), which is what the oracle checks.
    *
    * Hot-key probe: one map-side-combined count aggregate; "hot" =
    * count ≥ hotFactor × the mean per-key count (scale-stable — an
    * absolute threshold silently flips cold at 10× data), capped at
    * the top 1000 by count for driver safety (an uncapped set is
    * bounded only by n/threshold; keys past the cap just take the
    * cold path — mechanism preserved, result identical). `saltFrom`
    * must be a per-row expression (a unique id column) — salting by
    * the KEY would put every row of a hot key in the same bucket and
    * spread nothing.
    *
    * vs AQE skew-join: AQE splits oversized shuffle partitions at
    * runtime and is the first line of defense; explicit salting is
    * the portable form that also covers the cases AQE cannot touch
    * (aggregation-before-join pipelines, sinks keyed by the join
    * key, deterministic partition layout for a downstream write). */
  def saltedEquiJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, saltFrom: Column, hotFactor: Double = 1.1,
      salts: Int = 8): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val counts = fact.groupBy(col(factKey)).agg(count(lit(1)).as("_c"))
      .persist()
    // mean per-key count: tiny 1-row aggregate of the probe frame
    // (coalesce: sum over an EMPTY fact is null — the empty-input
    // sweep would NPE on getDouble)
    val mean = counts.agg(coalesce(sum(col("_c")).cast("double")
      / count(lit(1)), lit(0.0)).as("m")).head.getDouble(0)
    val hot = counts.filter(col("_c") >= lit(mean * hotFactor))
      .orderBy(col("_c").desc, col(factKey)).limit(1000)
      .select(col(factKey)).collect().map(_.get(0)).toSeq
    counts.unpersist(blocking = true)
    if (hot.isEmpty) return fact.join(dim, col(factKey) === col(dimKey))
    val fSalted = fact.withColumn("_fsalt",
      when(col(factKey).isin(hot: _*),
        pmod(crc32(saltFrom.cast("string")), lit(salts)).cast("int"))
        .otherwise(lit(0)))
    val dSalted = dim
      .withColumn("_ds",
        when(col(dimKey).isin(hot: _*),
          sequence(lit(0), lit(salts - 1)))
          .otherwise(array(lit(0))))
      .withColumn("_dsalt", explode(col("_ds"))).drop("_ds")
    fSalted.join(dSalted,
        col(factKey) === col(dimKey) && col("_fsalt") === col("_dsalt"))
      .drop("_fsalt", "_dsalt")
  }

  /** Registered skew-salted join: events (fact) ⋈ customer segment
    * (dim) on user_id with the salting kernel, then a per-user
    * rollup. hotFactor 1.1 marks the busier users hot on the real
    * corpus, so BOTH branches (salted hot keys, salt-0 cold keys)
    * run in the checked query at every SF — the oracle's plain join
    * proves the salt transform is result-invariant end to end. */
  def qJoinSkewSalted(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("value"))
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"))
    saltedEquiJoin(ev, cust, "user_id", "c_custkey",
        saltFrom = col("event_id"))
      .groupBy(col("user_id"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
      .orderBy(col("user_id"))
  }

  private val qJoinSkewSaltedSql =
    s"""SELECT user_id, c_mktsegment, count(*) AS n_events,
       |  ${dsumSql("value", "total_value")}
       |FROM events JOIN customer ON user_id = c_custkey
       |GROUP BY user_id, c_mktsegment
       |ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------- period movers
  /** Output bound for [[qPeriodMovers]]: movers are a reporting
    * shortlist; the bound keeps output independent of part count. */
  private val MoversTopK = 15

  /** Period-over-period mover detection — the month-on-month revenue
    * delta per part, top movers by absolute change: the classic OLAP
    * "what changed" report. Both periods come out of ONE aggregate
    * pass (CASE-split [[dsum]]s — no self-join on the period offset,
    * no second fact scan); the delta subtracts two already-exact
    * rounded doubles, abs is sign-exact, ties break on the part key.
    * One fact exchange; at 100 TB the shipdate filter prunes the
    * scan to the two months before anything shuffles. */
  def qPeriodMovers(spark: SparkSession, dir: String): DataFrame = {
    val aug = col("l_shipdate") >= lit("1997-08-01").cast("timestamp") &&
      col("l_shipdate") < lit("1997-09-01").cast("timestamp")
    val vol = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-08-01").cast("timestamp"))
      .filter(col("l_shipdate") < lit("1997-10-01").cast("timestamp"))
      .groupBy(col("l_partkey").as("p_partkey"))
      .agg(
        dsum(when(aug, vol).otherwise(lit(0.0))).as("rev_prev"),
        dsum(when(!aug, vol).otherwise(lit(0.0))).as("rev_curr"))
      .withColumn("delta", col("rev_curr") - col("rev_prev"))
      .orderBy(abs(col("delta")).desc, col("p_partkey"))
      .limit(MoversTopK)
  }

  private val qPeriodMoversSql =
    s"""WITH m AS (
       |  SELECT l_partkey AS p_partkey,
       |    ${dsumSql("CASE WHEN l_shipdate < timestamp '1997-09-01' THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END", "rev_prev")},
       |    ${dsumSql("CASE WHEN l_shipdate >= timestamp '1997-09-01' THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END", "rev_curr")}
       |  FROM lineitem
       |  WHERE l_shipdate >= timestamp '1997-08-01'
       |    AND l_shipdate < timestamp '1997-10-01'
       |  GROUP BY l_partkey)
       |SELECT p_partkey, rev_prev, rev_curr,
       |  rev_curr - rev_prev AS delta
       |FROM m
       |ORDER BY abs(rev_curr - rev_prev) DESC, p_partkey
       |LIMIT $MoversTopK""".stripMargin

  // ---------------------------------------------------------------- market basket
  /** Output bound for [[qMarketBasket]]: affinity reports are ranked
    * shortlists; the bound keeps output independent of catalog size. */
  private val BasketTopK = 25

  /** Min pair support of the registered `q_market_basket_pruned`:
    * the Apriori threshold the prune keys on. */
  private val BasketMinSupport = 2L

  /** Market-basket affinity — the top part pairs co-purchased in one
    * order, with support and lift (Agrawal & Srikant's association
    * setting at the 2-itemset level — the shape one self-join can
    * mine; deeper itemsets grow from these pairs): support = orders
    * containing both, lift = P(ab)/(P(a)·P(b)) against independence.
    * Plan: distinct (order, part) first (dedups multi-line parts),
    * pair self-join on the ORDER key — pair mass ∝ Σ(parts/order)²,
    * bounded by small baskets, the wedge-join envelope; per-part
    * order counts joined back size-gated ([[Tables.dimHint]] —
    * |parts| rows, broadcast while it fits, AQE-planned beyond); N is
    * one collected scalar (the mr_pagerank bounded 1-row probe). Lift
    * divides exact integer counts once and rounds once —
    * deterministic. The per-run persist of the (order, part) frame is
    * a documented cost (three consumers: the N scalar, the count
    * table, both self-join sides); bench/verify reclaim it via
    * CacheHygiene.sweep — the pipeline_curate_v6 precedent. */
  def qMarketBasket(spark: SparkSession, dir: String): DataFrame =
    marketBasket(spark, dir, minSupport = 1L)

  /** The corpus-scale path: [[qMarketBasket]] with the Apriori
    * 2-itemset prune ACTIVE — items with fewer than `minSupport`
    * supporting orders are dropped BEFORE the pair self-join.
    * Lossless for every reported pair because support(a,b) ≤
    * min(n_a, n_b) (a pair's orders are a subset of each item's): a
    * pair that could pass the support filter cannot lose a member to
    * the item prune, so above the threshold this equals the unpruned
    * form exactly (spec-proven on a planted rare-item corpus; at the
    * tested SFs every synthetic part clears n ≥ 2, so the registered
    * outputs coincide by construction). At 100 TB the prune is the
    * difference between pair mass ∝ Σ|basket|² over ALL items and
    * over FREQUENT items only — real catalogs are long-tailed, so
    * the one extra wordcount-shaped aggregate + semi-join removes
    * most of the quadratic wedge before it is ever materialized. */
  def qMarketBasketPruned(spark: SparkSession, dir: String): DataFrame =
    marketBasket(spark, dir, minSupport = BasketMinSupport)

  private[operators] def marketBasket(
      spark: SparkSession, dir: String, minSupport: Long): DataFrame =
    basketTopPairs(
      Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_partkey"))
        // ONE pinned order-keyed exchange (r18, guide §2.4/§2.5): the
        // distinct's ClusteredDistribution(l_orderkey, l_partkey) is
        // satisfied by hash(l_orderkey), so the dedup agg rides this
        // exchange, the persisted frame comes out CO-PARTITIONED on the
        // self-join key (the join plans zero exchanges from cache at
        // any scale), and the pinned count stops AQE from coalescing
        // the cache to ~1 partition by bytes — the pair-explosion
        // stage's work is Σ basket² pairs, not its few-MB input, and it
        // ran single-task here (0.57 s of a 0.58 s stage at sf0.1).
        .repartition(spark.sparkContext.defaultParallelism, col("l_orderkey"))
        .distinct(),
      minSupport)

  /** Shared 2-itemset kernel over a distinct (l_orderkey, l_partkey)
    * frame; `minSupport = 1` is the exhaustive form, `> 1` activates
    * the Apriori item prune (see [[qMarketBasketPruned]]). */
  def basketTopPairs(pairsIn: DataFrame, minSupport: Long): DataFrame = {
    val op = pairsIn.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = op.select(col("l_orderkey")).distinct().count() // 1 scalar
    // GLOBAL per-item counts (lift denominators stay unpruned)
    val partN = op.groupBy(col("l_partkey")).agg(count(lit(1)).as("n_part"))
    // Apriori: support(a,b) ≤ min(n_a, n_b) — items under minSupport
    // cannot participate in a qualifying pair, so drop them before
    // the quadratic self-join (one semi-join on the item key)
    val frequent = if (minSupport > 1L)
      op.join(partN.filter(col("n_part") >= minSupport)
          .select(col("l_partkey")), Seq("l_partkey"), "left_semi")
    else op
    frequent.select(col("l_orderkey"), col("l_partkey").as("part_a"))
      .join(frequent.select(col("l_orderkey"), col("l_partkey").as("part_b")),
        Seq("l_orderkey"))
      .filter(col("part_a") < col("part_b"))
      .groupBy(col("part_a"), col("part_b"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
      .join(Tables.dimHint(partN.select(col("l_partkey").as("part_a"),
        col("n_part").as("n_a"))), "part_a")
      .join(Tables.dimHint(partN.select(col("l_partkey").as("part_b"),
        col("n_part").as("n_b"))), "part_b")
      .orderBy(col("support").desc, col("part_a"), col("part_b"))
      .limit(BasketTopK)
      .select(col("part_a"), col("part_b"), col("support"),
        rnd(col("support").cast("double") * n /
          (col("n_a") * col("n_b")), 6).as("lift"))
  }

  // op/pn MATERIALIZED (the kcore-oracle lesson): op is read by n,
  // pn, and BOTH pair-join sides — DuckDB's default inlining would
  // re-derive the sf10 60M-row distinct per reference
  private val qMarketBasketSql =
    s"""WITH op AS MATERIALIZED (
       |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM op),
       |pn AS MATERIALIZED (SELECT l_partkey, count(*) AS n_part FROM op GROUP BY 1),
       |pairs AS (
       |  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
       |    count(*) AS support
       |  FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
       |    AND a.l_partkey < b.l_partkey
       |  GROUP BY 1, 2
       |  ORDER BY support DESC, part_a, part_b
       |  LIMIT $BasketTopK)
       |SELECT part_a, part_b, support,
       |  ${rndSql("cast(support AS double) * (SELECT n_orders FROM n) / (pa.n_part * pb.n_part)", 6)} AS lift
       |FROM pairs
       |JOIN pn pa ON part_a = pa.l_partkey
       |JOIN pn pb ON part_b = pb.l_partkey
       |ORDER BY support DESC, part_a, part_b""".stripMargin

  private val qMarketBasketPrunedSql =
    s"""WITH op AS MATERIALIZED (
       |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM op),
       |pn AS MATERIALIZED (SELECT l_partkey, count(*) AS n_part FROM op GROUP BY 1),
       |opf AS MATERIALIZED (
       |  SELECT op.* FROM op
       |  WHERE l_partkey IN
       |    (SELECT l_partkey FROM pn WHERE n_part >= $BasketMinSupport)),
       |pairs AS (
       |  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
       |    count(*) AS support
       |  FROM opf a JOIN opf b ON a.l_orderkey = b.l_orderkey
       |    AND a.l_partkey < b.l_partkey
       |  GROUP BY 1, 2
       |  HAVING count(*) >= $BasketMinSupport
       |  ORDER BY support DESC, part_a, part_b
       |  LIMIT $BasketTopK)
       |SELECT part_a, part_b, support,
       |  ${rndSql("cast(support AS double) * (SELECT n_orders FROM n) / (pa.n_part * pb.n_part)", 6)} AS lift
       |FROM pairs
       |JOIN pn pa ON part_a = pa.l_partkey
       |JOIN pn pb ON part_b = pb.l_partkey
       |ORDER BY support DESC, part_a, part_b""".stripMargin

  // ---------------------------------------------------------------- registry
  def defs: Seq[QueryDef] = Seq(
    QueryDef("q_market_basket", qMarketBasket _, Some(qMarketBasketSql)),
    QueryDef("q_market_basket_pruned", qMarketBasketPruned _,
      Some(qMarketBasketPrunedSql)),
    QueryDef("q_period_movers", qPeriodMovers _, Some(qPeriodMoversSql)),
    QueryDef("q_join_skew_salted", qJoinSkewSalted _, Some(qJoinSkewSaltedSql)),
    QueryDef("q1_pricing_summary", q1PricingSummary _, Some(q1Sql)),
    QueryDef("q3_shipping_priority", q3ShippingPriority _, Some(q3Sql)),
    QueryDef("q5_local_supplier", q5LocalSupplier _, Some(q5Sql)),
    QueryDef("q6_forecast_revenue", q6ForecastRevenue _, Some(q6Sql)),
    QueryDef("q_topk", qTopk _, Some(qTopkSql)),
    QueryDef("q_distinct", qDistinct _, Some(qDistinctSql)),
    QueryDef("q_semi_join", qSemiJoin _, Some(qSemiJoinSql)),
    QueryDef("q_anti_join", qAntiJoin _, Some(qAntiJoinSql)),
    QueryDef("q_outer_join", qOuterJoin _, Some(qOuterJoinSql)),
    QueryDef("q_window_rank", qWindowRank _, Some(qWindowRankSql)),
    QueryDef("q_window_running", qWindowRunning _, Some(qWindowRunningSql)),
    QueryDef("q_rollup", qRollup _, Some(qRollupSql)),
    QueryDef("q_cube", qCube _, Some(qCubeSql)),
    QueryDef("q_grouping_sets", qGroupingSets _, Some(qGroupingSetsSql)),
    QueryDef("q_not_in", qNotIn _, Some(qNotInSql)),
    QueryDef("q_case_agg", qCaseAgg _, Some(qCaseAggSql)),
    QueryDef("q_union", qUnion _, Some(qUnionSql)),
    QueryDef("q_intersect", qIntersect _, Some(qIntersectSql)),
    QueryDef("q_except", qExcept _, Some(qExceptSql)),
    QueryDef("q_having", qHaving _, Some(qHavingSql)),
    QueryDef("q_subquery_avg", qSubqueryAvg _, Some(qSubqueryAvgSql)),
    QueryDef("q_string_funcs", qStringFuncs _, Some(qStringFuncsSql)),
    QueryDef("q_date_funcs", qDateFuncs _, Some(qDateFuncsSql)))
}
