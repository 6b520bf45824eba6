package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.TpchSuite

/** Semantic invariants for the round-12 TPC-H completions — the
  * oracle gate proves value equality; these pin the NON-OBVIOUS
  * equivalences and edge semantics the adapted forms rely on. */
class TpchSuiteSpec extends SparkSpec {

  test("q21: collapsed per-order aggregate equals the literal EXISTS/NOT-EXISTS form") {
    // the literal Q21 shape: three passes over the fact join — this
    // supplier late, EXISTS another supplier, NOT EXISTS another LATE
    // supplier — exactly as the spec text reads
    val lo = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf).filter(col("o_orderstatus") === "F"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 120 DAYS"))
          .as("late"))
      .persist()
    try {
      val l1 = lo.filter(col("late"))
        .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk")).distinct()
      val others = lo.select(col("l_orderkey").as("ok2"), col("l_suppkey").as("sk2")).distinct()
      val lateOthers = lo.filter(col("late"))
        .select(col("l_orderkey").as("ok3"), col("l_suppkey").as("sk3")).distinct()
      val literal = l1
        .join(others, col("ok") === col("ok2") && col("sk") =!= col("sk2"), "left_semi")
        .join(lateOthers, col("ok") === col("ok3") && col("sk") =!= col("sk3"), "left_anti")
        .groupBy(col("sk")).agg(count(lit(1)).as("numwait"))
      val collapsed = lo
        .groupBy(col("l_orderkey"), col("l_suppkey"))
        .agg(max(col("late")).as("late"))
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_supp"),
          sum(when(col("late"), 1L).otherwise(0L)).as("n_late"),
          max(when(col("late"), col("l_suppkey"))).as("late_supp"))
        .filter(col("n_supp") >= 2 && col("n_late") === 1)
        .groupBy(col("late_supp")).agg(count(lit(1)).as("numwait"))
      val a = literal.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val b = collapsed.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(a.nonEmpty, "fixture should produce waiting suppliers")
      assert(a == b, s"collapsed form diverged: literal=$a collapsed=$b")
    } finally { lo.unpersist(); CacheHygiene.sweep(spark) }
  }

  test("q13: buckets partition ALL customers; zero-order bucket is present and exact") {
    val dist = TpchSuite.q13CustomerDistribution(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nCust = Tables.customer(spark, sf).count()
    assert(dist.values.sum == nCust,
      "custdist must partition the full customer table (outer join, not inner)")
    val withQualifying = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") =!= "4-NOT SPECIFIED")
      .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"), "left_semi")
      .select(col("o_custkey")).distinct().count()
    assert(dist.getOrElse(0L, 0L) == nCust - withQualifying,
      "the c_count=0 bucket must hold exactly the customers with no qualifying order")
    CacheHygiene.sweep(spark)
  }

  test("q15: every returned supplier carries exactly the global max revenue") {
    val out = TpchSuite.q15TopSupplier(spark, sf).collect()
    assert(out.nonEmpty)
    val revs = out.map(_.getAs[Double]("total_revenue")).distinct
    assert(revs.length == 1, s"ties must all share the max, got ${revs.toSeq}")
    CacheHygiene.sweep(spark)
  }

  test("q11: kept parts are exactly those above twice the mean share") {
    val out = TpchSuite.q11ImportantParts(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out.nonEmpty, "2x-mean-share keeps the top tail at every sf")
    // recompute the frame independently and re-apply the predicate
    val value = Tables.lineitem(spark, sf)
      .join(Tables.supplier(spark, sf), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.nation(spark, sf), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, sf).filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("l_partkey"))
      .agg(graft.functions.CrossEngine.dsum(
        col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("value"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    val total = value.map(_._2).sum // test-side double sum: tolerance below
    val n = value.length
    val expect = value.filter { case (_, v) => v * n > total * 2.0 }.toMap
    // the operator's total is decimal-exact; the test's is a double
    // fold — allow boundary rows to differ by at most the fold's ulp
    val sym = (expect.keySet diff out.keySet) ++ (out.keySet diff expect.keySet)
    sym.foreach { k =>
      val v = value.toMap.apply(k)
      assert(math.abs(v * n - total * 2.0) <= math.ulp(total) * n * 4,
        s"part $k differs beyond summation tolerance")
    }
    CacheHygiene.sweep(spark)
  }

  test("q2: join-back keeps every supplier tied at the per-part min unit price") {
    val out = TpchSuite.q2MinCostSupplier(spark, sf)
    val perPart = out.groupBy(col("p_partkey"))
      .agg(countDistinct(col("unit_price")).as("n_prices"))
      .collect()
    assert(perPart.nonEmpty)
    assert(perPart.forall(_.getAs[Long]("n_prices") == 1L),
      "a part must only ever report its single min price")
    // independent min recomputation
    val mins = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf).filter(col("p_size") === 25),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_partkey"))
      .agg(min(col("l_extendedprice") / col("l_quantity")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val got = out.select(col("p_partkey"), col("unit_price")).distinct().collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet == mins.keySet)
    got.foreach { case (k, v) =>
      val m = mins(k)
      val p = math.pow(10, 4)
      assert(v == math.floor(m * p + 0.5) / p, s"part $k: $v vs min $m")
    }
    CacheHygiene.sweep(spark)
  }
}
