package graft

import org.apache.spark.sql.functions._
import graft.operators.Advanced

class AdvancedSpec extends SparkSpec {

  test("asof join: every purchase appears once; last_view never after purchase") {
    val df = Advanced.qAsofJoin(spark, sf)
    val purchases = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    assert(df.count() == purchases)
    assert(df.filter(col("last_view_us") > col("purchase_us")).count() == 0)
  }

  test("range join covers every lineitem exactly once") {
    val total = Advanced.qRangeJoin(spark, sf)
      .agg(sum("n_items")).collect()(0).getLong(0)
    assert(total == Tables.lineitem(spark, sf).count())
  }

  test("pivot row totals equal event count") {
    val df = Advanced.qPivot(spark, sf)
    val total = df.select(
      (col("n_click") + col("n_view") + col("n_purchase")
        + col("n_signup") + col("n_error")).as("t"))
      .agg(sum("t")).collect()(0).getLong(0)
    assert(total == Tables.events(spark, sf).count())
  }

  test("approx_count_distinct within declared error of exact") {
    val approx = Advanced.qApproxDistinct(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag").agg(countDistinct("l_partkey").as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, ex) =>
      val ap = approx(k).toDouble
      assert(math.abs(ap - ex) / ex < 0.1, s"$k: approx $ap vs exact $ex")
    }
  }

  test("percentiles are ordered p50 <= p90") {
    val rows = Advanced.qPercentile(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getDouble(1) <= r.getDouble(2)))
  }
}
