package graft

import org.apache.spark.sql.functions._
import graft.sources.Sources

class BucketingSqlSpec extends SparkSpec {

  test("bucketed tables join without a shuffle") {
    val s = spark
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    try {
      Sources.writeBucketed(
        Tables.orders(s, sf).select("o_orderkey", "o_custkey", "o_totalprice"),
        "orders_b", "o_custkey", 8)
      Sources.writeBucketed(
        Tables.customer(s, sf).select("c_custkey", "c_name"),
        "customer_b", "c_custkey", 8)
      val joined = s.table("orders_b")
        .join(s.table("customer_b"), col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() > 0)
    } finally {
      s.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      s.sql("DROP TABLE IF EXISTS orders_b")
      s.sql("DROP TABLE IF EXISTS customer_b")
    }
  }

  test("whole surface reachable through spark.sql over registered views") {
    val s = spark
    Sources.createViews(s, sf)
    val revenue = s.sql(
      """SELECT n_name, count(*) AS n
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n DESC LIMIT 3""".stripMargin).collect()
    assert(revenue.length == 3)
    val sessions = s.sql(
      "SELECT count(*) FROM events WHERE event_type = 'purchase'").collect()(0).getLong(0)
    assert(sessions > 0)
  }
}
