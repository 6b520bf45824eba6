package graft

import org.apache.spark.sql.functions._
import graft.operators.{Events, Relational}

class RelationalSpec extends SparkSpec {

  test("every registered query runs and has stable schema at sf0.001") {
    SparkEntry.allDefs.foreach { d =>
      val df = d.run(spark, sf)
      assert(df.columns.nonEmpty, s"${d.name}: empty schema")
      assert(df.count() >= 0, s"${d.name}: failed to execute")
    }
  }

  test("oracle map only references registered queries") {
    val qnames = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qnames))
  }

  test("q1 aggregates are exact and grouped") {
    val rows = Relational.q1PricingSummary(spark, sf).collect()
    assert(rows.nonEmpty)
    val flags = rows.map(_.getString(0)).toSet
    assert(flags.subsetOf(Set("A", "N", "R")))
    // sum_qty must equal a direct recomputation
    val direct = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
      .agg(sum("l_quantity")).collect()(0).getDouble(0)
    val total = rows.map(_.getDouble(2)).sum
    assert(math.abs(total - direct) < 1e-4)
  }

  test("q_topk returns exactly k in descending order") {
    val prices = Relational.qTopk(spark, sf).collect().map(_.getDouble(2))
    assert(prices.length == 10)
    assert(prices.sameElements(prices.sortBy(-(_: Double))))
  }

  test("q_window_rank caps at 3 per customer") {
    val byCust = Relational.qWindowRank(spark, sf).collect()
      .groupBy(_.getLong(0)).values
    assert(byCust.forall(_.length <= 3))
  }

  test("semi and anti join partition the customer set") {
    val semi = Relational.qSemiJoin(spark, sf).count()
    val anti = Relational.qAntiJoin(spark, sf).count()
    // semi(>400000) and anti(>400000) are complements over customers
    val total = Tables.customer(spark, sf).count()
    assert(semi + anti == total)
  }

  test("sessionize: session counts are sane") {
    val df = Events.qSessionize(spark, sf)
    val n = df.count()
    assert(n > 0)
    assert(df.filter(col("n_events") < 1).count() == 0)
    assert(df.filter(col("duration_us") < 0).count() == 0)
  }

  test("q5 plan broadcasts dimension tables") {
    val plan = Relational.q5LocalSupplier(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "expected broadcast joins in q5")
  }

  test("q6 pushes filters into the parquet scan") {
    val plan = Relational.q6ForecastRevenue(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: ["), "expected pushed filters")
    assert(plan.contains("l_shipdate"), "expected shipdate in pushed filters")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("scd2: versions contiguous, intervals chain, one current row per user") {
    val rows = graft.operators.Events.qScd2(spark, sf).collect()
    assert(rows.nonEmpty)
    val totalEvents = Tables.events(spark, sf).count()
    assert(rows.map(_.getLong(5)).sum == totalEvents) // runs cover every event
    rows.groupBy(_.getLong(0)).values.foreach { rs =>
      val hist = rs.sortBy(_.getLong(1))
      // versions 1..V with no holes
      assert(hist.map(_.getLong(1)).sameElements(1L to hist.length))
      // exactly one open (current) interval, and it is the last
      assert(hist.count(_.getInt(6) == 1) == 1)
      assert(hist.last.getInt(6) == 1 && hist.last.isNullAt(4))
      hist.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getLong(4) == b.getLong(3)) // valid_to == next valid_from
          assert(a.getString(2) != b.getString(2)) // a version IS a change
          assert(a.getLong(3) < b.getLong(3)) // strictly advancing time
        case _ => ()
      }
    }
  }
}
