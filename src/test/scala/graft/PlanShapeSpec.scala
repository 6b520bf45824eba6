package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, MrCore}

/** Plan-shape and equivalence checks for the round-2 scale fixes. */
class PlanShapeSpec extends SparkSpec {

  test("mr_sort ranks the FULL table through a range exchange") {
    val df = MrCore.mrSort(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("rangepartitioning"),
      s"expected an explicit range exchange in:\n$plan")
    val rows = df.collect()
    val total = Tables.events(spark, sf).count()
    assert(rows.length == total, "every row must be ranked, not a top-k")
    // ranks are a permutation 1..n and agree with the declared order
    assert(rows.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to total.toInt))
    val byRank = rows.sortBy(_.getAs[Int]("rank"))
    byRank.sliding(2).foreach { case Array(hi, lo) =>
      val (vh, vl) = (hi.getAs[Double]("value"), lo.getAs[Double]("value"))
      assert(vh > vl || (vh == vl &&
        hi.getAs[Long]("event_id") < lo.getAs[Long]("event_id")),
        s"rank order violated between $hi and $lo")
    }
  }

  test("banded simhash finds exactly the all-pairs simhash results") {
    val exact = Dedup.dedupSimhash(spark, sf).collect().toSeq
    val banded = Dedup.dedupSimhashBanded(spark, sf).collect().toSeq
    assert(exact.nonEmpty, "corpus should contain near-dup pairs")
    assert(banded == exact,
      s"pigeonhole recall must be total: ${exact.size} exact vs ${banded.size} banded")
  }

  test("banded simhash candidate join is an equi-join, not a cross product") {
    val plan = Dedup.dedupSimhashBanded(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"banded candidates must come from a hash-joinable key:\n$plan")
  }
}
