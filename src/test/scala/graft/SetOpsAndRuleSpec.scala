package graft

import org.apache.spark.sql.functions._
import graft.operators.Relational
import graft.plans.AsOf
import graft.sources.Sources

class SetOpsAndRuleSpec extends SparkSpec {

  test("intersect + except partition the early-customer set") {
    val s = spark
    val inter = Relational.qIntersect(s, sf).count()
    val exc = Relational.qExcept(s, sf).count()
    val early = Tables.orders(s, sf)
      .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select("o_custkey").distinct().count()
    assert(inter + exc == early)
  }

  test("orc round-trip preserves rows") {
    val df = Tables.supplier(spark, sf)
    val path = java.nio.file.Files.createTempDirectory("orc").toString + "/out"
    Sources.writeOrc(df, path)
    assert(Sources.readOrc(spark, path).count() == df.count())
  }

  test("PushFilterThroughAsOfJoin moves left-only predicates below the join") {
    val s = spark
    import s.implicits._
    val l = Seq((1L, 100L), (2L, 200L), (3L, 300L)).toDF("k", "t")
    val r = Seq((1L, 90L), (2L, 150L)).toDF("rk", "rt")
    val joined = AsOf.join(l, r, "k", "t", "rk", "rt")
      .filter(col("k") > 1L) // left-only predicate above the custom join
    val optimized = joined.queryExecution.optimizedPlan.toString
    // after the rule fires, the Filter must sit under AsOfJoin
    val joinIdx = optimized.indexOf("AsOfJoin")
    val filterIdx = optimized.indexOf("Filter")
    assert(joinIdx >= 0 && filterIdx > joinIdx,
      s"expected Filter pushed below AsOfJoin:\n$optimized")
    // and the result is still correct
    val rows = joined.select("k", "rt").collect()
      .map(x => (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1))).toSet
    assert(rows == Set((2L, 150L), (3L, -1L)))
  }

  test("right-side filters are NOT pushed (correctness guard)") {
    val s = spark
    import s.implicits._
    val l = Seq((1L, 100L)).toDF("k", "t")
    val r = Seq((1L, 90L), (1L, 95L)).toDF("rk", "rt")
    // filter on right output col: latest match is rt=95; filtering
    // rt<95 BEFORE the join would wrongly match 90
    val joined = AsOf.join(l, r, "k", "t", "rk", "rt").filter(col("rt") < 95L)
    assert(joined.count() == 0)
  }
}
