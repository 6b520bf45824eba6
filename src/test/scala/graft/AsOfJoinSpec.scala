package graft

import org.apache.spark.sql.functions._
import graft.operators.Advanced
import graft.plans.AsOf

class AsOfJoinSpec extends SparkSpec {

  test("native as-of join equals the composed window form row-for-row") {
    val native = Advanced.qAsofJoinNative(spark, sf).collect().map(_.toSeq).toSet
    val composed = Advanced.qAsofJoin(spark, sf).collect().map(_.toSeq).toSet
    assert(native == composed)
  }

  test("physical plan contains the custom AsOfJoinExec with planted exchanges") {
    val plan = Advanced.qAsofJoinNative(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"expected AsOfJoinExec in:\n$plan")
  }

  test("as-of picks the latest right row at-or-before, nulls when none") {
    val s = spark
    import s.implicits._
    val l = Seq((1L, 100L, "p1"), (1L, 200L, "p2"), (2L, 50L, "p3"))
      .toDF("k", "t", "tag")
    val r = Seq((1L, 90L), (1L, 150L), (1L, 201L), (3L, 10L))
      .toDF("rk", "rt")
    val out = AsOf.join(l, r, "k", "t", "rk", "rt")
      .select("k", "t", "tag", "rt").collect()
      .map(x => (x.getString(2), if (x.isNullAt(3)) -1L else x.getLong(3))).toMap
    assert(out == Map("p1" -> 90L, "p2" -> 150L, "p3" -> -1L))
  }

  test("ties: right row at exactly left time is included") {
    val s = spark
    import s.implicits._
    val l = Seq((1L, 100L)).toDF("k", "t")
    val r = Seq((1L, 100L)).toDF("rk", "rt")
    val out = AsOf.join(l, r, "k", "t", "rk", "rt").select("rt").collect()
    assert(out(0).getLong(0) == 100L)
  }

  test("as-of widens int keys and takes timestamp times natively") {
    val s = spark
    import s.implicits._
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)
    // IntegerType keys (widened by a plan-time Cast on both sides) +
    // TimestampType times (long-backed epoch micros, compared natively)
    val l = Seq((1, ts(100), "p1"), (1, ts(200), "p2"), (2, ts(50), "p3"))
      .toDF("k", "t", "tag")
    val r = Seq((1, ts(90)), (1, ts(150)), (1, ts(201)), (3, ts(10)))
      .toDF("rk", "rt")
    val out = AsOf.join(l, r, "k", "t", "rk", "rt")
      .select("tag", "rt").collect()
      .map(x => x.getString(0) ->
        (if (x.isNullAt(1)) None else Some(x.getTimestamp(1)))).toMap
    assert(out == Map(
      "p1" -> Some(ts(90)), "p2" -> Some(ts(150)), "p3" -> None))
  }

  test("as-of tolerance bounds staleness without breaking the merge cursor") {
    val s = spark
    import s.implicits._
    val l = Seq((1L, 100L, "near"), (1L, 500L, "far"), (1L, 505L, "near2"))
      .toDF("k", "t", "tag")
    val r = Seq((1L, 95L), (1L, 497L), (1L, 504L)).toDF("rk", "rt")
    val out = AsOf.join(l, r, "k", "t", "rk", "rt", toleranceUs = Some(10L))
      .select("tag", "rt").collect()
      .map(x => x.getString(0) ->
        (if (x.isNullAt(1)) -1L else x.getLong(1))).toMap
    // latest-at-or-before within 10: near←95 (Δ5), far←497 (Δ3;
    // 504 > 500 not eligible), near2←504 (Δ1)
    assert(out == Map("near" -> 95L, "far" -> 497L, "near2" -> 504L))
    val out2 = AsOf.join(l, r, "k", "t", "rk", "rt", toleranceUs = Some(2L))
      .select("tag", "rt").collect()
      .map(x => x.getString(0) ->
        (if (x.isNullAt(1)) -1L else x.getLong(1))).toMap
    // tighter: near (Δ5) and far (Δ3) null out, but their stale
    // candidates still advanced the cursor, so near2 (Δ1) matches
    assert(out2 == Map("near" -> -1L, "far" -> -1L, "near2" -> 504L))
  }

  test("forward as-of: first at-or-after, tie inclusive, tolerance at/over the boundary") {
    val s = spark
    import s.implicits._
    val l = Seq((1L, 100L, "tie"), (1L, 200L, "gap"), (2L, 50L, "none"))
      .toDF("k", "t", "tag")
    val r = Seq((1L, 100L), (1L, 150L), (1L, 300L), (2L, 40L)).toDF("rk", "rt")
    def run(tol: Option[Long]) =
      AsOf.join(l, r, "k", "t", "rk", "rt", toleranceUs = tol,
          direction = "forward")
        .select("tag", "rt").collect()
        .map(x => x.getString(0) ->
          (if (x.isNullAt(1)) -1L else x.getLong(1))).toMap
    // tie: rt=100 >= t=100 inclusive (pandas forward tie rule);
    // gap: earliest at-or-after is 300; none: 40 < 50, no forward row
    assert(run(None) == Map("tie" -> 100L, "gap" -> 300L, "none" -> -1L))
    // tolerance AT the boundary: 300 - 200 = 100 == tol -> kept
    assert(run(Some(100L)) == Map("tie" -> 100L, "gap" -> 300L, "none" -> -1L))
    // one micro OVER: nulled, while the exact-tie match survives tol=0
    assert(run(Some(99L)) == Map("tie" -> 100L, "gap" -> -1L, "none" -> -1L))
    assert(run(Some(0L)) == Map("tie" -> 100L, "gap" -> -1L, "none" -> -1L))
  }

  test("forward as-of converts timestamp times exactly (PreciseTimestampConversion path)") {
    val s = spark
    import s.implicits._
    def ts(us: Long) = java.sql.Timestamp.from(
      java.time.Instant.EPOCH.plusNanos(us * 1000))
    val l = Seq((1L, ts(100), "a"), (1L, ts(250), "b")).toDF("k", "t", "tag")
    val r = Seq((1L, ts(99)), (1L, ts(101)), (1L, ts(251))).toDF("rk", "rt")
    val out = AsOf.join(l, r, "k", "t", "rk", "rt", direction = "forward")
      .select("tag", "rt").collect()
      .map(x => x.getString(0) -> x.getTimestamp(1)).toMap
    // output column keeps its TimestampType; only the compare negates
    assert(out == Map("a" -> ts(101), "b" -> ts(251)))
  }

  test("strict as-of: equal-time row never matches and never evicts an older candidate") {
    val s = spark
    import s.implicits._
    // THE cursor-preservation case: right rows at 5 and 10, left at
    // 10 — a naive strict check on the advanced cursor would see the
    // ineligible 10 and miss the eligible 5
    val l = Seq((1L, 10L, "a"), (1L, 12L, "b"), (2L, 7L, "c")).toDF("k", "t", "tag")
    val r = Seq((1L, 5L), (1L, 10L), (2L, 7L)).toDF("rk", "rt")
    def run(exact: Boolean, tol: Option[Long] = None) =
      AsOf.join(l, r, "k", "t", "rk", "rt", toleranceUs = tol,
          allowExactMatches = exact)
        .select("tag", "rt").collect()
        .map(x => x.getString(0) ->
          (if (x.isNullAt(1)) -1L else x.getLong(1))).toMap
    assert(run(exact = true) == Map("a" -> 10L, "b" -> 10L, "c" -> 7L))
    // strict: a matches 5 (10 ineligible but NOT evicting), b still
    // sees 10 (now strictly before 12), c's only candidate is exact
    assert(run(exact = false) == Map("a" -> 5L, "b" -> 10L, "c" -> -1L))
    // strict + tolerance: d ∈ [1, T] — a's candidate 5 is 5 away,
    // tol 4 nulls it while b's (d=2) survives
    assert(run(exact = false, tol = Some(4L)) ==
      Map("a" -> -1L, "b" -> 10L, "c" -> -1L))
    // strict forward via negation: first strictly-after row
    val fwd = AsOf.join(l, r, "k", "t", "rk", "rt",
        direction = "forward", allowExactMatches = false)
      .select("tag", "rt").collect()
      .map(x => x.getString(0) ->
        (if (x.isNullAt(1)) -1L else x.getLong(1))).toMap
    assert(fwd == Map("a" -> -1L, "b" -> -1L, "c" -> -1L))
  }

  test("as-of rejects mismatched time types at plan construction") {
    val s = spark
    import s.implicits._
    val l = Seq((1L, 100L)).toDF("k", "t")
    val r = Seq((1L, new java.sql.Timestamp(1000L))).toDF("rk", "rt")
    val e = intercept[IllegalArgumentException] {
      AsOf.join(l, r, "k", "t", "rk", "rt")
    }
    assert(e.getMessage.contains("time types must match"))
  }

  test("nearest as-of: backward-closer, forward-closer, tie to backward, no-match null") {
    // hand-checkable micro-corpus driven through the REGISTERED query's
    // semantics via a planted events frame is not possible (it reads
    // the table), so exercise the same two-pass composition directly
    val s2 = spark
    import s2.implicits._
    import org.apache.spark.sql.functions._
    val p = Seq((1L, 100L, 10L), (2L, 101L, 10L), (3L, 102L, 10L), (4L, 103L, 10L))
      .toDF("user_id", "purchase_event_id", "purchase_us")
      .withColumn("neg_us", -col("purchase_us"))
    // user 1: views at 7 and 12 -> forward (12) closer (3 vs 2)... backward diff 3, forward diff 2 -> forward
    // user 2: views at 9 and 14 -> backward (9) closer (1 vs 4)
    // user 3: views at 8 and 12 -> tie (2 vs 2) -> backward (8)
    // user 4: no views -> null
    val v = Seq((1L, 7L), (1L, 12L), (2L, 9L), (2L, 14L), (3L, 8L), (3L, 12L))
    val vb = v.toDF("v_user_id", "last_view_us")
    val vf = v.toDF("f_user_id", "next_view_us")
      .withColumn("neg_view_us", -col("next_view_us"))
    val both = graft.plans.AsOf.join(
      graft.plans.AsOf.join(p, vb, "user_id", "purchase_us", "v_user_id", "last_view_us"),
      vf.select(col("f_user_id"), col("neg_view_us"), col("next_view_us")),
      "user_id", "neg_us", "f_user_id", "neg_view_us")
    val db = col("purchase_us") - col("last_view_us")
    val df = col("next_view_us") - col("purchase_us")
    val got = both
      .withColumn("nearest",
        when(col("last_view_us").isNull, col("next_view_us"))
          .when(col("next_view_us").isNull, col("last_view_us"))
          .when(db <= df, col("last_view_us")).otherwise(col("next_view_us")))
      .select(col("user_id"), col("nearest"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got == Map(1L -> Some(12L), 2L -> Some(9L), 3L -> Some(8L), 4L -> None), s"got $got")
  }
}
