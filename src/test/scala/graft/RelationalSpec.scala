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

  test("no oracle SQL bakes a zero constant into a division") {
    // a Scala forward val reference inside an interpolated SQL string
    // silently bakes 0 (e.g. `count(*) / 0.0`) — the SQL still parses
    // and the mismatch only surfaces as a hash failure at check time
    val divZero = "/\\s*0(\\.0)?\\s*[,)\\s]".r
    val offenders = SparkEntry.oracleSql.collect {
      case (name, sql) if divZero.findFirstIn(sql).isDefined => name
    }
    assert(offenders.isEmpty, s"zero divisor baked into: ${offenders.mkString(", ")}")
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

  test("sessionize: native form equals composed form, incl. a planted exact-boundary gap") {
    // corpus equality at sf0.001 (the oracle gate re-proves this at sf0.01)
    val a = Events.qSessionize(spark, sf).collect().map(_.toString).sorted
    val b = Events.qSessionizeNative(spark, sf).collect().map(_.toString).sorted
    assert(a.sameElements(b), "native session_window diverged from composed sessionizer")
    // planted: inter-event gap of EXACTLY 30 min — composed splits only
    // at STRICTLY > gap, so both events must share a session; Spark's
    // session_window merges at exactly-gap boundaries natively (windows
    // [t, t+gap) and [t+gap, ...) touch and merge), so no offset is
    // needed for the two forms to agree (measured in Events.scala).
    val dir = java.nio.file.Files.createTempDirectory("sess-boundary").toString
    val gapUs = 1800000000L
    val base = 1700000000000000L
    val s = spark
    import s.implicits._
    Seq(
      (1L, 1L, base),
      (1L, 2L, base + gapUs),          // exactly on the boundary: SAME session
      (1L, 3L, base + gapUs + gapUs + 1L), // 1µs past: NEW session
      (2L, 4L, base))
      .toDF("user_id", "event_id", "us")
      .select(col("user_id"), col("event_id"),
        expr("timestamp_micros(us)").as("ts"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val comp = Events.qSessionize(spark, dir).collect().map(_.toString).sorted
    val nat  = Events.qSessionizeNative(spark, dir).collect().map(_.toString).sorted
    assert(comp.sameElements(nat),
      s"boundary corpus diverged:\ncomposed=${comp.mkString("|")}\nnative=${nat.mkString("|")}")
    // and the boundary pair really did stay in one session of 2 events
    val u1 = Events.qSessionize(spark, dir)
      .filter(col("user_id") === 1L).collect()
    assert(u1.length == 2 && u1.map(_.getLong(2)).sorted.sameElements(Array(1L, 2L)))
  }

  test("retention cohorts: offset-0 diagonal is full, cells never exceed cohort size") {
    val rows = Events.qRetentionCohorts(spark, sf).collect()
    assert(rows.nonEmpty)
    val byCohort = rows.groupBy(_.getLong(0))
    byCohort.foreach { case (c, cells) =>
      val zero = cells.find(_.getLong(1) == 0L)
      assert(zero.isDefined, s"cohort $c missing its offset-0 cell")
      assert(zero.get.getDouble(3) == 1.0, s"cohort $c offset-0 retention != 1")
      val size = zero.get.getLong(2)
      cells.foreach { r =>
        assert(r.getLong(2) <= size && r.getDouble(3) <= 1.0,
          s"cohort $c offset ${r.getLong(1)}: cell exceeds cohort size")
      }
    }
    // cohort sizes sum to the distinct-user count (cohorts partition users)
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(byCohort.values.map(_.find(_.getLong(1) == 0L).get.getLong(2)).sum == users)
  }

  test("outliers: planted spike flagged, constant series excluded, baseline is per-user") {
    val s = spark
    import s.implicits._
    // user 1: twenty 10.0s + one 1000.0 spike (z ≈ +4.47);
    // user 2: constant series (σ = 0 — the variance guard's case);
    // user 3: all values equal user 1's spike — normal FOR THEM
    val rows =
      (0 until 20).map(i => (i.toLong, 1L, 10.0)) ++ Seq((20L, 1L, 1000.0)) ++
      (21 until 31).map(i => (i.toLong, 2L, 5.0)) ++
      (31 until 41).map(i => (i.toLong, 3L, 1000.0 + (i % 2)))
    val dir = java.nio.file.Files.createTempDirectory("outl").toString
    rows.toDF("event_id", "user_id", "value")
      .select(col("event_id"),
        org.apache.spark.sql.functions.expr(
          "timestamp_micros(1700000000000000 + event_id * 1000000)").as("ts"),
        col("user_id"), lit("view").as("event_type"), col("value"),
        lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.operators.Events.qOutliers(s, dir).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(20L),
      s"exactly the planted spike must be flagged: ${out.mkString(",")}")
    assert(out.head.getDouble(3) > 3.0 && out.head.getDouble(3) < 5.0)
  }

  test("active users: wau bounds dau, first day equal, totals bounded by user count") {
    val rows = Events.qActiveUsers(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (d, dau, wau) =>
      assert(wau >= dau, s"day $d: wau $wau < dau $dau")
    }
    val first = rows.minBy(_._1)
    assert(first._2 == first._3, "no history before the first day: wau == dau")
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(rows.forall(_._3 <= users))
  }

  test("active users approx: same day grid as exact, per-day error within 5%") {
    val exact = Events.qActiveUsers(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val approx = Events.qActiveUsersApprox(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(approx.map(_._1).toSet == exact.keySet,
      "observed-day grids must be identical — the sketch changes counts, not days")
    approx.foreach { case (d, dauA, wauA) =>
      val (dau, wau) = exact(d)
      assert(math.abs(dauA - dau) <= math.max(1, 0.05 * dau),
        s"day $d: approx dau $dauA vs exact $dau")
      assert(math.abs(wauA - wau) <= math.max(1, 0.05 * wau),
        s"day $d: approx wau $wauA vs exact $wau")
    }
  }

  test("interval join: every row is a real purchase with >= 1 qualifying view") {
    import org.apache.spark.sql.functions.unix_micros
    val out = Events.qIntervalJoin(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty && out.forall(_._3 >= 1))
    val purchases = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts"))).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.forall(o => purchases.contains((o._1, o._2))),
      "every output row must key a real purchase event")
  }

  test("funnel steps: counts monotone non-increasing, rates consistent") {
    val rows = Events.qFunnelSteps(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.map(_._1).toSeq == Seq(1, 2, 3, 4))
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 <= a._3, s"step ${b._1} count ${b._3} > step ${a._1} ${a._3}")
    }
    val n1 = rows.head._3
    assert(rows.head._4 == 1.0 && rows.head._5 == 1.0)
    rows.foreach { case (_, _, n, cf, _) =>
      assert(math.abs(cf - math.floor(n.toDouble / n1 * 1e4 + 0.5) / 1e4) < 1e-12)
    }
    // step 1 = users who ever signed up
    val signups = Tables.events(spark, sf)
      .filter(col("event_type") === "signup")
      .select("user_id").distinct().count()
    assert(n1 == signups)
  }

  test("trend: recovers a planted exact line, excludes zero-x-variance users") {
    val s = spark
    import s.implicits._
    val base = 1704067200000000L
    // user 1: y = 2x + 5 exactly at hours 0..9; user 2: all events in
    // one hour (zero x variance — must be excluded)
    val rows =
      (0 until 10).map(h => (h.toLong, 1L, base + h * 3600000000L, 2.0 * h + 5.0)) ++
      (10 until 15).map(i => (i.toLong, 2L, base + 1000000L * i, 42.0))
    val dir = java.nio.file.Files.createTempDirectory("trend").toString
    rows.toDF("event_id", "user_id", "us", "value")
      .select(col("event_id"), expr("timestamp_micros(us)").as("ts"),
        col("user_id"), lit("view").as("event_type"), col("value"),
        lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.operators.ScalarOps.qTrend(s, dir).collect()
      .map(r => r.getLong(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    assert(out.keySet == Set(1L), s"only user 1 has x variance: $out")
    assert(out(1L) == ((2.0, 5.0)), s"exact line must be recovered: ${out(1L)}")
  }

  test("trend: pre-base events floor to the previous hour (cross-engine division)") {
    val s = spark
    import s.implicits._
    val base = 1704067200000000L
    // two events straddling the base at ±30 min: floor semantics give
    // x = (-1, 0) — the user is INCLUDED with slope y2-y1; the old
    // truncate-toward-zero form collapsed both to x = 0 (zero x
    // variance) and silently dropped the user, diverging from the
    // oracle's floor division on any pre-base data
    val rows = Seq(
      (0L, 7L, base - 1800000000L, 10.0),
      (1L, 7L, base + 1800000000L, 13.0))
    val dir = java.nio.file.Files.createTempDirectory("trendneg").toString
    rows.toDF("event_id", "user_id", "us", "value")
      .select(col("event_id"), expr("timestamp_micros(us)").as("ts"),
        col("user_id"), lit("view").as("event_type"), col("value"),
        lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.operators.ScalarOps.qTrend(s, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out == Map(7L -> 3.0),
      s"pre-base event must land at hour -1, giving slope 3.0: $out")
  }

  test("anomaly MAD: spike can't mask the second anomaly; zero-MAD users excluded") {
    val s = spark
    import s.implicits._
    // user 1: tight baseline 10.1..12.0, a 1000.0 spike, and a mild
    // 25.0 anomaly. The spike inflates sigma to ~200 so the z-score
    // rule misses 25.0 (|z| ~ 0.16); median/MAD shrug off the spike
    // and flag both. user 2: constant series -> MAD = 0, excluded.
    val rows = (0 until 20).map(i => (i.toLong, 1L, 10.1 + 0.1 * i)) ++
      Seq((20L, 1L, 1000.0), (21L, 1L, 25.0)) ++
      (22 until 30).map(i => (i.toLong, 2L, 7.0))
    val ev = rows.toDF("event_id", "user_id", "value")
    val flagged = Events.anomalyMad(ev).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(flagged.keySet == Set(20L, 21L),
      s"MAD must flag the spike AND the masked anomaly: $flagged")
    assert(flagged(20L) > 3.5 && flagged(21L) > 3.5)
    // the z-score twin misses the masked 25.0 on the same input
    val dir = java.nio.file.Files.createTempDirectory("madvz").toString
    ev.select(col("event_id"),
        expr("timestamp_micros(1700000000000000 + event_id * 1000000)")
          .as("ts"),
        col("user_id"), lit("view").as("event_type"), col("value"),
        lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val zFlagged = Events.qOutliers(s, dir).collect().map(_.getLong(0)).toSet
    assert(!zFlagged.contains(21L),
      s"the masking premise: z-score must miss the 25.0 anomaly: $zFlagged")
  }

  test("ewma: hand-computed fold, single-event identity, horizon truncation") {
    val s = spark
    import s.implicits._
    def ev(rows: Seq[(Long, Long, Double)]) =
      rows.toDF("event_id", "user_id", "value")
        .select(col("user_id"), col("event_id"),
          expr("timestamp_micros(1700000000000000 + event_id * 1000000)")
            .as("ts"), col("value"))
    // user 1: values 1,2,3 in time order -> ((1+2)/2 + 3)/2 = 2.25;
    // user 2: single event -> ewma = its value
    val out = Events.ewmaOf(ev(Seq((0L, 1L, 1.0), (1L, 1L, 2.0),
        (2L, 1L, 3.0), (3L, 2L, 7.5))))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(1L) == ((3L, 2.25)), s"fold order must be time order: $out")
    assert(out(2L) == ((1L, 7.5)))
    // horizon: 8 huge early values then 40 small ones — the window
    // keeps only the last 32, so the result equals the fold over
    // exactly those 32 (the early 1e9s never enter the array)
    val long = (0 until 8).map(i => (i.toLong, 9L, 1e9)) ++
      (8 until 48).map(i => (i.toLong, 9L, 2.0))
    val got = Events.ewmaOf(ev(long)).collect()
      .map(r => (r.getLong(1), r.getDouble(2))).head
    assert(got == ((32L, 2.0)), s"horizon must truncate to 32: $got")
  }

  test("cusum: sustained shift flagged at its hand-computed mass; constant and point-noise users stay at zero") {
    val s = spark
    import s.implicits._
    def ev(rows: Seq[(Long, Long, Double)]) =
      rows.toDF("event_id", "user_id", "value")
        .select(col("user_id"), col("event_id"),
          expr("timestamp_micros(1700000000000000 + event_id * 1000000)")
            .as("ts"), col("value"))
    // user 1: constant 10.0 -> every deviation is -kappa*n, C pinned
    // at 0. user 2: 10 events at 10.0 then 10 at 30.0 (mu = 20,
    // shift >> kappa=2): hand fold gives max C/n = 80.0 exactly, first
    // attained at the LAST event. user 3: one modest 12.0 point among
    // 10.0s — under the slack, so CUSUM accumulates nothing (the
    // point-noise immunity that distinguishes it from q_outliers).
    val rows =
      (0 until 10).map(i => (i.toLong, 1L, 10.0)) ++
      (10 until 20).map(i => (i.toLong, 2L, 10.0)) ++
      (20 until 30).map(i => (i.toLong, 2L, 30.0)) ++
      (30 until 50).map(i => (i.toLong, 3L, 10.0)) ++ Seq((50L, 3L, 12.0)) ++
      (51 until 61).map(i => (i.toLong, 4L, 10.0)) ++
      (61 until 71).map(i => (i.toLong, 4L, 1210.0))
    val out = Events.cusumOf(ev(rows)).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3), r.getBoolean(4))))
      .toMap
    assert(out(1L) == ((10L, 0.0, 0L, false)),
      s"constant user must sit at C=0 with at_event = first: $out")
    assert(out(2L) == ((20L, 80.0, 29L, false)),
      s"sustained +20 shift: max C/n = 10*(30-20-2) mass = 80.0 at the last event: $out")
    assert(out(3L)._2 == 0.0 && !out(3L)._4,
      s"a 12.0 point under the slack must accumulate nothing: $out")
    // +1200 shift: mu = 610, max C/n = 10*(1210-610-2) = 5980 > h
    assert(out(4L) == ((20L, 5980.0, 70L, true)),
      s"a shift past Page's h must set the drift flag: $out")
  }

  test("mode: winner is the true per-source argmax with the documented tie-break") {
    val expected = Tables.documents(spark, sf)
      .groupBy("source", "lang").count().collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1).map { case (src, rows) =>
        src -> rows.minBy(r => (-r._3, r._2))._2 // count desc, lang asc
      }
    val got = graft.operators.ScalarOps.qMode(spark, sf).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == expected, s"modal langs must match driver argmax")
  }

  test("mode bounded: argmax-aggregate form equals the window form row for row") {
    val win = graft.operators.ScalarOps.qMode(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val agg = graft.operators.ScalarOps.qModeBounded(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(agg.toSeq == win.toSeq,
      "the two mode formulations must be indistinguishable")
    // and the plan genuinely avoids window sorts: aggregates only
    val plan = graft.operators.ScalarOps.qModeBounded(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"bounded mode must not plan a window: $plan")
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

  test("merge upsert: ops partition the key space; source rows win") {
    import org.apache.spark.sql.functions.unix_micros
    val cut = 1705363200000000L // mirrors qMergeUpsert's cutoff
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("us")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val tUsers = ev.filter(_._2 < cut).map(_._1).toSet
    val sUsers = ev.filter(_._2 >= cut).map(_._1).toSet
    assert(tUsers.nonEmpty && sUsers.nonEmpty, "cutoff must split the data")
    val rows = graft.operators.Events.qMergeUpsert(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSet == (tUsers ++ sUsers))
    assert(rows.map(_.getLong(0)).distinct.length == rows.length) // one row/key
    rows.foreach { r =>
      val (u, op, lastUs) = (r.getLong(0), r.getString(1), r.getLong(3))
      val expect =
        if (tUsers(u) && sUsers(u)) "update"
        else if (sUsers(u)) "insert" else "keep"
      assert(op == expect, s"user $u: $op != $expect")
      // merged state comes from the source side iff the source saw the key
      assert((lastUs >= cut) == (op != "keep"), s"user $u: $op with us $lastUs")
    }
  }

  test("resample: contiguous hourly grid, forward fill carries last value") {
    import org.apache.spark.sql.functions.unix_micros
    val UsPerHour = 3600000000L
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("value")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1)
    val byUser = graft.operators.Events.qResample(spark, sf).collect()
      .groupBy(_.getLong(0))
    assert(byUser.keySet == ev.keySet)
    byUser.foreach { case (u, rs) =>
      val hrs = rs.map(_.getLong(1)).sorted
      val evHrs = ev(u).map(_._2 / UsPerHour)
      assert(hrs.head == evHrs.min && hrs.last == evHrs.max)
      assert(hrs.sameElements(hrs.head to hrs.last), s"user $u grid has holes")
      // recompute the fill: last event (by us, event_id) within each hour
      val lastPerHour = ev(u).groupBy(_._2 / UsPerHour).map { case (h, es) =>
        h -> es.maxBy(e => (e._2, e._3))._4
      }
      var carried: Option[Double] = None
      rs.sortBy(_.getLong(1)).foreach { r =>
        lastPerHour.get(r.getLong(1)) match {
          case Some(v) =>
            carried = Some(v)
            assert(!r.getBoolean(3) && r.getDouble(2) == v)
          case None =>
            assert(r.getBoolean(3) && r.getDouble(2) == carried.get)
        }
      }
    }
  }

  test("stats moments agree with Spark's built-in aggregates") {
    val got = graft.operators.ScalarOps.qStatsMoments(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val ref = Tables.events(spark, sf).groupBy("event_type")
      .agg(count(lit(1)).as("n"), avg("value").as("m"),
        var_pop("value").as("v"), skewness("value").as("s")).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got.keySet == ref.keySet)
    got.foreach { case (k, (n, mean, varp, skew)) =>
      val (rn, rm, rv, rs) = ref(k)
      assert(n == rn)
      assert(math.abs(mean - rm) < 1e-5, s"$k mean $mean vs $rm")
      assert(math.abs(varp - rv) < 1e-4, s"$k var $varp vs $rv")
      assert(math.abs(skew - rs) < 1e-4, s"$k skew $skew vs $rs")
    }
  }

  test("correlation from power sums agrees with Spark's built-in corr") {
    val got = graft.operators.ScalarOps.qCorr(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    val ref = Tables.lineitem(spark, sf).groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        covar_pop("l_quantity", "l_extendedprice").as("cv"),
        corr("l_quantity", "l_extendedprice").as("c")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(got.keySet == ref.keySet && got.nonEmpty)
    got.foreach { case (k, (n, cv, c)) =>
      val (rn, rcv, rc) = ref(k)
      assert(n == rn)
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
      assert(math.abs(cv - rcv) / math.max(1.0, math.abs(rcv)) < 1e-4,
        s"$k cov $cv vs $rcv")
      assert(math.abs(c - rc) < 1e-4, s"$k corr $c vs $rc")
    }
  }

  test("triangle counts on a planted graph match hand enumeration") {
    import TestSpark.spark.implicits._
    // K4 on {1,2,3,4} — four triangles, every node on three of them —
    // plus a pendant edge (4,5) and a disconnected edge (6,7):
    // pendant/isolated nodes must not appear at all
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (6L, 7L)).toDF("s1", "s2")
    val got = graft.operators.MrCore.triangleCounts(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
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

  test("salted join: planted 100:1 skew — result equals plain join, hot key spreads ~salts×") {
    val s = spark
    import s.implicits._
    val salts = 8
    // key 0: 4000 rows (the straggler); keys 1..40: 40 rows each
    val fact = ((0 until 4000).map(i => (i.toLong, 0L)) ++
      (for (k <- 1 to 40; j <- 0 until 40)
        yield ((10000 + k * 100 + j).toLong, k.toLong)))
      .toDF("row_id", "k")
    val dim = (0 to 40).map(k => (k.toLong, s"d$k")).toDF("dk", "payload")

    val plain = fact.join(dim, col("k") === col("dk"))
      .groupBy("k").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val salted = graft.operators.Relational
      .saltedEquiJoin(fact, dim, "k", "dk", saltFrom = col("row_id"),
        hotFactor = 2.0, salts = salts)
      .groupBy("k").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(salted == plain, "salting must be result-invariant")

    // the spread property: replicate the kernel's salt assignment and
    // measure the largest (key, salt) bucket of the hot key — it must
    // be ~1/salts of the unsalted 4000-row straggler
    val maxBucket = fact.filter(col("k") === 0L)
      .withColumn("_s", pmod(crc32(col("row_id").cast("string")), lit(salts)))
      .groupBy("_s").count().agg(max("count")).head.getLong(0)
    info(s"hot key: 4000 rows unsalted -> max salted bucket $maxBucket")
    assert(maxBucket < 4000 / salts * 2,
      s"salting must spread the hot key: max bucket $maxBucket")
  }

  test("event transitions: rows sum to 1 per from_type, edge mass = events minus per-user lasts") {
    val s = spark
    import s.implicits._
    val df = operators.Events.qEventTransitions(spark, sf)
    val rowSums = df.groupBy("from_type")
      .agg(sum("p").as("sp"), sum("n").as("sn")).collect()
    rowSums.foreach { r =>
      // p is rounded to 6dp per edge; |types| ≤ 5 edges per row bounds
      // the summed rounding error at 5e-6
      assert(math.abs(r.getDouble(1) - 1.0) < 5e-6,
        s"row ${r.getString(0)} probabilities sum to ${r.getDouble(1)}")
    }
    val totalEdges = rowSums.map(_.getLong(2)).sum
    val ev = Tables.events(spark, sf)
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(totalEdges == expected,
      s"every event except each user's last must contribute one edge: " +
        s"$totalEdges vs $expected")
  }

  test("as-of diff: planted added/changed classes, unchanged users excluded") {
    val s = spark
    import s.implicits._
    // T1 = 100, T2 = 200. user 1: active both sides (changed);
    // user 2: last event before T1, idle after (unchanged — excluded);
    // user 3: first event inside (T1, T2) (added);
    // user 4: only after T2 (outside both snapshots — excluded)
    val ev = Seq(
      (1L, 10L, "a", 1.0, 50L), (1L, 11L, "b", 2.0, 150L),
      (2L, 20L, "a", 3.0, 60L),
      (3L, 30L, "c", 4.0, 120L),
      (4L, 40L, "d", 5.0, 250L)
    ).toDF("user_id", "event_id", "event_type", "value", "us")
    val got = operators.Events.asOfDiff(ev, 100L, 200L)
      .orderBy("user_id")
      .select("user_id", "change", "old_event_id", "new_event_id")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq((1L, "changed", 10L, 11L), (3L, "added", -1L, 30L)),
      s"expected one changed + one added row, got $got")
  }

  test("snapshotDiff: full-outer CDC classes incl. removed; unchanged dropped; null-safe payload") {
    val s = spark
    import s.implicits._
    val a = Seq((1L, "x", Some(1.0)), (2L, "y", None: Option[Double]),
      (3L, "z", Some(3.0))).toDF("k", "t", "v")
    val b = Seq((1L, "x", Some(9.0)), (2L, "y", None: Option[Double]),
      (4L, "w", Some(4.0))).toDF("k", "t", "v")
    val got = operators.Events.snapshotDiff(a, b, "k")
      .orderBy("k").select("k", "change")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    // k=1 changed; k=2 identical INCLUDING the null field (null-safe
    // compare must drop it, not emit a spurious 'changed'); k=3
    // removed; k=4 added
    assert(got == Seq((1L, "changed"), (3L, "removed"), (4L, "added")),
      s"expected changed/removed/added only, got $got")
  }

  test("market basket: Apriori item prune is lossless above minSupport and drops rare pairs") {
    val s = spark
    import s.implicits._
    // planted long-tail catalog: items 100/200/300 are frequent (3
    // orders each), items 901-905 appear in ONE order each — the tail
    // the prune must remove before the pair self-join
    val op = Seq(
      (1L, 100L), (1L, 200L), (1L, 901L),
      (2L, 100L), (2L, 200L), (2L, 902L),
      (3L, 100L), (3L, 200L), (3L, 300L),
      (4L, 300L), (4L, 903L),
      (5L, 300L), (5L, 904L), (5L, 905L)
    ).toDF("l_orderkey", "l_partkey")
    val pruned = operators.Relational.basketTopPairs(op, minSupport = 2L)
      .collect()
    // reference: NO item prune, same support filter — support(a,b) ≤
    // min(n_a, n_b) makes the prune lossless, so these must be EQUAL
    val n = op.select("l_orderkey").distinct.count
    val partN = op.groupBy("l_partkey").agg(count(lit(1)).as("n_part"))
    val ref = op.select(col("l_orderkey"), col("l_partkey").as("part_a"))
      .join(op.select(col("l_orderkey"), col("l_partkey").as("part_b")),
        Seq("l_orderkey"))
      .filter(col("part_a") < col("part_b"))
      .groupBy("part_a", "part_b").agg(count(lit(1)).as("support"))
      .filter(col("support") >= 2)
      .join(partN.select(col("l_partkey").as("part_a"), col("n_part").as("n_a")),
        "part_a")
      .join(partN.select(col("l_partkey").as("part_b"), col("n_part").as("n_b")),
        "part_b")
      .orderBy(col("support").desc, col("part_a"), col("part_b"))
      .select(col("part_a"), col("part_b"), col("support"),
        graft.functions.CrossEngine.rnd(
          col("support").cast("double") * n / (col("n_a") * col("n_b")), 6)
          .as("lift"))
      .collect()
    assert(pruned.map(_.toSeq).toSeq == ref.map(_.toSeq).toSeq,
      s"prune must be lossless above minSupport: ${pruned.toSeq} vs ${ref.toSeq}")
    // exactly the hot pair survives: support 3, lift = 3·5/(3·3)
    assert(pruned.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      == Seq((100L, 200L, 3L)))
    assert(pruned.head.getDouble(3) == 1.666667)
    // the unpruned form DOES see the support-1 tail — the prune is
    // doing real work on this corpus, not vacuously passing
    val unpruned = operators.Relational.basketTopPairs(op, minSupport = 1L)
      .collect()
    assert(unpruned.length > pruned.length,
      "planted rare pairs must exist unpruned and be dropped by the prune")
    CacheHygiene.sweep(spark)
  }
}
