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

  test("approx_percentile within rank-error bound of the exact quantiles") {
    // GK sketch guarantee at accuracy a: the reported value's RANK is
    // within n/a of the target rank. Bound each reported value between
    // the exact values at (p − ε) and (p + ε) with ε = 1/a plus one
    // element of slack for interpolation on small groups.
    val acc = 10000.0
    val approx = Advanced.qApproxPercentile(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    approx.keys.foreach { seg =>
      val vals = Tables.customer(spark, sf)
        .filter(col("c_mktsegment") === seg)
        .select("c_acctbal").collect().map(_.getDouble(0)).sorted
      val n = vals.length
      def exactAt(p: Double): Double =
        vals(math.min(n - 1, math.max(0, math.round(p * (n - 1)).toInt)))
      def bound(p: Double, got: Double): Unit = {
        val eps = 1.0 / acc
        val slack = 1 // interpolation slack in elements
        val lo = vals(math.max(0, math.round((p - eps) * (n - 1)).toInt - slack))
        val hi = vals(math.min(n - 1, math.round((p + eps) * (n - 1)).toInt + slack))
        assert(got >= lo && got <= hi,
          s"$seg p=$p: $got outside [$lo, $hi] (exact ${exactAt(p)}, n=$n)")
      }
      val (p50, p90, p99) = approx(seg)
      bound(0.5, p50); bound(0.9, p90); bound(0.99, p99)
      assert(p50 <= p90 && p90 <= p99, s"$seg: quantiles must be ordered")
    }
  }

  test("unpivot doubles part's rows and pivots back to the originals") {
    val df = Advanced.qUnpivot(spark, sf)
    val nPart = Tables.part(spark, sf).count()
    assert(df.count() == 2 * nPart)
    val back = df.groupBy("p_partkey")
      .pivot("metric", Seq("p_size", "p_retailprice")).agg(first("value"))
      .select(col("p_partkey"), col("p_size"), col("p_retailprice"))
    val orig = Tables.part(spark, sf).select(col("p_partkey"),
      col("p_size").cast("double").as("p_size"), col("p_retailprice"))
    assert(back.except(orig).isEmpty && orig.except(back).isEmpty)
  }

  test("skyline is exactly the brute-force non-dominated set") {
    val pts = Tables.part(spark, sf)
      .select("p_partkey", "p_retailprice", "p_size").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    def dominated(p: (Long, Double, Int)) = pts.exists { q =>
      q._2 <= p._2 && q._3 >= p._3 && (q._2 < p._2 || q._3 > p._3)
    }
    val expect = pts.filterNot(dominated).toSet
    val got = Advanced.qSkyline(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSet
    assert(got == expect, s"skyline ${got.size} vs brute force ${expect.size}")
    assert(got.nonEmpty) // a frontier always exists on non-empty input
  }

  test("equi-depth deciles partition each segment into ordered ~10% buckets") {
    val rows = Advanced.qBucketize(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    val segTotals = Tables.customer(spark, sf).groupBy("c_mktsegment").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.groupBy(_._1).foreach { case (seg, ds) =>
      val n = segTotals(seg)
      assert(ds.map(_._2).sorted.toSeq == (1 to 10),
        s"$seg: missing deciles ${ds.map(_._2).sorted.toSeq}")
      assert(ds.map(_._3).sum == n, s"$seg: decile counts must cover the segment")
      // equi-depth: every decile holds roughly a tenth
      ds.foreach { case (_, d, c, _, _) =>
        assert(c >= n / 20 && c <= n / 5, s"$seg decile $d holds $c of $n")
      }
      // value ranges are ordered and non-overlapping across deciles
      val byD = ds.sortBy(_._2)
      byD.zip(byD.tail).foreach { case ((_, d, _, _, hi), (_, _, _, lo2, _)) =>
        assert(hi <= lo2 + 1e-9, s"$seg: decile $d hi $hi > next lo $lo2")
      }
    }
  }

  test("winsorized mean sits inside the clamp bounds; clamp counts consistent") {
    val rows = Advanced.qWinsorize(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // (c_mktsegment, n_cust, n_clamped_lo, n_clamped_hi, p_lo, p_hi, winsor_mean)
      val (n, nLo, nHi) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val (lo, hi, mean) = (r.getDouble(4), r.getDouble(5), r.getDouble(6))
      assert(lo <= hi)
      // every clamped value lies in [p_lo, p_hi], so the mean must too
      // (1e-3 headroom for the 4-decimal deterministic roundings)
      assert(mean >= lo - 1e-3 && mean <= hi + 1e-3,
        s"${r.getString(0)}: mean $mean outside [$lo, $hi]")
      assert(nLo + nHi <= n)
      assert(nLo > 0 || nHi > 0, "p10/p90 clamps must bite on a real segment")
    }
  }

  test("CMS join-size estimate: overestimates, within the epsilon*Na*Nb bound") {
    val r = graft.operators.Advanced.qJoinSizeEstimate(spark, sf).collect()(0)
    val (exact, est) = (r.getLong(0), r.getLong(1))
    assert(est >= exact, s"CM inner product must overestimate: $est < $exact")
    // Cormode-Muthukrishnan: est <= exact + e/width * Na * Nb (per
    // depth row, so certainly for the min); widths/sizes from the
    // registered configuration
    import org.apache.spark.sql.functions._
    val na = graft.Tables.orders(spark, sf).count()
    val nb = graft.Tables.customer(spark, sf).count()
    val bound = exact + (math.E / 4096.0) * na * nb
    assert(est <= bound, s"est $est above the CM bound $bound (Na=$na Nb=$nb)")
  }

  test("weighted PPS sample: exact hit count, heavy docs always drawn, multiplicity honest") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, sf)
    val drawn = graft.operators.ScalarOps.weightedSystematicSample(docs, k = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // recompute the line layout driver-side from first principles
    val toks = size(filter(split(col("text"), "\\s+"), x => x =!= "")).cast("long")
    val weights = docs.select(col("doc_id"), toks.as("w")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val total = weights.values.sum
    val stride = math.max(total / 100, 1L)
    // invariant 1: total multiplicity = number of stride multiples in [0, total)
    val expectedHits = (total + stride - 1) / stride
    assert(drawn.map(_._3).sum == expectedHits,
      s"sum(n_hits)=${drawn.map(_._3).sum} != ceil(W/stride)=$expectedHits")
    // invariant 2: any doc at least a stride wide must be drawn
    val heavy = weights.filter(_._2 >= stride).keySet
    val drawnIds = drawn.map(_._1).toSet
    assert(heavy.subsetOf(drawnIds),
      s"missing heavy docs: ${(heavy -- drawnIds).take(3)}")
    // invariant 3: multiplicity bounded by ceil(w/stride) + 1 windows
    drawn.foreach { case (id, w, hits) =>
      assert(hits >= 1 && hits <= w / stride + 1,
        s"doc $id: hits=$hits outside [1, ${w / stride + 1}] for w=$w")
    }
    // invariant 4: weights echoed correctly
    drawn.foreach { case (id, w, _) => assert(weights(id) == w) }
  }
}
