package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed bounded top-k aggregator (the `Aggregator[IN, BUF, OUT]`
  * route for custom aggregates — the guide's preferred API for
  * user-facing typed aggregation).
  *
  * The buffer never exceeds k entries, so map-side partial
  * aggregation ships at most k rows per partition per group — a
  * top-k-per-group that does NOT sort or shuffle the full group, the
  * property that matters when one group holds billions of rows.
  *
  * Ordering: score desc, then id asc (deterministic tie-break).
  */
object TopKAggregator {
  /** Parallel-array buffer (Product, hence columnar-encodable). */
  case class TopK(ids: Seq[Long], scores: Seq[Double])
}

class TopKAggregator(k: Int)
    extends Aggregator[(Long, Double), TopKAggregator.TopK, TopKAggregator.TopK] {
  import TopKAggregator.TopK

  private def trim(pairs: Seq[(Long, Double)]): TopK = {
    // sortWith(before), not sortBy(-score): negation would strand NaN
    // at the wrong end (see before's doc)
    val top = pairs.sortWith((a, b) => before(a._1, a._2, b._1, b._2)).take(k)
    TopK(top.map(_._1), top.map(_._2))
  }

  /** True when (id1, s1) ranks strictly before (id2, s2).
    * Double.compare, not > / ==: primitive NaN comparisons are always
    * false, which would make NaN scores insert when the buffer is
    * short but never when full — order-dependent results. compare
    * treats NaN as the LARGEST value, matching Spark's own descending
    * sort order, so the aggregator agrees with its window oracle even
    * on NaN scores (e.g. 0/0 cosines from zero-norm vectors). */
  private def before(id1: Long, s1: Double, id2: Long, s2: Double): Boolean = {
    val c = java.lang.Double.compare(s1, s2)
    c > 0 || (c == 0 && id1 < id2)
  }

  override def zero: TopK = TopK(Nil, Nil)

  /** The buffer is kept sorted, so the common case (row doesn't make
    * the top k) is an O(1) compare against the current worst, and an
    * accepted row is one O(k) splice — not an O(k log k) re-sort per
    * input row. */
  override def reduce(buf: TopK, in: (Long, Double)): TopK = {
    val n = buf.ids.length
    if (n == k && !before(in._1, in._2, buf.ids(n - 1), buf.scores(n - 1))) {
      buf
    } else {
      var idx = 0
      while (idx < n && before(buf.ids(idx), buf.scores(idx), in._1, in._2)) idx += 1
      TopK(
        (buf.ids.take(idx) :+ in._1) ++ buf.ids.slice(idx, math.min(n, k - 1)),
        (buf.scores.take(idx) :+ in._2) ++ buf.scores.slice(idx, math.min(n, k - 1)))
    }
  }

  /** Partial-buffer merges happen once per partition pair — the
    * sort-based trim is fine here. */
  override def merge(a: TopK, b: TopK): TopK =
    trim(a.ids.zip(a.scores) ++ b.ids.zip(b.scores))

  override def finish(buf: TopK): TopK = buf

  override def bufferEncoder: Encoder[TopK] = Encoders.product[TopK]
  override def outputEncoder: Encoder[TopK] = Encoders.product[TopK]
}
