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
    val top = pairs.sortBy(t => (-t._2, t._1)).take(k)
    TopK(top.map(_._1), top.map(_._2))
  }

  override def zero: TopK = TopK(Nil, Nil)

  override def reduce(buf: TopK, in: (Long, Double)): TopK =
    trim(buf.ids.zip(buf.scores) :+ in)

  override def merge(a: TopK, b: TopK): TopK =
    trim(a.ids.zip(a.scores) ++ b.ids.zip(b.scores))

  override def finish(buf: TopK): TopK = buf

  override def bufferEncoder: Encoder[TopK] = Encoders.product[TopK]
  override def outputEncoder: Encoder[TopK] = Encoders.product[TopK]
}
