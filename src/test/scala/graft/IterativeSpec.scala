package graft

import org.apache.spark.sql.functions._
import graft.operators.{MrCore, Similarity}

class IterativeSpec extends SparkSpec {

  test("pagerank: mass is conserved within integer-truncation loss") {
    val df = MrCore.mrPagerank(spark, sf)
    val scale = 1000000000000000L
    val total = df.agg(sum("rank_scaled")).collect()(0).getLong(0)
    // total mass stays within 1% of SCALE (integer division truncates)
    assert(math.abs(total - scale).toDouble / scale < 0.01,
      s"total mass $total vs $scale")
    // all ranks positive
    assert(df.filter(col("rank_scaled") <= 0).count() == 0)
  }

  test("pagerank: high-degree nodes outrank low-degree nodes on average") {
    val df = MrCore.mrPagerank(spark, sf)
    val suppliers = df.filter(col("node") >= 1000000L)
    val customers = df.filter(col("node") < 1000000L)
    // few suppliers absorb many edges -> mean supplier rank far higher
    val sAvg = suppliers.agg(avg("rank_scaled")).collect()(0).getDouble(0)
    val cAvg = customers.agg(avg("rank_scaled")).collect()(0).getDouble(0)
    assert(sAvg > cAvg * 2, s"supplier avg $sAvg vs customer avg $cAvg")
  }

  test("kmeans: every vector accounted for, centroids finite") {
    val df = Similarity.annKmeans(spark, sf).collect()
    val total = df.map(_.getLong(1)).sum
    assert(total == Tables.embeddings(spark, sf).count())
    assert(df.forall(r => !r.getDouble(2).isNaN && r.getDouble(2) > 0))
  }
}
