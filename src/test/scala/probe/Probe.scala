import org.apache.spark.sql.functions._

object Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.build(cores = 32, master = Some("local[32]"))
    val dir = "/root/testdata/sf0.1"
    import graft.functions.CrossEngine.md5Long
    val votes = (0 until 60).map { b =>
      s"(CASE WHEN aggregate(th, 0, (acc, h) -> acc + CASE WHEN shiftright(h, $b) % 2 = 1 THEN 1 ELSE -1 END) > 0 THEN ${1L << b}L ELSE 0L END)"
    }.mkString(" + ")
    def sigf() = graft.Tables.documents(spark, dir)
      .filter(col("text").rlike("\\S"))
      .select(col("doc_id"), col("lang"), array_distinct(
        filter(split(col("text"), "\\s+"), t => t =!= "")).as("t"))
      .withColumn("th", transform(col("t"), tok => md5Long(tok)))
      .select(col("doc_id"), col("lang").as("block"), expr(votes).as("sh"))
    // warm
    sigf().count()
    val sig = sigf().persist()
    var t = System.nanoTime()
    val n = sig.count()
    println("PROBE materialize=" + (System.nanoTime()-t)/1e9 + " n=" + n)
    t = System.nanoTime()
    val choice = graft.operators.Dedup.chooseBandingConfig(sig, 60, 4)
    println("PROBE choose=" + (System.nanoTime()-t)/1e9 + " " + choice)
    t = System.nanoTime()
    graft.operators.Dedup.bandedHammingPairs(sig, 60, 5, 4).write.format("noop").mode("overwrite").save()
    println("PROBE join=" + (System.nanoTime()-t)/1e9)
    spark.stop()
  }
}
