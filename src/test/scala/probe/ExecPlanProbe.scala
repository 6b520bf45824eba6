package probe

/** Print the FINAL (post-AQE) executed plan of a registered query at
  * sf0.1 — run the action first, then read executedPlan. */
object ExecPlanProbe {
  def main(args: Array[String]): Unit = {
    sys.props("spark.sql.files.maxPartitionBytes") = "16m"
    sys.props("spark.ui.enabled") = "false"
    val spark = graft.GraftSession.build(cores = 32, master = Some("local[32]"))
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- args.toSeq.flatMap(_.split(","))) {
      val df = graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.1")
      df.write.format("noop").mode("overwrite").save()
      println(s"PROBEPLAN ===== $q")
      println(df.queryExecution.executedPlan.toString.take(12000))
      graft.CacheHygiene.sweep(spark, blocking = true)
    }
    spark.stop()
  }
}
