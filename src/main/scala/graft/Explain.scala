package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump the formatted physical plan of one or all queries.
  * `runMain graft.Explain [sfDir] [queryName]` */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val only = if (args.length > 1) Some(args(1)) else None
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.allDefs
      .filter(d => only.forall(_ == d.name))
      .foreach { d =>
        println(s"\n===================== ${d.name} =====================")
        println(d.run(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      }
    spark.stop()
  }
}
