package graft

import org.apache.spark.sql.SparkSession

/** Recommended session builder: graft extensions + the configuration
  * defaults the library is tuned for. `cores` is local-mode
  * parallelism; on a real cluster pass `master = None` and submit
  * normally (spark-submit --conf spark.sql.extensions=graft.GraftExtensions).
  */
object GraftSession {
  def build(
      cores: Int = Runtime.getRuntime.availableProcessors(),
      appName: String = "graft",
      master: Option[String] = None): SparkSession = {
    val b = SparkSession.builder()
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new GraftExtensions)
    val s = master.orElse(Some(s"local[$cores]")).fold(b)(b.master).getOrCreate()
    graft.plans.AsOf.register(s)
    s
  }
}
