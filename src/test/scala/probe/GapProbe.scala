package probe
import org.apache.spark.scheduler._
import scala.collection.mutable

/** Job-level attribution: per-job wall time plus the DRIVER GAPS
  * between consecutive jobs (planning, collect post-processing,
  * expression building) — the time no job is running. */
object GapProbe {
  def main(args: Array[String]): Unit = {
    val qnames =
      if (args.isEmpty) Seq("ann_ivfpq") else args.toSeq.flatMap(_.split(","))
    sys.props("spark.sql.files.maxPartitionBytes") = "16m"
    sys.props("spark.ui.enabled") = "false"
    val spark = graft.GraftSession.build(cores = 32, master = Some("local[32]"))
    spark.sparkContext.setLogLevel("ERROR")
    case class J(id: Int, start: Long, end: Long)
    val jobs = mutable.ArrayBuffer[J]()
    val starts = mutable.Map[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts(j.jobId) = System.nanoTime()
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        starts.remove(j.jobId).foreach(t0 => jobs += J(j.jobId, t0, System.nanoTime()))
    })
    for (q <- qnames) {
      val fn = graft.SparkEntry.queries(q)
      fn(spark, "/root/testdata/sf0.01").write.format("noop").mode("overwrite").save()
      graft.CacheHygiene.sweep(spark, blocking = true)
      jobs.clear()
      val t0 = System.nanoTime()
      fn(spark, "/root/testdata/sf0.1").write.format("noop").mode("overwrite").save()
      val tEnd = System.nanoTime()
      graft.CacheHygiene.sweep(spark, blocking = true)
      Thread.sleep(200)
      val total = (tEnd - t0) / 1e9
      val js = jobs.sortBy(_.start).toVector
      val jobSum = js.map(j => (j.end - j.start) / 1e9).sum
      // gap before each job = its start minus max(end of all prior jobs, t0)
      var cursor = t0
      var gapSum = 0.0
      val lines = js.map { j =>
        val gap = math.max(0L, j.start - cursor) / 1e9
        gapSum += gap
        cursor = math.max(cursor, j.end)
        f"PROBE   job ${j.id}%4d gapBefore=$gap%6.3f run=${(j.end - j.start) / 1e9}%6.3f"
      }
      val tailGap = math.max(0L, tEnd - cursor) / 1e9
      println(f"PROBE ===== $q total=$total%.2f njobs=${js.size} jobSum=$jobSum%.2f gapSum=$gapSum%.2f tailGap=$tailGap%.3f")
      lines.foreach(println)
    }
    spark.stop()
  }
}
