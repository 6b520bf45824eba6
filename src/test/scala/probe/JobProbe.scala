package probe
import org.apache.spark.scheduler._
import scala.collection.mutable

/** Stage-level attribution for one or more registered queries: warm at
  * sf0.01, time at sf0.1, print the slowest stages with task counts and
  * per-stage max/median task skew. Flags serial (1-task) stages. */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val qnames =
      if (args.isEmpty) Seq("dedup_containment_exact") else args.toSeq.flatMap(_.split(","))
    // mirror graft.Bench's session confs exactly, so stage shapes match
    // the benched plans (notably the 16m input split of the ~MB parquet)
    sys.props("spark.sql.files.maxPartitionBytes") = "16m"
    sys.props("spark.ui.enabled") = "false"
    val spark = graft.GraftSession.build(cores = 32, master = Some("local[32]"))
    spark.sparkContext.setLogLevel("ERROR")
    case class St(id: Int, sec: Double, tasks: Int, maxTask: Double, name: String)
    val stages = mutable.ArrayBuffer[St]()
    val taskMax = mutable.Map[Int, Double]()
    val taskRecs = mutable.Map[Int, (Long, Long, Long)]() // (sumIn, maxIn, sumOut)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = if (t.taskInfo != null) {
        val d = t.taskInfo.duration / 1e3
        taskMax.updateWith(t.stageId)(p => Some(math.max(p.getOrElse(0.0), d)))
        if (t.taskMetrics != null) {
          val recs = t.taskMetrics.shuffleReadMetrics.recordsRead +
            t.taskMetrics.inputMetrics.recordsRead
          val out = t.taskMetrics.shuffleWriteMetrics.recordsWritten +
            t.taskMetrics.outputMetrics.recordsWritten
          val p = taskRecs.getOrElseUpdate(t.stageId, (0L, 0L, 0L))
          taskRecs(t.stageId) = (p._1 + recs, math.max(p._2, recs), p._3 + out)
        }
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val si = s.stageInfo
        stages += St(si.stageId,
          (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1e3,
          si.numTasks, taskMax.getOrElse(si.stageId, 0.0), si.name.take(70))
      }
    })
    for (q <- qnames) {
      val fn = graft.SparkEntry.queries(q)
      fn(spark, "/root/testdata/sf0.01").write.format("noop").mode("overwrite").save()
      graft.CacheHygiene.sweep(spark, blocking = true)
      stages.clear(); taskMax.clear(); taskRecs.clear()
      val t0 = System.nanoTime()
      fn(spark, "/root/testdata/sf0.1").write.format("noop").mode("overwrite").save()
      val total = (System.nanoTime() - t0) / 1e9
      graft.CacheHygiene.sweep(spark, blocking = true)
      Thread.sleep(300)
      val snap = stages.toVector
      val stageSum = snap.map(_.sec).sum
      println(f"PROBE ===== $q total=$total%.2f nstages=${snap.size} stage-sum=$stageSum%.2f")
      snap.sortBy(-_.sec).take(10).foreach { s =>
        val flag = if (s.tasks == 1 && s.sec > 0.2) " SERIAL" else
          if (s.maxTask > 0 && s.sec > 0.3 && s.maxTask > 0.7 * s.sec && s.tasks > 4) " STRAGGLER" else ""
        val (si, mi, so) = taskRecs.getOrElse(s.id, (0L, 0L, 0L))
        println(f"PROBE   stage ${s.id}%4d ${s.sec}%6.2f s tasks=${s.tasks}%4d maxTask=${s.maxTask}%5.2f$flag in=$si%,d maxTaskIn=$mi%,d out=$so%,d  ${s.name.take(40)}")
      }
    }
    spark.stop()
  }
}
