package graft.probe2
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

object StreamCostProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.build(cores = 32, master = Some("local[32]"))
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val sfDir = "/root/testdata/sf0.1"
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
      .orderBy(col("doc_id")).limit(20000)
      .as[(Long, String)].collect().toSeq
    val evalNgrams = graft.operators.Pipelines
      .fivegrams(docs.filter(_._1 < 20).toDF("doc_id", "text"))
      .select(col("s").as("es"), col("doc_id").as("eval_doc")).distinct()
      .persist()
    evalNgrams.count()
    spark.conf.set("spark.sql.shuffle.partitions", 8)
    val ckpt = java.nio.file.Files.createTempDirectory("probe-dec").toString
    val in = MemoryStream[(Long, String)](spark)
    val q = graft.streaming.StreamingJobs
      .decontaminateStream(in.toDS().toDF("doc_id", "text"), evalNgrams)
      .writeStream.format("noop").option("checkpointLocation", ckpt)
      .outputMode("append").start()
    val chunks = docs.grouped(2000).toSeq
    for ((c, i) <- chunks.zipWithIndex) {
      val t0 = System.nanoTime()
      in.addData(c); q.processAllAvailable()
      val wall = (System.nanoTime() - t0) / 1e6
      val p = q.lastProgress
      println(f"PROBE batch=$i wall=${wall}%.0fms durations=${p.durationMs}")
    }
    q.stop()
    // ---- curate head ----
    val curateDocs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("text"))
      .orderBy(col("doc_id")).limit(20000)
      .as[(Long, String, String)].collect().toSeq.zipWithIndex
      .map { case ((id, src, txt), i) =>
        graft.streaming.StreamingJobs.CurateIn(src, i.toLong, id, txt) }
    val ckpt2 = java.nio.file.Files.createTempDirectory("probe-cur").toString
    val in2 = MemoryStream[graft.streaming.StreamingJobs.CurateIn](spark)
    val q2 = graft.streaming.StreamingJobs.curateStream(in2.toDS(), 200)
      .writeStream.format("noop").option("checkpointLocation", ckpt2)
      .outputMode("append").start()
    for ((c, i) <- curateDocs.grouped(2000).toSeq.zipWithIndex) {
      val t0 = System.nanoTime()
      in2.addData(c); q2.processAllAvailable()
      val wall = (System.nanoTime() - t0) / 1e6
      println(f"PROBE curate batch=$i wall=${wall}%.0fms durations=${q2.lastProgress.durationMs}")
    }
    q2.stop()
    // gate-only batch twin of one 2000-doc chunk (the stateless part)
    for (t <- 1 to 3) {
      val c = curateDocs.take(2000)
      val t0 = System.nanoTime()
      c.toDF().filter(graft.operators.TextAnalysis.qualityKeep)
        .write.format("noop").mode("overwrite").save()
      println(f"PROBE curateGateTwin trial=$t wall=${(System.nanoTime()-t0)/1e6}%.0fms")
    }
    // batch twin of one chunk, warm x3: the floor addBatch cannot beat
    for (t <- 1 to 3) {
      val c = chunks.head
      val t0 = System.nanoTime()
      graft.operators.Pipelines.fivegrams(c.toDF("doc_id", "text"))
        .join(broadcast(evalNgrams), col("s") === col("es"))
        .select(col("doc_id"), col("s").as("ngram"), col("eval_doc"))
        .write.format("noop").mode("overwrite").save()
      println(f"PROBE batchTwin trial=$t wall=${(System.nanoTime()-t0)/1e6}%.0fms")
    }
    spark.stop()
  }
}
