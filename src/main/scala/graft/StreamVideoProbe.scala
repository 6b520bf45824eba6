package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stream-side video band-width A/B (round 18 — VERDICT r17 #1): the
  * batch video near-dup moved to the 5-band agree-2 wide postings on
  * a measured A/B (`graft.VideoBandProbe`, SCALING.md round-17), but
  * the stream head kept the narrow 4×16 bands on an UNMEASURED "2.5×
  * state records" scaladoc estimate. This main measures the actual
  * ingest-time trade on the saturating corpus, both sides driven
  * through the SAME `StreamingJobs.videoDupStream` state machine:
  *
  *  - **state**: post-feed `numRowsTotal` (bucket records) and
  *    `memoryUsedBytes` from the streaming progress — the narrow key
  *    space is bounded at 4 × 2¹⁶ = 262,144 buckets by construction,
  *    the wide one grows with distinct frame signatures;
  *  - **recall**: planted re-encode pairs (2k, 2k+1), both members
  *    present, counted found iff some emitted row links the two —
  *    the stream can lose a pair two ways the batch side cannot:
  *    the bucket cap stops matching in a saturated bucket, and a
  *    COLLISION canonical (band-equal, hash-distant, lower doc_id)
  *    displaces the genuine partner comparison;
  *  - **throughput**: wall seconds over the timed batches (first
  *    chunk untimed — codegen + state-store open, the bench's
  *    warmup discipline).
  *
  * Sides: narrow at the shipped cap, narrow uncapped (isolates
  * cap-loss from canonical displacement), wide at the shipped cap,
  * and wide RESTARTED AGAINST a half-corpus snapshot index
  * ([[graft.streaming.StreamingJobs.videoDupStreamAgainstIndex]]) —
  * the compaction path's state bound (store holds only
  * since-snapshot buckets) and tail-pair recall, measured.
  *
  * Usage: `tools/run_main.sh graft.StreamVideoProbe <sfDir> [cap]` */
object StreamVideoProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cap = args.lift(1).map(_.toLong).getOrElse(4096L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // signature map runs OUTSIDE the measured region (it is stateless
    // and identical on both sides); the feed is arrival-ordered by
    // (doc_id, frame_no) like a crawl ingest
    val hashes = operators.Multimodal.demuxFrameHashes(
        operators.Multimodal.syntheticClips(spark, sfDir))
      .collect().toSeq.sortBy(h => (h.doc_id, h.frame_no))
    val present = hashes.iterator.map(_.doc_id).toSet
    val planted = present.iterator
      .filter(d => d % 2 == 0 && present.contains(d + 1))
      .map(d => (d, d + 1)).toSeq.sorted
    println(s"""{"probe":"stream_video_corpus","frames":${hashes.size},""" +
      s""""docs":${present.size},"planted_pairs":${planted.size},"cap":$cap}""")
    val plantedDf = planted.toDF("a", "b")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    plantedDf.count()

    def side(name: String, wide: Boolean, bucketCap: Long): Unit = {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      val outDir = java.nio.file.Files.createTempDirectory(s"svp-$name").toString
      val ckpt = java.nio.file.Files.createTempDirectory(s"svp-ck-$name").toString
      var q: org.apache.spark.sql.streaming.StreamingQuery = null
      try {
        val in = MemoryStream[operators.Multimodal.FrameHash](spark)
        q = graft.streaming.StreamingJobs
          .videoDupStream(in.toDS(), bucketCap = bucketCap, wide = wide)
          .writeStream.format("parquet")
          .option("path", outDir)
          .option("checkpointLocation", ckpt)
          .outputMode("append")
          .start()
        val chunks = hashes.grouped(math.max(1, hashes.size / 10)).toSeq
        in.addData(chunks.head); q.processAllAvailable() // untimed warmup
        val timed = chunks.tail
        val t0 = System.nanoTime()
        timed.foreach { c => in.addData(c); q.processAllAvailable() }
        val dt = (System.nanoTime() - t0) / 1e9
        val prog = Option(q.lastProgress).toSeq.flatMap(_.stateOperators)
        val stateRows = prog.map(_.numRowsTotal).sum
        val stateBytes = prog.map(_.memoryUsedBytes).sum
        q.stop(); q = null
        val out = spark.read.parquet(outDir)
        val pairsFound = out
          .select(least(col("doc_id"), col("dup_of")).as("a"),
            greatest(col("doc_id"), col("dup_of")).as("b"))
          .distinct()
          .join(plantedDf, Seq("a", "b"), "left_semi")
          .count()
        val emitted = out.count()
        val nTimed = timed.map(_.size).sum
        println(s"""{"probe":"stream_video_ab","side":"$name",""" +
          s""""cap":$bucketCap,"state_rows":$stateRows,""" +
          s""""state_bytes":$stateBytes,"emitted":$emitted,""" +
          s""""pairs_found":$pairsFound,"pairs_total":${planted.size},""" +
          s""""recall":${"%.4f".format(
            if (planted.isEmpty) 1.0 else pairsFound.toDouble / planted.size)},""" +
          s""""sec":${"%.2f".format(dt)},""" +
          s""""rows_per_sec":${"%.0f".format(if (dt > 0) nTimed / dt else 0.0)}}""")
      } finally {
        if (q != null) { try q.stop() catch { case _: Throwable => () } }
        def rm(p: String): Unit = {
          import scala.jdk.CollectionConverters._
          val root = java.nio.file.Paths.get(p)
          if (java.nio.file.Files.exists(root))
            java.nio.file.Files.walk(root).iterator().asScala.toSeq
              .sortBy(-_.getNameCount)
              .foreach(java.nio.file.Files.deleteIfExists(_))
        }
        rm(outDir); rm(ckpt)
      }
    }

    // optional side filter (arg 3, comma-separated side names) so a
    // re-measurement of one side doesn't re-pay the others' feeds
    val sides = args.lift(2).map(_.split(",").toSet)
      .getOrElse(Set("narrow_4x16", "narrow_uncapped", "wide_5c2x25",
        "wide_compacted"))
    if (sides("narrow_4x16")) side("narrow_4x16", wide = false, bucketCap = cap)
    if (sides("narrow_uncapped"))
      side("narrow_uncapped", wide = false, bucketCap = Long.MaxValue)
    if (sides("wide_5c2x25")) side("wide_5c2x25", wide = true, bucketCap = cap)

    if (sides("wide_compacted")) {
    // ---- wide + compaction: snapshot the history half into the frame
    // index, restart the stream against it (videoDupStreamAgainstIndex).
    // The claim under test is the state bound — the restarted store
    // must hold ONLY since-snapshot buckets, so its row count should
    // read as "wide minus history buckets", while recall on every pair
    // the restarted stream is RESPONSIBLE for (later member in the
    // tail; both-in-history pairs were emitted pre-snapshot) matches
    // the uninterrupted wide head. The snapshot build itself is the
    // amortized batch compaction and runs untimed.
    {
      val split = {
        val ds = hashes.map(_.doc_id).distinct.sorted
        ds(ds.size / 2)
      }
      val hist = hashes.filter(_.doc_id < split)
      val tail = hashes.filter(_.doc_id >= split)
      val plantedTail = planted.filter(_._2 >= split)
      val plantedTailDf = plantedTail.toDF("a", "b")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      plantedTailDf.count()
      val idxDir = java.nio.file.Files.createTempDirectory("svp-idx").toString
      operators.Multimodal.writeFrameIndex(hist.toDS(), idxDir, wide = true)
      val index = sources.ManifestTable.read(spark, idxDir)
      val idxRows = index.count()
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      val outDir = java.nio.file.Files.createTempDirectory("svp-compact").toString
      val ckpt = java.nio.file.Files.createTempDirectory("svp-ck-compact").toString
      var q: org.apache.spark.sql.streaming.StreamingQuery = null
      try {
        val in = MemoryStream[operators.Multimodal.FrameHash](spark)
        q = graft.streaming.StreamingJobs
          .videoDupStreamAgainstIndex(in.toDS(), index, bucketCap = cap,
            wide = true)
          .writeStream.format("parquet")
          .option("path", outDir)
          .option("checkpointLocation", ckpt)
          .outputMode("append")
          .start()
        val chunks = tail.grouped(math.max(1, tail.size / 10)).toSeq
        in.addData(chunks.head); q.processAllAvailable() // untimed warmup
        val timed = chunks.tail
        val t0 = System.nanoTime()
        timed.foreach { c => in.addData(c); q.processAllAvailable() }
        val dt = (System.nanoTime() - t0) / 1e9
        val prog = Option(q.lastProgress).toSeq.flatMap(_.stateOperators)
        val stateRows = prog.map(_.numRowsTotal).sum
        val stateBytes = prog.map(_.memoryUsedBytes).sum
        q.stop(); q = null
        val out = spark.read.parquet(outDir)
        val pairsFound = out
          .select(least(col("doc_id"), col("dup_of")).as("a"),
            greatest(col("doc_id"), col("dup_of")).as("b"))
          .distinct()
          .join(plantedTailDf, Seq("a", "b"), "left_semi")
          .count()
        val emitted = out.count()
        val nTimed = timed.map(_.size).sum
        println(s"""{"probe":"stream_video_ab","side":"wide_compacted",""" +
          s""""cap":$cap,"split":$split,"index_rows":$idxRows,""" +
          s""""state_rows":$stateRows,"state_bytes":$stateBytes,""" +
          s""""emitted":$emitted,"pairs_found":$pairsFound,""" +
          s""""pairs_total":${plantedTail.size},""" +
          s""""recall":${"%.4f".format(
            if (plantedTail.isEmpty) 1.0
            else pairsFound.toDouble / plantedTail.size)},""" +
          s""""sec":${"%.2f".format(dt)},""" +
          s""""rows_per_sec":${"%.0f".format(if (dt > 0) nTimed / dt else 0.0)}}""")
      } finally {
        if (q != null) { try q.stop() catch { case _: Throwable => () } }
        def rm(p: String): Unit = {
          import scala.jdk.CollectionConverters._
          val root = java.nio.file.Paths.get(p)
          if (java.nio.file.Files.exists(root))
            java.nio.file.Files.walk(root).iterator().asScala.toSeq
              .sortBy(-_.getNameCount)
              .foreach(java.nio.file.Files.deleteIfExists(_))
        }
        rm(outDir); rm(ckpt); rm(idxDir)
        plantedTailDf.unpersist(blocking = true)
      }
    }
    }
    plantedDf.unpersist(blocking = true)
    spark.stop()
  }
}
