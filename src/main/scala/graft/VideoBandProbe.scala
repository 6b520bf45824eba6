package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Video band-WIDTH A/B (round 17 — VERDICT r16 #5): the r16
  * calibration showed the 4×16-bit video band space SATURATING (hot
  * df 1,664 → 15,398 across one sf decade) and genuine planted pairs
  * riding df-(504, 1024] bands — so a df cap prices recall (the
  * measured 6% loss at cap 504). The OTHER lever against saturation
  * is key width: the 5-band agree-2 subset postings
  * ([[graft.operators.Multimodal.frameBandPostingsWide]], ~2²⁵-bucket
  * keys for a 10/4 explode step) attack the hot buckets without
  * trading recall. This main measures both sides on the same corpus:
  *
  *  - df profile of each posting set ([[graft.operators.Calibration
  *    .capProfile]] at a 32-pairs/posting budget): max df, the
  *    calibrated cap, how much pair mass each cap refuses;
  *  - planted-pair recall of each posting set at the caps of record
  *    ({calibrated, 504, 1024}) via [[graft.operators.Calibration
  *    .recallAtCaps]] (labeled pairs = the synthetic corpus's
  *    (2k, 2k+1) re-encode pairs, both members required present);
  *  - wall seconds of the full [[graft.operators.Multimodal
  *    .videoDupStats]] vs [[graft.operators.Multimodal
  *    .videoDupStatsWide]] consumer at the shipped cap.
  *
  * Usage: `tools/run_main.sh graft.VideoBandProbe <sfDir> [caps,...]`
  */
object VideoBandProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val extraCaps: Seq[Long] =
      args.lift(1).map(_.split(",").toSeq.map(_.toLong)).getOrElse(Seq(504L, 1024L))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import spark.implicits._
    val clips = operators.Multimodal.syntheticClips(spark, sfDir)
    val hashes = operators.Multimodal.demuxFrameHashes(clips)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val fh = hashes.toDF("doc_id", "frame_no", "phash")
    // labeled planted pairs: (2k, 2k+1) is the same clip re-encoded;
    // both members must exist (the Calibrate parity-gap fix)
    val ids = Tables.documents(spark, sfDir).select(col("doc_id"))
    val labeled = ids
      .select((col("doc_id") - (col("doc_id") % 2)).as("doc_a"),
        (col("doc_id") - (col("doc_id") % 2) + 1).as("doc_b"))
      .distinct()
      .join(ids.select(col("doc_id").as("doc_a")), Seq("doc_a"), "left_semi")
      .join(ids.select(col("doc_id").as("doc_b")), Seq("doc_b"), "left_semi")

    def side(name: String, postings0: org.apache.spark.sql.DataFrame): Unit = {
      val postings = postings0
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val p = postings.count()
        val prof = operators.Calibration.capProfile(
          postings, Seq("band", "bv"), math.max(1L, 32L * p))
        println(s"""{"probe":"video_bands","side":"$name","postings":$p,""" +
          s""""recommended_cap":${prof.recommendedCap},""" +
          s""""kept_pair_mass":${prof.keptPairMass},""" +
          s""""dropped_pair_mass":${prof.droppedPairMass},""" +
          s""""total_pair_mass":${prof.totalPairMass},""" +
          s""""max_df":${prof.maxDf}}""")
        val caps = (prof.recommendedCap +: extraCaps).distinct
        operators.Calibration.recallAtCaps(postings, Seq("band", "bv"),
            "doc_id", labeled, caps).foreach { r =>
          println(s"""{"probe":"video_recall","side":"$name","cap":${r.cap},""" +
            s""""retained":${r.retainedPairs},"total":${r.totalPairs},""" +
            s""""recall":${"%.4f".format(r.recall)}}""")
        }
      } finally {
        postings.unpersist(blocking = true)
      }
    }
    side("narrow_4x16", operators.Multimodal.frameBandPostings(fh))
    side("wide_5c2x25", operators.Multimodal.frameBandPostingsWide(fh))

    // consumer wall time at the shipped cap, min-of-2 per side.
    // ADVICE r17: the post-side sweep unpersists EVERYTHING including
    // the shared `hashes` persist, so without re-materializing it the
    // second side would re-pay the PNG demux/decode inside its timed
    // runs (the r17 A/B was biased against wide by exactly that cost).
    // Re-persist + count() after each sweep so both sides time the
    // consumer over equally-warm frame hashes.
    def time(name: String,
        run: () => org.apache.spark.sql.DataFrame): Unit = {
      if (hashes.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
        hashes.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      hashes.count() // warm before the clock starts
      val secs = (0 until 2).map { _ =>
        val t0 = System.nanoTime()
        val n = run().count()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      CacheHygiene.sweep(spark, blocking = true)
      println(s"""{"probe":"video_time","side":"$name",""" +
        s""""sec_min_of_2":${"%.2f".format(secs.map(_._1).min)},""" +
        s""""rows":${secs.head._2}}""")
    }
    time("narrow_4x16",
      () => operators.Multimodal.videoDupStats(hashes))
    time("wide_5c2x25",
      () => operators.Multimodal.videoDupStatsWide(hashes))

    hashes.unpersist(blocking = true)
    spark.stop()
  }
}
