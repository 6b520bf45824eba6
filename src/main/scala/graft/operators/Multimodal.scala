package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Multimodal column plumbing (SURVEY.md §2 G): media as opaque
  * `binary` columns + typed metadata structs.
  *
  * The Spark-side shape is real — binary payloads, per-partition
  * batch decode, typed output schema, partition-friendly keys. The
  * decode kernel itself is a clearly-marked deterministic STUB
  * (`fakeDecode`): this container ships no image/audio codecs, so the
  * stub derives metadata from the payload bytes. Swapping in a real
  * codec (javax.imageio / ffmpeg via a mapPartitions JNI bridge)
  * changes only that one function.
  *
  * At 100 TB: payloads live in the parquet as binary chunks;
  * `decodeBatch` is a narrow per-partition map (no shuffle), so
  * decode scales with input splits. Keep
  * `spark.sql.files.maxPartitionBytes` sized so one task's payload
  * batch fits executor memory.
  */
object Multimodal {

  /** A media row: opaque payload + its id. */
  case class RawMedia(doc_id: Long, payload: Array[Byte])

  /** Typed decode output (what a real codec would fill). */
  case class DecodedMedia(
      doc_id: Long, width: Int, height: Int, channels: Int, n_bytes: Long)

  /** STUB decode kernel — deterministic fake in place of a codec.
    * Metadata is a pure function of the payload so tests are stable. */
  def fakeDecode(m: RawMedia): DecodedMedia = {
    val n = m.payload.length.toLong
    DecodedMedia(
      doc_id = m.doc_id,
      width = (n % 64).toInt + 16,
      height = (m.doc_id % 64).toInt + 16,
      channels = 3,
      n_bytes = n)
  }

  /** Per-partition batch decode: the real plumbing (narrow map, typed
    * output, no driver involvement). */
  def decodeBatch(ds: Dataset[RawMedia]): Dataset[DecodedMedia] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map(fakeDecode))
  }

  /** Resize output: same id, target dims, payload proportionally
    * truncated — STUB for a real scaler kernel. The signature (typed
    * in/out, per-partition batches, pure function of the row) is what
    * a production resize keeps. */
  case class ResizedMedia(doc_id: Long, width: Int, height: Int, payload: Array[Byte])

  def resizeBatch(ds: Dataset[RawMedia], w: Int, h: Int): Dataset[ResizedMedia] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map { m =>
      // STUB: real kernel = image decode + interpolation; fake keeps a
      // deterministic byte-proportional slice so sizes track w*h
      val n = math.min(m.payload.length, math.max(1, (w * h) / 64))
      ResizedMedia(m.doc_id, w, h, m.payload.take(n))
    })
  }

  /** Frame sampling for video-like payloads: every `stride`-th chunk
    * of the payload as one "frame" — STUB for a real demuxer; shape
    * (one input row → many typed frame rows via flatMap) is real. */
  case class Frame(doc_id: Long, frame_no: Int, n_bytes: Long)

  def sampleFrames(ds: Dataset[RawMedia], chunk: Int, stride: Int): Dataset[Frame] = {
    import ds.sparkSession.implicits._
    ds.flatMap { m =>
      val nChunks = math.max(1, m.payload.length / math.max(1, chunk))
      (0 until nChunks by stride).map { i =>
        val start = i * chunk
        val len = math.min(chunk, m.payload.length - start).max(0)
        Frame(m.doc_id, i, len.toLong)
      }
    }
  }

  /** Feature extraction over opaque payloads — NOT a stub: a 16-bin
    * byte histogram (normalized to an `Array[Float]`) plus Shannon
    * entropy is computable without any codec and is a real, useful
    * media feature (entropy separates compressed/encrypted payloads
    * from text; the histogram is a cheap content signature). The
    * output embedding column feeds the ANN/dedup operators directly —
    * the multimodal→similarity bridge of the pipeline. Narrow
    * per-partition map, typed output, no shuffle. */
  case class MediaFeatures(
      doc_id: Long, n_bytes: Long, byte_hist: Array[Float], entropy: Double)

  def featureBatch(ds: Dataset[RawMedia]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map { m =>
      val counts = new Array[Long](16)
      m.payload.foreach(b => counts((b & 0xff) >> 4) += 1)
      val n = m.payload.length.toLong
      val hist =
        if (n == 0) new Array[Float](16)
        else counts.map(c => (c.toDouble / n).toFloat)
      val entropy =
        if (n == 0) 0.0
        else -counts.filter(_ > 0).map { c =>
          val p = c.toDouble / n; p * math.log(p) / math.log(2)
        }.sum
      MediaFeatures(m.doc_id, n, hist, entropy)
    })
  }

  /** Documents' text bytes as the stand-in binary payload column. */
  def asBinary(spark: SparkSession, dir: String): Dataset[RawMedia] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[RawMedia]
  }

  // ---------------------------------------------------------------- query
  /** Oracle-checked binary metadata pipeline: byte length, content
    * digest, and the stub decode's metadata (SQL-expressible so both
    * engines agree; `decodeBatch` is the typed API for the same). */
  def mmBinaryMeta(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        octet_length(col("text")).cast("long").as("n_bytes"),
        sha2(col("text").cast("binary"), 256).as("sha"),
        (pmod(octet_length(col("text")).cast("long"), lit(64)) + 16).cast("int").as("width"),
        (pmod(col("doc_id"), lit(64)) + 16).cast("int").as("height"),
        lit(3).as("channels"))
      .orderBy(col("doc_id"))

  private val mmBinaryMetaSql =
    """SELECT doc_id,
      |  cast(octet_length(cast(text as blob)) as bigint) AS n_bytes,
      |  sha256(text) AS sha,
      |  cast(octet_length(cast(text as blob)) % 64 + 16 as int) AS width,
      |  cast(doc_id % 64 + 16 as int) AS height,
      |  3 AS channels
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- frame sample
  /** Oracle-checked twin of the typed `sampleFrames` API (chunk=64,
    * stride=2): the one-row→many-frames multimodal shape, expressed
    * declaratively (`sequence` + `explode` — stays in codegen) so
    * DuckDB can check it. MultimodalSpec proves the typed flatMap
    * API produces exactly these rows. */
  def mmFrameSample(spark: SparkSession, dir: String): DataFrame = {
    val (chunk, stride) = (64, 2)
    Tables.documents(spark, dir)
      .select(col("doc_id"), octet_length(col("text")).cast("long").as("len"))
      .withColumn("n_chunks", greatest(expr(s"len div $chunk"), lit(1L)))
      .select(col("doc_id"), col("len"),
        explode(expr(s"sequence(0L, n_chunks - 1, $stride)")).as("frame_no"))
      .select(
        col("doc_id"),
        col("frame_no").cast("int").as("frame_no"),
        greatest(least(lit(chunk.toLong), col("len") - col("frame_no") * chunk),
          lit(0L)).as("n_bytes"))
      .orderBy(col("doc_id"), col("frame_no"))
  }

  private val mmFrameSampleSql =
    """WITH d AS (
      |  SELECT doc_id, cast(octet_length(cast(text as blob)) as bigint) AS len
      |  FROM documents),
      |f AS (
      |  SELECT doc_id, len,
      |    unnest(range(0, greatest(len // 64, 1), 2)) AS frame_no
      |  FROM d)
      |SELECT doc_id, cast(frame_no as int) AS frame_no,
      |  cast(greatest(least(64, len - frame_no * 64), 0) as bigint) AS n_bytes
      |FROM f ORDER BY doc_id, frame_no""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("mm_binary_meta", mmBinaryMeta _, Some(mmBinaryMetaSql)),
    QueryDef("mm_frame_sample", mmFrameSample _, Some(mmFrameSampleSql)))
}
