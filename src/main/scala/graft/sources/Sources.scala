package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** Source/sink surface (SURVEY.md §2 I): parquet (primary), CSV,
  * JSON, text, with partitioned writes.
  *
  * The reference reads whole text files per map task
  * (mr/src/worker.rs:105-119) and writes JSON intermediate files;
  * here the equivalents are `readText`/`graft.mr.MapReduce
  * .wholeTextFiles` for input and columnar parquet (+ `partitionBy`
  * layout) for output — at 100 TB, partitioned parquet is what makes
  * downstream partition pruning possible.
  */
object Sources {

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def readCsv(spark: SparkSession, path: String,
      schema: Option[StructType] = None, header: Boolean = true): DataFrame = {
    val r = spark.read.option("header", header.toString)
    schema.fold(r.option("inferSchema", "true"))(r.schema).csv(path)
  }

  def readJson(spark: SparkSession, path: String,
      schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
    schema.fold(r)(r.schema).json(path)
  }

  def readText(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)

  /** Lenient JSON ingest for dirty corpora: malformed lines land in
    * `_corrupt_record` instead of failing the job (PERMISSIVE), so a
    * 100 TB crawl ingest quarantines bad records with a filter rather
    * than dying at hour nine. Requires an explicit schema — Spark
    * drops the corrupt-record column during inference. */
  def readJsonLenient(spark: SparkSession, path: String,
      schema: StructType): DataFrame = {
    val withCorrupt = schema.add("_corrupt_record", "string")
    spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(withCorrupt)
      .json(path)
  }

  /** Parquet read across schema-evolved file generations: fields
    * added over time are merged (nulls where absent). The footer
    * merge costs one extra pass over file metadata — only enable it
    * on layouts that actually evolved. */
  def readParquetMerged(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Raw-asset ingest for multimodal corpora: every file under `path`
    * (matching `glob`, e.g. `*.png`) becomes one row of (path,
    * modificationTime, length, content binary) — the scan that feeds
    * the opaque-binary columns [[graft.operators.Multimodal]] decodes.
    * `maxLength` guards the driver and executors against a stray
    * multi-GB file in a crawl dump: longer files fail the scan fast
    * rather than OOMing a task (filter-then-ingest is the 100 TB
    * pattern; set it to the pipeline's documented asset cap). The
    * format is non-splittable by nature (one file = one row), so
    * parallelism = file count — right for asset dirs, wrong for a few
    * giant archives (demux those via the length-prefixed container
    * path instead). */
  def readBinary(spark: SparkSession, path: String,
      glob: String = "*", maxLength: Long = 64L << 20): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(path)
      .filter(col("length") <= maxLength)

  def writeOrc(df: DataFrame, path: String,
      partitionCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .orc(path)
  }

  def writeParquet(df: DataFrame, path: String,
      partitionCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(path)
  }

  def writeCsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", header.toString).csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** Bucketed + sorted managed table: both sides of a recurring join
    * bucketed on the join key join WITHOUT a shuffle (the write
    * pre-pays the exchange once). At 100 TB this is the difference
    * between re-shuffling the fact table on every query and never
    * shuffling it again. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      nBuckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Small-files compaction — the maintenance job every streaming-
    * append layout needs: micro-batch sinks write a file per batch per
    * partition, and a year of 1-minute batches is half a million tiny
    * files whose open/footer cost dominates every later scan. Rewrites
    * the directory to ⌈rows/rowsPerFile⌉ files via a tmp-dir +
    * two-rename swap on the Hadoop `FileSystem` API (same recovery
    * story as the upsert sink, so it works on HDFS/S3A paths, not just
    * the local FS). The swap is NOT atomic: between the two renames
    * the table path is briefly absent, and a crash there leaves the
    * data intact at `path + ".compact-old"` — a re-run detects that
    * state (table missing, backup present) and restores the backup
    * before recompacting, so recovery is automatic. Single-writer
    * assumption, like the upsert sink. Data is row-identical; only
    * the file count changes. At cluster scale run it
    * per-partition-predicate (`WHERE date = X`) so the rewrite is
    * bounded by one partition, not the table. */
  def compactParquet(spark: SparkSession, path: String,
      rowsPerFile: Long): Unit = {
    // crash recovery FIRST: a previous run that died between its two
    // renames left the data at .compact-old and no table dir — reading
    // the table before this check would just throw path-not-found
    locally {
      val dir = new org.apache.hadoop.fs.Path(path)
      val bak = new org.apache.hadoop.fs.Path(path + ".compact-old")
      val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(dir) && fs.exists(bak)) {
        require(fs.rename(bak, dir), s"cannot restore $bak to $path")
      }
    }
    val df = spark.read.parquet(path)
    val n = df.count()
    val files = math.max(1L, (n + rowsPerFile - 1) / rowsPerFile).toInt
    val tmp = new org.apache.hadoop.fs.Path(path + ".compact-tmp")
    df.repartition(files).write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val dir = new org.apache.hadoop.fs.Path(path)
    val bak = new org.apache.hadoop.fs.Path(path + ".compact-old")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(tmp), s"compaction write missing: $tmp")
    if (fs.exists(bak)) fs.delete(bak, true) // stale leftover from a crashed run
    require(fs.rename(dir, bak), s"cannot move $path aside")
    require(fs.rename(tmp, dir), s"cannot swap $tmp into $path")
    fs.delete(bak, true)
  }

  // ---------------------------------------------------------------- z-order
  /** Layout metadata for a z-ordered table: the per-dimension value
    * bounds the writer bucketized against, carried in a `_zmeta.json`
    * sidecar so readers reconstruct the exact same bucket mapping. */
  case class ZMeta(colA: String, colB: String, minA: Double, maxA: Double,
      minB: Double, maxB: Double, bits: Int, prefixBits: Int)

  /** Morton (Z) interleave of two bucket ranks (each in
    * [0, 2^bits)): a's bit i lands at position 2i+1, b's at 2i — a
    * pure integer Column expression (codegen'd, zero shuffle). */
  def zValue(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column,
      bits: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    (0 until bits).map { i =>
      (shiftright(a, i) % 2) * lit(1L << (2 * i + 1)) +
        (shiftright(b, i) % 2) * lit(1L << (2 * i))
    }.reduce(_ + _)
  }

  /** Z-ORDERED parquet layout: rows are bucketized on two numeric
    * dimensions, bit-interleaved into a Morton code, directory-
    * partitioned by the code's top `prefixBits` bits and sorted by
    * the full code within files. Each directory is therefore a
    * RECTANGLE in (a, b) space — the property 1-D layouts lack: a
    * range-partition on `a` alone answers b-constrained queries by
    * scanning everything, while a z-prefix directory set stays small
    * for boxes narrow in EITHER dimension ([[readZBox]] proves it by
    * enumeration + partition pruning). The sort inside each file
    * additionally gives parquet row-group min/max locality on both
    * dims. This is the multi-dimensional member of the layout
    * family: bucketing (equi-join co-location), the manifest table
    * (atomic publish), the IVF index (cluster pruning), z-order
    * (2-D range pruning).
    *
    * Nulls bucket to 0 (kept, not dropped — they land in the lowest
    * cell and every box probe adds an explicit null guard via its
    * residual filter). Bounds are computed here (one 1-row aggregate)
    * and carried in the sidecar. */
  def writeZOrdered(df: DataFrame, path: String, colA: String, colB: String,
      bits: Int = 8, prefixBits: Int = 6): ZMeta = {
    import org.apache.spark.sql.functions._
    require(bits >= 1 && bits <= 20, s"bits out of range: $bits")
    require(prefixBits >= 1 && prefixBits <= 2 * bits,
      s"prefixBits out of range: $prefixBits")
    val b = df.agg(
      min(col(colA).cast("double")), max(col(colA).cast("double")),
      min(col(colB).cast("double")), max(col(colB).cast("double"))).head()
    require(!b.isNullAt(0) && !b.isNullAt(2),
      "z-order needs at least one non-null row per dimension")
    val meta = ZMeta(colA, colB, b.getDouble(0), b.getDouble(1),
      b.getDouble(2), b.getDouble(3), bits, prefixBits)
    def bucket(c: String, lo: Double, hi: Double) = {
      val span = math.max(hi - lo, java.lang.Double.MIN_NORMAL)
      least(lit((1L << bits) - 1), greatest(lit(0L),
        floor((coalesce(col(c).cast("double"), lit(lo)) - lo)
          / span * (1L << bits)).cast("long")))
    }
    val z = zValue(bucket(colA, meta.minA, meta.maxA),
      bucket(colB, meta.minB, meta.maxB), bits)
    df.withColumn("__z", z)
      .withColumn("z_prefix",
        shiftright(col("__z"), 2 * bits - prefixBits).cast("int"))
      .repartition(col("z_prefix"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode(SaveMode.Overwrite).partitionBy("z_prefix").parquet(path)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    // real JSON writer/reader (Jackson ships with Spark): a column
    // name containing a quote, backslash, or regex metacharacter
    // round-trips correctly where the earlier hand-rolled string
    // interpolation + regex extraction could corrupt or mis-parse
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.createObjectNode()
    root.put("colA", meta.colA); root.put("colB", meta.colB)
    root.put("minA", meta.minA); root.put("maxA", meta.maxA)
    root.put("minB", meta.minB); root.put("maxB", meta.maxB)
    root.put("bits", meta.bits); root.put("prefixBits", meta.prefixBits)
    val out = fs.create(new org.apache.hadoop.fs.Path(path, "_zmeta.json"), true)
    out.write(mapper.writeValueAsString(root).getBytes("UTF-8"))
    out.close()
    meta
  }

  private def readZMeta(spark: SparkSession, path: String): ZMeta = {
    val p = new org.apache.hadoop.fs.Path(path, "_zmeta.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val bytes = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
    in.readFully(bytes)
    in.close()
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(new String(bytes, "UTF-8"))
    ZMeta(node.get("colA").asText(), node.get("colB").asText(),
      node.get("minA").asDouble(), node.get("maxA").asDouble(),
      node.get("minB").asDouble(), node.get("maxB").asDouble(),
      node.get("bits").asInt(), node.get("prefixBits").asInt())
  }

  /** Box query over a z-ordered layout: enumerate the 2^prefixBits
    * z-prefix cells DRIVER-SIDE (each decodes to a rectangle in
    * bucket space — de-interleave the prefix, the remaining low bits
    * span the rest of the cell), keep only cells intersecting the
    * query box, and read with an IN partition filter (directory
    * pruning — the plan's PartitionFilters) plus the exact residual
    * range filter. Returns (frame, cellsRead, cellsTotal) so callers
    * and the spec can see the pruning ratio. */
  def readZBox(spark: SparkSession, path: String,
      loA: Double, hiA: Double, loB: Double, hiB: Double)
      : (DataFrame, Int, Int) = {
    import org.apache.spark.sql.functions._
    val m = readZMeta(spark, path)
    def bucketOf(v: Double, lo: Double, hi: Double): Long = {
      val span = math.max(hi - lo, java.lang.Double.MIN_NORMAL)
      math.min((1L << m.bits) - 1,
        math.max(0L, math.floor((v - lo) / span * (1L << m.bits)).toLong))
    }
    val (bLoA, bHiA) = (bucketOf(loA, m.minA, m.maxA), bucketOf(hiA, m.minA, m.maxA))
    val (bLoB, bHiB) = (bucketOf(loB, m.minB, m.maxB), bucketOf(hiB, m.minB, m.maxB))
    // de-interleave a prefix: bit 2i+1 of the z code is a's bit i.
    // A prefix of length prefixBits fixes the TOP ceil/floor halves
    // of the two dimensions' bucket bits; the unfixed low bits range
    // over the whole cell.
    val total = 1 << m.prefixBits
    val aFixed = (m.prefixBits + 1) / 2 // a holds the odd (higher) positions
    val bFixed = m.prefixBits / 2
    val cells = (0 until total).filter { p =>
      var aHi = 0L
      var bHi = 0L
      (0 until m.prefixBits).foreach { j =>
        // bit j of the prefix (from its LOW end) is z-bit (2*bits-1-…)
        val zPos = 2 * m.bits - m.prefixBits + j
        val bit = (p >> j) & 1
        if (zPos % 2 == 1) aHi |= bit.toLong << (zPos / 2)
        else bHi |= bit.toLong << (zPos / 2)
      }
      val aLo = aHi
      val aHiFull = aHi | ((1L << (m.bits - aFixed)) - 1)
      val bLo = bHi
      val bHiFull = bHi | ((1L << (m.bits - bFixed)) - 1)
      aHiFull >= bLoA && aLo <= bHiA && bHiFull >= bLoB && bLo <= bHiB
    }
    val prefixFilter =
      if (cells.isEmpty) lit(false) else col("z_prefix").isin(cells: _*)
    val reader = spark.read.parquet(path)
      .filter(prefixFilter)
      .filter(col(m.colA).cast("double").between(loA, hiA) &&
        col(m.colB).cast("double").between(loB, hiB))
    (reader, cells.size, total)
  }

  /** Register every test table as a temp view so the full surface is
    * reachable through plain `spark.sql(...)`. */
  def createViews(spark: SparkSession, dir: String): Unit =
    graft.Tables.all.foreach { t =>
      graft.Tables.table(spark, dir, t).createOrReplaceTempView(t)
    }
}
