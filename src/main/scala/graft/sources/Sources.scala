package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
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

  /** Register every test table as a temp view so the full surface is
    * reachable through plain `spark.sql(...)`. */
  def createViews(spark: SparkSession, dir: String): Unit =
    graft.Tables.all.foreach { t =>
      graft.Tables.table(spark, dir, t).createOrReplaceTempView(t)
    }
}
