package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

/** Streaming sinks beyond memory/noop (SURVEY.md §2 H / round-2 plan).
  *
  * `foreachBatchUpsert` gives a streaming query MERGE/upsert semantics
  * onto a plain parquet directory: each micro-batch's rows replace
  * same-key rows and append the rest. The merge itself is a
  * left-anti join + union — the exact plan a transactional table
  * format (Delta/Iceberg MERGE) would run; plain parquet adds a
  * tmp-dir write + atomic-ish rename swap in place of a metadata
  * commit, under a single-writer assumption. At 100 TB you'd point
  * the same `foreachBatch` body at a real table format and keep the
  * key-partitioned layout so the anti-join only touches matching
  * partitions.
  *
  * The rename swap here has a documented non-atomic window (a reader
  * arriving between the two renames sees a missing/partial table).
  * `graft.sources.ManifestTable` is the atomic-commit variant — same
  * merge plan, but versions published through one atomic manifest
  * rename (readers see old-complete or new-complete, never partial).
  * Prefer it unless a consumer must read the bare parquet path.
  */
object StreamSinks {

  /** Merge one batch into `path` by `keyCols` (upsert). Within a
    * batch, duplicate keys collapse arbitrarily via dropDuplicates —
    * feed a deterministic ordering upstream if last-write-wins
    * matters. Visible for batch-mode reuse and tests. */
  def upsertBatch(batch: DataFrame, path: String, keyCols: Seq[String]): Unit = {
    val spark = batch.sparkSession
    val fresh = batch.dropDuplicates(keyCols)
    val dir = new Path(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = new Path(path + ".old")
    // crash recovery FIRST: a writer that died between its two renames
    // left the ONLY copy of the table at .old and no table dir. Without
    // this restore, the next batch would see "no table", merge against
    // nothing, and the delete below would destroy the backup — silent
    // loss of the whole table.
    if (!fs.exists(dir) && fs.exists(old)) {
      require(fs.rename(old, dir), s"cannot restore crashed-swap backup $old to $path")
    }
    val merged =
      if (fs.exists(dir))
        spark.read.parquet(path).join(fresh, keyCols, "left_anti").unionByName(fresh)
      else fresh
    val tmp = new Path(path + ".tmp")
    merged.write.mode(SaveMode.Overwrite).parquet(tmp.toString) // reads old, writes new
    if (fs.exists(old)) fs.delete(old, true)
    // renames are CHECKED: an unflagged rename failure here would let
    // the trailing delete remove the only surviving copy
    if (fs.exists(dir)) {
      require(fs.rename(dir, old), s"cannot move $path aside to $old")
    }
    require(fs.rename(tmp, dir), s"cannot swap $tmp into $path")
    fs.delete(old, true)
  }

  /** Partition-pruned upsert: the layout is partitioned by
    * `partitionCol`, and a batch only touches the partitions its rows
    * land in — the anti-join reads ONLY those partitions (partition
    * pruning on the scan) and dynamic partition overwrite replaces
    * only those directories. Untouched partitions are never read or
    * rewritten — at 100 TB with date/tenant partitions this is the
    * difference between a merge proportional to the BATCH and one
    * proportional to the TABLE.
    *
    * CONTRACT: `partitionCol` must be a stable function of the key
    * (the usual date/tenant layouts are). If a key re-arrives under a
    * DIFFERENT partition value, its old copy in the untouched
    * partition survives — exactly because untouched partitions are
    * never read. Key-mobile layouts need the unpartitioned
    * `upsertBatch` (or a table format with a global index). */
  def upsertBatchPartitioned(batch: DataFrame, path: String,
      keyCols: Seq[String], partitionCol: String): Unit = {
    val spark = batch.sparkSession
    val fresh = batch.dropDuplicates(keyCols)
    val dir = new Path(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val merged =
      if (!fs.exists(dir)) fresh
      else {
        val parts = fresh.select(partitionCol).distinct().collect()
          .map(_.get(0)).toSeq // distinct batch partitions: small by design
        val existing = spark.read.parquet(path)
          .filter(org.apache.spark.sql.functions.col(partitionCol)
            .isin(parts: _*)) // prunes the scan to touched partitions
        existing.join(fresh, keyCols, "left_anti").unionByName(fresh)
      }
    // sever the lineage from the files about to be replaced: the
    // dynamic overwrite below must not re-read what it deletes
    val mat = merged.localCheckpoint(true)
    mat.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCol)
      .parquet(path)
  }

  /** writeStream wiring: one upsert transaction per micro-batch. */
  def foreachBatchUpsert(stream: DataFrame, path: String,
      keyCols: Seq[String]): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        upsertBatch(batch, path, keyCols)
      }

  /** Plain append-only streaming parquet sink (exactly-once via the
    * checkpoint + file-sink manifest); the durable layout downstream
    * batch queries read back. */
  def parquetAppend(stream: DataFrame, path: String,
      checkpoint: String): StreamingQuery =
    stream.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
}
