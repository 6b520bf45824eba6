package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Single entry point for the driver-generated parquet tables.
  *
  * Keeping every scan behind one function means projection pruning and
  * predicate pushdown stay visible in one place (`.explain` shows
  * `ReadSchema`/`PushedFilters` per scan), and a cluster deployment can
  * swap the path scheme (e.g. object-store prefixes, partitioned
  * layouts) without touching operators.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Name-dispatched loader (applies the per-table fixups, e.g. the
    * nanosecond-timestamp conversion on `events`). */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    name match {
      case "events" => events(spark, dir)
      case other    => load(spark, dir, other)
    }

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark's
    * TimestampType (micros) refuses outright. Read nanos as raw long
    * and rebuild a microsecond timestamp (integer division — the data
    * is generated at micro precision, so this is lossless).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    // GraftSession/Bench/Verify sessions set this up-front; this is the
    // fallback for caller-built sessions. It must stay set for the scan
    // (the reader consults it at execution, not just schema inference),
    // so it cannot be save/restored around the read.
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      // Parquet timestamp[us] with no timezone reads as TIMESTAMP_NTZ;
      // downstream event-time code (unix_micros, watermarks) needs
      // TimestampType. With the session TZ pinned to UTC the cast is the
      // identity on the stored micros, so oracle hashes are unchanged.
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts",
          df("ts").cast(org.apache.spark.sql.types.TimestampType))
      case org.apache.spark.sql.types.TimestampType => df
      // Fail HERE, not 15 call sites downstream: every event-time
      // operator assumes TimestampType `ts`, and a silent pass-through
      // of a new writer type (the round-7 NTZ lesson) breaks them all.
      case other => throw new IllegalStateException(
        s"events.ts read as unsupported type $other; " +
          "extend Tables.events to normalize it to TimestampType")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
