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

  /** Size-gated broadcast hint for dimension-shaped frames whose row
    * count GROWS with scale factor — customer, supplier, part, and
    * frames derived from them (per-part min tables, qualifying-supplier
    * shortlists). This is the 100-TB contract for every OLAP join in
    * the library:
    *
    *   - At the tested SFs these frames fit comfortably under
    *     `spark.sql.autoBroadcastJoinThreshold`, so the hint fires and
    *     the plans keep their broadcast joins (zero behavior change at
    *     small scale).
    *   - At cluster scale (TPC-H sf≈100k ⇒ customer ≈ 15 B rows) the
    *     estimate exceeds the threshold, the hint is WITHHELD, and
    *     AQE's runtime size-based planning picks the join strategy —
    *     including demotion to sort-merge. A forced `broadcast()` hint
    *     would DISABLE that demotion and turn the first TPC-H-shaped
    *     query into an executor OOM, which is why growing dims must
    *     never carry an unconditional hint.
    *
    * Plain `broadcast()` remains correct only for frames bounded by
    * construction: nation (25 rows), region (5), single-row scalar
    * aggregates, and `.limit(k)` shortlists.
    *
    * The estimate is Catalyst's optimized-plan size: file-length-based
    * for scans, conservative pass-through for filters/aggregates, and
    * a children-size product for inner joins — so a derived frame only
    * gets the static hint when even its UNREDUCED input fits, and
    * anything larger is left to AQE (which sees the true post-shuffle
    * size and still broadcasts it at every tested SF). The gate honors
    * whatever threshold the session has configured, so one conf tunes
    * both this hint and Spark's own planner identically.
    */
  def dimHint(df: DataFrame): DataFrame = {
    val raw = df.sparkSession.conf
      .get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    val threshold =
      try org.apache.spark.network.util.JavaUtils.byteStringAsBytes(raw)
      catch { case _: NumberFormatException => -1L } // "-1" = disabled
    if (threshold > 0 &&
        df.queryExecution.optimizedPlan.stats.sizeInBytes <= BigInt(threshold))
      org.apache.spark.sql.functions.broadcast(df)
    else df
  }
}
