package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.CrossEngine.{dsum, dsumSql, rnd}

/** Event / time-series analytics (SURVEY.md §2 C) plus JSON
  * extraction (§2 B #25). All session/funnel logic works on integer
  * epoch-microseconds (exact on both engines, no float time math).
  *
  * Scale notes: every window is partitioned by `user_id` — state per
  * task is one user's events; the tumbling-window aggregate is a
  * plain hash aggregate on (hour, event_type). These are the batch
  * oracles for the Structured Streaming jobs in graft.streaming.
  */
object Events {

  private val GapUs = 1800000000L // 30 min session gap, microseconds

  // ---------------------------------------------------------------- json
  /** JSON field extraction from the `props` payload column. */
  def qJson(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k_val"))
      .orderBy(col("event_id"))

  private val qJsonSql =
    """SELECT event_id, cast(props->>'k' as int) AS k_val
      |FROM events ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- tumbling
  /** Hourly tumbling-window counts/sums per event_type — the batch
    * oracle for streaming.StreamingJobs.tumbling. */
  def qTumblingWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(
        date_trunc("hour", col("ts")).as("hour"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        dsum(col("value")).as("total_value"))
      .orderBy(col("hour"), col("event_type"))

  private val qTumblingWindowSql =
    """SELECT date_trunc('hour', ts) AS hour, event_type,
      |  count(*) AS n_events,
      |  cast(round(sum(cast(value as decimal(18,6))), 2) as double) AS total_value
      |FROM events GROUP BY hour, event_type
      |ORDER BY hour, event_type""".stripMargin

  // ---------------------------------------------------------------- histogram
  /** Equi-width VALUE histogram of event values (20 buckets of width
    * 25 over [0, 500), under/overflow in buckets 0/21). Complements
    * `mr_partition_hist` (a key-hash histogram): this is the
    * data-profiling shape — one map-side-combinable aggregate, ≤22
    * output rows no matter the input size, min/max per bucket exact
    * (no order-dependent float summation anywhere). The bucket
    * expression is plain CASE+floor arithmetic, bit-identical on both
    * engines (DuckDB has no width_bucket). */
  private val histBucket =
    "CASE WHEN value < 0 THEN 0 WHEN value >= 500 THEN 21 " +
      "ELSE cast(floor(value / 25.0) as int) + 1 END"

  def qValueHistogram(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(expr(histBucket).as("bucket"))
      .agg(
        count(lit(1)).as("n"),
        min(col("value")).as("lo"),
        max(col("value")).as("hi"))
      .orderBy(col("bucket"))

  private val qValueHistogramSql =
    s"""SELECT $histBucket AS bucket,
       |  count(*) AS n, min(value) AS lo, max(value) AS hi
       |FROM events GROUP BY bucket ORDER BY bucket""".stripMargin

  // ---------------------------------------------------------------- ohlc bars
  /** Time-series RESAMPLING with arg-extremes: 6-hour OHLC bars per
    * event_type — open/close are the values of the chronologically
    * first/last event in the bar (arg-min/arg-max, not plain
    * min/max), high/low are value extremes. Deterministic open/close
    * via window row_numbers keyed (ts, event_id) both directions —
    * ties can't flip rows between engines, unlike bare first()/
    * min_by(). One shuffle on the bar key; the two row_numbers and
    * the aggregate share the (bar, event_type) partitioning. */
  def qOhlcBars(spark: SparkSession, dir: String): DataFrame = {
    val bar = date_trunc("day", col("ts")) +
      expr("make_interval(0, 0, 0, 0, 6 * (hour(ts) div 6), 0, 0)")
    val w = Window.partitionBy(col("bar"), col("event_type"))
    val rnA = row_number().over(w.orderBy(col("ts"), col("event_id")))
    val rnD = row_number().over(w.orderBy(col("ts").desc, col("event_id").desc))
    Tables.events(spark, dir)
      .select(col("ts"), col("event_id"), col("event_type"), col("value"))
      .withColumn("bar", bar)
      .withColumn("rna", rnA)
      .withColumn("rnd", rnD)
      .groupBy(col("bar"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        max(when(col("rna") === 1, col("value"))).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max(when(col("rnd") === 1, col("value"))).as("close"))
      .orderBy(col("bar"), col("event_type"))
  }

  private val qOhlcBarsSql =
    """WITH t AS (
      |  SELECT event_type, value,
      |    date_trunc('day', ts) + INTERVAL 6 HOUR * (hour(ts) // 6) AS bar,
      |    row_number() OVER (PARTITION BY date_trunc('day', ts) + INTERVAL 6 HOUR * (hour(ts) // 6), event_type
      |      ORDER BY ts, event_id) AS rna,
      |    row_number() OVER (PARTITION BY date_trunc('day', ts) + INTERVAL 6 HOUR * (hour(ts) // 6), event_type
      |      ORDER BY ts DESC, event_id DESC) AS rnd
      |  FROM events)
      |SELECT bar, event_type,
      |  count(*) AS n_events,
      |  max(CASE WHEN rna = 1 THEN value END) AS open,
      |  max(value) AS high,
      |  min(value) AS low,
      |  max(CASE WHEN rnd = 1 THEN value END) AS close
      |FROM t GROUP BY bar, event_type
      |ORDER BY bar, event_type""".stripMargin

  // ---------------------------------------------------------------- sessionize
  /** Gap-based sessionization: a >30-min silence starts a new
    * session. lag → flag → running sum = session id; then per-session
    * rollup. Batch oracle for streaming.StreamingJobs.sessionize. */
  def qSessionize(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .withColumn("new_s",
        when(col("us") - lag(col("us"), 1).over(w) > GapUs, 1L)
          .when(lag(col("us"), 1).over(w).isNull, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_s")).over(wRun))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        (max(col("us")) - min(col("us"))).as("duration_us"))
      .orderBy(col("user_id"), col("session_id"))
  }

  private val qSessionizeSql =
    s"""WITH e AS (
       |  SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
       |flagged AS (
       |  SELECT user_id, event_id, us,
       |    CASE WHEN lag(us) OVER w IS NULL THEN 1
       |         WHEN us - lag(us) OVER w > $GapUs THEN 1
       |         ELSE 0 END AS new_s
       |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
       |sessions AS (
       |  SELECT user_id, us,
       |    cast(sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
       |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |      as bigint) AS session_id
       |  FROM flagged)
       |SELECT user_id, session_id, count(*) AS n_events,
       |  max(us) - min(us) AS duration_us
       |FROM sessions GROUP BY user_id, session_id
       |ORDER BY user_id, session_id""".stripMargin

  // ---------------------------------------------------------------- scd2
  /** SCD2 history build (gaps-and-islands run-length encoding): each
    * user's event_type stream collapses into versioned dimension rows
    * (valid_from, valid_to, is_current) — the slowly-changing-
    * dimension compaction a lakehouse runs over CDC change rows to
    * make "state as of time T" one range probe (the batch twin of the
    * native as-of join's lookup side). Consecutive same-type events
    * collapse into one version, so output ∝ CHANGES, not events.
    *
    * Scale: the flag/version windows share one (user_id, (us,
    * event_id)) sort — one exchange; the run aggregate reuses the
    * same user_id-prefixed keys; the valid_to lead window runs on the
    * COMPACTED frame (≪ events). Integer epoch-micros time math
    * only. `is_current` emitted as int 0/1 (cross-engine: parquet
    * boolean round-trips as numpy bool_, which the driver's hash
    * normalizer does not fold to int). */
  def qScd2(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wVer = Window.partitionBy(col("user_id")).orderBy(col("version"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("chg",
        when(lag(col("event_type"), 1).over(w).isNull, 1L)
          .when(lag(col("event_type"), 1).over(w) =!= col("event_type"), 1L)
          .otherwise(0L))
      .withColumn("version", sum(col("chg")).over(wRun))
      .groupBy(col("user_id"), col("version"), col("event_type"))
      .agg(min(col("us")).as("valid_from"), count(lit(1)).as("n_events"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wVer))
      .withColumn("is_current",
        when(col("valid_to").isNull, 1).otherwise(0))
      .select(col("user_id"), col("version"), col("event_type"),
        col("valid_from"), col("valid_to"), col("n_events"), col("is_current"))
      .orderBy(col("user_id"), col("version"))
  }

  private val qScd2Sql =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
      |flagged AS (
      |  SELECT user_id, event_id, event_type, us,
      |    CASE WHEN lag(event_type) OVER w IS NULL THEN 1
      |         WHEN lag(event_type) OVER w <> event_type THEN 1
      |         ELSE 0 END AS chg
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
      |runs AS (
      |  SELECT user_id, event_type, us,
      |    cast(sum(chg) OVER (PARTITION BY user_id ORDER BY us, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as bigint)
      |      AS version
      |  FROM flagged),
      |agg AS (
      |  SELECT user_id, version, event_type, min(us) AS valid_from,
      |    count(*) AS n_events
      |  FROM runs GROUP BY user_id, version, event_type),
      |v AS (
      |  SELECT user_id, version, event_type, valid_from,
      |    lead(valid_from) OVER (PARTITION BY user_id ORDER BY version)
      |      AS valid_to,
      |    n_events
      |  FROM agg)
      |SELECT user_id, version, event_type, valid_from, valid_to, n_events,
      |  CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END AS is_current
      |FROM v ORDER BY user_id, version""".stripMargin

  // ---------------------------------------------------------------- sliding window
  /** Trailing 30-minute sliding count/sum per event via a RANGE
    * frame over epoch-micros — the batch form of a sliding stream
    * window, state bounded by the range width. */
  def qWindowSliding(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
      .rangeBetween(-GapUs, Window.currentRow)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .withColumn("n_trailing_30m", count(lit(1)).over(w))
      .select(col("user_id"), col("event_id"), col("n_trailing_30m"))
      .orderBy(col("user_id"), col("event_id"))
  }

  private val qWindowSlidingSql =
    s"""SELECT user_id, event_id,
       |  count(*) OVER (PARTITION BY user_id ORDER BY us
       |                 RANGE BETWEEN $GapUs PRECEDING AND CURRENT ROW)
       |    AS n_trailing_30m
       |FROM (SELECT user_id, event_id, epoch_us(ts) AS us FROM events)
       |ORDER BY user_id, event_id""".stripMargin

  // ---------------------------------------------------------------- window extras
  /** first_value / ntile / percent_rank over a per-user total order. */
  def qWindowExtras(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .withColumn("first_event_type", first(col("event_type")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("quartile", ntile(4).over(w))
      .withColumn("pct_rank", rnd(percent_rank().over(w), 6))
      .select(col("user_id"), col("event_id"), col("first_event_type"),
        col("quartile"), col("pct_rank"))
      .orderBy(col("user_id"), col("event_id"))
  }

  private val qWindowExtrasSql =
    s"""SELECT user_id, event_id,
       |  first_value(event_type) OVER w AS first_event_type,
       |  cast(ntile(4) OVER w AS int) AS quartile,
       |  ${graft.functions.CrossEngine.rndSql("percent_rank() OVER w", 6)} AS pct_rank
       |FROM (SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events)
       |WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
       |ORDER BY user_id, event_id""".stripMargin

  // ---------------------------------------------------------------- funnel
  /** signup→purchase conversion per user, time-ordered. */
  def qFunnel(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "signup", unix_micros(col("ts")))).as("first_signup_us"),
        min(when(col("event_type") === "purchase", unix_micros(col("ts")))).as("first_purchase_us"))
      .select(
        col("user_id"),
        when(col("first_signup_us").isNotNull, 1L).otherwise(0L).as("did_signup"),
        when(col("first_purchase_us").isNotNull, 1L).otherwise(0L).as("did_purchase"),
        when(col("first_purchase_us") > col("first_signup_us"), 1L).otherwise(0L).as("converted"))
      .orderBy(col("user_id"))

  private val qFunnelSql =
    """SELECT user_id,
      |  cast(CASE WHEN first_signup_us IS NOT NULL THEN 1 ELSE 0 END as bigint) AS did_signup,
      |  cast(CASE WHEN first_purchase_us IS NOT NULL THEN 1 ELSE 0 END as bigint) AS did_purchase,
      |  cast(CASE WHEN first_purchase_us > first_signup_us THEN 1 ELSE 0 END as bigint) AS converted
      |FROM (
      |  SELECT user_id,
      |    min(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END) AS first_signup_us,
      |    min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS first_purchase_us
      |  FROM events GROUP BY user_id)
      |ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------- registry
  def defs: Seq[QueryDef] = Seq(
    QueryDef("q_json", qJson _, Some(qJsonSql)),
    QueryDef("q_tumbling_window", qTumblingWindow _, Some(qTumblingWindowSql)),
    QueryDef("q_ohlc_bars", qOhlcBars _, Some(qOhlcBarsSql)),
    QueryDef("q_value_histogram", qValueHistogram _, Some(qValueHistogramSql)),
    QueryDef("q_sessionize", qSessionize _, Some(qSessionizeSql)),
    QueryDef("q_scd2", qScd2 _, Some(qScd2Sql)),
    QueryDef("q_window_sliding", qWindowSliding _, Some(qWindowSlidingSql)),
    QueryDef("q_window_extras", qWindowExtras _, Some(qWindowExtrasSql)),
    QueryDef("q_funnel", qFunnel _, Some(qFunnelSql)))
}
