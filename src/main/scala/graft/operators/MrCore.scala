package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** The reference's observable applications (SURVEY.md §2 A),
  * re-expressed as declarative plans over the `documents`/`events`
  * tables. The map phase is `split`+`explode` (codegen'd, no UDFs);
  * the reduce phase is a hash aggregate with map-side combine — the
  * Spark-native form of the word-count app in
  * mr_app/src/client.rs:3-21.
  */
object MrCore {

  /** Whitespace tokens, empties dropped (reference splits with
    * `split_whitespace`, client.rs:5 — no empty tokens). */
  private def tokens = explode(split(col("text"), "\\s+")).as("token")

  // ---------------------------------------------------------------- wordcount
  /** The flagship reference app: word count. */
  def mrWordcount(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(tokens)
      .filter(col("token") =!= "")
      .groupBy(col("token"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("token"))

  private val mrWordcountSql =
    """SELECT token, count(*) AS cnt
      |FROM (SELECT unnest(regexp_split_to_array(text, '\s+')) AS token
      |      FROM documents)
      |WHERE token <> ''
      |GROUP BY token ORDER BY token""".stripMargin

  // ---------------------------------------------------------------- grep
  /** Map-only job (no shuffle): pattern filter over documents. */
  def mrGrep(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(col("text").rlike("hash join"))
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy(col("doc_id"))

  private val mrGrepSql =
    """SELECT doc_id, lang, n_chars FROM documents
      |WHERE regexp_matches(text, 'hash join')
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- inverted index
  /** Classic MR app: token → sorted distinct posting list. The
    * two-level shape (distinct pairs, then per-token fold) keeps the
    * wide row out of the shuffle until after dedup. */
  def mrInvertedIndex(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), tokens)
      .filter(col("token") =!= "")
      .distinct()
      .groupBy(col("token"))
      .agg(
        count(lit(1)).as("df"),
        concat_ws(",",
          transform(sort_array(collect_set(col("doc_id"))),
            d => d.cast("string"))).as("postings"))
      .orderBy(col("token"))

  private val mrInvertedIndexSql =
    """SELECT token, count(*) AS df,
      |  string_agg(doc_id, ',' ORDER BY doc_id) AS postings
      |FROM (SELECT DISTINCT doc_id, token
      |      FROM (SELECT doc_id,
      |              unnest(regexp_split_to_array(text, '\s+')) AS token
      |            FROM documents)
      |      WHERE token <> '')
      |GROUP BY token ORDER BY token""".stripMargin

  // ---------------------------------------------------------------- sort
  /** Distributed total-order sort. `orderBy` compiles to a range
    * exchange (sampled split points) + per-partition sort — the
    * scalable form of the reference's single-reducer key sort
    * (worker.rs:124-131 collects everything into one HashMap).
    * The explicit rank makes the order itself oracle-checkable. */
  def mrSort(spark: SparkSession, dir: String): DataFrame = {
    val top = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("value"))
      .orderBy(col("value").desc, col("event_id"))
      .limit(1000)
    top.withColumn("rank",
      row_number().over(Window.orderBy(col("value").desc, col("event_id"))))
  }

  private val mrSortSql =
    """SELECT event_id, user_id, value,
      |  cast(row_number() OVER (ORDER BY value DESC, event_id) as int) AS rank
      |FROM events
      |ORDER BY value DESC, event_id
      |LIMIT 1000""".stripMargin

  // ---------------------------------------------------------------- partition hist
  /** Mirrors the reference's `task_id % n_reduce` bucketing
    * (coordinator.rs:146): key histogram per reduce bucket. */
  def mrPartitionHist(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(pmod(col("user_id"), lit(32)).as("bucket"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("bucket"))

  private val mrPartitionHistSql =
    """SELECT user_id % 32 AS bucket, count(*) AS n_events,
      |  count(DISTINCT user_id) AS n_users
      |FROM events GROUP BY bucket ORDER BY bucket""".stripMargin

  // ---------------------------------------------------------------- salted wordcount
  /** Skew-proof two-stage aggregation: tokens are first counted per
    * (salt, token) — splitting any hot key across 16 reducers — then
    * re-combined per token. Identical result to `mr_wordcount` (same
    * oracle SQL proves it); the shape to use when one key carries a
    * disproportionate share of a 100 TB shuffle. */
  def mrWordcountSalted(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(tokens)
      .filter(col("token") =!= "")
      .withColumn("salt", pmod(crc32(col("token")) + spark_partition_id(), lit(16)))
      .groupBy(col("salt"), col("token"))
      .agg(count(lit(1)).as("partial_cnt"))
      .groupBy(col("token"))
      .agg(sum(col("partial_cnt")).as("cnt"))
      .orderBy(col("token"))

  // ---------------------------------------------------------------- registry
  def defs: Seq[QueryDef] = Seq(
    QueryDef("mr_wordcount", mrWordcount _, Some(mrWordcountSql)),
    QueryDef("mr_wordcount_salted", mrWordcountSalted _, Some(mrWordcountSql)),
    QueryDef("mr_grep", mrGrep _, Some(mrGrepSql)),
    QueryDef("mr_inverted_index", mrInvertedIndex _, Some(mrInvertedIndexSql)),
    QueryDef("mr_sort", mrSort _, Some(mrSortSql)),
    QueryDef("mr_partition_hist", mrPartitionHist _, Some(mrPartitionHistSql)))
}
