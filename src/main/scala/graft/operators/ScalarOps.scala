package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.CrossEngine.{dsum, dsumSql, md5Long, md5LongSql}

/** Scalar-function coverage extensions (SURVEY.md §2 B): regex
  * extraction, null-handling combinators, and deterministic
  * hash-based sampling (the reproducible alternative to
  * `TABLESAMPLE` — same rows on every engine, every run, any
  * partitioning; the only sane way to sample a 100 TB training
  * corpus reproducibly).
  */
object ScalarOps {

  // ---------------------------------------------------------------- sample
  /** Deterministic ~10% Bernoulli sample keyed on md5(doc_id). */
  def qSample(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(pmod(md5Long(col("doc_id").cast("string")), lit(10)) === 0)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy(col("doc_id"))

  private val qSampleSql =
    s"""SELECT doc_id, lang, n_chars FROM documents
       |WHERE ${md5LongSql("cast(doc_id as varchar)")} % 10 = 0
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- stratified
  /** Stratified deterministic sampling: EXACTLY ⌈10%⌉ of each lang
    * stratum (Bernoulli sampling under/over-shoots small strata —
    * curation quotas need exact per-stratum counts). Each doc's rank
    * within its stratum is its position in md5 order (a deterministic
    * shuffle — same rows on any engine/partitioning/run); the cutoff
    * ⌈n/10⌉ is pure integer arithmetic. One shuffle on the stratum
    * key; the rank window and the stratum-size window share it. At
    * 100 TB a skewed stratum bottlenecks its single partition — there
    * the rank comes from the mr_sort shape instead (range-partition
    * the md5 key within each stratum, rank = partition offset +
    * local index); semantics identical, so this operator stays the
    * oracle. */
  def qSampleStratified(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("lang"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .withColumn("sample_rank", row_number().over(
        w.orderBy(md5(concat(lit("strat:"), col("doc_id").cast("string"))), col("doc_id"))))
      .withColumn("n", count(lit(1)).over(w))
      .filter(col("sample_rank") <= expr("(n + 9) div 10")) // ⌈n/10⌉, integer-exact
      .select(col("doc_id"), col("lang"), col("n_chars"), col("sample_rank"))
      .orderBy(col("doc_id"))
  }

  private val qSampleStratifiedSql =
    """WITH r AS (
      |  SELECT doc_id, lang, n_chars,
      |    cast(row_number() OVER (PARTITION BY lang
      |      ORDER BY md5('strat:' || cast(doc_id as varchar)), doc_id) as int)
      |      AS sample_rank,
      |    count(*) OVER (PARTITION BY lang) AS n
      |  FROM documents)
      |SELECT doc_id, lang, n_chars, sample_rank FROM r
      |WHERE sample_rank <= (n + 9) // 10
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- regex
  /** Regex extraction/replacement over part names. */
  def qRegex(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(
        col("p_partkey"),
        regexp_extract(col("p_name"), "^([a-z]+)", 1).as("first_word"),
        regexp_extract(col("p_name"), "([a-z]+)$", 1).as("last_word"),
        regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"))
      .orderBy(col("p_partkey"))

  private val qRegexSql =
    """SELECT p_partkey,
      |  regexp_extract(p_name, '^([a-z]+)', 1) AS first_word,
      |  regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
      |  regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled
      |FROM part ORDER BY p_partkey""".stripMargin

  // ---------------------------------------------------------------- nulls
  /** Null combinators over an outer join: coalesce / nullif /
    * null-aware aggregation. */
  def qNullHandling(spark: SparkSession, dir: String): DataFrame = {
    val bigOrders = Tables.orders(spark, dir)
      .filter(col("o_totalprice") > 300000)
    Tables.customer(spark, dir)
      .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(
        coalesce(dsum(col("o_totalprice")), lit(0.0)).as("big_total"),
        sum(when(col("o_orderkey").isNull, 1L).otherwise(0L)).as("n_null_rows"),
        nullif(count(col("o_orderkey")), lit(0L)).as("n_big_or_null"))
      .orderBy(col("c_custkey"))
  }

  private val qNullHandlingSql =
    s"""SELECT c_custkey,
       |  coalesce(${dsumSql("o_totalprice", "ignored").replace(" AS ignored", "")}, 0.0) AS big_total,
       |  cast(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) as bigint) AS n_null_rows,
       |  nullif(count(o_orderkey), 0) AS n_big_or_null
       |FROM customer LEFT JOIN (
       |  SELECT * FROM orders WHERE o_totalprice > 300000) o
       |  ON c_custkey = o_custkey
       |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- registry
  def defs: Seq[QueryDef] = Seq(
    QueryDef("q_sample", qSample _, Some(qSampleSql)),
    QueryDef("q_sample_stratified", qSampleStratified _, Some(qSampleStratifiedSql)),
    QueryDef("q_regex", qRegex _, Some(qRegexSql)),
    QueryDef("q_null_handling", qNullHandling _, Some(qNullHandlingSql)))
}
