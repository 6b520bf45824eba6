package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.CrossEngine.{md5Long, md5LongSql, rnd, rndSql}

/** End-to-end training-data pipeline (the composition the library
  * exists for): quality-score → filter → exact-dedup → deterministic
  * sample → per-doc stats. Every stage is one of the §2 operators;
  * the whole chain is a single declarative plan (Catalyst fuses the
  * scalar stages into one codegen'd pass over the scan, dedup is the
  * only shuffle, the sample predicate is pushed below it — check
  * `Explain`).
  *
  * At 100 TB this plan is: one scan + one exchange on md5(text) —
  * the minimal possible shape for dedup-inclusive curation.
  */
object Pipelines {

  private val toksSql =
    "list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> '')"

  def trainingData(spark: SparkSession, dir: String): DataFrame = {
    val t = filter(split(col("text"), "\\s+"), x => x =!= "")
    val nTok = size(col("t"))
    val digits = length(col("text")) - length(regexp_replace(col("text"), "[0-9]", ""))
    val quality =
      least(length(col("text")).cast("double") / 500.0, lit(1.0)) * 0.5 +
        (lit(1.0) - digits.cast("double") / length(col("text"))) * 0.5

    Tables.documents(spark, dir)
      .withColumn("t", t)
      .withColumn("quality", quality)
      .filter(col("quality") >= 0.55)                       // quality gate
      .groupBy(md5(col("text")).as("text_md5"))             // exact dedup
      .agg(
        min(col("doc_id")).as("doc_id"),
        min(col("quality")).as("q"),
        min(size(col("t"))).as("n_tokens"))
      .filter(pmod(md5Long(col("text_md5")), lit(2)) === 0) // 50% det. sample
      .select(col("doc_id"), rnd(col("q"), 4).as("quality"), col("n_tokens"))
      .orderBy(col("doc_id"))
  }

  private val trainingDataSql =
    s"""WITH scored AS (
       |  SELECT doc_id, text,
       |    least(cast(length(text) as double) / 500.0, 1.0) * 0.5
       |      + (1.0 - cast(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) as double)
       |          / length(text)) * 0.5 AS quality,
       |    cast(len($toksSql) as int) AS n_tokens
       |  FROM documents),
       |gated AS (SELECT * FROM scored WHERE quality >= 0.55),
       |deduped AS (
       |  SELECT md5(text) AS text_md5, min(doc_id) AS doc_id,
       |    min(quality) AS q, min(n_tokens) AS n_tokens
       |  FROM gated GROUP BY text_md5)
       |SELECT doc_id, ${rndSql("q", 4)} AS quality, n_tokens
       |FROM deduped
       |WHERE ${md5LongSql("text_md5")} % 2 = 0
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- decontamination
  /** Benchmark decontamination — the curation pass every serious
    * training pipeline runs: any training document sharing a 5-gram
    * with an evaluation document is flagged (the published
    * GPT-3/PaLM-style n-gram collision rule). Here the "eval set" is
    * a deterministic ~5% doc_id split standing in for a benchmark
    * suite; in production it is an external table.
    *
    * Plan shape for 100 TB: the eval side is SMALL by nature
    * (benchmarks are thousands of docs, not billions), so its
    * distinct 5-gram table is broadcast — the training corpus is
    * never shuffled for the probe; its only exchange is the final
    * per-doc aggregate on doc_id. 5-grams are per-row array
    * expressions (same no-explode-before-distinct shape as the
    * minhash shingles). */
  private val fivegramExpr =
    """filter(
      |  transform(t, (x, i) -> CASE WHEN i + 4 < size(t)
      |    THEN concat_ws(' ', x, element_at(t, i + 2), element_at(t, i + 3),
      |                   element_at(t, i + 4), element_at(t, i + 5))
      |    END),
      |  s -> s IS NOT NULL)""".stripMargin

  /** Per-doc distinct 5-grams, exploded: (doc_id, s). `docs` needs
    * (doc_id, text). */
  def fivegrams(docs: DataFrame): DataFrame = docs
    .select(col("doc_id"), filter(split(col("text"), "\\s+"), x => x =!= "").as("t"))
    .select(col("doc_id"), explode(array_distinct(expr(fivegramExpr))).as("s"))

  /** PUBLIC decontamination API against an EXTERNAL eval corpus —
    * the production form (the registered query below derives its eval
    * split from the same table only so DuckDB can check it). Returns
    * one row per train doc: the keep/drop list. */
  def decontaminateAgainst(train: DataFrame, evalDocs: DataFrame): DataFrame = {
    val evalNgrams = fivegrams(evalDocs)
      .select(col("s").as("es"), col("doc_id").as("eval_doc")).distinct()
    val hits = fivegrams(train)
      .join(broadcast(evalNgrams), col("s") === col("es"))
      .groupBy(col("doc_id"))
      .agg(
        countDistinct(col("s")).as("sh"),
        countDistinct(col("eval_doc")).as("ed"))
    // one row per TRAIN doc (the keep/drop list a pipeline consumes),
    // clean docs carrying zeros — the hit aggregate is tiny, so this
    // left join broadcasts it back onto the doc list
    train.select(col("doc_id"))
      .join(broadcast(hits), Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("sh"), lit(0L)).as("n_shared_ngrams"),
        coalesce(col("ed"), lit(0L)).as("n_eval_docs"),
        (coalesce(col("sh"), lit(0L)) > 0).as("contaminated"))
  }

  def decontaminate(spark: SparkSession, dir: String): DataFrame = {
    val isEval =
      pmod(md5Long(concat(lit("decon:"), col("doc_id").cast("string"))), lit(20)) === 0
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    decontaminateAgainst(docs.filter(!isEval), docs.filter(isEval))
      .orderBy(col("doc_id"))
  }

  private val decontaminateSql =
    s"""WITH t AS (SELECT doc_id, $toksSql AS tk FROM documents),
       |sh AS (
       |  SELECT doc_id, list_distinct(list_filter(
       |    list_transform(tk, (x, i) -> CASE WHEN i + 4 <= len(tk)
       |      THEN x || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3] || ' ' || tk[i+4] END),
       |    s -> s IS NOT NULL)) AS s
       |  FROM t),
       |e AS (
       |  SELECT doc_id AS eval_doc, unnest(s) AS es FROM sh
       |  WHERE ${md5LongSql("'decon:' || cast(doc_id as varchar)")} % 20 = 0),
       |tr AS (
       |  SELECT doc_id, unnest(s) AS s FROM sh
       |  WHERE ${md5LongSql("'decon:' || cast(doc_id as varchar)")} % 20 <> 0),
       |hits AS (
       |  SELECT tr.doc_id,
       |    cast(count(DISTINCT tr.s) as bigint) AS sh,
       |    cast(count(DISTINCT e.eval_doc) as bigint) AS ed
       |  FROM tr JOIN e ON tr.s = e.es
       |  GROUP BY tr.doc_id)
       |SELECT d.doc_id,
       |  coalesce(h.sh, 0) AS n_shared_ngrams,
       |  coalesce(h.ed, 0) AS n_eval_docs,
       |  coalesce(h.sh, 0) > 0 AS contaminated
       |FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
       |WHERE ${md5LongSql("'decon:' || cast(d.doc_id as varchar)")} % 20 <> 0
       |ORDER BY d.doc_id""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("pipeline_training_data", trainingData _, Some(trainingDataSql)),
    QueryDef("pipeline_decontaminate", decontaminate _, Some(decontaminateSql)))
}
