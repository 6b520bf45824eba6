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

  def defs: Seq[QueryDef] = Seq(
    QueryDef("pipeline_training_data", trainingData _, Some(trainingDataSql)))
}
