package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One oracle-checked operator from SURVEY.md §2: a Spark query plus
  * (when SQL-expressible) the equivalent DuckDB oracle SQL. Modules
  * expose `defs: Seq[QueryDef]`; SparkEntry aggregates them.
  */
case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])
