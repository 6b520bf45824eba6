package graft.mr

import org.apache.spark.sql.{Dataset, Encoder, SparkSession}
import org.apache.spark.sql.functions.{col, input_file_name}

/** The reference's programming model (mr/src/worker.rs:24-25):
  *
  * {{{
  *   MapFn:    (key, value)    => Seq[(k2, v2)]
  *   ReduceFn: (k2, Seq[v2])   => (k2, out)
  * }}}
  *
  * re-expressed on `Dataset`. Spark's DAG scheduler plays the
  * coordinator (task table, retry, speculation — coordinator.rs
  * :88-160), and the shuffle service replaces the intermediate
  * JSON files (worker.rs:105-119). Two reduce shapes:
  *
  *  - `run` — associative/commutative combiner (`reduceByKey`
  *    semantics): partial aggregation on the map side, the only shape
  *    that scales to 100 TB hot keys;
  *  - `runGrouped` — the reference's exact signature (all values for
  *    a key materialized in one reducer call, worker.rs:122-141);
  *    values for one key must fit one executor's memory, as in the
  *    reference.
  */
object MapReduce {

  def run[K, V, K2, V2](
      input: Dataset[(K, V)],
      mapFn: (K, V) => IterableOnce[(K2, V2)],
      reduceFn: (V2, V2) => V2)(
      implicit ek2: Encoder[K2], etup: Encoder[(K2, V2)]): Dataset[(K2, V2)] =
    input
      .flatMap { case (k, v) => mapFn(k, v).iterator.toSeq }
      .groupByKey(_._1)
      .reduceGroups((a, b) => (a._1, reduceFn(a._2, b._2)))
      .map(_._2)

  def runGrouped[K, V, K2, V2, OUT](
      input: Dataset[(K, V)],
      mapFn: (K, V) => IterableOnce[(K2, V2)],
      reduceFn: (K2, Iterator[V2]) => OUT)(
      implicit ek2: Encoder[K2], etup: Encoder[(K2, V2)],
      eout: Encoder[OUT]): Dataset[OUT] =
    input
      .flatMap { case (k, v) => mapFn(k, v).iterator.toSeq }
      .groupByKey(_._1)
      .mapGroups((k, it) => reduceFn(k, it.map(_._2)))

  /** Reference input shape #1: whole file → (path, contents)
    * (worker.rs:108 reads the entire file as the map value). */
  def wholeTextFiles(spark: SparkSession, pathGlob: String): Dataset[(String, String)] = {
    import spark.implicits._
    spark.sparkContext.wholeTextFiles(pathGlob).toDS()
  }

  /** Reference input shape #2: line-numbered lines
    * (mr/tests/test.rs:21-31 keys each line by its line number;
    * here the key is file#offset, which is what that line number is
    * standing in for — a stable per-line id). */
  def textLines(spark: SparkSession, pathGlob: String): Dataset[(String, String)] = {
    import spark.implicits._
    spark.read.textFile(pathGlob)
      .withColumn("file", input_file_name())
      .select(col("file"), col("value"))
      .as[(String, String)]
  }
}
