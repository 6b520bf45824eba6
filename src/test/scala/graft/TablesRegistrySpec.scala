package graft

import org.apache.spark.sql.functions._

/** Contract of the Tables schema registry (VERDICT r14 #7): repeated
  * loads skip parquet-footer schema inference WITHOUT sharing frame
  * objects, and a regenerated source dir invalidates the cached entry
  * via the source fingerprint instead of serving a stale schema. */
class TablesRegistrySpec extends SparkSpec {

  test("repeated loads return frames with DISTINCT attribute ids (self-join safe)") {
    Tables.clearAllRegistries()
    val a = Tables.lineitem(spark, sf)
    val b = Tables.lineitem(spark, sf) // served from the schema cache
    val idsA = a.queryExecution.analyzed.output.map(_.exprId).toSet
    val idsB = b.queryExecution.analyzed.output.map(_.exprId).toSet
    assert(idsA.intersect(idsB).isEmpty,
      "cached-schema loads must mint fresh AttributeReferences — a shared " +
        "frame object would make lineitem ⋈ lineitem an ambiguous self-join")
    // and the self-join actually works end to end: per-key match count
    // is n² for a key appearing n times on both sides
    val j = a.join(b, a("l_orderkey") === b("l_orderkey") &&
      a("l_linenumber") === b("l_linenumber"))
    val expected = a.groupBy("l_orderkey", "l_linenumber").count()
      .agg(sum(col("count") * col("count"))).head().getLong(0)
    assert(j.count() == expected)
  }

  test("cached schema equals the inferred schema exactly") {
    Tables.clearAllRegistries()
    val first = Tables.orders(spark, sf).schema  // populates the cache
    val second = Tables.orders(spark, sf).schema // served from it
    assert(first == second)
    assert(first == spark.read.parquet(s"$sf/orders.parquet").schema)
  }

  test("regenerating a source dir invalidates the cached schema (fingerprint)") {
    val dir = java.nio.file.Files.createTempDirectory("tables-reg").toString
    val s = spark
    import s.implicits._
    Seq((1, "a"), (2, "b")).toDF("k", "v")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Tables.clearAllRegistries()
    assert(Tables.load(spark, dir, "documents").columns.toSeq == Seq("k", "v"))
    // overwrite with a DIFFERENT schema — byte size and file content change,
    // so the fingerprint changes and the stale (k, v) entry must not serve
    Seq((1, "a", 9L)).toDF("k", "v", "extra")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    assert(Tables.load(spark, dir, "documents").columns.toSeq ==
      Seq("k", "v", "extra"))
    val fresh = Tables.load(spark, dir, "documents")
    assert(fresh.agg(sum(col("extra"))).head().getLong(0) == 9L)
  }

  test("CacheHygiene.sweep clears size estimates but keeps the schema registry warm") {
    Tables.clearAllRegistries()
    // warm both registries
    val hinted = Tables.dimHint(Tables.customer(spark, sf))
    assert(hinted != null)
    val t0 = System.nanoTime()
    Tables.customer(spark, sf) // warm-path load
    val warmNs = System.nanoTime() - t0
    CacheHygiene.sweep(spark)
    // post-sweep load must still be the cached-schema path: bound it by a
    // generous multiple of the measured warm load rather than an absolute
    // time (box-speed independent)
    val t1 = System.nanoTime()
    Tables.customer(spark, sf)
    val postSweepNs = System.nanoTime() - t1
    assert(postSweepNs < math.max(warmNs * 20, 200_000_000L),
      s"post-sweep load took ${postSweepNs / 1e6} ms vs warm ${warmNs / 1e6} ms " +
        "— sweep must not evict the schema registry")
  }
}
