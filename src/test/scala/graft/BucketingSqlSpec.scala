package graft

import org.apache.spark.sql.functions._
import graft.sources.Sources

class BucketingSqlSpec extends SparkSpec {

  test("bucketed tables join without a shuffle") {
    val s = spark
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    try {
      Sources.writeBucketed(
        Tables.orders(s, sf).select("o_orderkey", "o_custkey", "o_totalprice"),
        "orders_b", "o_custkey", 8)
      Sources.writeBucketed(
        Tables.customer(s, sf).select("c_custkey", "c_name"),
        "customer_b", "c_custkey", 8)
      val joined = s.table("orders_b")
        .join(s.table("customer_b"), col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() > 0)
    } finally {
      s.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      s.sql("DROP TABLE IF EXISTS orders_b")
      s.sql("DROP TABLE IF EXISTS customer_b")
    }
  }

  test("md5-bucketed corpus layout makes exact dedup exchange-free") {
    val s = spark
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // ingest-time layout: materialize the dedup key and bucket on it
      // — the one-off write pre-pays the exchange every later curation
      // run would otherwise repeat over the full corpus
      val docs = Tables.documents(s, sf).withColumn("text_md5", md5(col("text")))
      Sources.writeBucketed(docs, "documents_md5_b", "text_md5", 8)
      val dedup = s.table("documents_md5_b")
        .groupBy(col("text_md5"))
        .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("n_copies"))
      val plan = dedup.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed dedup aggregate should not shuffle:\n$plan")
      // identical results to the raw-layout operator
      val bucketed = dedup.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val raw = graft.operators.Dedup.dedupExact(s, sf).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(bucketed == raw)
    } finally {
      s.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      s.sql("DROP TABLE IF EXISTS documents_md5_b")
    }
  }

  test("doc_id-bucketed corpus: per-doc aggregation over exploded tokens has no exchange") {
    val s = spark
    try {
      // the layout the signature operators (minhash/simhash) want:
      // bucketed by doc_id, their per-doc groupBys need no repartition
      Sources.writeBucketed(Tables.documents(s, sf), "documents_doc_b", "doc_id", 8)
      val perDoc = s.table("documents_doc_b")
        .select(col("doc_id"),
          explode(filter(split(col("text"), "\\s+"), t => t =!= "")).as("tok"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"), countDistinct(col("tok")).as("n_distinct"))
      val plan = perDoc.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed per-doc aggregate should not shuffle:\n$plan")
      assert(perDoc.count() == Tables.documents(s, sf).count())
    } finally {
      s.sql("DROP TABLE IF EXISTS documents_doc_b")
    }
  }

  test("signature kernels are per-row: zero exchanges on any layout, same sigs across layouts") {
    val s = spark
    try {
      Sources.writeBucketed(Tables.documents(s, sf), "documents_sig_b", "doc_id", 8)
      val bucketed = s.table("documents_sig_b")
      val raw = Tables.documents(s, sf)

      // the signature stage is a pure map: no Exchange of ANY kind
      Seq(graft.operators.Dedup.minhashSignatures(raw),
          graft.operators.Dedup.simhashSignatures(raw)).foreach { sig =>
        val plan = sig.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange"),
          s"signature kernel should be shuffle-free:\n$plan")
      }

      // identical signatures regardless of input layout
      val mhRaw = graft.operators.Dedup.minhashSignatures(raw).collect()
        .map(r => (0 to 8).map(r.get).mkString("|")).toSet
      val mhB = graft.operators.Dedup.minhashSignatures(bucketed).collect()
        .map(r => (0 to 8).map(r.get).mkString("|")).toSet
      assert(mhB == mhRaw)
      val shRaw = graft.operators.Dedup.simhashSignatures(raw).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      val shB = graft.operators.Dedup.simhashSignatures(bucketed).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(shB == shRaw)
    } finally {
      s.sql("DROP TABLE IF EXISTS documents_sig_b")
    }
  }

  test("whole surface reachable through spark.sql over registered views") {
    val s = spark
    Sources.createViews(s, sf)
    val revenue = s.sql(
      """SELECT n_name, count(*) AS n
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n DESC LIMIT 3""".stripMargin).collect()
    assert(revenue.length == 3)
    val sessions = s.sql(
      "SELECT count(*) FROM events WHERE event_type = 'purchase'").collect()(0).getLong(0)
    assert(sessions > 0)
  }
}
