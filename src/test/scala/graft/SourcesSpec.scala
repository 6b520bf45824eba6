package graft

import org.apache.spark.sql.functions._
import graft.sources.Sources
import graft.operators.Multimodal

class SourcesSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/out"

  test("parquet round-trip with partitioned layout") {
    val df = Tables.orders(spark, sf)
    val path = tmp("pq")
    Sources.writeParquet(df, path, partitionCols = Seq("o_orderstatus"))
    val back = Sources.readParquet(spark, path)
    assert(back.count() == df.count())
    // partition pruning: reading one partition dir touches only it
    val one = Sources.readParquet(spark, path)
      .filter(col("o_orderstatus") === "F")
    assert(one.count() == df.filter(col("o_orderstatus") === "F").count())
  }

  test("csv round-trip preserves rows") {
    val df = Tables.nation(spark, sf)
    val path = tmp("csv")
    Sources.writeCsv(df, path)
    val back = Sources.readCsv(spark, path, schema = Some(df.schema))
    assert(back.collect().toSet.size == df.count())
  }

  test("json round-trip preserves rows") {
    val df = Tables.region(spark, sf)
    val path = tmp("json")
    Sources.writeJson(df, path)
    val back = Sources.readJson(spark, path, schema = Some(df.schema))
    assert(back.count() == df.count())
  }

  test("multimodal resize/frame-sample stubs keep typed batch shape") {
    val raw = Multimodal.asBinary(spark, sf)
    val resized = Multimodal.resizeBatch(raw, 32, 32).collect()
    assert(resized.forall(r => r.width == 32 && r.height == 32))
    assert(resized.forall(r => r.payload.length <= 32 * 32 / 64))
    val frames = Multimodal.sampleFrames(raw, chunk = 50, stride = 2).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.frame_no % 2 == 0))
    assert(frames.forall(f => f.n_bytes <= 50))
  }

  test("multimodal decodeBatch: typed stub decode over binary payloads") {
    val raw = Multimodal.asBinary(spark, sf)
    val decoded = Multimodal.decodeBatch(raw).collect()
    assert(decoded.length == Tables.documents(spark, sf).count())
    assert(decoded.forall(d => d.width >= 16 && d.width < 80))
    assert(decoded.forall(_.channels == 3))
    // metadata agrees with the oracle-checked SQL form
    val sqlMeta = Multimodal.mmBinaryMeta(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(3), r.getInt(4))).toSet
    val typedMeta = decoded.map(d => (d.doc_id, d.width, d.height)).toSet
    assert(typedMeta == sqlMeta)
  }
}
