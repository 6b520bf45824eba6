package probe
import org.apache.spark.sql.functions._

/** Micro A/B: interpreted transform(_.cast) vs native array cast, and
  * the zip_with d2 fold vs dot-based forms, over an amplified
  * embeddings frame (2000 rows x 200 copies = 400k rows). */
object CastProbe {
  def main(args: Array[String]): Unit = {
    sys.props("spark.sql.files.maxPartitionBytes") = "16m"
    sys.props("spark.ui.enabled") = "false"
    val spark = graft.GraftSession.build(cores = 32, master = Some("local[32]"))
    spark.sparkContext.setLogLevel("ERROR")
    val base = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      .crossJoin(spark.range(200))
      .repartition(32)
      .persist()
    println("PROBE rows=" + base.count())
    def time(label: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warm codegen
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"PROBE $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    time("transform-cast") {
      base.select(transform(col("embedding"), x => x.cast("double")).as("v"))
        .select(graft.functions.VectorFunctions.norm(col("v")).as("n"))
    }
    time("native-cast") {
      base.select(col("embedding").cast("array<double>").as("v"))
        .select(graft.functions.VectorFunctions.norm(col("v")).as("n"))
    }
    val dv = base.select(col("embedding").cast("array<double>").as("v"),
      col("vec_id"))
    val cb = (0 until 16).map(i => (0 until 16).map(j => (i * 17 + j) / 256.0))
    time("zipwith-d2-fold") {
      dv.select((0 until 4).map { m =>
        val sub = slice(col("v"), m * 16 + 1, 16)
        val terms = cb.map(c =>
          aggregate(zip_with(typedLit(c), sub, (a, b) => (a - b) * (a - b)),
            lit(0.0), (acc, x) => acc + x))
        least(terms: _*).as(s"d$m")
      }: _*)
    }
    spark.stop()
  }
}
