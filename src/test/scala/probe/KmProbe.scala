package probe
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Decompose one Lloyd round of the ann_kmeans trainer: assign-only,
  * update-agg-only, collect, and repeated rounds with fresh vs fixed
  * centroid literals (janino-cache hypothesis). */
object KmProbe {
  def main(args: Array[String]): Unit = {
    sys.props("spark.sql.files.maxPartitionBytes") = "16m"
    sys.props("spark.ui.enabled") = "false"
    val spark = graft.GraftSession.build(cores = 32, master = Some("local[32]"))
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.VectorFunctions
    val e = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", VectorFunctions.norm(col("v")))
      .persist()
    e.count()
    val dim = 64
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"PROBE $label%-34s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    val cents0 = graft.operators.Similarity.collectCentroids(
      e.filter(col("vec_id") < 10)
        .select(col("vec_id").cast("int").as("c_id"), col("v").as("cv")))
    def assign(cents: Seq[(Int, Seq[Double], Double)]): DataFrame =
      e.withColumn("cluster",
        graft.operators.Similarity.nearestCentroid(cents, col("v"), col("nrm")))
        .select(col("vec_id"), col("v"), col("cluster"))
    def update(assigned: DataFrame): DataFrame =
      assigned
        .filter(col("v").isNotNull && size(col("v")) === dim)
        .groupBy(col("cluster"))
        .agg(array((0 until dim).map { i =>
          (sum(element_at(col("v"), i + 1).cast("decimal(28,12)")).cast("double")
            / count(lit(1))).as(s"m$i")
        }: _*).as("cv"))
        .select(col("cluster").as("c_id"), col("cv"))
    // warm all code paths once
    var cents = cents0
    cents = graft.operators.Similarity.collectCentroids(update(assign(cents)))
    time("assign-only noop")(assign(cents0).write.format("noop").mode("overwrite").save())
    time("assign-only noop again")(assign(cents0).write.format("noop").mode("overwrite").save())
    for (r <- 1 to 4)
      time(s"round fresh-cents $r") {
        cents = graft.operators.Similarity.collectCentroids(update(assign(cents)))
      }
    for (r <- 1 to 3)
      time(s"round FIXED-cents $r") {
        graft.operators.Similarity.collectCentroids(update(assign(cents0)))
      }
    // update WITHOUT the decimal cast (timing only; different rounding)
    def updateDouble(assigned: DataFrame): DataFrame =
      assigned
        .filter(col("v").isNotNull && size(col("v")) === dim)
        .groupBy(col("cluster"))
        .agg(array((0 until dim).map { i =>
          (sum(element_at(col("v"), i + 1)) / count(lit(1))).as(s"m$i")
        }: _*).as("cv"))
        .select(col("cluster").as("c_id"), col("cv"))
    graft.operators.Similarity.collectCentroids(updateDouble(assign(cents0)))
    for (r <- 1 to 2)
      time(s"round double-sum $r") {
        graft.operators.Similarity.collectCentroids(updateDouble(assign(cents0)))
      }
    spark.stop()
  }
}
