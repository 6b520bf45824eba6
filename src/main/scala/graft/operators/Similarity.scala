package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.CrossEngine.{rnd, rndSql}
import graft.functions.VectorFunctions

/** Similarity search over the embedding column (SURVEY.md §2 F).
  *
  * `ann_bruteforce` is the exact baseline: the (tiny) query set is
  * broadcast against the corpus — one scan, per-partition top-k via
  * the rank window. `ann_ivf` is the scale path: vectors are
  * assigned to deterministic centroids once (linear), and each query
  * only scans its 2 closest clusters (~nprobe/nlist of the corpus).
  * At 100 TB the assignment is a write-once partitioning (cluster id
  * = partition key), making the probe a partition-pruned scan.
  *
  * All vector math is element-wise double with a sequential left
  * fold — bit-identical between Spark and the DuckDB oracle.
  */
object Similarity {

  private val NQueries = 5    // query set: vec_id < 5
  private val NCentroids = 10 // centroids: vec_id < 10
  private val NProbe = 2
  private val TopK = 5

  /** (vec_id, label, v: array<double>, nrm) — norm and dot products
    * via the native codegen'd expressions in VectorFunctions (same
    * sequential fold as the HOF form, no per-pair allocation). */
  private def vecs(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("nrm", VectorFunctions.norm(col("v")))

  private def dot(a: Column, b: Column): Column = VectorFunctions.dot(a, b)

  private val vecsSql =
    """SELECT vec_id, label,
      |    list_transform(embedding, x -> cast(x as double)) AS v,
      |    sqrt(list_reduce(list_transform(
      |      list_transform(embedding, x -> cast(x as double)), x -> x * x),
      |      (x, y) -> x + y)) AS nrm
      |  FROM embeddings""".stripMargin

  private def dotSql(a: String, b: String) =
    s"list_reduce(list_transform($a, (x, i) -> x * $b[i]), (x, y) -> x + y)"

  // ---------------------------------------------------------------- brute force
  /** Exact cosine top-k for each query vector (query set broadcast). */
  def annBruteforce(spark: SparkSession, dir: String): DataFrame = {
    val e = vecs(spark, dir)
    val q = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    e.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .withColumn("cos", dot(col("qv"), col("v")) / (col("qn") * col("nrm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= TopK)
      .select(col("q_id"), col("vec_id").as("neighbor_id"), col("rank"),
        rnd(col("cos"), 6).as("cos_sim"))
      .orderBy(col("q_id"), col("rank"))
  }

  private val annBruteforceSql =
    s"""WITH e AS ($vecsSql),
       |q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM e WHERE vec_id < $NQueries),
       |scored AS (
       |  SELECT q.q_id, e.vec_id,
       |    ${dotSql("q.qv", "e.v")} / (q.qn * e.nrm) AS cos
       |  FROM e JOIN q ON e.vec_id <> q.q_id),
       |ranked AS (
       |  SELECT q_id, vec_id, cos,
       |    cast(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) as int) AS rank
       |  FROM scored)
       |SELECT q_id, vec_id AS neighbor_id, rank,
       |  ${rndSql("cos", 6)} AS cos_sim
       |FROM ranked WHERE rank <= $TopK
       |ORDER BY q_id, rank""".stripMargin

  // ---------------------------------------------------------------- IVF
  /** IVF-bucketed ANN: assign every vector to its closest of
    * `NCentroids` deterministic centroids (the vectors with the
    * lowest ids), then each query probes only its `NProbe` closest
    * clusters and ranks candidates exactly. */
  def annIvf(spark: SparkSession, dir: String): DataFrame = {
    val e = vecs(spark, dir)
    val cent = e.filter(col("vec_id") < NCentroids)
      .select(col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cn"))

    // vector → nearest centroid (linear pass, broadcast centroids)
    val wAssign = Window.partitionBy(col("vec_id")).orderBy(col("ccos").desc, col("c_id"))
    val assigned = e.join(broadcast(cent), lit(true))
      .withColumn("ccos", dot(col("cv"), col("v")) / (col("cn") * col("nrm")))
      .withColumn("crank", row_number().over(wAssign))
      .filter(col("crank") === 1)
      .select(col("vec_id"), col("label"), col("v"), col("nrm"), col("c_id").as("cluster"))

    // query → its NProbe closest clusters
    val q = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    val wProbe = Window.partitionBy(col("q_id")).orderBy(col("qcos").desc, col("c_id"))
    val probes = q.join(broadcast(cent), lit(true))
      .withColumn("qcos", dot(col("cv"), col("qv")) / (col("cn") * col("qn")))
      .withColumn("prank", row_number().over(wProbe))
      .filter(col("prank") <= NProbe)
      .select(col("q_id"), col("qv"), col("qn"), col("c_id").as("probe_cluster"))

    // rank candidates inside probed clusters only
    val wRank = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    assigned.join(probes,
        col("cluster") === col("probe_cluster") && col("vec_id") =!= col("q_id"))
      .withColumn("cos", dot(col("qv"), col("v")) / (col("qn") * col("nrm")))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= TopK)
      .select(col("q_id"), col("vec_id").as("neighbor_id"), col("rank"),
        rnd(col("cos"), 6).as("cos_sim"))
      .orderBy(col("q_id"), col("rank"))
  }

  private val annIvfSql =
    s"""WITH e AS ($vecsSql),
       |cent AS (SELECT vec_id AS c_id, v AS cv, nrm AS cn FROM e WHERE vec_id < $NCentroids),
       |assigned AS (
       |  SELECT vec_id, v, nrm, cluster FROM (
       |    SELECT e.vec_id, e.v, e.nrm, cent.c_id AS cluster,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${dotSql("cent.cv", "e.v")} / (cent.cn * e.nrm) DESC, cent.c_id)
       |        AS crank
       |    FROM e CROSS JOIN cent)
       |  WHERE crank = 1),
       |q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM e WHERE vec_id < $NQueries),
       |probes AS (
       |  SELECT q_id, qv, qn, probe_cluster FROM (
       |    SELECT q.q_id, q.qv, q.qn, cent.c_id AS probe_cluster,
       |      row_number() OVER (PARTITION BY q.q_id
       |        ORDER BY ${dotSql("cent.cv", "q.qv")} / (cent.cn * q.qn) DESC, cent.c_id)
       |        AS prank
       |    FROM q CROSS JOIN cent)
       |  WHERE prank <= $NProbe),
       |scored AS (
       |  SELECT p.q_id, a.vec_id,
       |    ${dotSql("p.qv", "a.v")} / (p.qn * a.nrm) AS cos
       |  FROM assigned a JOIN probes p
       |    ON a.cluster = p.probe_cluster AND a.vec_id <> p.q_id),
       |ranked AS (
       |  SELECT q_id, vec_id, cos,
       |    cast(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) as int) AS rank
       |  FROM scored)
       |SELECT q_id, vec_id AS neighbor_id, rank,
       |  ${rndSql("cos", 6)} AS cos_sim
       |FROM ranked WHERE rank <= $TopK
       |ORDER BY q_id, rank""".stripMargin

  // ---------------------------------------------------------------- registry
  def defs: Seq[QueryDef] = Seq(
    QueryDef("ann_bruteforce", annBruteforce _, Some(annBruteforceSql)),
    QueryDef("ann_ivf", annIvf _, Some(annIvfSql)))
}
