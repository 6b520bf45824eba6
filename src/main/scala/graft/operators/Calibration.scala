package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-driven calibration of the hot-key df caps (round 15 —
  * VERDICT r14 #4).
  *
  * Every banded/fingerprint pair join in the library bounds its worst
  * case by dropping over-frequent keys before the join:
  * [[Dedup.winnowPairs]] (`maxDf`), [[Multimodal.videoDupStats]]
  * (`bandDfCap`), [[Relational.basketTopPairs]] (`minSupport`'s dual).
  * Their default caps were synthetic-corpus constants; this kernel
  * derives the cap FROM the corpus at a stated pair-mass budget — the
  * `q_cusum` h = measured-p87 discipline applied to join cost.
  *
  * Cost model: a key held by `df` documents contributes
  * `df·(df−1)/2` candidate pairs to the equi-join — pair mass is THE
  * cost the cap exists to bound (join output rows, shuffle bytes, and
  * verify work all scale with it). Given a budget B of candidate
  * pairs the caller is willing to generate, the recommendation is the
  * largest cap c such that the cumulative pair mass of all keys with
  * df ≤ c stays within B: every key the cap drops is provably more
  * expensive per key than every key it keeps, so at fixed budget this
  * cap maximizes the number of surviving keys (and near-dup recall is
  * monotone in surviving keys — genuine duplicate groups are the
  * low-df keys, corpus boilerplate the high-df ones).
  *
  * Plan shape (one pass + a bounded collect): one wordcount-shaped
  * groupBy for per-key df, a second tiny groupBy folding keys into a
  * df-histogram, and a driver-side cumulative scan over that
  * histogram. The collect is bounded by construction: the distinct
  * df values sum to ≤ |postings|, so there are at most √(2·|postings|)
  * of them (each distinct value ≥ its rank) — a 10-billion-posting
  * corpus yields ≤ ~141 k histogram rows, driver-trivial.
  */
object Calibration {

  /** The profile [[capProfile]] returns. `recommendedCap` is what a
    * caller feeds to `winnowPairs(maxDf = _)` /
    * `videoDupStats(bandDfCap = _)`; the mass/key fields are the
    * evidence (what the cap keeps, what it refuses to pay for). */
  case class CapProfile(
      recommendedCap: Long,
      keptPairMass: Long,
      droppedPairMass: Long,
      totalPairMass: Long,
      totalKeys: Long,
      droppedKeys: Long,
      maxDf: Long)

  /** Profile a postings frame (one row per (document, key) — e.g. the
    * (doc_id, fp_h) winnowing fingerprints, or (band, bv) video-hash
    * postings keyed by `keyCols`) and recommend the largest hot-key
    * cap whose kept candidate-pair mass fits `pairMassBudget`.
    *
    * `minCap` floors the recommendation (default 2): df = 2 keys ARE
    * the genuine duplicate pairs, so no budget — however tight — may
    * push the cap below finding an exact twin. When even the df ≤
    * minCap mass exceeds the budget, the floor wins and the profile's
    * `keptPairMass` reports the overrun honestly (the caller set a
    * budget below the corpus's irreducible duplicate mass; the right
    * response is a bigger budget, not a blind cap). */
  def capProfile(postings: DataFrame, keyCols: Seq[String],
      pairMassBudget: Long, minCap: Long = 2L): CapProfile = {
    require(keyCols.nonEmpty, "keyCols must name the posting key")
    require(pairMassBudget > 0, s"pairMassBudget must be > 0, got $pairMassBudget")
    require(minCap >= 2, s"minCap below 2 cannot keep any pair, got $minCap")
    // pass 1: per-key document frequency (wordcount shape, map-side
    // combined); pass 2: histogram over df — tiny by the √(2P) bound
    val hist = postings.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("df"))
      .groupBy(col("df")).agg(count(lit(1)).as("n_keys"))
      .select(col("df"), col("n_keys"),
        (col("n_keys") * col("df") * (col("df") - 1) / 2).cast("long").as("mass"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    if (hist.isEmpty)
      return CapProfile(minCap, 0L, 0L, 0L, 0L, 0L, 0L)
    val totalMass = hist.map(_._3).sum
    val totalKeys = hist.map(_._2).sum
    val maxDf = hist.last._1
    // cumulative scan ascending by df: the largest df whose cumulative
    // pair mass fits the budget, floored at minCap
    var cum = 0L
    var best = 0L
    hist.foreach { case (df, _, mass) =>
      cum += mass
      if (cum <= pairMassBudget) best = df
    }
    val cap = math.max(best, minCap)
    val kept = hist.filter(_._1 <= cap)
    val keptMassFinal = kept.map(_._3).sum
    val keptKeys = kept.map(_._2).sum
    CapProfile(
      recommendedCap = cap,
      keptPairMass = keptMassFinal,
      droppedPairMass = totalMass - keptMassFinal,
      totalPairMass = totalMass,
      totalKeys = totalKeys,
      droppedKeys = totalKeys - keptKeys,
      maxDf = maxDf)
  }
}
