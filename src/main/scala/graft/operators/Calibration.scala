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

  /** One point on a cap's cost-recall frontier: how many of the
    * labeled duplicate pairs would still be CANDIDATES (≥ `minShared`
    * shared keys of df ≤ cap) if the join ran at this cap. */
  case class CapRecall(cap: Long, retainedPairs: Long, totalPairs: Long) {
    def recall: Double =
      if (totalPairs == 0L) 1.0 else retainedPairs.toDouble / totalPairs
  }

  /** Candidate-generation recall of each candidate `cap` against a
    * LABELED duplicate-pair sample — the validation step that must
    * follow [[capProfile]] (round 16, measured: the 32-pairs/posting
    * budget recommended cap 504 for the video bands, and the consumer
    * A/B showed that cap losing 6% of planted-pair recall because the
    * corpus's genuine pairs ride df-(504, 1024] keys — a pair-mass
    * budget prices COST only, so a recommendation is one point on the
    * cost-recall frontier until a labeled sample prices the RECALL
    * side).
    *
    * Semantics: a labeled pair (doc_a, doc_b) is RETAINED at `cap`
    * iff the two documents share ≥ `minShared` distinct keys whose
    * corpus df is ≤ `cap` — exactly the candidate-survival rule of the
    * capped equi-joins (`winnowPairs(maxDf)`, `videoDupStats
    * (bandDfCap)`); any downstream exact-verify step only removes
    * FALSE candidates, so this measures the recall the cap itself
    * forfeits. All caps are evaluated in ONE pass.
    *
    * Plan shape (labeled-sample-bounded): one df aggregate over the
    * postings (the [[capProfile]] pass), two equi-joins restricting
    * postings to the labeled docs (shuffle ∝ the sample's postings,
    * never the corpus pair mass), one conditional aggregate per cap,
    * and a 1-row collect. The labeled sample is small by construction
    * (it is hand-labeled), so at 100 TB the cost is the df aggregate —
    * which calibration already pays. */
  def recallAtCaps(postings: DataFrame, keyCols: Seq[String], docCol: String,
      labeledPairs: DataFrame, caps: Seq[Long],
      minShared: Long = 1L): Seq[CapRecall] = {
    require(keyCols.nonEmpty, "keyCols must name the posting key")
    require(caps.nonEmpty, "need at least one candidate cap")
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    // input hygiene (ADVICE r16): duplicate caps would alias-collide
    // the per-cap aggregate columns (AnalysisException), and duplicate
    // labeled rows would inflate `total` while the per-pair groupBy
    // dedupes the retained side — both deduped here so recall is a
    // pair-SET property whatever the caller feeds in
    val capsU = caps.distinct
    val pairsU = labeledPairs.select(col("doc_a"), col("doc_b")).distinct()
    val total = pairsU.count() // bounded: the labeled sample
    // df counts RAW posting rows (what the consumers' caps threshold —
    // video bands count every frame); key MEMBERSHIP per doc is
    // distinct (a key shared via many frames is still one shared key)
    val keyDf = postings.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("df"))
    val docKeys = postings
      .select((col(docCol).as("doc") +: keyCols.map(col)): _*)
      .distinct()
      .join(keyDf, keyCols)
    val aKeys = pairsU
      .join(docKeys, col("doc_a") === col("doc")).drop("doc")
    val shared = aKeys.join(
      docKeys.select((col("doc").as("doc_b") +: keyCols.map(col)): _*),
      Seq("doc_b") ++ keyCols)
    val perPair = shared
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(when(col("df") <= capsU.head, 1)).as(s"n_le_${capsU.head}"),
        capsU.tail.map(c =>
          count(when(col("df") <= c, 1)).as(s"n_le_$c")): _*)
    val rolled = perPair.agg(
      count(when(col(s"n_le_${capsU.head}") >= minShared, 1)).as(s"r_${capsU.head}"),
      capsU.tail.map(c =>
        count(when(col(s"n_le_$c") >= minShared, 1)).as(s"r_$c")): _*)
      .head()
    capsU.zipWithIndex.map { case (c, i) =>
      CapRecall(c, rolled.getLong(i), total)
    }
  }
}
