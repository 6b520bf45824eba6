package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity, TextAnalysis}

class DedupSimilaritySpec extends SparkSpec {

  test("dedup_exact covers every document exactly once") {
    val df = Dedup.dedupExact(spark, sf)
    val total = df.agg(sum("n_copies")).collect()(0).getLong(0)
    assert(total == Tables.documents(spark, sf).count())
  }

  test("normalized dedup: case/punct/whitespace variants collapse, distinct texts do not") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    // three byte-distinct scrapes of one page (case, punctuation,
    // whitespace), one genuinely different doc — exact dedup sees 4
    // groups, normalized dedup must see 2
    val docs = Seq(
      (1L, "The quick Brown fox."),
      (2L, "the  quick brown fox"),
      (3L, "THE QUICK, BROWN FOX!!"),
      (4L, "a different document")
    ).toDF("doc_id", "text")
    val groups = docs
      .groupBy(md5(Dedup.normText(col("text"))).as("k"))
      .agg(min("doc_id").as("keep"), count(lit(1)).as("n"),
        countDistinct(md5(col("text"))).as("raw"))
      .collect()
    assert(groups.length == 2)
    val merged = groups.find(_.getLong(2) == 3L).get
    assert(merged.getLong(1) == 1L && merged.getLong(3) == 3L,
      "the three variants must collapse to doc 1 with 3 raw variants")
    assert(docs.select(md5(col("text"))).distinct().count() == 4,
      "exact hashing must NOT merge them — that is the tier gap")
  }

  test("CDC chunking: one inserted token re-syncs; fixed chunks lose every later chunk") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    // ~100 distinct-ish tokens → ~12 content-defined boundaries at m=8
    val base = (0 until 96).map(i => s"w${(i * 37) % 101}x$i").mkString(" ")
    val docs = Seq((1L, base), (2L, "inserted " + base)).toDF("doc_id", "text")
    def shareOf(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
      df.collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val cdc = shareOf(Dedup.cdcChunkStats(docs))
    val fixed = shareOf(Dedup.chunkDupStats(docs, 8))
    // CDC: boundaries re-synchronize after the insertion point — all
    // but the first chunk of doc 2 still match doc 1
    assert(cdc(2L) > 0.5,
      s"CDC must re-sync past the insertion: doc-2 dup_share ${cdc(2L)}")
    // fixed chunks: the one-token shift changes EVERY chunk's content
    assert(fixed.getOrElse(2L, 0.0) == 0.0,
      s"fixed chunks must all shift: doc-2 dup_share ${fixed.get(2L)}")
    assert(cdc(1L) > 0.5, "the original doc shares the same re-synced chunks")
  }

  test("dedup_jaccard pairs are ordered and above threshold") {
    val rows = Dedup.dedupJaccard(spark, sf).collect()
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
    assert(rows.forall(_.getDouble(2) >= 0.8))
  }

  test("two-stage jaccard fallback: precision 1.0 and high-J recall vs the exact baseline") {
    val s = spark
    import s.implicits._
    // a corpus the bitmask path cannot take (vocab > 64): 80 distinct
    // tokens; planted pairs at J = 1.0 and J ≈ 0.9, plus disjoint docs
    val vocab = (0 until 80).map(i => f"w$i%02d")
    def doc(ids: Seq[Int]) = ids.map(vocab).mkString(" ")
    val docs = Seq(
      (0L, "en", doc(0 until 20)),
      (1L, "en", doc(0 until 20)),            // J=1.0 with doc 0
      (2L, "en", doc(0 until 18) ++ " " ++ doc(Seq(20, 21))), // J=18/22≈0.82
      (3L, "en", doc(30 until 50)),
      (4L, "en", doc(Seq(30, 31, 32, 33, 34, 35, 36, 37, 38, 39, 40, 41, 42, 43, 44, 45, 46, 47, 48, 50))), // J=19/21≈0.90
      (5L, "en", doc(60 until 80)),           // disjoint from all
      (6L, "fr", doc(0 until 20))             // cross-lang: never paired
    ).toDF("doc_id", "lang", "text")
    val t = docs.select(col("doc_id"), col("lang"),
      array_distinct(filter(split(col("text"), "\\s+"), x => x =!= "")).as("s"))
    val exact = Dedup.jaccardTokenJoinExact(t).collect().toSeq
    val two = Dedup.jaccardTwoStage(t).collect().toSeq
    // precision 1.0: every two-stage pair is an exact pair, same jaccard
    assert(two.toSet.subsetOf(exact.toSet),
      s"two-stage emitted a non-exact pair: ${two.toSet -- exact.toSet}")
    // recall at the high-J band this corpus plants: identical docs
    // share every minhash (J=1.0 ⇒ miss probability 0), J≈0.9 pairs
    // miss with probability (1-J²)⁴ ≈ 0.1% — both must be present
    val twoPairs = two.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(twoPairs.contains((0L, 1L)), "J=1.0 pair must always be found")
    assert(twoPairs.contains((3L, 4L)), "J=0.90 pair expected (miss prob ~0.1%)")
    assert(exact.size >= two.size)
  }

  test("two-stage small components are EXACT; one big component keeps banding recall") {
    val s = spark
    import s.implicits._
    // 40 disjoint 30-token vocabulary blocks (global vocab 1200 ≫ 512
    // — the dispatcher would take this path) + one 80-token CHAINED
    // block whose sets overlap into a single > 64-token component.
    // Small components must reproduce the exact baseline VERBATIM
    // (mask path, total recall); the big component keeps the minhash
    // recall bound, so the J=1.0 planted pair there must still appear.
    def blockDoc(b: Int, ids: Seq[Int]) = ids.map(i => f"b${b}%02d_t$i%02d").mkString(" ")
    val smallDocs = (0 until 40).flatMap { b =>
      val base = 1000L * b
      Seq(
        (base + 0, "en", blockDoc(b, 0 until 20)),
        (base + 1, "en", blockDoc(b, 0 until 20)),          // J=1.0
        (base + 2, "en", blockDoc(b, (0 until 18) ++ Seq(20, 21))), // J=18/22
        (base + 3, "en", blockDoc(b, 5 until 25)))          // J=15/25 vs doc0
    }
    val chain = (0 until 20).map { i => // windows [3i, 3i+20) over 80 toks
      (100000L + i, "en", (3 * i until 3 * i + 20).map(t => f"big_t$t%02d").mkString(" "))
    } :+ (200000L, "en", (0 until 20).map(t => f"big_t$t%02d").mkString(" ")) // dup of window 0
    val docs = (smallDocs ++ chain).toDF("doc_id", "lang", "text")
    val t = docs.select(col("doc_id"), col("lang"),
      array_distinct(filter(split(col("text"), "\\s+"), x => x =!= "")).as("s"))
    val exact = Dedup.jaccardTokenJoinExact(t).collect().toSeq
    val two = Dedup.jaccardTwoStage(t).collect().toSeq
    assert(two.toSet.subsetOf(exact.toSet),
      s"two-stage emitted a non-exact pair: ${two.toSet -- exact.toSet}")
    // every exact pair among the small blocks must be present (mask
    // path total recall); doc ids < 100000 are the small blocks
    val smallExact = exact.filter(r => r.getLong(0) < 100000L).toSet
    val smallTwo = two.filter(r => r.getLong(0) < 100000L).toSet
    assert(smallTwo == smallExact,
      s"small-component path missed exact pairs: ${smallExact -- smallTwo}")
    // the planted J=1.0 pair in the big chained component survives
    // banding (identical sets group together: total recall via intra)
    assert(two.map(r => (r.getLong(0), r.getLong(1))).contains((100000L, 200000L)))
  }

  test("multi-word-mask jaccard tier equals the exact token-join baseline") {
    val s = spark
    import s.implicits._
    // 100-token vocab (> 64 forces the 2-word mask), dup-dense: many
    // overlapping subsets so intra (J=1.0) and inter groups both occur
    val vocab = (0 until 100).map(i => f"t$i%03d")
    def doc(ids: Seq[Int]) = ids.map(vocab).mkString(" ")
    // sliding 20-token windows over an 80-token ring: every lang sees
    // all 80 tokens; d and d+20 share a window (J=1.0 intra groups),
    // adjacent windows overlap at J=16/24≈0.67 (below threshold), and
    // doc 200 plants an inter pair at J=19/21≈0.905 with doc 0
    val docs = (0 until 30).map { d =>
      (d.toLong, "en", doc((d * 4 until d * 4 + 20).map(_ % 80)))
    } ++ (0 until 30).map { d =>
      (100L + d, "fr", doc((d * 4 until d * 4 + 20).map(_ % 80)))
    } ++ Seq((200L, "en", doc((0 until 19) :+ 50)))
    val t = docs.toDF("doc_id", "lang", "text").select(col("doc_id"), col("lang"),
      array_distinct(filter(split(col("text"), "\\s+"), x => x =!= "")).as("s"))
    val langVocab = t.select(col("lang"), explode(col("s")).as("tok")).distinct()
      .groupBy(col("lang")).agg(sort_array(collect_set(col("tok"))).as("v"))
      .collect().map(r => (r.getString(0), r.getSeq[String](1)))
    assert(langVocab.exists(_._2.size > 64), "corpus must force the multi-word tier")
    val exact = Dedup.jaccardTokenJoinExact(t).collect().toSeq
    val mask = Dedup.jaccardMaskWide(spark, t, langVocab).collect().toSeq
    assert(exact.nonEmpty, "corpus should contain qualifying pairs")
    assert(mask == exact,
      s"mask tier must have total recall: ${exact.size} exact vs ${mask.size} mask")
  }

  test("clustered dedup_embedding equals the exact all-pairs baseline when k = 1") {
    // at sf0.01 (n=500 < 2560) the corpus-scaled k is 1, so the
    // cluster scope degenerates to the label blocks — outputs equal
    val exact = Dedup.dedupEmbeddingExact(spark, sf).collect().toSeq
    val clustered = Similarity.dedupEmbeddingClustered(spark, sf).collect().toSeq
    assert(exact.nonEmpty, "corpus should contain qualifying pairs")
    assert(clustered == exact)
  }

  test("minhash candidates are a superset of exact-duplicate docs") {
    // any pair with identical text must share all 4 bands
    val mh = Dedup.dedupMinhash(spark, sf)
    assert(mh.filter(col("n_shared_bands") > 4).count() == 0)
  }

  test("simhash hamming bounded by threshold") {
    val df = Dedup.dedupSimhash(spark, sf)
    assert(df.filter(col("hamming") > 3).count() == 0)
  }

  test("ann_bruteforce: k results per query, ranks contiguous, cos descending") {
    val rows = Similarity.annBruteforce(spark, sf).collect()
    val perQ = rows.groupBy(_.getLong(0))
    assert(perQ.size == 5)
    perQ.values.foreach { rs =>
      val sorted = rs.sortBy(_.getInt(2))
      assert(sorted.map(_.getInt(2)).sameElements(1 to rs.length))
      val coss = sorted.map(_.getDouble(3))
      assert(coss.zip(coss.tail).forall { case (a, b) => a >= b })
    }
  }

  test("ann_ivf recall: probed top-1 matches brute force top-1 for most queries") {
    val bf = Similarity.annBruteforce(spark, sf).filter(col("rank") === 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ivf = Similarity.annIvf(spark, sf).filter(col("rank") === 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // IVF probes 2/10 clusters; exact-match recall@1 of >= 2/5 queries
    // is the data-calibrated floor for random vectors
    val hits = bf.count { case (q, n) => ivf.get(q).contains(n) }
    assert(hits >= 2, s"IVF top-1 recall too low: $hits/5")
  }

  test("dedup clusters equal a brute-force union-find over the verified pairs") {
    val pairs = Dedup.pipelineFuzzyDedup(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val docs = Tables.documents(spark, sf).select("doc_id")
      .collect().map(_.getLong(0))
    // driver-side union-find as the independent oracle
    val parent = scala.collection.mutable.Map(docs.map(d => d -> d): _*)
    def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = docs.map(d => d -> find(d)).toMap
    val got = Dedup.pipelineDedupClusters(spark, sf)
      .select("doc_id", "cluster_id", "cluster_size", "keep").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(got.map(g => g._1 -> g._2).toMap == expected)
    val sizes = expected.values.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(got.forall(g => g._3 == sizes(g._2)))
    assert(got.forall(g => g._4 == (g._1 == g._2)))
  }

  test("tfidf: <=3 terms per doc, df consistent with term spread, score = tf*N/df") {
    val n = Tables.documents(spark, sf).count()
    val rows = TextAnalysis.textTfidf(spark, sf).collect()
    val perDoc = rows.groupBy(_.getLong(0))
    assert(perDoc.values.forall(_.length <= 3))
    rows.foreach { r =>
      val (tf, df, score) = (r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(df >= 1 && df <= n)
      assert(score == tf.toDouble * n / df)
    }
  }

  test("stratified sample draws exactly ceil(n/10) docs per lang stratum") {
    val strata = Tables.documents(spark, sf).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = graft.operators.ScalarOps.qSampleStratified(spark, sf)
      .groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet == strata.keySet)
    got.foreach { case (lang, c) => assert(c == (strata(lang) + 9) / 10) }
  }

  test("text fingerprints are distinct for distinct docs (content_fp)") {
    val fps = TextAnalysis.textFingerprint(spark, sf)
      .select("content_fp").collect().map(_.getLong(0))
    assert(fps.length == fps.distinct.length)
  }

  test("incremental dedup: file-backed index path equals the inline query") {
    import graft.sources.ManifestTable
    val docs = Tables.documents(spark, sf)
    val maxId = docs.agg(max("doc_id")).head.getLong(0)
    val split = maxId * 4 / 5
    val corpus = docs.filter(col("doc_id") < split)
    val batch = docs.filter(col("doc_id") >= split)

    val inline = graft.operators.Dedup.dedupIncremental(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(inline.nonEmpty) // dup-dense synthetic corpus: non-vacuous

    // one-shot: write the index, probe the whole batch
    val tmp = java.nio.file.Files.createTempDirectory("mh-index").toString
    graft.operators.Dedup.writeMinhashIndex(corpus, tmp)
    val oneShot = graft.operators.Dedup
      .dedupAgainstIndex(ManifestTable.read(spark, tmp), batch)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(oneShot == inline)

    // two-step: probe/fold the first half, then probe the second —
    // same union (id-ordered batches keep every bucket's canonical)
    val v0 = ManifestTable.current(spark, tmp).get._1
    val mid = (split + maxId) / 2
    val b1 = batch.filter(col("doc_id") < mid)
    val b2 = batch.filter(col("doc_id") >= mid)
    val r1 = graft.operators.Dedup
      .dedupAgainstIndex(ManifestTable.read(spark, tmp), b1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    graft.operators.Dedup.updateMinhashIndex(b1, tmp)
    val r2 = graft.operators.Dedup
      .dedupAgainstIndex(ManifestTable.read(spark, tmp), b2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert((r1 union r2) == inline)

    // the fold-in advanced the manifest version atomically
    assert(ManifestTable.current(spark, tmp).map(_._1).contains(v0 + 1))
  }

  test("semantic dedup: delete-list valid, survivors pairwise below tau") {
    val tau = 0.35 // SemDedupTau (private in Similarity)
    val dropped = Similarity.dedupSemantic(spark, sf).collect()
    assert(dropped.nonEmpty) // non-vacuous at sf0.001 (69 planted)
    // every dropped row names a LOWER-id keeper above the floor
    dropped.foreach { r =>
      assert(r.getLong(2) < r.getLong(0)) // dup_of < vec_id
      assert(r.getDouble(3) >= tau)
    }
    // the SemDeDup guarantee: after applying the delete-list, no
    // within-cluster pair >= tau survives (if y survived, every
    // lower-id cluster-mate x — kept or dropped — had cos(x,y) < tau)
    val del = dropped.map(_.getLong(0)).toSet
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val clusters = dropped.map(r => r.getLong(0) -> r.getInt(1)).toMap
    // survivors' clusters come from re-running the same trainer
    val (_, assigned) = Similarity.kmeansTrainTwoLevel(
      Tables.embeddings(spark, sf)
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("v"))
        .withColumn("nrm", graft.functions.VectorFunctions.norm(col("v"))),
      10, iters = 2)
    val byCluster = assigned.select("vec_id", "cluster").collect()
      .map(r => r.getLong(0) -> r.getInt(1))
      .filterNot { case (id, _) => del(id) }
      .groupBy(_._2).values
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    byCluster.foreach { members =>
      val ids = members.map(_._1).sorted
      for (i <- ids.indices; j <- (i + 1) until ids.length)
        assert(cos(e(ids(i)), e(ids(j))) < tau,
          s"surviving pair ${ids(i)},${ids(j)} above tau")
    }
    // and the reported cluster ids agree with the trainer's assignment
    val asg = assigned.select("vec_id", "cluster").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    clusters.foreach { case (id, c) => assert(asg(id) == c) }
  }

  test("hybrid retrieval: rrf is the rank-reciprocal sum of its shortlists") {
    val rows = Similarity.pipelineHybridRetrieval(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // (doc_id, lex_rank, sem_rank, rrf)
      val lex = if (r.isNullAt(1)) None else Some(r.getInt(1))
      val sem = if (r.isNullAt(2)) None else Some(r.getInt(2))
      assert(lex.nonEmpty || sem.nonEmpty,
        "a fused row must come from at least one shortlist")
      val expect = lex.map(x => 1.0 / (60 + x)).getOrElse(0.0) +
        sem.map(x => 1.0 / (60 + x)).getOrElse(0.0)
      assert(math.abs(r.getDouble(3) - expect) < 1e-8,
        s"doc ${r.getLong(0)}: rrf ${r.getDouble(3)} != $expect")
    }
    // each shortlist contributes each rank at most once, from 1..100
    Seq(1, 2).foreach { c =>
      val ranks = rows.flatMap(r => if (r.isNullAt(c)) None else Some(r.getInt(c)))
      assert(ranks.distinct.length == ranks.length)
      assert(ranks.forall(x => x >= 1 && x <= 100))
    }
    // the fusion is ordered by rrf descending
    val rrfs = rows.map(_.getDouble(3))
    assert(rrfs.zip(rrfs.tail).forall { case (a, b) => a >= b })
  }

  test("containment exact: prefix-filter equals brute force, incl. the tiny-in-huge pair banding misses") {
    val s = spark
    import s.implicits._
    // planted: doc 1 is a 5-token quote fully inside 40-token doc 2
    // (containment 1.0, jaccard 0.125 — the pair symmetric banding is
    // blind to), doc 3 shares 4/5 of doc 1 (c = 0.8 < 0.9, excluded),
    // doc 4 is disjoint, doc 5 duplicates doc 1 exactly (both
    // directions emitted)
    val quote = (1 to 5).map(i => s"q$i").mkString(" ")
    val docs = Seq(
      (1L, quote),
      (2L, quote + " " + (1 to 35).map(i => s"w$i").mkString(" ")),
      (3L, (1 to 4).map(i => s"q$i").mkString(" ") + " z1"),
      (4L, (1 to 9).map(i => s"x$i").mkString(" ")),
      (5L, quote)
    ).toDF("doc_id", "text")
    val got = graft.operators.Dedup.containmentPairsExact(docs)
      .select("doc_sub", "doc_sup").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force over distinct token sets
    val sets = Seq(
      1L -> (1 to 5).map(i => s"q$i").toSet,
      2L -> ((1 to 5).map(i => s"q$i") ++ (1 to 35).map(i => s"w$i")).toSet,
      3L -> ((1 to 4).map(i => s"q$i").toSet + "z1"),
      4L -> (1 to 9).map(i => s"x$i").toSet,
      5L -> (1 to 5).map(i => s"q$i").toSet)
    val expect = (for {
      (a, sa) <- sets; (b, sb) <- sets
      if a != b && (sa & sb).size.toDouble / sa.size >= 0.9
    } yield (a, b)).toSet
    assert(got == expect, s"missing=${expect -- got} extra=${got -- expect}")
    assert(got.contains((1L, 2L)), "the tiny-in-huge pair must be found")
    assert(got.contains((1L, 5L)) && got.contains((5L, 1L)),
      "exact duplicates emit both directions")
    assert(!got.contains((3L, 1L)), "c = 0.8 stays below the 0.9 gate")
  }

  test("containment exact: natural-vocab prefix tier equals brute force (vocab > 64)") {
    val s = spark
    import s.implicits._
    // vocab = 20 quote + 60 filler + 9 disjoint + 2 unique = 91 > 64,
    // so the prefix-filter tier runs. doc 1 (quote + 1 unique token,
    // 21 tokens) is 20/21 = 0.952-contained in doc 2 (quote + 60
    // filler); doc 3 is disjoint; doc 4 duplicates doc 1.
    val quote = (1 to 20).map(i => s"q$i").mkString(" ")
    val docs = Seq(
      (1L, quote + " u1"),
      (2L, quote + " " + (1 to 60).map(i => s"w$i").mkString(" ")),
      (3L, (1 to 9).map(i => s"x$i").mkString(" ") + " u3"),
      (4L, quote + " u1")
    ).toDF("doc_id", "text")
    val got = graft.operators.Dedup.containmentPairsExact(docs)
      .select("doc_sub", "doc_sup").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sets = Seq(
      1L -> ((1 to 20).map(i => s"q$i").toSet + "u1"),
      2L -> ((1 to 20).map(i => s"q$i") ++ (1 to 60).map(i => s"w$i")).toSet,
      3L -> ((1 to 9).map(i => s"x$i").toSet + "u3"),
      4L -> ((1 to 20).map(i => s"q$i").toSet + "u1"))
    val expect = (for {
      (a, sa) <- sets; (b, sb) <- sets
      if a != b && (sa & sb).size.toDouble / sa.size >= 0.9
    } yield (a, b)).toSet
    assert(got == expect, s"missing=${expect -- got} extra=${got -- expect}")
    assert(got.contains((1L, 2L)), "the 0.952-contained quote pair must be found")
  }

  test("containment ngram: candidate count is measured and bounds the output") {
    // the prefix filter's selectivity, counted (VERDICT r9 #8): the
    // tracked 10.6 s bench entry is candidates × verify cost, so the
    // candidate count is the number that keeps it interpretable —
    // every qualifying pair must be a candidate (recall), and the
    // filter must actually filter (candidates ≪ all ordered pairs)
    val sets = graft.operators.Dedup.containmentNgramSets(spark, sf)
      .filter(size(col("s")) > 0)
    val toks = sets.select(col("doc_id"), size(col("s")).as("sz"),
      explode(col("s")).as("tok"))
    val nDocs = sets.count()
    val candidates = graft.operators.Dedup
      .containmentPrefixCandidates(toks).count()
    val pairs = graft.operators.Dedup.dedupContainmentNgram(spark, sf).count()
    info(s"prefix-tier candidates=$candidates, qualifying pairs=$pairs, " +
      s"docs=$nDocs (all ordered pairs=${nDocs * (nDocs - 1)})")
    assert(candidates >= pairs,
      s"recall: every qualifying pair must be a candidate ($candidates < $pairs)")
    assert(candidates < nDocs * (nDocs - 1) / 2,
      s"the prefix filter must prune below half the ordered-pair space: $candidates")
  }

  test("lm score: bigram-MLE mean probability, hand-computed on a planted corpus") {
    val s = spark
    import s.implicits._
    // corpus bigrams: "a b" x3 (docs 1,1,2), "b a" x1 (doc 1), "a c" x1 (doc 2)
    // contexts: a -> 4, b -> 1
    val docs = Seq((1L, "a b a b"), (2L, "a b a c")).toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.lmScore(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    def p9(cBi: Long, cUni: Long): Long = cBi * 1000000000L / cUni
    // doc 1: bigrams (a,b),(b,a),(a,b) -> p(b|a)=3/4 twice, p(a|b)=1/1
    val d1 = (p9(3, 4) + p9(1, 1) + p9(3, 4)).toDouble / (3 * 1e9)
    // doc 2: (a,b),(b,a),(a,c) -> 3/4, 1/1, 1/4
    val d2 = (p9(3, 4) + p9(1, 1) + p9(1, 4)).toDouble / (3 * 1e9)
    assert(got(1L)._1 == 3 && got(2L)._1 == 3)
    assert(math.abs(got(1L)._2 - math.floor(d1 * 1e6 + 0.5) / 1e6) < 1e-12)
    assert(math.abs(got(2L)._2 - math.floor(d2 * 1e6 + 0.5) / 1e6) < 1e-12)
    // and on real data: scores in (0, 1], defined for every doc
    val corpus = graft.operators.TextAnalysis.lmScore(
      graft.Tables.documents(spark, sf))
    val scores = corpus.select("lm_score").as[Double].collect()
    assert(scores.nonEmpty && scores.forall(x => x > 0.0 && x <= 1.0))
  }

  test("winnowing: the w+k-1 guarantee holds on a planted shared run; boundary-blind where chunking fails") {
    val s2 = spark
    import s2.implicits._
    // two docs sharing EXACTLY a 6-token run (w+k-1 = 4+3-1 = 6) in
    // otherwise disjoint text, placed at different offsets so a fixed
    // 8-token chunk grid would straddle it in at least one doc
    val shared = "alpha beta gamma delta epsilon zeta"
    val docs = Seq(
      (1L, s"one two three four five $shared aa bb cc dd"),
      (2L, s"x1 x2 $shared y1 y2 y3 y4 y5 y6 y7 y8")).toDF("doc_id", "text")
    val fps = graft.operators.Dedup.winnowFingerprints(docs, k = 3, w = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val h1 = fps.filter(_._1 == 1L).map(_._3).toSet
    val h2 = fps.filter(_._1 == 2L).map(_._3).toSet
    assert((h1 intersect h2).nonEmpty,
      "a shared run of w+k-1 tokens must share at least one fingerprint")
    // fingerprint density ~ 1/w of gram mass: strictly fewer
    // fingerprints than grams, but at least one per complete window span
    val grams1 = docs.filter(col("doc_id") === 1L)
      .select(size(filter(split(col("text"), "\\s+"), t => t =!= "")))
      .head.getInt(0) - 2
    assert(h1.size < grams1 && h1.size >= grams1 / 4 / 2,
      s"density out of range: ${h1.size} fingerprints for $grams1 grams")
    // rightmost-tie determinism: identical text -> identical positions
    val again = graft.operators.Dedup.winnowFingerprints(docs, k = 3, w = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(again.toSet == fps.toSet)
    CacheHygiene.sweep(spark)
  }

  test("winnowing: hot-fingerprint df cap drops boilerplate-only pairs, keeps genuine near-dups") {
    val s = spark
    import s.implicits._
    // 70 docs (> WinnowMaxDf = 64) that are NOTHING BUT shared
    // boilerplate: every fingerprint they carry has df = 70, so the
    // cap drops them all and the 70·69/2 = 2415-pair quadratic blowup
    // never reaches the join — the LSH hot-bucket failure mode the
    // cap exists for
    val boiler = "all rights reserved please subscribe to our newsletter " +
      "for the latest updates and exclusive offers every single day"
    val hot = (0L until 70L).map(i => (i, boiler))
    // one genuine near-dup pair: a long document-specific shared run
    // (df = 2 fingerprints — comfortably under the cap)
    val shared = "the quick brown fox jumps over the lazy dog near " +
      "the quiet river bank at dawn while birds sing"
    val pair = Seq((1000L, shared + " alpha beta gamma"),
      (1001L, shared + " delta epsilon zeta"))
    val docs = (hot ++ pair).toDF("doc_id", "text")
    val got = Dedup.winnowPairs(Dedup.winnowFingerprintHashes(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1000L, 1001L)),
      s"expected ONLY the genuine pair (boilerplate pairs capped away), got $got")
    CacheHygiene.sweep(spark)
  }
}
