package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Rule semantics of `text_filter_quality` (SURVEY.md §2 D33h): the
  * oracle hash-check proves cross-engine equality; this spec proves
  * the rules MEAN what they claim on planted documents, and that the
  * gate discriminates (both outcomes occur) on the real corpus.
  */
class TextFilterSpec extends SparkSpec {

  /** Planted docs exercising each rule in isolation (documents
    * schema: doc_id, text, lang, source, n_chars). */
  private def planted(): String = {
    val s = spark
    import s.implicits._
    val ok = (0 until 30).map(i => s"word$i").mkString(" ") +
      " the a of it goes on" // 36 words, has stopwords, all distinct
    val docs = Seq(
      (0L, ok),                                        // passes all
      (1L, "too short the a"),                         // word_count (4)
      (2L, ("x " * 40).trim + " the a"),               // mean len ~1 (also top/distinct)
      (3L, (0 until 40).map(i => s"extraordinarily$i").mkString(" ") + " the a"), // mean_word_len > 6
      (4L, (0 until 40).map(i => s"word$i").mkString(" ")), // no stopwords
      // 64 words, 12 distinct (ratio 0.19), mean len 4.8, top share
      // 6/64 — ONLY distinct_ratio fails
      (5L, ((0 until 10).flatMap(i => Seq.fill(6)(s"alpha$i")) ++
        Seq("the", "a", "the", "a")).mkString(" "))
    ).map { case (id, text) =>
      (id, text, "en", "src0", text.length.toLong)
    }
    val dir = java.nio.file.Files.createTempDirectory("tfq").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("each rule fires on its planted document with the right fail_reason") {
    val out = TextAnalysis.textFilterQuality(spark, planted())
      .select("doc_id", "keep", "fail_reason").collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), Option(r.getString(2)))).toMap
    assert(out(0L) == (true, None), s"doc 0 must pass: ${out(0L)}")
    assert(out(1L) == (false, Some("word_count")))
    // doc 2: 42 words pass count; mean len ~1.2 fails FIRST (fixed order)
    assert(out(2L) == (false, Some("mean_word_len")))
    assert(out(3L) == (false, Some("mean_word_len")))
    assert(out(4L) == (false, Some("stopwords")))
    assert(out(5L) == (false, Some("distinct_ratio")))
  }

  test("gopher gate: each published rule fires on its planted doc; line rules work on real lines") {
    val s = spark
    import s.implicits._
    // 60 distinct alpha words incl. >= 2 gopher stopwords, mean len
    // in [3, 10] -> passes every rule
    val okWords = (0 until 58).map(i => s"word$i") ++ Seq("the", "with")
    val ok = okWords.mkString(" ")
    val docs = Seq(
      (0L, ok),                                        // passes all
      (1L, "the with tiny"),                           // word_count (3)
      (2L, (0 until 60).map(_ => "extraordinarily" * 2).mkString(" ")
        + " the with"),                                // mean_word_len > 10
      (3L, ok + " " + (0 until 12).map(_ => "#").mkString(" ")), // symbol_ratio
      (4L, okWords.map(w => s"- $w\n").mkString),      // every line a bullet
      // 10 lines x 10 words; 4 lines ...-ended -> ellipsis share 0.4
      // while symbols stay 4/102 (the symbol rule must NOT fire first)
      (5L, (0 until 10).map(j =>
        (0 until 10).map(i => s"word${j}x$i").mkString(" ") +
          (if (j < 4) "..." else "") + (if (j == 9) " the with" else ""))
        .mkString("\n")),
      (6L, ok + " " + (0 until 20).map(_ => "123456").mkString(" ")), // alpha < 0.8
      (7L, (0 until 60).map(i => s"word$i").mkString(" ") + " the") // 1 stopword
    ).map { case (id, text) => (id, text, "en", "src0", text.length.toLong) }
    val dir = java.nio.file.Files.createTempDirectory("gopher").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextAnalysis.textFilterGopher(s, dir)
      .select("doc_id", "keep", "fail_reason").collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), Option(r.getString(2)))))
      .toMap
    assert(out(0L) == ((true, None)), s"doc 0 must pass: $out")
    assert(out(1L) == ((false, Some("word_count"))))
    assert(out(2L) == ((false, Some("mean_word_len"))))
    assert(out(3L) == ((false, Some("symbol_ratio"))))
    assert(out(4L) == ((false, Some("bullet_lines"))))
    assert(out(5L) == ((false, Some("ellipsis_lines"))))
    assert(out(6L) == ((false, Some("alpha_words"))))
    assert(out(7L) == ((false, Some("stopwords"))))
  }

  test("cooccurrence: hand-computed pairs and lift on a planted corpus") {
    val s = spark
    import s.implicits._
    // one doc "a b c a b": d1 pairs (a,b)(b,c)(c,a)(a,b), d2 pairs
    // (a,c)(b,a)(c,b) — 7 pairs total, top pair (a,b) count 2;
    // T=5 tokens, c(a)=2, c(b)=2
    val dir = java.nio.file.Files.createTempDirectory("cooc").toString
    Seq((0L, "a b c a b", "en", "s", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextAnalysis.textCooccurrence(s, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(rows.values.map(_._1).sum == 7, s"7 window pairs expected: $rows")
    val (cnt, lift) = rows(("a", "b"))
    assert(cnt == 2)
    // lift = cnt*T^2/(P*c1*c2) = 2*25/(7*2*2) rounded to 6
    val expect = math.floor(2.0 * 5 * 5 / (7.0 * 2 * 2) * 1e6 + 0.5) / 1e6
    assert(lift == expect, s"lift $lift != $expect")
  }

  test("keep == conjunction of rule booleans; fail_reason null iff kept; gate discriminates") {
    val df = TextAnalysis.textFilterQuality(spark, sf).persist()
    val bad = df.filter(
      col("keep") =!= (col("r_word_count") && col("r_mean_word_len") &&
        col("r_distinct_ratio") && col("r_stopwords") && col("r_top_word_share")) ||
      (col("keep") && col("fail_reason").isNotNull) ||
      (!col("keep") && col("fail_reason").isNull))
    assert(bad.count() == 0, "keep/fail_reason must be consistent with the rules")
    val kept = df.filter(col("keep")).count()
    val dropped = df.filter(!col("keep")).count()
    info(s"sf0.001 corpus: $kept kept, $dropped dropped")
    assert(kept > 0 && dropped > 0,
      s"thresholds must discriminate on the corpus: $kept kept / $dropped dropped")
    df.unpersist()
  }
}
