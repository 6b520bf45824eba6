package graft

import graft.mr.MapReduce
import graft.operators.MrCore

class MapReduceSpec extends SparkSpec {

  test("typed MapReduce.run word count matches the declarative plan") {
    val s = spark
    import s.implicits._
    val docs = Tables.documents(s, sf)
      .select("doc_id", "text").as[(Long, String)]
      .map { case (id, text) => (id.toString, text) }

    // the reference app verbatim: map = whitespace split -> (word, 1),
    // reduce = sum (mr_app/src/client.rs:3-21)
    val counted = MapReduce.run[String, String, String, Long](
      docs,
      (_, text) => text.split("\\s+").filter(_.nonEmpty).map(w => (w, 1L)),
      _ + _)

    val viaApi = counted.collect().toMap
    val viaPlan = MrCore.mrWordcount(s, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaApi == viaPlan)
  }

  test("runGrouped reproduces the reference's grouped-reduce signature") {
    val s = spark
    import s.implicits._
    val input = Seq(("f1", "a b a"), ("f2", "b b c")).toDS()
    val out = MapReduce.runGrouped[String, String, String, Long, (String, Long)](
      input,
      (_, text) => text.split(" ").map(w => (w, 1L)),
      (k, vs) => (k, vs.sum)).collect().toMap
    assert(out == Map("a" -> 2L, "b" -> 3L, "c" -> 1L))
  }

  test("textLines keys each line by source file") {
    val s = spark
    val tmp = java.nio.file.Files.createTempDirectory("mrlines")
    java.nio.file.Files.writeString(tmp.resolve("x.txt"), "one two\nthree\n")
    val lines = MapReduce.textLines(s, tmp.toString + "/*.txt").collect()
    assert(lines.length == 2)
    assert(lines.forall(_._1.endsWith("x.txt")))
  }

  test("wholeTextFiles gives (path, full contents)") {
    val s = spark
    val tmp = java.nio.file.Files.createTempDirectory("mrwhole")
    java.nio.file.Files.writeString(tmp.resolve("y.txt"), "hello world\nhello\n")
    val files = MapReduce.wholeTextFiles(s, tmp.toString + "/*.txt").collect()
    assert(files.length == 1)
    assert(files(0)._2 == "hello world\nhello\n")
  }
}
