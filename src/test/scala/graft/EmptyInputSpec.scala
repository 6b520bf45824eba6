package graft

/** Robustness: every registered query must run (not crash) on
  * zero-row inputs with the production schemas — the degenerate case
  * every 100 TB pipeline eventually hits (empty partition, empty
  * date-slice, filtered-out shard). */
class EmptyInputSpec extends SparkSpec {

  lazy val emptyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("empty-sf").toString
    Tables.all.foreach { t =>
      Tables.table(spark, sf, t).limit(0)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  test("all queries run on empty tables") {
    val failures = SparkEntry.allDefs.flatMap { d =>
      val r =
        try { d.run(spark, emptyDir).count(); None }
        catch { case e: Throwable => Some(s"${d.name}: ${e.getMessage}") }
      // release-handle discipline: one sweep must fully release every
      // internal persist/localCheckpoint a query creates — the
      // invariant that keeps a 100+-query session from accumulating
      // orphaned blocks (the persist calls run on empty inputs too,
      // so this exercises every kernel's cache sites)
      CacheHygiene.sweep(spark)
      if (!CacheHygiene.clean(spark))
        Some(s"${d.name}: orphaned cache entries after sweep") else r
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
