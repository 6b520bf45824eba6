package graft

import org.apache.spark.sql.SaveMode
import graft.sources.ManifestTable

/** Manifest-committed table: atomicity, crash, and retention cases
  * (round 5 — closes the documented non-atomic window of the
  * rename-swap sinks). */
class ManifestTableSpec extends SparkSpec {

  private def tmpTable(): String =
    java.nio.file.Files.createTempDirectory("manifest-tbl").toString + "/t"

  private def stateOf(path: String): Set[(Long, String)] = {
    val s = spark
    import s.implicits._
    ManifestTable.read(s, path).as[(Long, String)].collect().toSet
  }

  private def dataDirs(path: String): Seq[String] = {
    val d = new java.io.File(path)
    if (!d.exists()) Seq.empty
    else d.listFiles().map(_.getName).filter(_.startsWith("data-")).sorted.toSeq
  }

  test("upsert merges by key across commits") {
    val s = spark
    import s.implicits._
    val t = tmpTable()
    ManifestTable.upsertBatch(Seq((1L, "a0"), (2L, "b0")).toDF("k", "v"), t, Seq("k"))
    assert(stateOf(t) == Set((1L, "a0"), (2L, "b0")))
    ManifestTable.upsertBatch(Seq((2L, "b1"), (3L, "c1")).toDF("k", "v"), t, Seq("k"))
    assert(stateOf(t) == Set((1L, "a0"), (2L, "b1"), (3L, "c1")))
  }

  test("writer killed between stage and publish: readers see only the old complete state, then recover") {
    val s = spark
    import s.implicits._
    val t = tmpTable()
    ManifestTable.upsertBatch(Seq((1L, "a0"), (2L, "b0")).toDF("k", "v"), t, Seq("k"))
    val before = stateOf(t)

    // the crash: phase 1 stages a complete new version, the writer
    // dies before phase 2 — no publish call ever happens
    val orphan = ManifestTable.prepare(s, t) { dir =>
      Seq((1L, "a1"), (9L, "z9")).toDF("k", "v")
        .write.mode(SaveMode.Overwrite).parquet(dir)
    }
    assert(dataDirs(t).exists(_.endsWith(f"$orphan%09d")), "orphan dir staged")
    // a concurrent reader resolving the manifest NOW sees exactly the
    // old complete state — not the orphan, not a partial swap
    assert(stateOf(t) == before)
    assert(ManifestTable.current(s, t).get._1 == orphan - 1)

    // a fresh writer (the recovery path): merges against the OLD
    // published state, re-stages the orphan version, publishes
    ManifestTable.upsertBatch(Seq((2L, "b1")).toDF("k", "v"), t, Seq("k"))
    assert(stateOf(t) == Set((1L, "a0"), (2L, "b1")),
      "recovery must merge against the published state, never the orphan")
    assert(ManifestTable.current(s, t).get._1 == orphan)
  }

  test("publish is the only visibility point and retention keeps exactly one previous version") {
    val s = spark
    import s.implicits._
    val t = tmpTable()
    (0 until 4).foreach { i =>
      ManifestTable.upsertBatch(Seq((i.toLong, s"v$i")).toDF("k", "v"), t, Seq("k"))
    }
    // versions 0..3 committed; retention = {current, previous}
    assert(ManifestTable.current(s, t).get._1 == 3L)
    assert(dataDirs(t) == Seq("data-000000002", "data-000000003"),
      s"retention must keep current+previous, got ${dataDirs(t)}")
    assert(stateOf(t) == (0 until 4).map(i => (i.toLong, s"v$i")).toSet)
  }

  test("time travel: retained versions readable as committed, GC'd/staged ones refused") {
    val s = spark
    import s.implicits._
    val t = tmpTable()
    // commits at retain=3: after publishing v, dirs < v−3 are GC'd —
    // so after version 4 the readable window is {1, 2, 3, 4}
    (0 until 5).foreach { i =>
      val v = ManifestTable.prepare(s, t) { dir =>
        Seq((i.toLong, s"v$i")).toDF("k", "v")
          .write.mode(SaveMode.Overwrite).parquet(dir)
      }
      ManifestTable.publish(s, t, v, retain = 3)
    }
    assert(ManifestTable.versions(s, t) == Seq(1L, 2L, 3L, 4L),
      s"retain=3 window, got ${ManifestTable.versions(s, t)}")
    // each retained snapshot reads EXACTLY as committed (dirs are
    // immutable once published — this is what makes travel sound)
    (1 to 4).foreach { v =>
      val got = ManifestTable.readVersion(s, t, v.toLong)
        .as[(Long, String)].collect().toSet
      assert(got == Set((v.toLong, s"v$v")), s"version $v: got $got")
    }
    intercept[IllegalArgumentException] {
      ManifestTable.readVersion(s, t, 0L) // GC'd
    }
    // a staged-but-unpublished successor is not readable state
    ManifestTable.prepare(s, t) { dir =>
      Seq((99L, "orphan")).toDF("k", "v")
        .write.mode(SaveMode.Overwrite).parquet(dir)
    }
    assert(ManifestTable.versions(s, t) == Seq(1L, 2L, 3L, 4L),
      "an unpublished staged version must not appear in the window")
    intercept[IllegalArgumentException] {
      ManifestTable.readVersion(s, t, 5L)
    }
  }

  test("compact rewrites files, never the visible row set") {
    val s = spark
    import s.implicits._
    val t = tmpTable()
    // 40 single-row commits would be slow; 4 commits of 10 rows each
    // still fragments the current dir into many small files
    (0 until 4).foreach { i =>
      val rows = (0 until 10).map(j => ((i * 10 + j).toLong, s"r$i-$j"))
      ManifestTable.upsertBatch(rows.toDF("k", "v"), t, Seq("k"))
    }
    val before = stateOf(t)
    val filesBefore = new java.io.File(
      t + "/" + ManifestTable.current(s, t).get._2).listFiles()
      .count(_.getName.endsWith(".parquet"))
    ManifestTable.compact(s, t, rowsPerFile = 40L)
    assert(stateOf(t) == before, "compaction must not change the row set")
    val filesAfter = new java.io.File(
      t + "/" + ManifestTable.current(s, t).get._2).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(filesAfter < filesBefore && filesAfter <= 2,
      s"expected consolidation, got $filesBefore -> $filesAfter")
  }

  test("streaming foreachBatch upsert publishes one commit per micro-batch") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val t = tmpTable()
    val in = MemoryStream[(Long, String)](s)
    val q = ManifestTable
      .foreachBatchUpsert(in.toDF().toDF("k", "v"), t, Seq("k"))
      .start()
    in.addData((1L, "a0"), (2L, "b0"))
    q.processAllAvailable()
    assert(stateOf(t) == Set((1L, "a0"), (2L, "b0")))
    in.addData((2L, "b1"), (3L, "c1"))
    q.processAllAvailable()
    q.stop()
    assert(stateOf(t) == Set((1L, "a0"), (2L, "b1"), (3L, "c1")))
  }

  test("two interleaved writers: one wins, the second fails loudly (lease)") {
    val s = spark
    import s.implicits._
    import graft.sources.ManifestTable.ConcurrentWriterException
    val t = tmpTable()
    ManifestTable.upsertBatch(Seq((1L, "a0")).toDF("k", "v"), t, Seq("k"))
    // writer A claims the table and stages (mid-commit)
    ManifestTable.acquireLease(s, t, "writer-A")
    val vA = ManifestTable.prepare(s, t) { dir =>
      Seq((1L, "a1")).toDF("k", "v").write.mode(SaveMode.Overwrite).parquet(dir)
    }
    // writer B arrives WHILE A holds the lease: every entry point must
    // refuse — the raw claim, the shipped upsert, and the compactor
    intercept[ConcurrentWriterException] {
      ManifestTable.acquireLease(s, t, "writer-B")
    }
    intercept[ConcurrentWriterException] {
      ManifestTable.upsertBatch(Seq((2L, "b0")).toDF("k", "v"), t, Seq("k"))
    }
    intercept[ConcurrentWriterException] { ManifestTable.compact(s, t, 10L) }
    // B's failure changed nothing: A publishes and the table is A's state
    ManifestTable.publish(s, t, vA, writerId = Some("writer-A"))
    ManifestTable.releaseLease(s, t, "writer-A")
    assert(stateOf(t) == Set((1L, "a1")))
    // after A releases, B succeeds normally
    ManifestTable.upsertBatch(Seq((2L, "b0")).toDF("k", "v"), t, Seq("k"))
    assert(stateOf(t) == Set((1L, "a1"), (2L, "b0")))
    assert(ManifestTable.currentLease(s, t).isEmpty, "lease released after commit")
  }

  test("stalled writer is fenced: an expired lease is broken, and the loser cannot publish") {
    val s = spark
    import s.implicits._
    import graft.sources.ManifestTable.ConcurrentWriterException
    val t = tmpTable()
    ManifestTable.upsertBatch(Seq((1L, "a0")).toDF("k", "v"), t, Seq("k"))
    // writer A claims, stages, then STALLS past its TTL
    ManifestTable.acquireLease(s, t, "writer-A")
    val vA = ManifestTable.prepare(s, t) { dir =>
      Seq((1L, "stale")).toDF("k", "v").write.mode(SaveMode.Overwrite).parquet(dir)
    }
    Thread.sleep(30) // let A's heartbeat age past the tiny TTL below
    // writer B finds the expired lease, breaks it, and commits
    ManifestTable.acquireLease(s, t, "writer-B", ttlMs = 10L)
    val vB = ManifestTable.prepare(s, t) { dir =>
      Seq((1L, "fresh")).toDF("k", "v").write.mode(SaveMode.Overwrite).parquet(dir)
    }
    ManifestTable.publish(s, t, vB, writerId = Some("writer-B"))
    // A wakes up and tries to publish its stale staging: the fencing
    // check at the commit point must refuse, and B's state must stand
    intercept[ConcurrentWriterException] {
      ManifestTable.publish(s, t, vA, writerId = Some("writer-A"))
    }
    assert(stateOf(t) == Set((1L, "fresh")))
    // A's release is a no-op on the lost lease (must not unfence B)
    ManifestTable.releaseLease(s, t, "writer-A")
    assert(ManifestTable.currentLease(s, t).exists(_._1 == "writer-B"))
    ManifestTable.releaseLease(s, t, "writer-B")
    // heartbeat keeps a healthy writer alive: re-claim, heartbeat, and a
    // would-be breaker with the same tiny TTL sees a FRESH lease again
    ManifestTable.acquireLease(s, t, "writer-C")
    ManifestTable.heartbeat(s, t, "writer-C")
    intercept[ConcurrentWriterException] {
      ManifestTable.acquireLease(s, t, "writer-D", ttlMs = 5000L)
    }
    ManifestTable.releaseLease(s, t, "writer-C")
  }

  test("claim-time purge deletes only writer-suffixed tmps; an unleased publish in flight survives (ADVICE r17)") {
    val s = spark
    import s.implicits._
    val t = tmpTable()
    ManifestTable.upsertBatch(Seq((1L, "a0")).toDF("k", "v"), t, Seq("k"))
    // an UNLEASED writer stages a version: its tmp is the unsuffixed
    // MANIFEST.tmp, written just before publish's rename. Simulate the
    // in-flight moment by creating the file directly.
    val vU = ManifestTable.prepare(s, t) { dir =>
      Seq((1L, "u1")).toDF("k", "v").write.mode(SaveMode.Overwrite).parquet(dir)
    }
    val root = new java.io.File(t)
    val unsuffixed = new java.io.File(root, "MANIFEST.tmp")
    java.nio.file.Files.write(unsuffixed.toPath,
      s"data-$vU".getBytes("UTF-8"))
    // a stalled LEASED loser's staged tmp (writer-suffixed)
    val suffixed = new java.io.File(root, "MANIFEST.tmp.writer-old")
    java.nio.file.Files.write(suffixed.toPath, "data-99".getBytes("UTF-8"))
    // a fresh claimant purges the leased loser's tmp but spares the
    // unleased writer's — purging it would fail that writer's rename
    // on a missing source even though it never participated in leasing
    ManifestTable.acquireLease(s, t, "writer-new")
    assert(!suffixed.exists(),
      "a displaced leased writer's staged tmp must be purged at claim time")
    assert(unsuffixed.exists(),
      "an unleased publish's unsuffixed tmp must survive a claim-time purge")
    ManifestTable.releaseLease(s, t, "writer-new")
    // the unleased writer's commit completes normally
    ManifestTable.publish(s, t, vU)
    assert(stateOf(t) == Set((1L, "u1")))
  }
}
