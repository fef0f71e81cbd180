package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.SnapshotLog

/** Round-10 snapshot/manifest commit protocol (sources/SnapshotLog):
  * the table-grain transactional guarantees the graded keys rely on —
  * optimistic concurrency on the version claim, orphan invisibility,
  * vacuum safety, and snapshot isolation across overwrites. */
class SnapshotSpec extends SparkTestBase {

  private def freshTable(): String =
    Files.createTempDirectory("graft_snap").toString + "/t"

  private def rows(table: String, v: Option[Int] = None): Set[Long] = {
    import scala.jdk.CollectionConverters._
    SnapshotLog.read(spark, table, v)
      .select("id").collect().map(_.getLong(0)).toSet
  }

  test("append commits accumulate; staged-but-uncommitted files stay invisible") {
    import spark.implicits._
    val t = freshTable()
    SnapshotLog.commit(spark, t, (1L to 5L).toDF("id"))
    SnapshotLog.commit(spark, t, (6L to 9L).toDF("id"))
    SnapshotLog.stageOnly(spark, t, (100L to 120L).toDF("id")) // crash
    assert(SnapshotLog.versions(spark, t) == Seq(1, 2))
    assert(rows(t) == (1L to 9L).toSet)
  }

  test("overwrite replaces the live set; old versions stay readable (time travel)") {
    import spark.implicits._
    val t = freshTable()
    SnapshotLog.commit(spark, t, (1L to 5L).toDF("id"))
    SnapshotLog.commit(spark, t, (6L to 9L).toDF("id"))
    SnapshotLog.commit(spark, t, (50L to 52L).toDF("id"), overwrite = true)
    assert(rows(t) == (50L to 52L).toSet)
    assert(rows(t, Some(2)) == (1L to 9L).toSet)
    assert(rows(t, Some(1)) == (1L to 5L).toSet)
  }

  test("concurrent appends race on the version claim; no commit is lost") {
    import spark.implicits._
    val t = freshTable()
    SnapshotLog.commit(spark, t, Seq(0L).toDF("id"))
    // 8 writers land disjoint batches concurrently; rename-claim makes
    // exactly one winner per version and losers retry on the new tip
    val threads = (1 to 8).map { i =>
      new Thread(() => {
        SnapshotLog.commit(spark, t, Seq(i.toLong * 10, i.toLong * 10 + 1).toDF("id"))
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(SnapshotLog.versions(spark, t) == (1 to 9))
    assert(rows(t) == (Set(0L) ++ (1 to 8).flatMap(i => Seq(i.toLong * 10, i.toLong * 10 + 1))))
  }

  test("a foreign process's claim lock is never clobbered; a stale one is broken") {
    import spark.implicits._
    val t = freshTable()
    SnapshotLog.commit(spark, t, Seq(1L).toDF("id"))
    // simulate ANOTHER PROCESS mid-commit on v2: its O_EXCL lock file
    // exists (created exactly as a second JVM would), no commit yet.
    // Our commit must NOT rename over the claimed version — POSIX
    // rename overwrites, so respecting the lock is what prevents the
    // cross-process lost-commit the per-JVM lock can't see.
    val logDir = new java.io.File(s"$t/_log")
    val lock = new java.io.File(logDir, "v00000002.lock")
    assert(lock.createNewFile())
    val e = intercept[IllegalStateException](
      SnapshotLog.commit(spark, t, Seq(2L).toDF("id")))
    assert(e.getMessage.contains("lost the version race"))
    assert(SnapshotLog.versions(spark, t) == Seq(1),
      "a blocked commit must leave the log untouched")
    // the foreign process completes: its commit appears, lock released
    // (emulated by an overwrite-free path: just drop the lock — the
    // version stays unused, which is also what a crashed claimant
    // past the grace looks like once broken)
    assert(lock.delete())
    SnapshotLog.commit(spark, t, Seq(2L).toDF("id"))
    assert(rows(t) == Set(1L, 2L))
    // stale-claim break: a crashed claimant's lock older than the
    // grace is removed and the version proceeds
    val stale = new java.io.File(logDir, "v00000003.lock")
    assert(stale.createNewFile())
    assert(stale.setLastModified(System.currentTimeMillis() - 10 * 60 * 1000))
    SnapshotLog.commit(spark, t, Seq(3L).toDF("id"))
    assert(rows(t) == Set(1L, 2L, 3L))
    assert(!stale.exists(), "the abandoned claim must have been broken")
    // a breaker that dies between its rename-to-tombstone and the
    // delete leaves `<lock>.stale-<uuid>` debris; vacuum reclaims it
    // past the grace window but never a fresh one (a break in flight)
    val deadTomb = new java.io.File(logDir, "v00000004.lock.stale-dead01")
    assert(deadTomb.createNewFile())
    assert(deadTomb.setLastModified(System.currentTimeMillis() - 2 * 60 * 60 * 1000))
    val freshTomb = new java.io.File(logDir, "v00000005.lock.stale-live01")
    assert(freshTomb.createNewFile())
    SnapshotLog.vacuum(spark, t)
    assert(!deadTomb.exists(), "stale tombstone debris must be vacuumed")
    assert(freshTomb.exists(), "a fresh tombstone (break in flight) survives vacuum")
  }

  test("scoped index rebuild: a delete delta rewrites only the shards a " +
    "dead key admits — disjoint-vocabulary shards carry byte-identical, " +
    "and the watermark rides the replace commit") {
    import spark.implicits._
    val idx = freshTable()
    // two vocabularies, committed separately so each lands its own
    // range-clustered files: a-shard (docs 1-50) and z-shard (51-100)
    SnapshotLog.commit(
      spark, idx,
      (1L to 50L).map(d => (d, s"aaa_${d % 10}")).toDF("doc_id", "term")
        .repartition(1))
    SnapshotLog.commit(
      spark, idx,
      (51L to 100L).map(d => (d, s"zzz_${d % 10}")).toDF("doc_id", "term")
        .repartition(1))
    val v0 = SnapshotLog.versions(spark, idx).last
    val zFilesBefore = SnapshotLog.manifest(spark, idx, v0)
      .filter { f =>
        // which committed file holds the z vocabulary? read it
        spark.read.parquet(s"$idx/$f").head.getString(1).startsWith("zzz")
      }.toSet
    assert(zFilesBefore.nonEmpty)
    // doc 5's postings die: its terms are all a-vocabulary, so the
    // z shards must not be admitted, let alone rewritten
    val dead = Seq((5L, "aaa_5")).toDF("doc_id", "term")
    val (_, touched, untouched) = SnapshotLog.mergeCoW(
      spark, idx, "term", dead.select("term").distinct(),
      base => base.join(dead, Seq("doc_id", "term"), "left_anti"),
      extraHeader = "idxv=7")
    assert(touched.nonEmpty, "the a-shard holding the dead term must rewrite")
    assert(
      zFilesBefore.subsetOf(untouched.toSet),
      s"z shards must not be admitted by a-vocabulary dead terms: $untouched")
    val after = SnapshotLog
      .manifest(spark, idx, SnapshotLog.versions(spark, idx).last).toSet
    assert(
      zFilesBefore.subsetOf(after),
      "untouched shards must carry into the new manifest by name (zero rewrite)")
    // the dead posting is gone, everything else intact
    val left = SnapshotLog.read(spark, idx).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(!left.contains((5L, "aaa_5")) && left.size == 99)
    // the watermark landed ATOMICALLY with the scoped rebuild
    assert(SnapshotLog.committedWatermark(spark, idx, "idxv").contains(7))
  }

  test("commits refuse loudly on an object-store-shaped filesystem whose " +
    "rename does not refuse an existing destination") {
    import spark.implicits._
    // a mock S3-class scheme: rename is copy+delete semantics as far
    // as the protocol can prove (the scheme is not in the safe set)
    spark.sparkContext.hadoopConfiguration.set(
      "fs.fakes3.impl", classOf[FakeObjectStoreFs].getName)
    val t = "fakes3:" + freshTable()
    val e = intercept[UnsupportedOperationException] {
      SnapshotLog.commit(spark, t, Seq(1L).toDF("id"))
    }
    assert(e.getMessage.contains("conditional-put") &&
      e.getMessage.contains("fakes3"),
      s"refusal must name the scheme and the required primitive: ${e.getMessage}")
    // nothing staged, nothing committed — the refusal is pre-IO
    val dir = new java.io.File(t.stripPrefix("fakes3:")).getParentFile
    assert(
      dir == null || Option(dir.list()).forall(_.isEmpty),
      "a refused commit must leave no orphans")
  }

  test("a registered conditional-put backend makes an object-store scheme " +
    "commit-safe: the full race suite holds and the refusal returns when " +
    "unregistered") {
    import spark.implicits._
    spark.sparkContext.hadoopConfiguration.set(
      "fs.fakes3.impl", classOf[FakeObjectStoreFs].getName)
    // in-memory if-none-match store: putIfAbsent on the target key IS
    // the arbitration (exactly what S3-class conditional put gives);
    // the winner writes the staged bytes through
    SnapshotLog.registerCommitBackend("fakes3", new InMemoryCondPutBackend)
    try {
      val t = "fakes3:" + freshTable()
      SnapshotLog.commit(spark, t, Seq(0L).toDF("id"))
      val threads = (1 to 8).map { i =>
        new Thread(() => {
          SnapshotLog.commit(
            spark, t, Seq(i.toLong * 10, i.toLong * 10 + 1).toDF("id"))
        })
      }
      threads.foreach(_.start())
      threads.foreach(_.join())
      // exactly one winner per version, no commit lost, reads and
      // time travel flow through the backend-published log
      assert(SnapshotLog.versions(spark, t) == (1 to 9))
      assert(rows(t) ==
        (Set(0L) ++ (1 to 8).flatMap(i => Seq(i.toLong * 10, i.toLong * 10 + 1))))
      assert(rows(t, Some(1)) == Set(0L))
    } finally SnapshotLog.unregisterCommitBackend("fakes3")
    // unregistered again: the loud refusal is back — the backend is a
    // capability, never a default
    val e = intercept[UnsupportedOperationException] {
      SnapshotLog.commit(spark, "fakes3:" + freshTable(), Seq(1L).toDF("id"))
    }
    assert(e.getMessage.contains("conditional-put"))
  }

  test("bloom refresh converges on an all-NULL file: the zero-bits rider " +
    "lands once, the next incremental pass no-ops, and the probe prunes " +
    "the file exactly") {
    import spark.implicits._
    val t = freshTable()
    SnapshotLog.commit(
      spark, t, Seq((1L, "x1"), (2L, "x2")).toDF("id", "s").coalesce(1))
    val v1 = SnapshotLog.buildBloomIndex(spark, t, "s")
    // an all-NULL append lands AFTER the build — the advisor's round-14
    // non-convergence scenario
    SnapshotLog.commit(
      spark, t,
      Seq(3L, 4L).toDF("id")
        .withColumn("s", lit(null).cast("string")).coalesce(1))
    val v2 = SnapshotLog.buildBloomIndex(spark, t, "s", onlyMissing = true)
    assert(v2 > v1, "the all-NULL file must gain its (zero) rider")
    // CONVERGED: every live file carries a rider — no version burned
    val v3 = SnapshotLog.buildBloomIndex(spark, t, "s", onlyMissing = true)
    assert(v3 == v2, "a fully-ridered table must no-op, not burn a version")
    // the zero bloom is EXACT for equality: col = v is never true on a
    // NULL row, so pruning the all-NULL file loses nothing
    val (kept, total) = SnapshotLog.prunedFilesBloom(spark, t, "s", "x1")
    assert(total == 2 && kept.size == 1,
      s"the all-NULL file must prune on a point probe: kept $kept of $total")
    assert(
      SnapshotLog.readPoint(spark, t, "s", "x1").collect()
        .map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("breaking a live lock restores it exclusively: a contender that " +
    "re-claimed the name in the window is never clobbered") {
    import java.nio.charset.StandardCharsets.UTF_8
    val dir = java.nio.file.Files.createTempDirectory("graft_lockrestore").toFile
    // case 1 — no contender: the displaced live lock comes back under
    // its name with content (the claimant's token) intact
    val lk1 = new java.io.File(dir, "v00000002.lock")
    val tomb1 = new java.io.File(dir, "v00000002.lock.stale-a")
    java.nio.file.Files.write(tomb1.toPath, "displaced-token".getBytes(UTF_8))
    SnapshotLog.restoreLockExclusive(lk1, tomb1)
    assert(lk1.exists() && !tomb1.exists())
    assert(new String(
      java.nio.file.Files.readAllBytes(lk1.toPath), UTF_8) == "displaced-token")
    // case 2 — a new contender won createNewFile in the window: its
    // live lock must survive the restore BYTE-IDENTICAL (the old
    // rename-back overwrote it here, minting two owners), and the
    // displaced claimant's token is gone — its token-verify reports
    // the loss
    val lk2 = new java.io.File(dir, "v00000003.lock")
    val tomb2 = new java.io.File(dir, "v00000003.lock.stale-b")
    java.nio.file.Files.write(lk2.toPath, "contender-token".getBytes(UTF_8))
    java.nio.file.Files.write(tomb2.toPath, "displaced-token".getBytes(UTF_8))
    SnapshotLog.restoreLockExclusive(lk2, tomb2)
    assert(lk2.exists() && !tomb2.exists())
    assert(new String(
      java.nio.file.Files.readAllBytes(lk2.toPath), UTF_8) == "contender-token",
      "the contender's live lock must never be clobbered by the restore")
  }

  test("manifest stats skip disjoint files; pruned read equals full read+filter") {
    import spark.implicits._
    val t = freshTable()
    // three key-clustered batches, each range-split into 2 files with
    // tight disjoint id spans — the layout data skipping exists for
    def batch(lo: Long, hi: Long) =
      (lo to hi).toDF("id").repartitionByRange(2, col("id"))
    SnapshotLog.commit(spark, t, batch(1, 100))
    SnapshotLog.commit(spark, t, batch(101, 200))
    SnapshotLog.commit(spark, t, batch(201, 300))
    val (keptMid, total) = SnapshotLog.prunedFiles(spark, t, "id", 120, 180)
    assert(total == 6, s"expected 6 files, saw $total")
    // only batch-2's files can contain [120,180]
    assert(keptMid.nonEmpty && keptMid.size <= 2, s"mid-range probe kept $keptMid")
    val pruned = SnapshotLog.readPruned(spark, t, "id", 120, 180)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(pruned == (120L to 180L).toSet)
    // range straddling two batches keeps one file from each, still exact
    val (kept2, _) = SnapshotLog.prunedFiles(spark, t, "id", 90, 110)
    assert(kept2.size == 2, s"straddle probe kept $kept2")
    // stats carried forward through appends: v1 entries still prune at v3
    val (keptLo, _) = SnapshotLog.prunedFiles(spark, t, "id", 1, 10)
    assert(keptLo.size == 1, s"low probe kept $keptLo")
    // unstated column never prunes (skipping must not lose rows)
    val (keptAll, _) = SnapshotLog.prunedFiles(spark, t, "nope", 0, 1)
    assert(keptAll.size == 6)
    // fully-disjoint probe: zero files admit it, result is empty not error
    assert(SnapshotLog.readPruned(spark, t, "id", 5000, 6000).count() == 0)
  }

  test("idempotent commits: a replayed batch id lands exactly once") {
    import spark.implicits._
    val t = freshTable()
    // the foreachBatch delivery pattern with an at-least-once producer:
    // batch 1 is delivered twice (crash between sink write and offset
    // commit), batch ids are the stable idempotency token
    val v0 = SnapshotLog.commitIdempotent(spark, t, (1L to 3L).toDF("id"), "b0")
    val v1a = SnapshotLog.commitIdempotent(spark, t, (4L to 6L).toDF("id"), "b1")
    val v1b = SnapshotLog.commitIdempotent(spark, t, (4L to 6L).toDF("id"), "b1")
    val v2 = SnapshotLog.commitIdempotent(spark, t, (7L to 9L).toDF("id"), "b2")
    assert((v0, v1a, v2) == (1, 2, 3))
    assert(v1b == v1a, "replay must return the original version")
    assert(SnapshotLog.versions(spark, t) == Seq(1, 2, 3))
    assert(rows(t) == (1L to 9L).toSet, "replayed batch must not duplicate rows")
    assert(SnapshotLog.committedTxn(spark, t, "b1").contains(2))
    assert(SnapshotLog.committedTxn(spark, t, "b9").isEmpty)
  }

  test("delta manifests + checkpoints: O(batch) appends, every version resolves") {
    import spark.implicits._
    val t = freshTable()
    // 25 single-file appends: versions 10 and 20 fold to checkpoints,
    // everything else is a delta carrying one file + a parent pointer
    (1 to 25).foreach { i =>
      SnapshotLog.commit(spark, t, Seq(i.toLong).toDF("id").coalesce(1))
    }
    // every historical version resolves to exactly its prefix
    for (v <- Seq(1, 9, 10, 11, 19, 20, 21, 25))
      assert(rows(t, Some(v)) == (1L to v.toLong).toSet, s"version $v")
    // the log cost model: delta manifests stay O(batch) while the live
    // set grows — v25's commit file lists 1 file, the v20 checkpoint 20
    def ownLines(v: Int) = {
      val p = java.nio.file.Paths.get(t, "_log", f"v$v%08d.commit")
      scala.jdk.CollectionConverters
        .ListHasAsScala(java.nio.file.Files.readAllLines(p)).asScala
        .count(_.nonEmpty) - 1 // minus header
    }
    assert(ownLines(25) == 1, s"v25 should be a 1-file delta, has ${ownLines(25)}")
    assert(ownLines(20) == 20, s"v20 should be a folded checkpoint, has ${ownLines(20)}")
    // overwrite resets to a full list; history before it still resolves
    SnapshotLog.commit(spark, t, Seq(1000L).toDF("id"), overwrite = true)
    assert(rows(t) == Set(1000L))
    assert(rows(t, Some(13)) == (1L to 13L).toSet)
    // vacuum against the delta log keeps every referenced file
    assert(SnapshotLog.vacuum(spark, t, olderThanMs = 0).isEmpty)
    assert(rows(t, Some(25)) == (1L to 25L).toSet)
  }

  test("copy-on-write merge rewrites ONLY stats-admitted files; others carry by reference") {
    import spark.implicits._
    val t = freshTable()
    // three key-clustered shards, two files each — the CoW selection grain
    def batch(lo: Long, hi: Long) =
      (lo to hi).map(i => (i, i * 10)).toDF("id", "v")
        .repartitionByRange(2, col("id"))
    SnapshotLog.commit(spark, t, batch(1, 100))
    SnapshotLog.commit(spark, t, batch(101, 200))
    SnapshotLog.commit(spark, t, batch(201, 300))
    val before = SnapshotLog.manifest(spark, t, 3)
    assert(before.size == 6)
    val (keptMid, _) = SnapshotLog.prunedFiles(spark, t, "id", 120, 180)
    val midFiles = keptMid.toSet // the only files a mid-range change set may touch
    // change set confined to the middle shard: update ids 120..180 (+1000 to v),
    // plus brand-new inserts at 10_000+ (in no file)
    val changeKeys = ((120L to 180L) ++ (10001L to 10005L)).toDF("k")
    val (v4, rewritten, carried) = SnapshotLog.mergeCoW(
      spark, t, "id", changeKeys,
      base => {
        val updated = base
          .withColumn("v", when(col("id").between(120, 180), col("v") + 1000).otherwise(col("v")))
        updated.unionByName((10001L to 10005L).map(i => (i, -1L)).toDF("id", "v"))
      }
    )
    assert(v4 == 4)
    // file-granularity pin: exactly the stats-admitted files were rewritten...
    assert(rewritten.toSet == midFiles, s"rewrote $rewritten, expected $midFiles")
    // ...and every untouched file NAME survives verbatim in the new manifest
    val after = SnapshotLog.manifest(spark, t, 4).toSet
    carried.foreach(n => assert(after(n), s"carried file $n missing from v4 manifest"))
    rewritten.foreach(n => assert(!after(n), s"rewritten file $n still live in v4"))
    // row-identity with a full-table merge
    val got = SnapshotLog.read(spark, t)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (1L to 300L).map(i =>
      (i, if (i >= 120 && i <= 180) i * 10 + 1000 else i * 10)).toSet ++
      (10001L to 10005L).map((_, -1L))
    assert(got == want)
    // pre-merge state stays time-travel readable
    assert(rows(t, Some(3)) == (1L to 300L).toSet)
    // a second merge claiming an already-removed file is a loud conflict
    intercept[java.util.ConcurrentModificationException] {
      SnapshotLog.commitReplace(spark, t, rewritten, Seq((1L, 1L)).toDF("id", "v"))
    }
  }

  test("readChanges: appends are inserts, CoW replaces diff only moved files, ranges compose") {
    import spark.implicits._
    val t = freshTable()
    SnapshotLog.commit(spark, t, (1L to 5L).toDF("id").coalesce(1))
    SnapshotLog.commit(spark, t, (6L to 9L).toDF("id").coalesce(1))
    SnapshotLog.commit(spark, t, (50L to 52L).toDF("id").coalesce(1), overwrite = true)
    def changes(a: Int, b: Int) =
      SnapshotLog.readChanges(spark, t, a, b)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
        .toSet
    assert(changes(1, 2) == (6L to 9L).map((_, "insert", 2)).toSet)
    // overwrite: delete-all + insert-all at v3
    assert(changes(2, 3) ==
      ((1L to 9L).map((_, "delete", 3)) ++ (50L to 52L).map((_, "insert", 3))).toSet)
    // consecutive ranges compose to the full range (incremental consumption)
    assert(changes(1, 2) ++ changes(2, 3) == changes(1, 3))
    // CoW replace surfaces only the rewritten files' rows
    val (v4, rewritten, _) = SnapshotLog.mergeCoW(
      spark, t, "id", Seq(51L).toDF("k"),
      base => base.withColumn("id", when(col("id") === 51, lit(510L)).otherwise(col("id")))
    )
    assert(v4 == 4 && rewritten.size == 1)
    val c4 = changes(3, 4)
    assert(c4.collect { case (id, "delete", _) => id } == Set(50L, 51L, 52L))
    assert(c4.collect { case (id, "insert", _) => id } == Set(50L, 510L, 52L))
  }

  test("tip pointer: O(1) tip discovery, stale/missing pointer recovers") {
    import spark.implicits._
    val t = freshTable()
    (1 to 4).foreach(i => SnapshotLog.commit(spark, t, Seq(i.toLong).toDF("id")))
    val tip = java.nio.file.Paths.get(t, "_log", "_tip")
    assert(java.nio.file.Files.readString(tip).trim == "4")
    // stale tip (crashed writer updated the manifest but not the pointer):
    // forward probing finds the real latest. Written through the Hadoop FS
    // so the .crc sidecar stays valid and the PROBE path (not the corrupt-
    // tip listing fallback) is what recovers.
    val hfs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val out = hfs.create(new org.apache.hadoop.fs.Path(s"$t/_log/_tip"), true)
    out.write("2".getBytes); out.close()
    assert(SnapshotLog.versions(spark, t) == (1 to 4))
    // missing tip (pre-upgrade log): listing fallback
    java.nio.file.Files.delete(tip)
    assert(SnapshotLog.versions(spark, t) == (1 to 4))
    // corrupt tip: fallback, and the next commit repairs it
    java.nio.file.Files.writeString(tip, "not-a-number")
    SnapshotLog.commit(spark, t, Seq(9L).toDF("id"))
    assert(java.nio.file.Files.readString(tip).trim == "5")
    assert(rows(t) == Set(1L, 2L, 3L, 4L, 9L))
  }

  test("string manifest stats prune; long values are omitted, never truncated") {
    import spark.implicits._
    val t = freshTable()
    def shard(tag: String, lo: Int, hi: Int) =
      (lo to hi).map(i => (f"$tag%s-$i%03d", i.toLong)).toDF("lang", "n")
        .coalesce(1)
    SnapshotLog.commit(spark, t, shard("de", 1, 50))
    SnapshotLog.commit(spark, t, shard("en", 1, 50))
    SnapshotLog.commit(spark, t, shard("fr", 1, 50))
    val (kept, total) = SnapshotLog.prunedFilesString(spark, t, "lang", "en", "en-999")
    assert(total == 3 && kept.size == 1, s"kept $kept of $total")
    val en = SnapshotLog.readPrunedString(spark, t, "lang", "en", "en-999")
    assert(en.count() == 50)
    // equality with the unpruned filtered read at any layout
    val full = SnapshotLog.read(spark, t)
      .filter(col("lang") >= "en" && col("lang") <= "en-999")
    assert(en.collect().toSet == full.collect().toSet)
    // values longer than the stat cap: column omitted from stats -> file
    // always scans (conservative), result still exact
    val t2 = freshTable()
    SnapshotLog.commit(spark, t2, Seq(("x" * 100, 1L)).toDF("lang", "n").coalesce(1))
    val (kept2, _) = SnapshotLog.prunedFilesString(spark, t2, "lang", "a", "b")
    assert(kept2.size == 1, "uncapped string stats must not prune")
  }

  test("schema in the header: empty versions read, appends evolve, conflicts are loud") {
    import spark.implicits._
    val t = freshTable()
    SnapshotLog.commit(spark, t, (1L to 3L).toDF("id"))
    // added column: union schema, old files null-fill
    SnapshotLog.commit(spark, t, Seq((10L, "a")).toDF("id", "tag"))
    val evolved = SnapshotLog.read(spark, t)
    assert(evolved.columns.toSeq == Seq("id", "tag"))
    val byId = evolved.collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(byId(1L) && !byId(10L), "pre-evolution rows must null-fill the new column")
    // incompatible change: loud error, nothing committed
    val ex = intercept[IllegalArgumentException] {
      SnapshotLog.commit(spark, t, Seq((1L, 2L)).toDF("id", "tag")) // tag string->long
    }
    assert(ex.getMessage.contains("incompatible schema evolution"))
    assert(SnapshotLog.versions(spark, t) == (1 to 2))
    // empty overwrite: a legitimate empty table, readable via the header schema
    SnapshotLog.commit(spark, t, Seq.empty[(Long, String)].toDF("id", "tag"),
      overwrite = true)
    val empty = SnapshotLog.read(spark, t)
    assert(empty.count() == 0 && empty.columns.toSeq == Seq("id", "tag"))
    // and changes into an empty version still resolve
    assert(SnapshotLog.readChanges(spark, t, 2, 3)
      .filter(col("change_type") === "insert").count() == 0)
  }

  test("txn cache survives same-path table recreation without skipping real commits") {
    import spark.implicits._
    val t = freshTable()
    val v1 = SnapshotLog.commitIdempotent(spark, t, (1L to 3L).toDF("id"), "batch-0")
    assert(v1 == 1)
    // the graded keys' pattern: deterministic tmp() path, table deleted
    // and rebuilt in the same JVM
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(t), true)
    assert(SnapshotLog.committedTxn(spark, t, "batch-0").isEmpty,
      "dead incarnation's txn must not survive")
    val v1b = SnapshotLog.commitIdempotent(spark, t, (7L to 9L).toDF("id"), "batch-0")
    assert(v1b == 1, "recreated table must COMMIT, not replay the dead incarnation")
    assert(rows(t) == (7L to 9L).toSet)
  }

  test("vacuum sweeps crashed writers' _staging directories past the grace period") {
    import spark.implicits._
    val t = freshTable()
    SnapshotLog.commit(spark, t, (1L to 5L).toDF("id"))
    // a writer that died INSIDE stageOnly: parquet landed under
    // _staging/<jobId>, nothing renamed into the table root
    (100L to 105L).toDF("id").write.parquet(s"$t/_staging/deadjob")
    assert(SnapshotLog.vacuum(spark, t).isEmpty, "grace period protects fresh staging")
    val swept = SnapshotLog.vacuum(spark, t, olderThanMs = 0)
    assert(swept.contains("_staging/deadjob"), s"swept=$swept")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(t, "_staging", "deadjob")))
    assert(rows(t) == (1L to 5L).toSet)
  }

  test("vacuum deletes only unreferenced files; every version survives") {
    import spark.implicits._
    val t = freshTable()
    SnapshotLog.commit(spark, t, (1L to 5L).toDF("id"))
    SnapshotLog.commit(spark, t, (6L to 9L).toDF("id"))
    val orphaned = SnapshotLog.stageOnly(spark, t, (100L to 110L).toDF("id"))
    // default grace period protects freshly-landed files (an in-flight
    // writer's staged-but-unclaimed batch must not be reaped)...
    assert(SnapshotLog.vacuum(spark, t).isEmpty)
    // ...olderThanMs=0 is the test-only full sweep
    val deleted = SnapshotLog.vacuum(spark, t, olderThanMs = 0)
    assert(deleted.toSet == orphaned.toSet, s"deleted $deleted, orphaned $orphaned")
    assert(rows(t) == (1L to 9L).toSet)
    assert(rows(t, Some(1)) == (1L to 5L).toSet)
    assert(SnapshotLog.vacuum(spark, t, olderThanMs = 0).isEmpty) // idempotent
  }

  test("compact bin-packs small files; data preserved, change feed silent, no-op below threshold") {
    import spark.implicits._
    val t = freshTable()
    (0 until 6).foreach(i =>
      SnapshotLog.commit(spark, t, (i * 10L until i * 10L + 10L).toDF("id")))
    val v0 = SnapshotLog.versions(spark, t).last
    val before = SnapshotLog.manifest(spark, t, v0)
    assert(before.size >= 6)
    // nothing under 1 byte: compaction must not burn a version
    val (vNoop, r0, _) = SnapshotLog.compact(spark, t, smallerThanBytes = 1)
    assert(vNoop == v0 && r0.isEmpty, "no-op compaction must not commit")
    val (v1, rewritten, carried) =
      SnapshotLog.compact(spark, t, smallerThanBytes = Long.MaxValue, filesOut = Some(1))
    assert(rewritten.toSet == before.toSet && carried.isEmpty)
    assert(SnapshotLog.manifest(spark, t, v1).size == 1, "bin-pack to one file")
    assert(rows(t) == (0L until 60L).toSet, "compaction must preserve rows exactly")
    assert(rows(t, Some(v0)) == (0L until 60L).toSet, "pre-compaction version intact")
    // datachange=false: a row-level change feed emits NOTHING for the
    // rewrite (the Delta OPTIMIZE posture)
    assert(SnapshotLog.readChanges(spark, t, v0, v1).count() == 0)
    // old files are still referenced by old versions: vacuum keeps them
    assert(SnapshotLog.vacuum(spark, t, olderThanMs = 0).isEmpty)
  }

  test("compact(sortBy) clusters: pruning dead on modulo layout, alive after the rewrite") {
    import spark.implicits._
    val t = freshTable()
    // round-robin-partitioned shards: every file's id range spans
    // ~the whole table (a contiguous parallelize would accidentally
    // range-cluster each file — measured exactly that)
    (0 until 4).foreach(i =>
      SnapshotLog.commit(spark, t,
        (0L until 400L).filter(_ % 4 == i).toDF("id").repartition(4)))
    val (keptB, totalB) = SnapshotLog.prunedFiles(spark, t, "id", 100, 199)
    assert(keptB.size == totalB, "modulo layout admits every file")
    val (v1, _, _) = SnapshotLog.compact(
      spark, t, smallerThanBytes = Long.MaxValue,
      sortBy = Seq("id"), filesOut = Some(4))
    val (keptA, totalA) = SnapshotLog.prunedFiles(spark, t, "id", 100, 199)
    assert(totalA == 4)
    assert(keptA.size <= 2, s"clustered quarter-range probe kept $keptA")
    assert(SnapshotLog.readPruned(spark, t, "id", 100, 199)
      .collect().map(_.getLong(0)).toSet == (100L to 199L).toSet)
    // clustered files carry stats+size riders: a later CoW merge
    // selects a strict subset via touchedFiles
    val (touched, untouched) = SnapshotLog.touchedFiles(
      spark, t, "id", Seq(5L, 7L).toDF("id"), Some(v1))
    assert(touched.size == 1 && untouched.size == 3,
      s"low-key change set must touch one clustered file: $touched")
  }

  test("zorder compact prunes on BOTH dims where lexicographic sort only prunes the leading one") {
    import spark.implicits._
    val t = freshTable()
    // decorrelated 2D keys: y = 173x mod 400 — any 25 consecutive x
    // values throw y across nearly the whole domain
    val xy = (0L until 400L).map(x => (x, (x * 173) % 400))
    (0 until 4).foreach(i =>
      SnapshotLog.commit(spark, t,
        xy.filter(_._1 % 4 == i).toDF("x", "y").repartition(4)))
    // lexicographic clustering: leading key prunes, trailing key dead
    SnapshotLog.compact(spark, t, smallerThanBytes = Long.MaxValue,
      sortBy = Seq("x", "y"), filesOut = Some(16))
    val (lexX, _) = SnapshotLog.prunedFiles(spark, t, "x", 0, 99)
    val (lexY, totalLex) = SnapshotLog.prunedFiles(spark, t, "y", 0, 99)
    assert(totalLex == 16)
    assert(lexX.size <= 6, s"leading-key probe must prune: ${lexX.size}")
    assert(lexY.size == 16, "trailing key spans every lexicographic file")
    // z-order rewrite of the SAME table: bounded extent in BOTH dims
    SnapshotLog.compact(spark, t, smallerThanBytes = Long.MaxValue,
      zorderBy = Seq("x", "y"), filesOut = Some(16))
    val (zX, _) = SnapshotLog.prunedFiles(spark, t, "x", 0, 99)
    val (zY, totalZ) = SnapshotLog.prunedFiles(spark, t, "y", 0, 99)
    assert(totalZ == 16)
    assert(zX.size < 16, s"z-order x-probe must skip files: ${zX.size}")
    assert(zY.size < 16, s"z-order y-probe must skip files: ${zY.size}")
    // layout changes are invisible to data: rows and pruned reads exact
    assert(SnapshotLog.read(spark, t).select("x")
      .collect().map(_.getLong(0)).toSet == (0L until 400L).toSet)
    assert(SnapshotLog.readPruned(spark, t, "y", 0, 99)
      .select("x").collect().map(_.getLong(0)).toSet
      == xy.filter(p => p._2 <= 99).map(_._1).toSet)
  }

  test("bloom index: point lookups prune where stats cannot; appends stay blind-safe") {
    import spark.implicits._
    val t = freshTable()
    // round-robin by id%4: every file spans ~the whole id domain, so
    // min/max stats keep everything for a point probe
    (0 until 4).foreach(i =>
      SnapshotLog.commit(spark, t,
        (0L until 400L).filter(_ % 4 == i).toDF("id").repartition(2)))
    val (statKept, total) = SnapshotLog.prunedFiles(spark, t, "id", 123, 123)
    assert(total == 8 && statKept.size == total,
      s"stats must be useless here: ${statKept.size}/$total")
    SnapshotLog.buildBloomIndex(spark, t, "id")
    val (bloomKept, total2) = SnapshotLog.prunedFilesBloom(spark, t, "id", 123L)
    assert(total2 == 8 && bloomKept.size < total2,
      s"bloom must prune the point probe: ${bloomKept.size}/$total2")
    assert(SnapshotLog.readPoint(spark, t, "id", 123L)
      .collect().map(_.getLong(0)).toSeq == Seq(123L))
    // an absent value: bloom may keep a false-positive file, the row
    // filter still yields nothing
    assert(SnapshotLog.readPoint(spark, t, "id", 100000L).isEmpty)
    // the index commit is datachange=false: the change feed is silent
    val vIdx = SnapshotLog.versions(spark, t).last
    assert(SnapshotLog.readChanges(spark, t, vIdx - 1, vIdx).isEmpty)
    // post-build appends are BLIND: always kept, rows never lost
    SnapshotLog.commit(spark, t, Seq(9999L).toDF("id"))
    assert(SnapshotLog.readPoint(spark, t, "id", 9999L)
      .collect().map(_.getLong(0)).toSeq == Seq(9999L))
    // rebuild covers the new file too
    SnapshotLog.buildBloomIndex(spark, t, "id")
    val (k3, t3) = SnapshotLog.prunedFilesBloom(spark, t, "id", 9999L)
    assert(k3.size < t3)
    // a CoW delete drops the rewritten file's bloom (blind, safe)
    SnapshotLog.deleteWhere(spark, t, "id", 123, 123)
    assert(SnapshotLog.readPoint(spark, t, "id", 123L).isEmpty)
  }

  test("bloom build commits as a conflict-checked replace, not a tip overwrite") {
    import spark.implicits._
    val t = freshTable()
    SnapshotLog.commit(spark, t, (0L until 100L).toDF("id").repartition(2))
    SnapshotLog.commit(spark, t, (100L until 200L).toDF("id").repartition(2))
    SnapshotLog.buildBloomIndex(spark, t, "id")
    val v = SnapshotLog.versions(spark, t).last
    // the round-12 build overwrote the tip manifest blindly: any commit
    // landing during the (long, distributed) build — its whole file
    // list — was silently dropped, orphaning rows. The replace path
    // carries untouched entries by reference and conflict-checks the
    // re-spelled ones at commit time inside the lock.
    val hist = SnapshotLog.describeHistory(spark, t)
      .filter(col("version") === v).collect()(0)
    assert(hist.getString(1) == "replace",
      s"bloom commit must be a replace, got '${hist.getString(1)}'")
    assert(!hist.getBoolean(2), "bloom commit must be datachange=false")
    // data-preserving by contract: rows identical through the rebuild
    assert(SnapshotLog.read(spark, t).count() == 200L)
    // and the index still prunes the point probe
    val (kept, total) = SnapshotLog.prunedFilesBloom(spark, t, "id", 42L)
    assert(kept.size < total)
  }

  test("string-key z-order: both a STRING and a numeric dim prune after the rewrite") {
    import spark.implicits._
    val t = freshTable()
    // decorrelated (string, numeric) keys: s = zero-padded (x*173 mod
    // 400) — any consecutive x window throws s across its whole domain
    val xs = (0L until 400L).map(x => (x, f"s${(x * 173) % 400}%03d"))
    (0 until 4).foreach(i =>
      SnapshotLog.commit(spark, t,
        xs.filter(_._1 % 4 == i).toDF("x", "s").repartition(4)))
    SnapshotLog.compact(spark, t, smallerThanBytes = Long.MaxValue,
      zorderBy = Seq("s", "x"), filesOut = Some(16))
    val (zX, totalX) = SnapshotLog.prunedFiles(spark, t, "x", 0, 99)
    val (zS, totalS) = SnapshotLog.prunedFilesString(spark, t, "s", "s000", "s099")
    assert(totalX == 16 && totalS == 16)
    assert(zX.size < 16, s"numeric probe must skip files: ${zX.size}")
    assert(zS.size < 16, s"string probe must skip files: ${zS.size}")
    // layout invisible to data: the pruned string read is exact
    assert(SnapshotLog.readPrunedString(spark, t, "s", "s000", "s099")
      .select("x").collect().map(_.getLong(0)).toSet
      == xs.filter(_._2 <= "s099").map(_._1).toSet)
    assert(SnapshotLog.read(spark, t).count() == 400)
  }

  test("deleteWhere rewrites only admitted files; disjoint delete is a free no-op") {
    import spark.implicits._
    val t = freshTable()
    def batch(lo: Long, hi: Long) =
      (lo to hi).toDF("id").repartitionByRange(2, col("id"))
    SnapshotLog.commit(spark, t, batch(1, 100))
    SnapshotLog.commit(spark, t, batch(101, 200))
    SnapshotLog.commit(spark, t, batch(201, 300))
    val preManifest = SnapshotLog.manifest(spark, t, 3)
    val (v, rewritten, carried) = SnapshotLog.deleteWhere(spark, t, "id", 120, 180)
    assert(v == 4)
    assert(rewritten.size <= 2, s"only batch-2's files admit [120,180]: $rewritten")
    assert(carried.size == preManifest.size - rewritten.size)
    // carried names survive VERBATIM into the post-delete manifest
    val post = SnapshotLog.manifest(spark, t, v).toSet
    assert(carried.forall(post), "untouched files must carry by reference")
    assert(rewritten.forall(n => !post(n)), "rewritten files must leave the manifest")
    assert(rows(t) == ((1L to 119L) ++ (181L to 300L)).toSet)
    assert(rows(t, Some(3)) == (1L to 300L).toSet, "pre-delete version intact")
    // no file's stats admit [5000, 6000]: no rewrite, no version burned
    val (v2, r2, _) = SnapshotLog.deleteWhere(spark, t, "id", 5000, 6000)
    assert(v2 == v && r2.isEmpty, "disjoint delete must be a no-op")
    // the delete IS a data change: the feed emits it (deletes of the
    // rewritten files' rows, re-inserts of their survivors)
    val ch = SnapshotLog.readChanges(spark, t, 3, v)
    val deleted = ch.filter(col("change_type") === "delete").select("id")
      .collect().map(_.getLong(0)).toSet
    val reinserted = ch.filter(col("change_type") === "insert").select("id")
      .collect().map(_.getLong(0)).toSet
    assert((deleted -- reinserted) == (120L to 180L).toSet,
      "net change of the delete must be exactly the doomed range")
  }

  test("expire bounds history: old generations reclaimed, survivors exact, expired reads loud") {
    import spark.implicits._
    val t = freshTable()
    SnapshotLog.commit(spark, t, (1L to 5L).toDF("id"))          // v1
    SnapshotLog.commit(spark, t, (6L to 9L).toDF("id"))          // v2
    SnapshotLog.commit(spark, t, (50L to 55L).toDF("id"), overwrite = true) // v3
    SnapshotLog.commit(spark, t, (56L to 58L).toDF("id"))        // v4
    val v1Files = SnapshotLog.manifest(spark, t, 1)
    val deleted = SnapshotLog.expire(spark, t, keepLast = 2)
    // v1/v2's generation is referenced ONLY by expired versions: gone.
    // v3's files survive (still live at v4).
    assert(deleted.nonEmpty && v1Files.forall(deleted.contains), s"deleted=$deleted")
    assert(rows(t) == ((50L to 58L).toSet), "tip unaffected")
    assert(rows(t, Some(3)) == (50L to 55L).toSet, "oldest SURVIVING version exact")
    // expired time travel fails loudly, not FileNotFound mid-scan
    val err = intercept[IllegalStateException] { rows(t, Some(2)) }
    assert(err.getMessage.contains("expired by retention"), err.getMessage)
    intercept[IllegalStateException] { SnapshotLog.readChanges(spark, t, 1, 4) }
    // the surviving range still serves changes
    assert(SnapshotLog.readChanges(spark, t, 3, 4)
      .select("id").collect().map(_.getLong(0)).toSet == (56L to 58L).toSet)
    // manifests stay: versions() and the log are unaffected; idempotent
    assert(SnapshotLog.versions(spark, t) == Seq(1, 2, 3, 4))
    assert(SnapshotLog.expire(spark, t, keepLast = 2).isEmpty)
    // a stream whose checkpoint predates the horizon is refused loudly
    val ckpt = java.nio.file.Files.createTempDirectory("graft-exp-ck").toString
    val got = scala.collection.mutable.Set[Long]()
    val q = spark.readStream.format("graft.sources.GraftSnapshotSource")
      .option("startingVersion", "0").load(t)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        got.synchronized { got ++= df.select("id").collect().map(_.getLong(0)) }: Unit
      }
      .option("checkpointLocation", ckpt).start()
    val serr = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.processAllAvailable(); q.awaitTermination()
    }
    def mentions(x: Throwable): Boolean =
      x != null && (Option(x.getMessage).exists(_.contains("retention horizon")) ||
        mentions(x.getCause))
    assert(mentions(serr), s"stream refusal must name the horizon: ${serr.getMessage}")
  }

  test("describeHistory reports the commit ledger") {
    import spark.implicits._
    val t = freshTable()
    SnapshotLog.commit(spark, t, (1L to 5L).toDF("id"))
    SnapshotLog.commitIdempotent(spark, t, (6L to 9L).toDF("id"), "b7")
    SnapshotLog.compact(spark, t, smallerThanBytes = Long.MaxValue, filesOut = Some(1))
    SnapshotLog.deleteWhere(spark, t, "id", 2, 3)
    val h = SnapshotLog.describeHistory(spark, t)
      .select("version", "action", "data_change", "txn_id")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getBoolean(2), r.getString(3)))
    assert(h.toSeq == Seq(
      (1, "append", true, ""),
      (2, "append", true, "b7"),
      (3, "replace", false, ""),
      (4, "replace", true, "")
    ), h.toSeq)
    // live totals follow the manifest: one compacted file rewritten by
    // the delete leaves exactly one live file
    val last = SnapshotLog.describeHistory(spark, t)
      .filter(org.apache.spark.sql.functions.col("version") === 4)
      .select("n_live_files").collect()(0).getInt(0)
    assert(last == 1, s"live files after compact+delete: $last")
  }

  test("metadata-only count/min/max are exact over mixed generations, and refuse rather than guess") {
    import spark.implicits._
    val t = freshTable()
    def batch(lo: Long, hi: Long) =
      (lo to hi).toDF("id").repartitionByRange(2, org.apache.spark.sql.functions.col("id"))
    SnapshotLog.commit(spark, t, batch(1, 100))
    SnapshotLog.commit(spark, t, batch(101, 300))
    assert(SnapshotLog.metadataCount(spark, t).contains(300L))
    assert(SnapshotLog.metadataRange(spark, t, "id").contains((1L, 300L)))
    // after a CoW delete the riders being summed mix original and
    // rewritten files — still exact against the actual scan
    SnapshotLog.deleteWhere(spark, t, "id", 50, 120)
    assert(SnapshotLog.metadataCount(spark, t)
      .contains(SnapshotLog.read(spark, t).count()))
    assert(SnapshotLog.metadataRange(spark, t, "id").contains((1L, 300L)))
    // time travel: pre-delete version still answers from its manifest
    assert(SnapshotLog.metadataCount(spark, t, Some(2)).contains(300L))
    // a column with no stats anywhere: None, never a guess
    assert(SnapshotLog.metadataRange(spark, t, "nope").isEmpty)
  }

  test("change feed composes across a skipped compaction version") {
    import spark.implicits._
    val t = freshTable()
    SnapshotLog.commit(spark, t, (1L to 5L).toDF("id"))   // v1
    SnapshotLog.commit(spark, t, (6L to 9L).toDF("id"))   // v2
    val (v3, _, _) = SnapshotLog.compact(
      spark, t, smallerThanBytes = Long.MaxValue, filesOut = Some(1))
    assert(v3 == 3)
    SnapshotLog.commit(spark, t, (10L to 12L).toDF("id")) // v4
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("id").collect().map(_.getLong(0)).toSet
    // the compaction version contributes nothing; appends around it do
    assert(ids(SnapshotLog.readChanges(spark, t, 1, 4)
      .filter(col("change_type") === "insert")) == (6L to 12L).toSet)
    assert(SnapshotLog.readChanges(spark, t, 1, 4)
      .filter(col("change_type") === "delete").count() == 0)
    // a CoW delete AFTER compaction diffs against the compacted layout
    val (v5, rewritten, _) = SnapshotLog.deleteWhere(spark, t, "id", 2, 3)
    assert(rewritten.nonEmpty)
    val net = {
      val ch = SnapshotLog.readChanges(spark, t, 4, v5)
      ids(ch.filter(col("change_type") === "delete")) --
        ids(ch.filter(col("change_type") === "insert"))
    }
    assert(net == Set(2L, 3L))
    assert(rows(t) == ((1L to 12L).toSet -- Set(2L, 3L)))
  }

  test("restore is a metadata-only rollback: manifest reverts, disk untouched, history append-only") {
    import spark.implicits._
    val t = freshTable()
    SnapshotLog.commit(spark, t, (1L to 100L).toDF("id"))    // v1
    SnapshotLog.commit(spark, t, (101L to 200L).toDF("id"))  // v2
    SnapshotLog.deleteWhere(spark, t, "id", 120, 150)        // v3: the bad write
    val fsys = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def disk(): Set[String] = fsys
      .listStatus(new org.apache.hadoop.fs.Path(t))
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.getName).toSet
    val before = disk()
    val (v4, readded, dropped) = SnapshotLog.restore(spark, t, 2)
    assert(v4 == 4 && readded.nonEmpty && dropped.nonEmpty)
    assert(disk() == before, "restore moved data bytes")
    assert(SnapshotLog.manifest(spark, t, 4).sorted ==
      SnapshotLog.manifest(spark, t, 2).sorted)
    assert(rows(t) == (1L to 200L).toSet)
    // history is append-only: the rolled-back delete is still readable
    assert(rows(t, Some(3)) == ((1L to 200L).toSet -- (120L to 150L)))
    // the change feed across the restore is the exact revert diff
    val ch = SnapshotLog.readChanges(spark, t, 3, 4)
    val ins = ch.filter(col("change_type") === "insert")
      .select("id").collect().map(_.getLong(0)).toSet
    val del = ch.filter(col("change_type") === "delete")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(ins -- del == (120L to 150L).toSet)
    // no-op restore burns no version
    val (v5, r2, d2) = SnapshotLog.restore(spark, t, 2)
    assert(v5 == 4 && r2.isEmpty && d2.isEmpty)
  }

  test("restore past a MoR delete: DV positions leaving the vector surface as re-inserts") {
    import spark.implicits._
    val t = freshTable()
    SnapshotLog.commit(spark, t, (1L to 50L).toDF("id"))       // v1
    val (v2, amended, _) = SnapshotLog.deleteWhereMoR(spark, t, "id", 10, 15)
    assert(v2 == 2 && amended.nonEmpty)
    assert(rows(t) == ((1L to 50L).toSet -- (10L to 15L)))
    val (v3, _, _) = SnapshotLog.restore(spark, t, 1)
    assert(v3 == 3)
    assert(rows(t) == (1L to 50L).toSet)
    // the un-delete is file-stable (same name, DV rider dropped): the
    // feed must emit exactly the resurrected positions as inserts
    val ch = SnapshotLog.readChanges(spark, t, 2, 3)
    assert(ch.filter(col("change_type") === "insert")
      .select("id").collect().map(_.getLong(0)).toSet == (10L to 15L).toSet)
    assert(ch.filter(col("change_type") === "delete").count() == 0)
  }

  test("restore refuses a retention-expired target") {
    import spark.implicits._
    val t = freshTable()
    SnapshotLog.commit(spark, t, (1L to 5L).toDF("id"), overwrite = true)  // v1
    SnapshotLog.commit(spark, t, (6L to 9L).toDF("id"), overwrite = true)  // v2
    SnapshotLog.commit(spark, t, (10L to 12L).toDF("id"), overwrite = true) // v3
    SnapshotLog.expire(spark, t, keepLast = 2)
    val e = intercept[IllegalStateException](SnapshotLog.restore(spark, t, 1))
    assert(e.getMessage.contains("expired by retention"))
    // in-horizon restore still works
    assert(SnapshotLog.restore(spark, t, 2)._1 == 4)
    assert(rows(t) == (6L to 9L).toSet)
  }

  // ---- tags and branches (write–audit–publish), round 11 cont. ----

  test("publish refuses a non-fast-forward: main advanced since the fork") {
    import spark.implicits._
    val t = freshTable()
    SnapshotLog.commit(spark, t, (1L to 5L).toDF("id"))
    val b = SnapshotLog.branchCreate(spark, t, "wip")
    SnapshotLog.commit(spark, b, (10L to 12L).toDF("id"))
    // main moves on while the branch is in flight — file-level merge has
    // no row-conflict story, so publish must refuse, not clobber
    SnapshotLog.commit(spark, t, (6L to 7L).toDF("id"))
    val e = intercept[IllegalArgumentException](SnapshotLog.publish(spark, t, "wip"))
    assert(e.getMessage.contains("advanced since branch"))
    assert(rows(t) == (1L to 7L).toSet, "a refused publish must not touch main")
    // the WAP rebase: drop, re-branch from the new tip, re-apply, publish
    SnapshotLog.branchDrop(spark, t, "wip")
    val b2 = SnapshotLog.branchCreate(spark, t, "wip")
    SnapshotLog.commit(spark, b2, (10L to 12L).toDF("id"))
    val (v, moved) = SnapshotLog.publish(spark, t, "wip")
    assert(v == 3 && moved.nonEmpty)
    assert(rows(t) == ((1L to 7L) ++ (10L to 12L)).toSet)
  }

  test("a failed publish copy leaves main untouched and the branch intact") {
    import spark.implicits._
    val t = freshTable()
    SnapshotLog.commit(spark, t, (1L to 5L).toDF("id"))
    val b = SnapshotLog.branchCreate(spark, t, "wip")
    SnapshotLog.commit(spark, b, (10L to 12L).toDF("id"))
    // plant a DIFFERENT-SIZED collision for the branch-owned file name
    // in main's root: copy-in must refuse BEFORE anything destructive
    val f = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val branchOwned = SnapshotLog.manifest(spark, b, 2)
      .filterNot(SnapshotLog.isExternal)
    assert(branchOwned.nonEmpty)
    f.create(new org.apache.hadoop.fs.Path(s"$t/${branchOwned.head}"), false).close()
    val e = intercept[IllegalArgumentException](SnapshotLog.publish(spark, t, "wip"))
    assert(e.getMessage.contains("collision"))
    assert(SnapshotLog.versions(spark, t) == Seq(1),
      "a refused publish must not commit anything on main")
    assert(rows(t) == (1L to 5L).toSet)
    assert(f.exists(new org.apache.hadoop.fs.Path(b)),
      "the branch must survive a refused publish — it still owns its data")
    // clear the collision: a RETRY completes (copy-in is idempotent
    // for same-name-same-length earlier attempts)
    f.delete(new org.apache.hadoop.fs.Path(s"$t/${branchOwned.head}"), false)
    val (v, moved) = SnapshotLog.publish(spark, t, "wip")
    assert(v == 2 && moved.nonEmpty)
    assert(rows(t) == ((1L to 5L) ++ (10L to 12L)).toSet)
  }

  test("branchDrop abandons unpublished work without touching main") {
    import spark.implicits._
    val t = freshTable()
    SnapshotLog.commit(spark, t, (1L to 5L).toDF("id"))
    val b = SnapshotLog.branchCreate(spark, t, "bad")
    SnapshotLog.commit(spark, b, (90L to 99L).toDF("id"))
    SnapshotLog.branchDrop(spark, t, "bad")
    assert(rows(t) == (1L to 5L).toSet)
    assert(SnapshotLog.versions(spark, t) == Seq(1))
    // a dropped name is reusable
    SnapshotLog.branchCreate(spark, t, "bad")
    SnapshotLog.branchDrop(spark, t, "bad")
  }

  test("published branch work composes: CoW delete on the branch lands on main") {
    import spark.implicits._
    val t = freshTable()
    SnapshotLog.commit(spark, t,
      (1L to 100L).toDF("id").repartitionByRange(4, col("id")))
    val b = SnapshotLog.branchCreate(spark, t, "fix")
    // CoW delete on the branch rewrites the admitted (main-external)
    // files into branch-owned locals; publish must move exactly those
    val (_, rewritten, carried) = SnapshotLog.deleteWhere(spark, b, "id", 40, 60)
    assert(rewritten.nonEmpty && carried.nonEmpty)
    val (v, moved) = SnapshotLog.publish(spark, t, "fix")
    val manifest = SnapshotLog.manifest(spark, t, v)
    assert(manifest.forall(!SnapshotLog.isExternal(_)),
      s"published manifest must be fully owned: $manifest")
    assert(rows(t) == ((1L to 39L) ++ (61L to 100L)).toSet)
    // the rewrite produced branch-owned files; publish must move them
    assert(moved.count(_.endsWith(".parquet")) >= 1)
  }

  test("tag pins retention through expire; tagDelete releases the pin") {
    import spark.implicits._
    val t = freshTable()
    SnapshotLog.commit(spark, t, (1L to 3L).toDF("id"), overwrite = true)  // v1
    SnapshotLog.commit(spark, t, (4L to 6L).toDF("id"), overwrite = true)  // v2
    SnapshotLog.tagCreate(spark, t, "keep", Some(1))
    SnapshotLog.commit(spark, t, (7L to 9L).toDF("id"), overwrite = true)  // v3
    SnapshotLog.expire(spark, t, keepLast = 1)
    // the tag clamps the horizon at v1: everything stays readable
    assert(rows(t, Some(1)) == (1L to 3L).toSet)
    assert(SnapshotLog.readTag(spark, t, "keep")
      .select("id").collect().map(_.getLong(0)).toSet == (1L to 3L).toSet)
    SnapshotLog.tagDelete(spark, t, "keep")
    SnapshotLog.expire(spark, t, keepLast = 1)
    val e = intercept[IllegalStateException](SnapshotLog.read(spark, t, Some(1)))
    assert(e.getMessage.contains("expired by retention"))
    assert(rows(t) == (7L to 9L).toSet)
  }

  test("tags listing and unknown-tag read error") {
    import spark.implicits._
    val t = freshTable()
    SnapshotLog.commit(spark, t, (1L to 3L).toDF("id"))
    SnapshotLog.commit(spark, t, (4L to 6L).toDF("id"))
    SnapshotLog.tagCreate(spark, t, "a", Some(1))
    SnapshotLog.tagCreate(spark, t, "b")
    assert(SnapshotLog.tags(spark, t) == Map("a" -> 1, "b" -> 2))
    val e = intercept[IllegalArgumentException](SnapshotLog.readTag(spark, t, "nope"))
    assert(e.getMessage.contains("no tag"))
    intercept[IllegalArgumentException](
      SnapshotLog.tagCreate(spark, t, "bad name with spaces"))
  }

  // ---- metadata-only RENAME/DROP COLUMN (column mapping) ----

  test("renameColumn is metadata-only: values read under the new name, zero files touched") {
    import spark.implicits._
    val t = freshTable()
    SnapshotLog.commit(spark, t, (1L to 50L).map(i => (i, i * 2)).toDF("id", "v"))
    val fsys = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def disk(): Set[String] = fsys
      .listStatus(new org.apache.hadoop.fs.Path(t))
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.getName).toSet
    val before = disk()
    val v = SnapshotLog.renameColumn(spark, t, "v", "val2")
    assert(v == 2 && disk() == before, "rename must not touch a data file")
    val df = SnapshotLog.read(spark, t)
    assert(df.columns.toSeq == Seq("id", "val2"))
    assert(df.filter(col("id") === 7).select("val2").collect()(0).getLong(0) == 14)
    // time travel reads v1 under the OLD name
    assert(SnapshotLog.read(spark, t, Some(1)).columns.toSeq == Seq("id", "v"))
    // refusals: unknown source, live target
    intercept[IllegalArgumentException](SnapshotLog.renameColumn(spark, t, "nope", "x"))
    intercept[IllegalArgumentException](SnapshotLog.renameColumn(spark, t, "id", "val2"))
  }

  test("stats pruning keys through the rename: the new name still skips files") {
    import spark.implicits._
    val t = freshTable()
    def batch(lo: Long, hi: Long) =
      (lo to hi).map(i => (i, i * 10)).toDF("k", "v").repartitionByRange(2, col("k"))
    SnapshotLog.commit(spark, t, batch(1, 100))
    SnapshotLog.commit(spark, t, batch(101, 200))
    SnapshotLog.renameColumn(spark, t, "k", "key")
    val (kept, total) = SnapshotLog.prunedFiles(spark, t, "key", 120, 180)
    assert(total == 4 && kept.size <= 2, s"renamed column must still prune: $kept/$total")
    val got = SnapshotLog.readPruned(spark, t, "key", 120, 180)
      .select("key").collect().map(_.getLong(0)).toSet
    assert(got == (120L to 180L).toSet)
  }

  test("append after rename lands physical names; old and new files read as one") {
    import spark.implicits._
    val t = freshTable()
    SnapshotLog.commit(spark, t, (1L to 10L).map(i => (i, i + 100)).toDF("id", "v"))
    SnapshotLog.renameColumn(spark, t, "v", "score")
    // append under the LOGICAL name; the file must spell the physical one
    SnapshotLog.commit(spark, t, (11L to 20L).map(i => (i, i + 100)).toDF("id", "score"))
    val all = SnapshotLog.read(spark, t).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(all.toSeq == (1L to 20L).map(i => (i, i + 100)))
    // the new file's footer stats rider is keyed by the PHYSICAL name
    // (v), which is exactly why pruning maps through the schema
    val entries = SnapshotLog.manifestEntries(spark, t, SnapshotLog.versions(spark, t).last)
    assert(entries.exists(_.contains("v=l:")), s"physical stats key expected: $entries")
    assert(!entries.exists(_.contains("score=l:")), "no file may spell the logical name")
  }

  test("dropColumn then re-add: old values can never resurrect under the re-used name") {
    import spark.implicits._
    val t = freshTable()
    SnapshotLog.commit(spark, t, (1L to 5L).map(i => (i, i * 7)).toDF("id", "c"))
    SnapshotLog.dropColumn(spark, t, "c")
    assert(SnapshotLog.read(spark, t).columns.toSeq == Seq("id"))
    // re-add the same logical name by appending rows that carry it
    SnapshotLog.commit(spark, t, (6L to 8L).map(i => (i, i * 1000)).toDF("id", "c"))
    val rowsOut = SnapshotLog.read(spark, t).orderBy("id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
    assert(rowsOut.toSeq ==
      ((1L to 5L).map(i => (i, None)) ++ (6L to 8L).map(i => (i, Some(i * 1000)))),
      s"dropped data resurfaced: ${rowsOut.mkString(",")}")
    intercept[IllegalArgumentException](SnapshotLog.dropColumn(spark, t, "nope"))
  }

  test("MoR delete subtracts correctly on a renamed table (DV path re-aliases)") {
    import spark.implicits._
    val t = freshTable()
    SnapshotLog.commit(spark, t,
      (1L to 40L).map(i => (i, i * 3)).toDF("id", "v").repartitionByRange(2, col("id")))
    SnapshotLog.renameColumn(spark, t, "id", "key")
    val (_, amended, _) = SnapshotLog.deleteWhereMoR(spark, t, "key", 10, 15)
    assert(amended.nonEmpty)
    val keys = SnapshotLog.read(spark, t).select("key").collect().map(_.getLong(0)).toSet
    assert(keys == ((1L to 9L) ++ (16L to 40L)).toSet)
    // and the change feed across the rename+delete stays coherent
    val ch = SnapshotLog.readChanges(spark, t, 2, 3)
    assert(ch.filter(col("change_type") === "delete").count() == 6)
  }

  test("mergeCoW upserts through a renamed key column (touched-file selection maps)") {
    import spark.implicits._
    val t = freshTable()
    SnapshotLog.commit(spark, t,
      (1L to 100L).map(i => (i, i)).toDF("id", "v").repartitionByRange(4, col("id")))
    SnapshotLog.renameColumn(spark, t, "id", "key")
    // change set hits one shard's range; merge through the LOGICAL name
    val changes = (40L to 45L).map(i => (i, i * 100)).toDF("key", "v")
    val (_, touched, carried) = SnapshotLog.mergeCoW(
      spark, t, "key", changes.select("key"),
      base => base
        .join(changes.select(col("key"), col("v").as("nv")), Seq("key"), "left")
        .select(col("key"), coalesce(col("nv"), col("v")).as("v")))
    assert(touched.nonEmpty && carried.nonEmpty,
      s"stats selection must stay file-granular through the rename: $touched/$carried")
    val got = SnapshotLog.read(spark, t)
      .filter(col("key").between(38, 47)).orderBy("key")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == (38L to 47L).map(i =>
      (i, if (i >= 40 && i <= 45) i * 100 else i)))
  }

  test("clustering compact on a renamed column restores pruning under the new name") {
    import spark.implicits._
    val t = freshTable()
    // modulo layout: every file spans the whole key domain — pruning dead
    SnapshotLog.commit(spark, t,
      (1L to 200L).map(i => (i, i)).toDF("id", "v").repartition(4, col("v")))
    SnapshotLog.renameColumn(spark, t, "id", "key")
    val (kept0, total0) = SnapshotLog.prunedFiles(spark, t, "key", 50, 60)
    assert(kept0.size == total0, "modulo layout must not prune (test setup)")
    val (_, rewritten, _) = SnapshotLog.compact(
      spark, t, smallerThanBytes = Long.MaxValue, filesOut = Some(4),
      sortBy = Seq("key"))
    assert(rewritten.nonEmpty)
    val (kept1, total1) = SnapshotLog.prunedFiles(spark, t, "key", 50, 60)
    assert(kept1.size < total1,
      s"clustered rewrite must prune on the renamed name: ${kept1.size}/$total1")
    assert(SnapshotLog.readPruned(spark, t, "key", 50, 60)
      .count() == 11)
  }

  test("publish of a branch carrying a MoR deletion vector moves the sidecar") {
    import spark.implicits._
    val t = freshTable()
    SnapshotLog.commit(spark, t,
      (1L to 50L).toDF("id").repartitionByRange(2, col("id")))
    val b = SnapshotLog.branchCreate(spark, t, "mor")
    val (_, amended, _) = SnapshotLog.deleteWhereMoR(spark, b, "id", 10, 15)
    assert(amended.nonEmpty)
    val (v, moved) = SnapshotLog.publish(spark, t, "mor")
    assert(moved.exists(_.startsWith("_dv/")), s"DV sidecar must move: $moved")
    // the published DV subtracts on main's read path
    assert(rows(t) == ((1L to 9L) ++ (16L to 50L)).toSet)
    // and the entries reference main-owned files + main-local sidecars
    assert(SnapshotLog.manifest(spark, t, v).forall(e =>
      !SnapshotLog.isExternal(e.split('\t')(0)) && !e.contains("_dv=v:/")))
  }

  test("ingest: ledger skips consumed names, idle call burns no version, " +
    "same-name replacement is deliberately not re-read") {
    import spark.implicits._
    val t = freshTable()
    val landing = Files.createTempDirectory("graft_ingest_src").toString
    SnapshotLog.commit(spark, t, Seq.empty[Long].toDF("id"))
    (1L to 4L).toDF("id").coalesce(1).write.mode("append").parquet(landing)
    val (v1, in1, sk1) = SnapshotLog.ingest(spark, t, landing)
    assert(in1 == 1 && sk1 == 0 && rows(t) == (1L to 4L).toSet)
    // wave 2 lands beside wave 1: only the new file moves
    (5L to 6L).toDF("id").coalesce(1).write.mode("append").parquet(landing)
    val (v2, in2, sk2) = SnapshotLog.ingest(spark, t, landing)
    assert(v2 == v1 + 1 && in2 == 1 && sk2 == 1 && rows(t) == (1L to 6L).toSet)
    // idle: nothing fresh → no version burned, full listing reported skipped
    val (v3, in3, sk3) = SnapshotLog.ingest(spark, t, landing)
    assert(v3 == v2 && in3 == 0 && sk3 == 2)
    assert(SnapshotLog.versions(spark, t).last == v2)
    // name-identity contract: overwriting a consumed file IN PLACE with
    // new content does not re-ingest it (Auto-Loader's posture — a
    // landing file is immutable once dropped; replacing one is an
    // upstream bug the ledger must not double-count)
    val fs = new org.apache.hadoop.fs.Path(landing)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val consumed = fs.listStatus(new org.apache.hadoop.fs.Path(landing))
      .map(_.getPath).filter(_.getName.endsWith(".parquet")).head
    val rewrite = Files.createTempDirectory("graft_ingest_rw").toString
    (100L to 101L).toDF("id").coalesce(1).write.mode("append").parquet(rewrite)
    val newFile = new org.apache.hadoop.fs.Path(rewrite).getFileSystem(
      spark.sessionState.newHadoopConf())
      .listStatus(new org.apache.hadoop.fs.Path(rewrite))
      .map(_.getPath).filter(_.getName.endsWith(".parquet")).head
    fs.delete(consumed, false)
    fs.rename(newFile, consumed)
    val (v4, in4, _) = SnapshotLog.ingest(spark, t, landing)
    assert(v4 == v2 && in4 == 0 && rows(t) == (1L to 6L).toSet)
  }

  test("ingest: text formats read under the table's declared schema; " +
    "unknown format and missing table refuse loudly") {
    import spark.implicits._
    val t = freshTable()
    val landing = Files.createTempDirectory("graft_ingest_csv").toString
    SnapshotLog.commit(
      spark, t, Seq((1L, "a")).toDF("id", "s").where(lit(false)))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(landing, "drop1.csv"),
      "id,s\n7,x\n8,y\n".getBytes("UTF-8"))
    val (_, in1, _) = SnapshotLog.ingest(spark, t, landing, format = "csv")
    assert(in1 == 1)
    val got = SnapshotLog.read(spark, t)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((7L, "x"), (8L, "y")))
    val e1 = intercept[IllegalArgumentException](
      SnapshotLog.ingest(spark, t, landing, format = "orc"))
    assert(e1.getMessage.contains("parquet|csv|json"))
    val e2 = intercept[IllegalArgumentException](
      SnapshotLog.ingest(spark, freshTable(), landing))
    assert(e2.getMessage.contains("no commits"))
  }

  /** Round 18: `_sz`/`_rc` rider BACKFILL for pre-upgrade manifests —
    * a data-preserving replace delta stamping footer-read stats onto
    * rider-less entries, healing the metadata count (and the MV
    * candidate ranking) without rewriting a byte of data. */
  test("backfillStats stamps missing _sz/_rc riders from parquet footers: " +
    "metadataCount heals, the pass is idempotent (0 = no version " +
    "burned), and history stays readable") {
    import spark.implicits._
    val t = freshTable()
    SnapshotLog.commit(spark, t, (1L to 5L).toDF("id"))
    SnapshotLog.commit(spark, t, (6L to 9L).toDF("id"))
    assert(SnapshotLog.metadataCount(spark, t).contains(9L))
    // simulate a pre-upgrade table: strip the stats riders from every
    // committed entry line, in both commit files
    (1 to 2).foreach { v =>
      val cp = java.nio.file.Paths.get(
        s"$t/_log/v${"%08d".format(v)}.commit")
      val stripped = new String(java.nio.file.Files.readAllBytes(cp))
        .linesIterator.map { l =>
          if (!l.contains("\t")) l
          else {
            val Array(name, suffix) = l.split("\t", 2)
            val kept = suffix.split(';')
              .filterNot(x => x.startsWith("_sz=") || x.startsWith("_rc="))
              .mkString(";")
            if (kept.isEmpty) name else s"$name\t$kept"
          }
        }.mkString("", "\n", "\n")
      java.nio.file.Files.write(cp, stripped.getBytes("UTF-8"))
      // hadoop's local FS keeps .crc sidecars; the hand-edit must
      // drop the stale one or every later read checksum-fails
      java.nio.file.Files.deleteIfExists(
        cp.getParent.resolve("." + cp.getFileName.toString + ".crc"))
    }
    assert(SnapshotLog.metadataCount(spark, t).isEmpty,
      "rider-less entries must refuse the metadata count, not guess")
    assert(rows(t) == (1L to 9L).toSet, "data reads are rider-independent")
    // the backfill stamps every rider-less entry from its footer
    val liveFiles = SnapshotLog.read(spark, t)
      .select(org.apache.spark.sql.functions.input_file_name())
      .distinct().count()
    val n = SnapshotLog.backfillStats(spark, t)
    assert(n == liveFiles, s"every live file lacked riders: $liveFiles, got $n")
    assert(SnapshotLog.metadataCount(spark, t).contains(9L),
      "the metadata count must be exact again")
    assert(rows(t) == (1L to 9L).toSet)
    // idempotent: nothing missing, nothing committed
    val vBefore = SnapshotLog.versions(spark, t).last
    assert(SnapshotLog.backfillStats(spark, t) == 0)
    assert(SnapshotLog.versions(spark, t).last == vBefore,
      "a no-op backfill must not burn a version")
    // the backfill is data-preserving: the change feed sees no rows
    val changes = SnapshotLog.readChanges(spark, t, vBefore - 1, vBefore)
    assert(changes.count() == 0L,
      "statsfill must commit datachange=false (no feed rows)")
  }
}

/** Mock object-store filesystem for the commit-posture pin: local IO,
  * foreign scheme — exactly what the protocol cannot prove safe. */
class FakeObjectStoreFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "fakes3"
  override def getUri: java.net.URI = java.net.URI.create("fakes3:///")
}

/** In-memory if-none-match store: the S3-class conditional-put
  * primitive, shaped exactly as a real backend would be — putIfAbsent
  * on the target key arbitrates (ConcurrentHashMap.add is the
  * compare-and-set a real store does server-side), the winner then
  * writes the staged manifest through. The race suite runs verbatim
  * against it, so the protocol's object-store path is code-real even
  * though no object store exists in this sandbox. */
class InMemoryCondPutBackend extends graft.sources.SnapshotLog.CommitBackend {
  private val published =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  override def putIfAbsent(
      f: org.apache.hadoop.fs.FileSystem,
      table: String,
      v: Int,
      tmp: org.apache.hadoop.fs.Path,
      target: org.apache.hadoop.fs.Path
  ): Boolean =
    published.add(target.toString) && f.rename(tmp, target)

}

