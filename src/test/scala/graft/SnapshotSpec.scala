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
}
