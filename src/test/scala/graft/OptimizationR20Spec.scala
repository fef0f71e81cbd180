package graft

import org.apache.spark.sql.functions._

/** Focused pins for the round-20 optimization changes — each proves an
  * internals change can never serve stale or wrong values.
  *
  *   1. The SnapshotLog commit-file memo is keyed by (mtime, length)
  *      identity: deleting a table directory and recreating it at the
  *      SAME path with the SAME version numbers but different content
  *      must serve the NEW incarnation's manifests, schema and
  *      versions — the exact hazard a bare (path, version) cache
  *      would have.
  *   2. versions() stays a hint + forward probe: a commit whose tip
  *      write is missing (simulated by restoring an older tip) is
  *      still found.
  *   3. The footer-extremum memo is (mtime, length)-validated: a
  *      rewritten fixture file at the same path yields the new
  *      extremum, never the memoized old one.
  */
class OptimizationR20Spec extends SparkTestBase {
  import graft.sources.SnapshotLog

  private def freshDir(name: String): String = {
    val d = s"${sys.props("java.io.tmpdir")}/graft_r20spec/$name"
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete(): Unit
    }
    rm(new java.io.File(d))
    d
  }

  test("commit-file memo: a same-path table recreation with the same " +
    "version numbers serves the NEW incarnation's manifest and schema") {
    import spark.implicits._
    val t = freshDir("recreate")
    SnapshotLog.commit(spark, t, Seq((1L, "a")).toDF("id", "s"))
    SnapshotLog.commit(spark, t, Seq((2L, "b")).toDF("id", "s"))
    // prime every memo
    assert(SnapshotLog.versions(spark, t) == (1 to 2))
    val entriesOld = SnapshotLog.manifestEntries(spark, t, 1)
    assert(entriesOld.nonEmpty)
    assert(SnapshotLog.read(spark, t).count() == 2L)
    // kill and recreate at the SAME path, same version count, new
    // content and a different schema
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete(): Unit
    }
    rm(new java.io.File(t))
    // mtime granularity is the identity the memo stands on — a fresh
    // incarnation lands later than the old one; no sleep needed beyond
    // the Spark jobs in between, but make the margin explicit
    Thread.sleep(5)
    SnapshotLog.commit(spark, t, Seq((10L, "x", 1.5)).toDF("id", "s", "w"))
    SnapshotLog.commit(spark, t, Seq((20L, "y", 2.5)).toDF("id", "s", "w"))
    assert(SnapshotLog.versions(spark, t) == (1 to 2))
    val entriesNew = SnapshotLog.manifestEntries(spark, t, 1)
    assert(
      entriesNew != entriesOld,
      "recreated v1 must resolve to the new incarnation's files")
    val schema = SnapshotLog.tableSchema(spark, t, 2)
    assert(
      schema.exists(_.fieldNames.contains("w")),
      s"recreated schema must be the new incarnation's, got $schema")
    assert(
      SnapshotLog.read(spark, t).select("id").as[Long].collect().toSet ==
        Set(10L, 20L))
  }

  test("versions() is a hint + forward probe: commits the tip pointer " +
    "missed are still found") {
    import spark.implicits._
    val t = freshDir("tiplag")
    SnapshotLog.commit(spark, t, Seq(1L).toDF("id"))
    SnapshotLog.commit(spark, t, Seq(2L).toDF("id"))
    assert(SnapshotLog.versions(spark, t) == (1 to 2)) // prime the memo
    // roll the tip pointer BACK to 1 (a crashed tip write after v2's
    // manifest landed looks exactly like this)
    val tip = java.nio.file.Paths.get(t, "_log", "_tip")
    java.nio.file.Files.writeString(tip, "1")
    // hadoop's local FS keeps .crc sidecars; the hand-edit must drop
    // the stale one or the tip read checksum-fails (which would still
    // pass via the listing fallback, but the probe is what's pinned)
    java.nio.file.Files.deleteIfExists(tip.getParent.resolve("._tip.crc"))
    assert(
      SnapshotLog.versions(spark, t) == (1 to 2),
      "forward probe must find the commit the pointer missed")
    // and a further commit keeps everything consistent
    SnapshotLog.commit(spark, t, Seq(3L).toDF("id"))
    assert(SnapshotLog.versions(spark, t) == (1 to 3))
    assert(SnapshotLog.read(spark, t).count() == 3L)
  }

  test("footer-extremum memo: a rewritten file at the same path yields " +
    "the new extremum, never the memoized old one") {
    import spark.implicits._
    val dir = freshDir("extmemo")
    new java.io.File(dir).mkdirs()
    val f = s"$dir/fix.parquet"
    def writeOne(ids: Seq[Long]): Unit = {
      val staging = s"$dir/_stage"
      ids.toDF("k").coalesce(1).write.mode("overwrite").parquet(staging)
      val part = new java.io.File(staging).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(f)
      dst.delete()
      java.nio.file.Files.move(part.toPath, dst.toPath)
    }
    writeOne(Seq(1L, 5L, 9L))
    assert(Tables.footerMaxLong(spark, f, "k").contains(9L))
    assert(Tables.footerMaxLong(spark, f, "k").contains(9L)) // memo hit
    Thread.sleep(5) // stat identity margin (ms mtime granularity)
    writeOne(Seq(2L, 42L))
    assert(
      Tables.footerMaxLong(spark, f, "k").contains(42L),
      "a rewritten fixture must invalidate the extremum memo")
    assert(Tables.footerMinLong(spark, f, "k").contains(2L))
  }

  test("extremum scan fallback names the table/column on an all-null " +
    "column instead of NPE (ADVICE r19)") {
    // string column: footer path refuses (not a plain signed int), the
    // scan fallback aggregates max(NULL-free string)... use an actually
    // all-null typed frame via a synthetic fixture
    import spark.implicits._
    val dir = freshDir("nullext")
    new java.io.File(dir).mkdirs()
    Seq[Option[Long]](None, None).toDF("k")
      .write.mode("overwrite").parquet(s"$dir/nulls.parquet")
    val e = intercept[IllegalStateException] {
      Tables.maxLong(spark, dir, "nulls", "k")
    }
    assert(e.getMessage.contains("nulls.k"))
  }
}
