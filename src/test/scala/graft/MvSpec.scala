package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.SnapshotLog

/** Round-12 managed materialized views (SnapshotLog.createMv /
  * refreshMv, surfaced as CALL system.create_mv / refresh_mv): the
  * incremental refresh folds ONLY the source's change feed since the
  * MV's recorded high-water version, and must land bit-exactly on a
  * full recompute of the source's current state after any mix of
  * appends and CoW rewrites. */
class MvSpec extends SparkTestBase {

  private def fresh(name: String): String =
    Files.createTempDirectory("graft_mv").toString + "/" + name

  /** Full recompute of what the MV should hold at the source's tip. */
  private def recompute(src: String): Set[(Long, Long, Long)] =
    SnapshotLog.read(spark, src)
      .groupBy(col("k"))
      .agg(sum(col("v")).as("mv_sum"), count(lit(1)).as("mv_n"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet

  private def mvRows(mv: String): Set[(Long, Long, Long)] =
    SnapshotLog.read(spark, mv)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet

  private def kv(rows: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("k", "v")
  }

  test("refresh after appends and a CoW rewrite lands on the full recompute") {
    val src = fresh("src")
    val mv = fresh("mv")
    SnapshotLog.commit(spark, src, kv(Seq(1L -> 10L, 2L -> 20L, 2L -> 5L)))
    SnapshotLog.commit(spark, src, kv(Seq(3L -> 7L, 1L -> 1L)))
    val asOf = SnapshotLog.createMv(spark, src, mv, "k", "v")
    assert(asOf == 2)
    assert(mvRows(mv) == recompute(src))
    // the source moves on: an append AND a CoW update behind the MV's back
    SnapshotLog.commit(spark, src, kv(Seq(4L -> 100L, 2L -> 2L)))
    SnapshotLog.mergeCoW(
      spark, src, "k", kv(Seq(1L -> 0L)).select("k"),
      df => df.withColumn("v", when(col("k") === 1L, col("v") * 3).otherwise(col("v"))))
    val (from, to) = SnapshotLog.refreshMv(spark, mv)
    assert(from == 2 && to == SnapshotLog.versions(spark, src).last)
    assert(mvRows(mv) == recompute(src))
  }

  test("a key whose rows are all CoW-deleted vanishes from the MV") {
    val src = fresh("src")
    val mv = fresh("mv")
    SnapshotLog.commit(spark, src, kv(Seq(1L -> 10L, 2L -> 20L)))
    SnapshotLog.createMv(spark, src, mv, "k", "v")
    SnapshotLog.deleteWhere(spark, src, "k", 2L, 2L)
    SnapshotLog.refreshMv(spark, mv)
    assert(mvRows(mv) == Set((1L, 10L, 1L)))
    assert(recompute(src) == mvRows(mv))
  }

  test("idle refresh is a no-op: same version twice, no MV commit burned") {
    val src = fresh("src")
    val mv = fresh("mv")
    SnapshotLog.commit(spark, src, kv(Seq(1L -> 10L)))
    SnapshotLog.createMv(spark, src, mv, "k", "v")
    val before = SnapshotLog.versions(spark, mv).last
    val (f, t) = SnapshotLog.refreshMv(spark, mv)
    assert(f == t)
    assert(SnapshotLog.versions(spark, mv).last == before)
  }

  test("successive refresh cycles track the advancing high-water mark") {
    val src = fresh("src")
    val mv = fresh("mv")
    SnapshotLog.commit(spark, src, kv(Seq(1L -> 1L)))
    SnapshotLog.createMv(spark, src, mv, "k", "v")
    SnapshotLog.commit(spark, src, kv(Seq(1L -> 2L, 2L -> 9L)))
    val (f1, t1) = SnapshotLog.refreshMv(spark, mv)
    SnapshotLog.commit(spark, src, kv(Seq(2L -> -9L, 3L -> 4L)))
    val (f2, t2) = SnapshotLog.refreshMv(spark, mv)
    // the second cycle starts exactly where the first ended: deltas are
    // consumed once — double-counting the v2 append would show up here
    assert(f2 == t1 && f1 < t1 && f2 < t2)
    assert(mvRows(mv) == recompute(src))
  }

  test("refresh of a table that is not an MV refuses loudly") {
    val t = fresh("plain")
    SnapshotLog.commit(spark, t, kv(Seq(1L -> 1L)))
    val e = intercept[IllegalArgumentException] {
      SnapshotLog.refreshMv(spark, t)
    }
    assert(e.getMessage.contains("not a materialized view"))
  }

  /** Full recompute of a minmax MV at the source's tip. */
  private def recomputeMinmax(src: String): Set[(Long, Long, Long, Long)] =
    SnapshotLog.read(spark, src)
      .groupBy(col("k"))
      .agg(min(col("v")).as("mv_min"), max(col("v")).as("mv_max"),
        count(lit(1)).as("mv_n"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

  private def mvMinmaxRows(mv: String): Set[(Long, Long, Long, Long)] =
    SnapshotLog.read(spark, mv)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

  test("minmax MV: inserts fold; a CoW delete that removes a group's minimum " +
    "lands on the group-scoped recompute exactly") {
    val src = fresh("src")
    val mv = fresh("mv")
    SnapshotLog.commit(spark, src, kv(Seq(1L -> 10L, 1L -> 30L, 2L -> 5L)))
    val asOf = SnapshotLog.createMv(spark, src, mv, "k", "v", kind = "minmax")
    assert(asOf == 1 && mvMinmaxRows(mv) == recomputeMinmax(src))
    // pure-insert delta: the fold path (no recompute needed)
    SnapshotLog.commit(spark, src, kv(Seq(1L -> 7L, 3L -> 50L)))
    SnapshotLog.refreshMv(spark, mv)
    assert(mvMinmaxRows(mv) == recomputeMinmax(src))
    assert(mvMinmaxRows(mv).contains((1L, 7L, 30L, 3L)))
    // CoW delete of group 1's MINIMUM (v=7): min/max cannot invert a
    // delete — the refresh must recompute group 1 from the source and
    // land min back on 10, while groups 2 and 3 keep the fold
    SnapshotLog.mergeCoW(
      spark, src, "k", kv(Seq(1L -> 0L)).select("k"),
      df => df.filter(!(col("k") === 1L && col("v") === 7L)))
    SnapshotLog.refreshMv(spark, mv)
    assert(mvMinmaxRows(mv) == recomputeMinmax(src))
    assert(mvMinmaxRows(mv).contains((1L, 10L, 30L, 2L)))
    // a fully-deleted group vanishes from the MV
    SnapshotLog.mergeCoW(
      spark, src, "k", kv(Seq(3L -> 0L)).select("k"),
      df => df.filter(col("k") =!= 3L))
    SnapshotLog.refreshMv(spark, mv)
    assert(mvMinmaxRows(mv) == recomputeMinmax(src))
    assert(!mvMinmaxRows(mv).exists(_._1 == 3L))
  }

  /** Full recompute of a stats MV at the source's tip. */
  private def recomputeStats(src: String): Set[(Long, Long, Long, Long)] =
    SnapshotLog.read(spark, src)
      .groupBy(col("k"))
      .agg(sum(col("v")).as("mv_sum"), sum(col("v") * col("v")).as("mv_sumsq"),
        count(lit(1)).as("mv_n"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

  test("stats MV: sum/sumsq/n fold through appends, CoW updates and deletes; " +
    "avg and variance derive from the moments") {
    val src = fresh("src")
    val mv = fresh("mv")
    SnapshotLog.commit(spark, src, kv(Seq(1L -> 3L, 1L -> 5L, 2L -> 4L)))
    val asOf = SnapshotLog.createMv(spark, src, mv, "k", "v", kind = "stats")
    assert(asOf == 1 && mvMinmaxRows(mv) == recomputeStats(src))
    assert(mvMinmaxRows(mv).contains((1L, 8L, 34L, 2L))) // 3+5, 9+25
    // append (fold +), then a CoW update: the x² of the OLD value must
    // subtract while the NEW one adds — 3 leaves (−9), 30 lands (+900)
    SnapshotLog.commit(spark, src, kv(Seq(3L -> 6L, 1L -> 2L)))
    SnapshotLog.mergeCoW(
      spark, src, "k", kv(Seq(1L -> 0L)).select("k"),
      df => df.withColumn("v", when(col("k") === 1L && col("v") === 3L,
        lit(30L)).otherwise(col("v"))))
    SnapshotLog.refreshMv(spark, mv)
    assert(mvMinmaxRows(mv) == recomputeStats(src))
    assert(mvMinmaxRows(mv).contains((1L, 37L, 929L, 3L))) // 30+5+2, 900+25+4
    // a scattering delete folds too (no recompute branch in stats),
    // and a fully-deleted group vanishes
    SnapshotLog.mergeCoW(
      spark, src, "k", kv(Seq(2L -> 0L)).select("k"),
      df => df.filter(col("k") =!= 2L))
    SnapshotLog.refreshMv(spark, mv)
    assert(mvMinmaxRows(mv) == recomputeStats(src))
    assert(!mvMinmaxRows(mv).exists(_._1 == 2L))
    // the promised derivation: mean and population variance from the
    // three moments alone — k=1: mean 37/3, var 929/3 − mean²
    val m = SnapshotLog.read(spark, mv)
      .filter(col("k") === 1L)
      .select(
        (col("mv_sum").cast("double") / col("mv_n")).as("mean"),
        (col("mv_sumsq").cast("double") / col("mv_n") -
          pow(col("mv_sum").cast("double") / col("mv_n"), 2)).as("var"))
      .head
    val exact = SnapshotLog.read(spark, src).filter(col("k") === 1L)
      .agg(avg(col("v")), var_pop(col("v"))).head
    assert(math.abs(m.getDouble(0) - exact.getDouble(0)) < 1e-9)
    assert(math.abs(m.getDouble(1) - exact.getDouble(1)) < 1e-9)
  }

  test("minmax recompute pins at the watermark: a source commit landing " +
    "mid-refresh neither leaks into the recompute nor double-folds") {
    val src = fresh("src")
    val mv = fresh("mv")
    SnapshotLog.commit(spark, src, kv(Seq(1L -> 10L, 1L -> 30L, 2L -> 5L)))
    SnapshotLog.createMv(spark, src, mv, "k", "v", kind = "minmax")
    // a delete of group 1's minimum forces the group-scoped RECOMPUTE
    // branch — the only branch that reads the source directly
    SnapshotLog.mergeCoW(
      spark, src, "k", kv(Seq(1L -> 0L)).select("k"),
      df => df.filter(!(col("k") === 1L && col("v") === 10L)))
    val tipAtRefresh = SnapshotLog.versions(spark, src).last
    // the racing commit lands AFTER the watermark is pinned: a new
    // global minimum for group 1 plus a brand-new group
    SnapshotLog.refreshMv(spark, mv, onWatermarkPinned = () => {
      SnapshotLog.commit(spark, src, kv(Seq(1L -> 1L, 4L -> 9L))): Unit
    })
    // the refresh must reflect EXACTLY version tipAtRefresh — a
    // tip-reading recompute would pull 1 -> 1 into group 1 here
    val atTo = SnapshotLog.read(spark, src, Some(tipAtRefresh))
      .groupBy(col("k"))
      .agg(min(col("v")).as("mv_min"), max(col("v")).as("mv_max"),
        count(lit(1)).as("mv_n"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(mvMinmaxRows(mv) == atTo,
      s"refresh must land on the watermark state: ${mvMinmaxRows(mv)} vs $atTo")
    // and the NEXT refresh folds the racing commit exactly once: the
    // tip-reading design double-counted mv_n for the recomputed group
    SnapshotLog.refreshMv(spark, mv)
    assert(mvMinmaxRows(mv) == recomputeMinmax(src))
    assert(mvMinmaxRows(mv).contains((1L, 1L, 30L, 2L)))
  }

  test("minmax delete-recompute is SCOPED by manifest stats: files whose " +
    "key range excludes every delete-touched key are never opened") {
    val src = fresh("src")
    val mv = fresh("mv")
    // two key shards in two separate commits — per-file stats are
    // tight and disjoint by construction
    SnapshotLog.commit(
      spark, src, kv(Seq(1L -> 10L, 2L -> 30L, 3L -> 5L)).coalesce(1))
    SnapshotLog.commit(
      spark, src,
      kv(Seq(1000L -> 7L, 1001L -> 50L, 1002L -> 9L)).coalesce(1))
    val outerFiles = SnapshotLog.read(spark, src)
      .select(org.apache.spark.sql.functions
        .input_file_name().as("f"))
      .where(col("f").isNotNull)
      .distinct().collect().map(_.getString(0))
      .filter { f =>
        spark.read.parquet(f).agg(min(col("k"))).head.getLong(0) >= 1000L
      }
    assert(outerFiles.nonEmpty, "layout precondition: an outer-shard file")
    SnapshotLog.createMv(spark, src, mv, "k", "v", kind = "minmax")
    // CoW-delete the INNER shard's minimum — the recompute branch fires
    // for inner keys only
    SnapshotLog.mergeCoW(
      spark, src, "k", kv(Seq(1L -> 0L)).select("k"),
      df => df.filter(!(col("k") === 1L && col("v") === 10L)))
    // corrupt every outer-shard file on disk: if the recompute opened
    // ANY of them the refresh would crash — stats admission must have
    // excluded them (the delete-touched keys all sit in the inner
    // shard's range)
    val saved = outerFiles.map { f =>
      val p = java.nio.file.Paths.get(new java.net.URI(f))
      val bytes = java.nio.file.Files.readAllBytes(p)
      java.nio.file.Files.write(p, Array[Byte](0, 1, 2, 3))
      (p, bytes)
    }
    try {
      SnapshotLog.refreshMv(spark, mv)
    } finally saved.foreach { case (p, bytes) =>
      java.nio.file.Files.write(p, bytes)
    }
    // exact: recomputed inner groups + folded (untouched) outer groups
    assert(mvMinmaxRows(mv) == recomputeMinmax(src))
    assert(mvMinmaxRows(mv).contains((1L, 10L, 10L, 1L)) === false)
    assert(mvMinmaxRows(mv).exists(_._1 == 1000L))
  }

  test("composite-key MV: the incremental fold AND the minmax " +
    "delete-recompute both group by the full key list; a derived " +
    "composite refuses") {
    import spark.implicits._
    def ksv(rows: Seq[(Long, String, Long)]): org.apache.spark.sql.DataFrame =
      rows.toDF("k", "s", "v")
    def recomputeC(src: String): Set[(Long, String, Long, Long, Long)] =
      SnapshotLog.read(spark, src)
        .groupBy(col("k"), col("s"))
        .agg(min(col("v")).as("mv_min"), max(col("v")).as("mv_max"),
          count(lit(1)).as("mv_n"))
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
          r.getLong(4)))
        .toSet
    def mvC(mv: String): Set[(Long, String, Long, Long, Long)] =
      SnapshotLog.read(spark, mv).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
          r.getLong(4)))
        .toSet
    val src = fresh("src")
    val mv = fresh("mv")
    SnapshotLog.commit(
      spark, src, ksv(Seq((1L, "a", 10L), (1L, "b", 20L), (2L, "a", 5L))))
    SnapshotLog.createMv(spark, src, mv, "k,s", "v", kind = "minmax")
    assert(mvC(mv) == recomputeC(src))
    // pure-insert delta folds per (k, s) — (1,'a') gains a new min,
    // (1,'b') must NOT see it
    SnapshotLog.commit(spark, src, ksv(Seq((1L, "a", 7L), (3L, "c", 50L))))
    SnapshotLog.refreshMv(spark, mv)
    assert(mvC(mv) == recomputeC(src))
    assert(mvC(mv).contains((1L, "a", 7L, 10L, 2L)))
    assert(mvC(mv).contains((1L, "b", 20L, 20L, 1L)))
    // delete (1,'a')'s minimum: ONLY that composite group recomputes
    SnapshotLog.mergeCoW(
      spark, src, "k", Seq(1L).toDF("k"),
      df => df.filter(!(col("k") === 1L && col("s") === "a" && col("v") === 7L)))
    SnapshotLog.refreshMv(spark, mv)
    assert(mvC(mv) == recomputeC(src))
    assert(mvC(mv).contains((1L, "a", 10L, 10L, 1L)))
    // a derived expression cannot combine with a composite list
    val e = intercept[IllegalArgumentException] {
      SnapshotLog.createMv(
        spark, src, fresh("mv2"), "day,k", "v",
        keyExpr = Some("to_date(ts)"))
    }
    assert(e.getMessage.contains("composite"))
  }

  test("multi-measure minmax MV: the insert fold and the delete-recompute " +
    "cover every measure; a deleted extremum of ONE measure recomputes " +
    "both exactly") {
    import spark.implicits._
    def kab(rows: Seq[(Long, Long, Long)]): org.apache.spark.sql.DataFrame =
      rows.toDF("k", "a", "b")
    def recomputeM(src: String): Set[(Long, Long, Long, Long, Long, Long)] =
      SnapshotLog.read(spark, src)
        .groupBy(col("k"))
        .agg(
          min(col("a")).as("mv_min_a"), max(col("a")).as("mv_max_a"),
          min(col("b")).as("mv_min_b"), max(col("b")).as("mv_max_b"),
          count(lit(1)).as("mv_n"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5)))
        .toSet
    def mvM(mv: String): Set[(Long, Long, Long, Long, Long, Long)] =
      SnapshotLog.read(spark, mv).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5)))
        .toSet
    val src = fresh("src")
    val mv = fresh("mv")
    SnapshotLog.commit(
      spark, src, kab(Seq((1L, 10L, 100L), (1L, 30L, 50L), (2L, 5L, 7L))))
    SnapshotLog.createMv(spark, src, mv, "k", "a,b", kind = "minmax")
    assert(mvM(mv) == recomputeM(src))
    SnapshotLog.commit(spark, src, kab(Seq((1L, 7L, 200L), (3L, 1L, 2L))))
    SnapshotLog.refreshMv(spark, mv)
    assert(mvM(mv) == recomputeM(src))
    assert(mvM(mv).contains((1L, 7L, 30L, 50L, 200L, 3L)))
    // delete the row holding group 1's minimum of `a` AND maximum of
    // `b` — the recompute must land both extrema exactly
    SnapshotLog.mergeCoW(
      spark, src, "k", Seq(1L).toDF("k"),
      df => df.filter(!(col("k") === 1L && col("a") === 7L)))
    SnapshotLog.refreshMv(spark, mv)
    assert(mvM(mv) == recomputeM(src))
    assert(mvM(mv).contains((1L, 10L, 30L, 50L, 100L, 2L)))
  }

  test("derived-key MV (to_date): the fold AND the delete-touched-group " +
    "recompute both re-derive the day; a colliding key name refuses") {
    import java.sql.Timestamp
    import spark.implicits._
    val src = fresh("src")
    val mv = fresh("mv")
    def rows(xs: (String, Long)*) =
      xs.map { case (t, v) => (Timestamp.valueOf(t), v) }.toSeq.toDF("ts", "v")
    SnapshotLog.commit(spark, src, rows(
      "2024-03-01 08:00:00" -> 10L, "2024-03-01 18:00:00" -> 30L,
      "2024-03-02 09:00:00" -> 5L))
    SnapshotLog.createMv(
      spark, src, mv, "day", "v", kind = "minmax",
      keyExpr = Some("to_date(ts)"))
    def state(): Set[(String, Long, Long, Long)] =
      SnapshotLog.read(spark, mv).collect()
        .map(r => (r.get(0).toString, r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
    assert(state() == Set(
      ("2024-03-01", 10L, 30L, 2L), ("2024-03-02", 5L, 5L, 1L)))
    // pure-insert delta: the fold path re-derives the day
    SnapshotLog.commit(spark, src, rows(
      "2024-03-01 23:00:00" -> 7L, "2024-03-03 01:00:00" -> 50L))
    SnapshotLog.refreshMv(spark, mv)
    assert(state() == Set(
      ("2024-03-01", 7L, 30L, 3L), ("2024-03-02", 5L, 5L, 1L),
      ("2024-03-03", 50L, 50L, 1L)))
    // CoW delete of day 1's MINIMUM: the group-scoped recompute must
    // re-derive the day over the source at the watermark
    SnapshotLog.mergeCoW(
      spark, src, "v", Seq(7L).toDF("v"),
      df => df.filter(col("v") =!= 7L))
    SnapshotLog.refreshMv(spark, mv)
    assert(state() == Set(
      ("2024-03-01", 10L, 30L, 2L), ("2024-03-02", 5L, 5L, 1L),
      ("2024-03-03", 50L, 50L, 1L)))
    // a derived key whose name collides with a source column refuses
    val e = intercept[IllegalArgumentException](
      SnapshotLog.createMv(
        spark, src, fresh("mv2"), "ts", "v", keyExpr = Some("to_date(ts)")))
    assert(e.getMessage.contains("collides"))
  }

  test("a crash between refresh commit and props rewrite cannot double-count " +
    "(high-water mark rides the commit header)") {
    val src = fresh("src")
    val mv = fresh("mv")
    SnapshotLog.commit(spark, src, kv(Seq(1L -> 10L, 2L -> 20L)))
    val asOf = SnapshotLog.createMv(spark, src, mv, "k", "v")
    SnapshotLog.commit(spark, src, kv(Seq(1L -> 5L, 3L -> 7L)))
    val (_, to) = SnapshotLog.refreshMv(spark, mv)
    val good = mvRows(mv)
    assert(good == recompute(src))
    // simulate the crash window: the fold COMMITTED (header carries
    // mvv=to) but the props rewrite never ran — wind the props copy
    // back to the pre-refresh version
    val props = SnapshotLog.tableProps(spark, mv)
    SnapshotLog.setTableProps(
      spark, mv, props + ("mv_version" -> asOf.toString))
    // a replayed refresh must trust the committed header, see nothing
    // new, and change nothing — the stale-props design double-applied
    // the same change feed here (1->15 became 1->20)
    val (f2, t2) = SnapshotLog.refreshMv(spark, mv)
    assert(f2 == to && t2 == to, s"replay must no-op from the header: $f2 -> $t2")
    assert(mvRows(mv) == good)
  }

  /** kind='distinct' (round 15): exact COUNT(DISTINCT v) partials at
    * (key, 32768-value-bucket) grain — one Spark-native bitmap per
    * bucket. Inserts fold by bitmap OR; delete-touched groups
    * recompute (a surviving row may carry the deleted value, so the
    * partial is not invertible). The per-key truth is
    * sum-over-buckets of the stored cardinalities. */
  private def recomputeDistinct(src: String): Set[(Long, Long, Long)] =
    SnapshotLog.read(spark, src)
      .groupBy(col("k"))
      .agg(countDistinct(col("v")).as("dc"), count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet

  private def mvDistinctRows(mv: String): Set[(Long, Long, Long)] =
    SnapshotLog.read(spark, mv)
      .groupBy(col("k"))
      .agg(sum(col("mv_dc")).as("dc"), sum(col("mv_n")).as("n"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet

  test("distinct MV: inserts (duplicates, negatives, a fresh bucket) fold " +
    "by bitmap OR; deletes recompute — dropping a value only when its last " +
    "copy goes; an all-NULL group survives as zero") {
    import spark.implicits._
    val src = fresh("src")
    val mv = fresh("mv")
    def rows(xs: (Long, Option[Long])*) = xs.toDF("k", "v")
    // k=1 spans three buckets (negative, small, 70000) with a repeated
    // 5; k=2 is all-NULL (count(distinct)=0 but the GROUP must exist)
    SnapshotLog.commit(spark, src, rows(
      1L -> Some(5L), 1L -> Some(5L), 1L -> Some(-3L), 1L -> Some(70000L),
      2L -> None, 3L -> Some(8L)))
    val asOf = SnapshotLog.createMv(spark, src, mv, "k", "v", kind = "distinct")
    assert(asOf == 1)
    assert(mvDistinctRows(mv) == recomputeDistinct(src))
    assert(mvDistinctRows(mv) == Set((1L, 3L, 4L), (2L, 0L, 1L), (3L, 1L, 1L)))
    // the stored grain really is (key, bucket): k=1 holds 3 value
    // buckets plus none for NULL — 5 and -3 share bucket 0? no: -3 is
    // bucket 0, 5 is bucket 1, 70000 bucket 3 (pinning the grain, not
    // the bucket arithmetic)
    assert(SnapshotLog.read(spark, mv).filter(col("k") === 1L).count() == 3)
    // pure-insert delta: a DUPLICATE of an existing value (no count
    // change), a first value for the all-NULL group, a new group with
    // a negative value — all fold, no recompute
    SnapshotLog.commit(spark, src, rows(
      1L -> Some(5L), 2L -> Some(100000L), 4L -> Some(-1L)))
    SnapshotLog.refreshMv(spark, mv)
    assert(mvDistinctRows(mv) == recomputeDistinct(src))
    assert(mvDistinctRows(mv) == Set(
      (1L, 3L, 5L), (2L, 1L, 2L), (3L, 1L, 1L), (4L, 1L, 1L)))
    // CoW delete of v=5 removes all THREE copies under k=1: the
    // recompute drops the value; the untouched groups keep their fold
    SnapshotLog.deleteWhere(spark, src, "v", 5L, 5L)
    SnapshotLog.refreshMv(spark, mv)
    assert(mvDistinctRows(mv) == recomputeDistinct(src))
    assert(mvDistinctRows(mv).contains((1L, 2L, 2L)))
    // delete k=4 entirely: the group vanishes from the MV
    SnapshotLog.mergeCoW(
      spark, src, "k", Seq(4L).toDF("k"),
      df => df.filter(col("k") =!= 4L))
    SnapshotLog.refreshMv(spark, mv)
    assert(mvDistinctRows(mv) == recomputeDistinct(src))
    assert(!mvDistinctRows(mv).exists(_._1 == 4L))
    // guard rails: multi-measure and non-integral measures refuse
    val e1 = intercept[IllegalArgumentException](
      SnapshotLog.createMv(spark, src, fresh("m2"), "k", "v,k",
        kind = "distinct"))
    assert(e1.getMessage.contains("ONE measure"))
    val src2 = fresh("src2")
    SnapshotLog.commit(
      spark, src2, Seq((1L, "a")).toDF("k", "s"))
    val e2 = intercept[IllegalArgumentException](
      SnapshotLog.createMv(spark, src2, fresh("m3"), "k", "s",
        kind = "distinct"))
    assert(e2.getMessage.contains("integral"))
  }

  /** Join MVs (round 15): a per-dim-attribute rollup of
    * `fact ⋈ dim ON fk = pk`, maintained from the FACT change feed
    * enriched against the dim at its PINNED version. The truth the
    * fold must land on, after any mix of fact appends and CoW
    * deletes, is the full recompute of the join at (fact tip,
    * dim@pinned). */
  private def recomputeJoin(
      fact: String, dim: String, dimV: Int): Set[(String, Long, Long)] =
    SnapshotLog.read(spark, fact)
      .join(SnapshotLog.read(spark, dim, Some(dimV)),
        col("fk") === col("pk"), "inner")
      .groupBy(col("attr"))
      .agg(sum(col("v")).as("mv_sum"), count(lit(1)).as("mv_n"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet

  test("join MV: the fact change feed folds ENRICHED against the pinned " +
    "dim version — appends, an invertible delete, an unmatched fk, and a " +
    "post-create dim commit that must change nothing") {
    import spark.implicits._
    val fact = fresh("fact")
    val dim = fresh("dim")
    val mv = fresh("jmv")
    SnapshotLog.commit(
      spark, dim, Seq(1L -> "a", 2L -> "b", 3L -> "a").toDF("pk", "attr"))
    val dimV = SnapshotLog.versions(spark, dim).last
    // fk=99 has no dim row: inner-join semantics exclude it everywhere
    SnapshotLog.commit(
      spark, fact,
      Seq(1L -> 10L, 2L -> 20L, 3L -> 5L, 99L -> 7L).toDF("fk", "v"))
    val asOf = SnapshotLog.createJoinMv(
      spark, fact, dim, "fk", "pk", mv, "attr", "v")
    assert(asOf == SnapshotLog.versions(spark, fact).last)
    def mvState(): Set[(String, Long, Long)] =
      SnapshotLog.read(spark, mv).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(mvState() == Set(("a", 15L, 2L), ("b", 20L, 1L)))
    // appends fold (one matched per group, one still-unmatched)
    SnapshotLog.commit(
      spark, fact, Seq(1L -> 1L, 99L -> 9L, 2L -> 2L).toDF("fk", "v"))
    SnapshotLog.refreshMv(spark, mv)
    assert(mvState() == recomputeJoin(fact, dim, dimV))
    assert(mvState() == Set(("a", 16L, 3L), ("b", 22L, 2L)))
    // a dim commit AFTER the create must not disturb the fold: the MV
    // is defined against dim@pinned, so a fact row matching only the
    // NEW dim row stays excluded — exactly the recompute at dimV
    SnapshotLog.commit(spark, dim, Seq(99L -> "c").toDF("pk", "attr"))
    SnapshotLog.commit(spark, fact, Seq(99L -> 3L).toDF("fk", "v"))
    SnapshotLog.refreshMv(spark, mv)
    assert(mvState() == recomputeJoin(fact, dim, dimV))
    assert(!mvState().exists(_._1 == "c"))
    // a CoW delete inverts through the sum fold (enriched delete rows)
    SnapshotLog.deleteWhere(spark, fact, "v", 20L, 20L)
    SnapshotLog.refreshMv(spark, mv)
    assert(mvState() == recomputeJoin(fact, dim, dimV))
    assert(mvState().contains(("b", 2L, 1L)))
    // a minmax join MV recomputes delete-touched groups through the
    // enriched at-watermark read (scoped through the dim's pks). This
    // one pins the dim at ITS create time — the newer version where
    // pk=99 resolves to 'c' — so the same fact serves a third group:
    // two MVs over one fact, each exact against its own dim pin.
    val mv2 = fresh("jmv2")
    SnapshotLog.createJoinMv(
      spark, fact, dim, "fk", "pk", mv2, "attr", "v", kind = "minmax")
    SnapshotLog.deleteWhere(spark, fact, "v", 1L, 1L) // group a's minimum
    SnapshotLog.refreshMv(spark, mv2)
    val m2 = SnapshotLog.read(spark, mv2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(m2 == Set(
      ("a", 5L, 10L, 2L), ("b", 2L, 2L, 1L), ("c", 3L, 9L, 3L)))
    // guard rails: a duplicate pk refuses loudly (it would multiply
    // fact rows); grouping by the join key refuses; a dim key name
    // colliding with a fact column refuses
    val dupDim = fresh("dupdim")
    SnapshotLog.commit(
      spark, dupDim, Seq(1L -> "x", 1L -> "y").toDF("pk", "attr"))
    val e1 = intercept[IllegalArgumentException](SnapshotLog.createJoinMv(
      spark, fact, dupDim, "fk", "pk", fresh("m"), "attr", "v"))
    assert(e1.getMessage.contains("not unique"))
    val e2 = intercept[IllegalArgumentException](SnapshotLog.createJoinMv(
      spark, fact, dim, "fk", "pk", fresh("m"), "pk", "v"))
    assert(e2.getMessage.contains("plain MV"))
    val clashDim = fresh("clashdim")
    SnapshotLog.commit(
      spark, clashDim, Seq(1L -> "z").toDF("pk", "v"))
    val e3 = intercept[IllegalArgumentException](SnapshotLog.createJoinMv(
      spark, fact, clashDim, "fk", "pk", fresh("m"), "v", "v"))
    assert(e3.getMessage.contains("overlap") ||
      e3.getMessage.contains("collides"))
  }
}
