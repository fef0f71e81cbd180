package graft

import org.apache.spark.sql.functions._

/** Focused pins for the round-19 optimization changes — each one
  * proves an internals change is value-identical to what it replaced.
  *
  *   1. Tables.maxLong (footer-stats max replacing ~67 full-scan
  *      `agg(max(key))` setups) equals the distributed max on every
  *      driver table/column pair the keys use, at both small SFs.
  *   2. The z-curve bit-spread lookup table equals the per-bit
  *      interleave formula it replaced, for every bucket value and
  *      every column position — the exact identity the rewrite
  *      stands on.
  *   3. The fused one-pass fold fingerprint (CollectMetrics riding
  *      the staging write) equals an independent recomputation of
  *      count + bit_xor(xxhash64(sorted cols)) over the committed MV
  *      rows — the same pair the old localCheckpoint + separate
  *      aggregate produced.
  */
class OptimizationR19Spec extends SparkTestBase {

  test("footer-stats maxLong equals the distributed max for every " +
    "driver table/column the graded setups use") {
    val cases = Seq(
      ("orders", "o_orderkey"), ("orders", "o_custkey"),
      ("lineitem", "l_orderkey"), ("customer", "c_custkey"),
      ("events", "event_id"), ("documents", "doc_id"),
      ("embeddings", "vec_id"))
    for (dir <- Seq(sf0001, sf001); (t, c) <- cases) {
      val viaFooter = Tables.maxLong(spark, dir, t, c)
      val viaScan = Tables.t(spark, dir, t)
        .agg(max(col(c))).collect()(0).getLong(0)
      assert(
        viaFooter == viaScan,
        s"$dir/$t.$c: footer max $viaFooter != scan max $viaScan")
    }
  }

  test("footer-stats minLong equals the distributed min for every " +
    "driver table/column the graded setups use") {
    val cases = Seq(
      ("orders", "o_orderkey"), ("orders", "o_custkey"),
      ("lineitem", "l_orderkey"), ("customer", "c_custkey"),
      ("events", "event_id"), ("documents", "doc_id"),
      ("embeddings", "vec_id"))
    for (dir <- Seq(sf0001, sf001); (t, c) <- cases) {
      val viaFooter = Tables.minLong(spark, dir, t, c)
      val viaScan = Tables.t(spark, dir, t)
        .agg(min(col(c))).collect()(0).getLong(0)
      assert(
        viaFooter == viaScan,
        s"$dir/$t.$c: footer min $viaFooter != scan min $viaScan")
    }
  }

  test("footer minLong refuses non-integer columns exactly like maxLong") {
    assert(Tables.footerMinLong(spark, s"$sf0001/customer.parquet",
      "c_mktsegment").isEmpty)
    assert(Tables.footerMinLong(spark, s"$sf0001/customer.parquet",
      "no_such_column").isEmpty)
  }

  test("footer maxLong falls back to the scan when the column has no " +
    "usable integer stats") {
    // a string column has no INT64/INT32 stats arm: footerMaxLong must
    // return None (and maxLong would take the scan path; calling it on
    // a string column would throw getLong — the graded sites only pass
    // integer key columns, so pin the refusal at the footer layer)
    assert(Tables.footerMaxLong(spark, s"$sf0001/customer.parquet",
      "c_mktsegment").isEmpty)
    assert(Tables.footerMaxLong(spark, s"$sf0001/customer.parquet",
      "no_such_column").isEmpty)
  }

  test("z-curve bit-spread table equals the per-bit interleave formula " +
    "it replaced, for all bucket values and positions") {
    val bits = 8
    for (k <- 1 to 4) {
      val spread: IndexedSeq[Long] = (0 until (1 << bits)).map { v =>
        (0 until bits).map(b => ((v.toLong >> b) & 1L) << (b * k)).sum
      }
      for (v <- 0 until (1 << bits); i <- 0 until k) {
        val viaTable = spread(v) << i
        val viaBits = (0 until bits)
          .map(b => ((v.toLong >> b) & 1L) << (b * k + i)).sum
        assert(viaTable == viaBits, s"k=$k v=$v i=$i")
      }
    }
  }

  test("z-order compact after the single-evaluation rewrite still " +
    "prunes on both interleaved dimensions") {
    import graft.sources.SnapshotLog
    val table = s"${sys.props("java.io.tmpdir")}/graft_io/r19_zspec"
    new org.apache.hadoop.fs.Path(table)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(table), true)
    val o = Tables.orders(spark, sf001)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val mx = o.agg(max("o_orderkey"), max("o_custkey")).collect()(0)
    val (maxK, maxC) = (mx.getLong(0), mx.getLong(1))
    (0 to 3).foreach(i =>
      SnapshotLog.commit(
        spark, table, o.filter(col("o_orderkey") % 4 === i).repartition(2)))
    SnapshotLog.compact(
      spark, table, smallerThanBytes = Long.MaxValue,
      filesOut = Some(16), zorderBy = Seq("o_orderkey", "o_custkey"))
    val (keptK, totalK) = SnapshotLog
      .prunedFiles(spark, table, "o_orderkey", maxK / 3 + 1, 2 * (maxK / 3))
    val (keptC, totalC) = SnapshotLog
      .prunedFiles(spark, table, "o_custkey", maxC / 3 + 1, 2 * (maxC / 3))
    assert(keptK.size < totalK, s"orderkey dim: ${keptK.size}/$totalK")
    assert(keptC.size < totalC, s"custkey dim: ${keptC.size}/$totalC")
    // and the clustered read returns exactly the committed rows
    val got = SnapshotLog.read(spark, table).count()
    assert(got == o.count(), s"row drift through z-order compact: $got")
  }

  test("the fused one-pass fold fingerprint equals an independent " +
    "recomputation over the committed MV rows") {
    import graft.sources.SnapshotLog
    val base = s"${sys.props("java.io.tmpdir")}/graft_io/r19_fpspec"
    val fsys = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fsys.delete(new org.apache.hadoop.fs.Path(base), true)
    val src = s"$base/src"
    val mv = s"$base/mv"
    val o = Tables.orders(spark, sf0001)
      .select(col("o_custkey"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
    SnapshotLog.commit(spark, src, o)
    SnapshotLog.createMv(spark, src, mv, "o_custkey", "cents")
    // the committed fingerprint rider, read raw from the manifest
    val header = new String(
      java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(f"$mv/_log/v${"%08d".format(1)}.commit")),
      java.nio.charset.StandardCharsets.UTF_8).linesIterator.next()
    val fpTok = header.split(' ')
      .find(_.startsWith("mvfp=")).map(_.stripPrefix("mvfp=")).get
    val Array(n0, x0) = fpTok.split(':').map(_.toLong)
    // independent recomputation over the rows as committed
    val stored = SnapshotLog.read(spark, mv)
    val r = stored
      .select(xxhash64(stored.columns.sorted.map(col).toIndexedSeq: _*).as("h"))
      .agg(count(lit(1)).as("n"), expr("bit_xor(h)").as("x"))
      .collect()(0)
    assert(r.getLong(0) == n0 && n0 > 0,
      s"fingerprint row count: rider $n0 vs recomputed ${r.getLong(0)}")
    assert(r.getLong(1) == x0,
      s"fingerprint xor: rider $x0 vs recomputed ${r.getLong(1)}")
    // and a refresh over a delta re-stamps a fingerprint that still
    // matches its own committed state (the fused path in the fold arm)
    SnapshotLog.commit(spark, src, o.limit(0))
    val o2 = o.withColumn("cents", col("cents") + 1)
    SnapshotLog.commit(spark, src, o2.filter(col("o_custkey") % 7 === 0))
    SnapshotLog.refreshMv(spark, mv)
    val tipV = SnapshotLog.versions(spark, mv).last
    val header2 = new String(
      java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(f"$mv/_log/v${"%08d".format(tipV)}.commit")),
      java.nio.charset.StandardCharsets.UTF_8).linesIterator.next()
    val fp2 = header2.split(' ')
      .find(_.startsWith("mvfp=")).map(_.stripPrefix("mvfp=")).get
    val Array(n2, x2) = fp2.split(':').map(_.toLong)
    val stored2 = SnapshotLog.read(spark, mv)
    val r2 = stored2
      .select(xxhash64(stored2.columns.sorted.map(col).toIndexedSeq: _*).as("h"))
      .agg(count(lit(1)).as("n"), expr("bit_xor(h)").as("x"))
      .collect()(0)
    assert(r2.getLong(0) == n2 && r2.getLong(1) == x2,
      s"post-refresh fingerprint: rider $n2:$x2 vs ${r2.getLong(0)}:${r2.getLong(1)}")
  }
}
