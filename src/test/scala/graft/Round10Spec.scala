package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

/** Round-10 pins: byte-range splits in the graft-tbl DSv2 connector and
  * Tables loader hardening.
  *
  * The split contract under test (sources/GraftTbl.scala): a file larger
  * than `split_bytes` becomes multiple InputPartitions; each line is
  * owned by exactly ONE split wherever the byte boundaries fall —
  * including boundaries landing exactly on a newline, exactly on a line
  * start, and inside a multi-byte UTF-8 sequence.
  */
class Round10Spec extends SparkTestBase {

  private def writeLines(dir: String, name: String, lines: Seq[String]): String = {
    Files.createDirectories(Paths.get(dir))
    val p = Paths.get(dir, name)
    Files.write(p, (lines.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8))
    p.toString
  }

  private def readTbl(path: String, splitBytes: Option[Long]) = {
    val r = spark.read
      .format("graft.sources.GraftTblSource")
      .schema("id LONG, payload STRING, score DOUBLE")
    splitBytes
      .fold(r)(b => r.option("split_bytes", b.toString))
      .load(path)
  }

  // Deterministic variable-length lines, some with multi-byte UTF-8 so
  // byte offsets and char offsets diverge; id is the identity check.
  private def mkLines(n: Int): Seq[String] =
    (0 until n).map { i =>
      val pad = "x" * (i % 37)
      val uni = if (i % 5 == 0) "é☃" * (i % 3 + 1) else ""
      s"$i|p$pad$uni|${i * 0.5}"
    }

  test("graft-tbl byte-range splits: every line owned by exactly one split") {
    val dir = s"/tmp/graft_r10_split_${System.nanoTime}"
    val lines = mkLines(500)
    writeLines(dir, "big.gtbl", lines)

    val whole = readTbl(dir, None) // default split >> file size: 1 partition
    assert(whole.rdd.getNumPartitions == 1, whole.rdd.getNumPartitions)
    val expected = whole.orderBy("id").collect().map(_.toSeq).toSeq
    assert(expected.length == lines.length)

    // a spread of split sizes so boundaries land mid-line, on newlines,
    // and inside multi-byte characters
    for (split <- Seq(64L, 127L, 256L, 1000L)) {
      val df = readTbl(dir, Some(split))
      val parts = df.rdd.getNumPartitions
      val fileLen = Files.size(Paths.get(dir, "big.gtbl"))
      assert(
        parts == ((fileLen + split - 1) / split).toInt,
        s"split=$split: $parts partitions for $fileLen bytes"
      )
      assert(parts > 1, s"split=$split produced a single partition")
      val got = df.orderBy("id").collect().map(_.toSeq).toSeq
      assert(got == expected, s"split=$split row mismatch")
    }
  }

  test("graft-tbl split boundary exactly on a line start loses/duplicates nothing") {
    val dir = s"/tmp/graft_r10_exact_${System.nanoTime}"
    // 20-byte lines (19 chars + '\n') so split=60 lands every boundary
    // exactly at a line start — the complete-line-at-boundary case the
    // skip convention must hand to the PRECEDING reader.
    val lines = (0 until 30).map(i => f"$i%04d|${"a" * 9}|$i%02d.0")
    assert(lines.forall(_.getBytes(StandardCharsets.UTF_8).length == 19))
    writeLines(dir, "fixed.gtbl", lines)
    val expected = readTbl(dir, None).orderBy("id").collect().map(_.toSeq).toSeq
    val df = readTbl(dir, Some(60L))
    assert(df.rdd.getNumPartitions == 10, df.rdd.getNumPartitions)
    assert(df.orderBy("id").collect().map(_.toSeq).toSeq == expected)
  }

  test("graft-tbl split ownership is exactly-once for EVERY split size (exhaustive)") {
    // drive the PartitionReader directly — no Spark jobs — so the whole
    // boundary space is affordable: every split size from 1 byte to
    // beyond the file length, every boundary placement, proven to
    // deliver each line exactly once
    import org.apache.spark.sql.types.StructType
    val dir = s"/tmp/graft_r10_exh_${System.nanoTime}"
    val lines = mkLines(60)
    val file = writeLines(dir, "exh.gtbl", lines)
    val fileLen = Files.size(Paths.get(file))
    val schema = StructType.fromDDL("id LONG, payload STRING, score DOUBLE")
    val expectedIds = (0L until 60L).toSeq
    for (split <- 1L to (fileLen + 7) by 3) {
      val got = scala.collection.mutable.ArrayBuffer.empty[Long]
      var start = 0L
      while (start < fileLen) {
        val len = math.min(split, fileLen - start)
        val r = new graft.sources.GraftTblReader(
          file, start, len, schema, schema, Array.empty,
          new org.apache.hadoop.conf.Configuration()
        )
        try while (r.next()) got += r.get().getLong(0)
        finally r.close()
        start += split
      }
      assert(
        got.sorted == expectedIds,
        s"split=$split: ${got.size} rows, dupes=${got.diff(got.distinct).distinct.take(5)}, " +
          s"missing=${expectedIds.diff(got).take(5)}"
      )
    }
  }

  test("graft-tbl factories carry the SESSION hadoop conf to executor code") {
    // round 11: executor-side readers/writers used to build a bare
    // `new Configuration()` — on a real cluster that silently drops any
    // session-level filesystem conf (object-store credentials, custom
    // schemes). The factories now capture the session conf at driver
    // time; java serialization below IS the executor shipping path.
    import org.apache.spark.sql.types.StructType
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    def roundTrip[T <: AnyRef](x: T): T = {
      val bos = new java.io.ByteArrayOutputStream()
      val oos = new java.io.ObjectOutputStream(bos)
      oos.writeObject(x); oos.close()
      new java.io.ObjectInputStream(
        new java.io.ByteArrayInputStream(bos.toByteArray)
      ).readObject().asInstanceOf[T]
    }
    // the path cluster credentials take: core hadoopConfiguration, which
    // newHadoopConf() clones per session (runtime spark.conf.set keys
    // keep their full "spark.hadoop."-prefixed names there — only
    // startup SparkConf entries are stripped)
    spark.sparkContext.hadoopConfiguration.set("graft.test.marker", "ring-the-bell")
    try {
      val schema = StructType.fromDDL("id LONG")
      // reader factory, built through the real table/scan stack
      val scan = graft.sources
        .GraftTblTable(schema, "/tmp/graft_r11_conf")
        .newScanBuilder(new CaseInsensitiveStringMap(java.util.Map.of()))
        .build()
      val rf = scan.toBatch
        .createReaderFactory()
        .asInstanceOf[graft.sources.GraftTblReaderFactory]
      assert(
        roundTrip(rf).conf.value.get("graft.test.marker") == "ring-the-bell",
        "session hadoop conf must survive into deserialized reader factories"
      )
      // writer factory: same capture (createBatchWriterFactory calls the
      // same newHadoopConf), same serialization contract
      val wf = graft.sources.GraftTblWriterFactory(
        schema,
        "/tmp/graft_r11_conf",
        new graft.sources.SerializableHadoopConf(
          spark.sessionState.newHadoopConf()
        )
      )
      assert(roundTrip(wf).conf.value.get("graft.test.marker") == "ring-the-bell")
    } finally spark.sparkContext.hadoopConfiguration.unset("graft.test.marker")
  }

  test("graft-tbl splits compose with pushdown and pruning (source_dsv2 parity)") {
    // the graded key's own dataflow, forced through many tiny splits:
    // pushed predicates and pruned columns must see identical rows
    val base = operators.Scans.sourceDsv2(spark, sf0001).collect().map(_.toSeq).toSeq
    val path = s"${sys.props("java.io.tmpdir")}/graft_io/orders_graft_tbl"
    val scan = spark.read
      .format("graft.sources.GraftTblSource")
      .schema(
        "o_orderkey LONG, o_custkey LONG, o_orderstatus STRING," +
          " o_totalprice DOUBLE, o_orderpriority STRING"
      )
      .option("split_bytes", "2048")
      .load(path)
      .filter(col("o_orderstatus") === "O" && col("o_totalprice") > 150000.0)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    // partition count BEFORE the orderBy exchange: one per byte range
    assert(scan.rdd.getNumPartitions > 8, scan.rdd.getNumPartitions)
    assert(scan.orderBy("o_orderkey").collect().map(_.toSeq).toSeq == base)
  }
}
