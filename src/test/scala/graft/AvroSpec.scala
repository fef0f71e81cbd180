package graft

import org.apache.spark.sql.functions._

/** Round-11 Avro connector (sources/GraftAvro): container round trip
  * over every supported type, schema inference from the self-describing
  * header, sync-marker split ownership, and the two-phase-commit
  * truncate — all on the avro CORE jars (no spark-avro in this
  * environment; its absence was the standing #1 residual gap). */
class AvroSpec extends SparkTestBase {

  private val fmt = "graft.sources.GraftAvroSource"

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft_avro").toString + "/t"

  test("round trip preserves every supported type, nulls included; schema is inferred from the container") {
    val df = spark
      .range(0, 100, 1, 3)
      .select(
        col("id"),
        (col("id") % 3).cast("int").as("i"),
        (col("id") * 1.5).as("d"),
        (col("id") / 2).cast("float").as("f"),
        (col("id") % 2 === 0).as("b"),
        concat(lit("s"), col("id")).as("s"),
        when(col("id") % 5 === 0, lit(null).cast("string"))
          .otherwise(concat(lit("n"), col("id"))).as("maybe"),
        encode(concat(lit("x"), col("id")), "UTF-8").as("bin"),
        to_timestamp(
          concat(lit("2024-03-01 10:30:"), lpad(col("id") % 60, 2, "0"))
        ).as("ts"),
        to_date(lit("2024-03-05")).as("dt")
      )
    val dir = tmpDir()
    df.write.format(fmt).mode("append").save(dir)
    // no .schema(...): the container header IS the schema
    val back = spark.read.format(fmt).load(dir)
    assert(
      back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
        df.schema.fields.map(f => (f.name, f.dataType)).toSeq,
      s"inferred ${back.schema.simpleString} vs written ${df.schema.simpleString}"
    )
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getInt(1), r.getDouble(2), r.getFloat(3), r.getBoolean(4),
        r.getString(5), Option(r.getString(6)),
        new String(r.getAs[Array[Byte]](7), "UTF-8"),
        r.getTimestamp(8).getTime, r.getDate(9).toString)
    assert(back.collect().map(key).toSet == df.collect().map(key).toSet)
    // null round trip specifically: every 5th 'maybe' is null
    assert(back.filter(col("maybe").isNull).count() == 20)
  }

  test("sync-marker splits: exactly-once row ownership at any boundary") {
    import spark.implicits._
    val dir = tmpDir()
    // ONE container with many blocks (payload forces multiple sync
    // points even under deflate)
    (0L until 20000L)
      .map(i => (i, "payload-" + ("x" * 40) + i))
      .toDF("id", "s")
      .coalesce(1)
      .write.format(fmt).mode("append").save(dir)
    val fileLen = new java.io.File(
      new java.io.File(dir).listFiles().filter(_.getName.endsWith(".avro")).head.getPath
    ).length
    val expected = (0L until 20000L).toSet
    for (split <- Seq(1000L, 7777L, fileLen / 3, fileLen, fileLen * 2)) {
      val ids = spark.read.format(fmt)
        .option("split_bytes", split.toString)
        .load(dir)
        .select("id").collect().map(_.getLong(0))
      assert(ids.length == 20000, s"split=$split delivered ${ids.length} rows")
      assert(ids.toSet == expected, s"split=$split lost/duplicated rows")
    }
  }

  test("truncate overwrite drops the whole stale generation") {
    import spark.implicits._
    val dir = tmpDir()
    (1L to 9000L).toDF("id").repartition(4).write.format(fmt).mode("append").save(dir)
    (100000L to 100999L).toDF("id").repartition(2)
      .write.format(fmt).mode("overwrite").save(dir)
    val ids = spark.read.format(fmt).load(dir)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(ids == (100000L to 100999L).toSet,
      "stale generation must not survive the truncate")
  }

  test("column pruning reaches the avro scan") {
    import spark.implicits._
    val dir = tmpDir()
    (1L to 50L).map(i => (i, s"s$i", i * 2.0)).toDF("id", "s", "d")
      .write.format(fmt).mode("append").save(dir)
    val pruned = spark.read.format(fmt).load(dir).select("id")
    val scans = pruned.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.nonEmpty)
    assert(scans.head.output.map(_.name) == Seq("id"),
      s"scan must read only the projected column: ${scans.head.output}")
    assert(pruned.collect().map(_.getLong(0)).toSet == (1L to 50L).toSet)
  }

  test("filter pushdown: dropped rows never leave the scan, residual predicates stay with Spark") {
    import spark.implicits._
    val dir = tmpDir()
    (1L to 1000L).map(i => (i, s"s$i", i * 0.5)).toDF("id", "s", "d")
      .write.format(fmt).mode("append").save(dir)
    val q = spark.read.format(fmt).load(dir)
      .filter(col("id") > 900L && col("d") <= 475.0)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("pushed=[") && plan.contains("GreaterThan(id"),
      s"comparisons must reach the scan: $plan")
    assert(q.collect().map(_.getLong(0)).toSet == (901L to 950L).toSet)
    // a predicate outside the dialect (endsWith) stays with Spark as a
    // residual Filter — correctness never depends on connector ambition
    val q2 = spark.read.format(fmt).load(dir)
      .filter(col("id") > 990L && col("s").endsWith("5"))
    assert(q2.collect().map(_.getLong(0)).toSet == Set(995L))
  }

  test("schema evolution across containers: headers merge, int widens to long, added column null-fills") {
    import spark.implicits._
    val dir = tmpDir()
    (1 to 50).map(i => (i, s"a$i")).toDF("id", "s")
      .write.format(fmt).mode("append").save(dir) // generation 1: id INT
    (51L to 80L).map(i => (i, s"b$i", i * 0.5)).toDF("id", "s", "d")
      .write.format(fmt).mode("append").save(dir) // generation 2: id LONG + d
    val back = spark.read.format(fmt).load(dir)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      Seq(("id", org.apache.spark.sql.types.LongType),
        ("s", org.apache.spark.sql.types.StringType),
        ("d", org.apache.spark.sql.types.DoubleType)),
      back.schema.simpleString)
    val rows = back.collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.get(2)))).toSet
    val expected =
      (1 to 50).map(i => (i.toLong, s"a$i", None: Option[Any])).toSet ++
        (51L to 80L).map(i => (i, s"b$i", Some(i * 0.5): Option[Any]))
    assert(rows == expected)
    // incompatible change (same field, irreconcilable type) is loud
    val dir2 = tmpDir()
    Seq((1L, "x")).toDF("id", "s").write.format(fmt).mode("append").save(dir2)
    Seq((true, "y")).toDF("id", "s").write.format(fmt).mode("append").save(dir2)
    val err = intercept[Exception] { spark.read.format(fmt).load(dir2) }
    def mentions(t: Throwable): Boolean =
      t != null && (Option(t.getMessage).exists(_.contains("incompatible")) ||
        mentions(t.getCause))
    assert(mentions(err), s"conflict must be loud: ${err.getMessage}")
  }

  test("unsupported schema fails at write planning, not mid-task") {
    import spark.implicits._
    val dir = tmpDir()
    val err = intercept[Exception] {
      Seq((1L, Seq(1, 2))).toDF("id", "arr").write.format(fmt).mode("append").save(dir)
    }
    def mentions(t: Throwable): Boolean =
      t != null && (Option(t.getMessage).exists(_.contains("graft-avro")) ||
        mentions(t.getCause))
    assert(mentions(err), s"planning failure must name the connector: ${err.getMessage}")
  }
}
