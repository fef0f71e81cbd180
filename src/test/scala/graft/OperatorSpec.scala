package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Per-operator unit checks on hand-computable inputs plus edge cases
  * (empty input, all-null keys, ties) — SURVEY.md §5.2. */
class OperatorSpec extends SparkTestBase {

  import spark.implicits._

  test("cosine_sim matches a hand computation and handles zero vectors") {
    GraftFunctions.register(spark)
    val df = Seq(
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f), Some(1.0)),
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f), Some(0.0)),
      (Array(1.0f, 0.0f), Array(-1.0f, 0.0f), Some(-1.0)),
      (Array(1.0f, 2.0f), Array(0.0f, 0.0f), None) // zero norm -> null
    ).toDF("a", "b", "expected")
    val got = df.select(expr("cosine_sim(a, b)").as("c"), col("expected")).collect()
    got.foreach { r =>
      val c = if (r.isNullAt(0)) None else Some(r.getDouble(0))
      val e = if (r.isNullAt(1)) None else Some(r.getDouble(1))
      (c, e) match {
        case (Some(x), Some(y)) => assert(math.abs(x - y) < 1e-12, s"$x != $y")
        case (a, b)             => assert(a == b, s"$a != $b")
      }
    }
  }

  test("cosine_sim agrees between codegen and interpreted paths") {
    GraftFunctions.register(spark)
    val emb = Tables.embeddings(spark, sf0001).limit(50)
    val pairs = emb.toDF("v1", "e1", "l1").crossJoin(emb.toDF("v2", "e2", "l2"))
    val withCodegen = pairs.select(expr("cosine_sim(e1, e2)").as("c")).collect()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interpreted = pairs.select(expr("cosine_sim(e1, e2)").as("c")).collect()
      withCodegen.zip(interpreted).foreach { case (a, b) =>
        assert(a.getDouble(0) == b.getDouble(0), "codegen/interpreted mismatch")
      }
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    }
  }

  test("approx_count_distinct is within rsd bounds of the exact count") {
    val df = operators.Aggregates.aggApproxDistinct(spark, sf001)
    val exact = Tables
      .lineitem(spark, sf001)
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("n"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    df.collect().foreach { r =>
      val flag = r.getAs[String]("l_returnflag")
      val approx = r.getAs[Long]("approx_part")
      val e = exact(flag)
      assert(
        math.abs(approx - e).toDouble / e < 0.1,
        s"approx $approx too far from exact $e for $flag"
      )
    }
  }

  test("weighted-mean UDAF: empty group absent, single row, hand-checked") {
    val wmean = udaf(functions.Udfs.WeightedMean)
    val df = Seq((1, 10.0, 2.0), (1, 20.0, 6.0), (2, 5.0, 1.0))
      .toDF("k", "x", "w")
      .groupBy("k")
      .agg(wmean(col("x"), col("w")).as("wm"))
    val got = df.collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(math.abs(got(1) - (10 * 2 + 20 * 6) / 8.0) < 1e-12)
    assert(got(2) == 5.0)
  }

  test("as-of join: latest at-or-before wins, equal-ts inclusive, key tiebreak") {
    // drive the real operator through crafted parquet fixtures
    val dir = java.nio.file.Files.createTempDirectory("graft-asof").toString
    // ts as a REAL timestamp column (current generation encoding; the
    // round-10 footer-dispatch loader refuses a bare long — TablesSpec
    // covers the per-encoding paths)
    Seq(
      (1L, "2024-01-05 00:00:00", 10L, "click", 1.0, "{}"),
      (2L, "2024-01-03 00:00:00", 10L, "click", 1.0, "{}"), // == order ts
      (3L, "2023-12-01 00:00:00", 10L, "click", 1.0, "{}"), // before all
      (4L, "2024-01-05 00:00:00", 99L, "click", 1.0, "{}")  // no orders
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", to_timestamp(col("ts")))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    Seq(
      (100L, 10L, "2024-01-01 00:00:00", 50.0),
      (101L, 10L, "2024-01-03 00:00:00", 60.0), // latest at-or-before, max key
      (99L, 10L, "2024-01-03 00:00:00", 70.0),  // same ts, lower key loses
      (102L, 10L, "2024-01-06 00:00:00", 80.0)  // after events: excluded
    ).toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      .withColumn("o_orderdate", to_timestamp(col("o_orderdate")))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = operators.Joins
      .joinAsof(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("o_orderkey"))
      .toMap
    assert(got == Map(1L -> 101L, 2L -> 101L), s"got $got")
  }

  test("window rank on empty input returns empty, not error") {
    val schema = StructType(Seq(StructField("k", StringType), StructField("v", LongType)))
    val empty = spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    import org.apache.spark.sql.expressions.Window
    val out = empty
      .withColumn("rn", row_number().over(Window.partitionBy("k").orderBy("v")))
      .collect()
    assert(out.isEmpty)
  }

  test("session boundary: exactly-gap continues the session, beyond-gap splits") {
    // Spark merges ADJACENT session windows: an event at exactly
    // prev + gap joins the session. The stream_session oracle mirrors
    // this with a strict (>) island break.
    def sessionsOf(times: Seq[String]): Int = {
      val df = times
        .toDF("s")
        .select(lit(7L).as("user_id"), to_timestamp(col("s")).as("ts"))
      df.groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .count()
        .collect()
        .length
    }
    assert(sessionsOf(Seq("2024-01-01 10:00:00", "2024-01-01 10:30:00")) == 1)
    assert(sessionsOf(Seq("2024-01-01 10:00:00", "2024-01-01 10:30:01")) == 2)
  }

  test("poly_hash equals the HOF fingerprint fold beyond ASCII (codegen path)") {
    GraftFunctions.register(spark)
    val rows = Seq(
      "",
      "plain ascii text",
      "accents éàü and symbols ±×",
      "emoji 😀 surrogate pair", // U+1F600: one code point, two chars
      "mixed 中文 and ascii"
    ).toDF("s")
    val out = rows
      .select(
        expr("poly_hash(s)").as("fused"),
        aggregate(
          transform(split(col("s"), ""), c => ascii(c).cast("long")),
          lit(0L),
          (h, c) => (h * 31 + c) % 1000000007L
        ).as("hof")
      )
      .collect()
    out.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
  }

  test("inner_product equals the zip_with/aggregate HOF fold bit-for-bit") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(53)
    val rows = (0 until 50)
      .map(i => (Array.fill(64)(rnd.nextGaussian().toFloat), Array.fill(64)(rnd.nextGaussian().toFloat)))
      .toDF("a", "b")
    val out = rows
      .select(
        expr("inner_product(a, b)").as("fused"),
        expr(
          "aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE))," +
            " 0D, (acc, v) -> acc + v)"
        ).as("hof")
      )
      .collect()
    // same sequential accumulation order => exact equality, not approx
    out.foreach(r => assert(r.getDouble(0) == r.getDouble(1), r.toString))
  }

  test("l2_sq equals the zip_with/aggregate HOF fold bit-for-bit") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(61)
    val rows = (0 until 50)
      .map(_ => (Array.fill(64)(rnd.nextGaussian().toFloat), Array.fill(64)(rnd.nextGaussian().toFloat)))
      .toDF("a", "b")
    val out = rows
      .select(
        expr("l2_sq(a, b)").as("fused"),
        expr(
          "aggregate(zip_with(a, b, (x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))" +
            " * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), 0D, (acc, v) -> acc + v)"
        ).as("hof")
      )
      .collect()
    out.foreach(r => assert(r.getDouble(0) == r.getDouble(1), r.toString))
  }

  test("SessionizeExec matches session_window boundary semantics and resets per user") {
    // same merge rule as the built-in: exactly prev + gap CONTINUES;
    // the counter restarts at 1 for each user in clustering order
    val df = Seq(
      (1L, "2024-01-01 10:00:00"),
      (1L, "2024-01-01 10:30:00"), // exactly gap: same session
      (1L, "2024-01-01 11:00:01"), // 1s past gap: new session
      (2L, "2024-01-01 10:00:00")  // new user: counter resets to 1
    ).toDF("user_id", "s")
      .select(col("user_id"), to_timestamp(col("s")).as("ts"))
      .withColumn("event_id", monotonically_increasing_id())
    val out = graft.plans.Sessionize
      .sessionize(df, "user_id", "ts", Seq("event_id"), 1800L * 1000000L)
      .orderBy("user_id", "ts")
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_id")))
      .toSeq
    assert(out == Seq((1L, 1L), (1L, 1L), (1L, 2L), (2L, 1L)), out.toString)
  }
}
