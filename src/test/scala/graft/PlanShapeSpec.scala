package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions.{col, expr}

/** §5.5 plan-shape assertions (SURVEY.md): the scale claims — pushdown,
  * pruning, broadcast, top-k heap, codegen — must be visible in the
  * executed plan, not just hoped for. */
class PlanShapeSpec extends SparkTestBase {

  private def planString(df: DataFrame): String = {
    df.collect() // materialize so AQE finalizes the plan
    def finalPlan(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other                    => other
    }
    finalPlan(df.queryExecution.executedPlan).toString
  }

  test("scan_pruned pushes predicates and prunes columns at the parquet scan") {
    val df = operators.Scans.scanPruned(spark, sf001)
    val explain = df.queryExecution.executedPlan.toString
    assert(explain.contains("PushedFilters: ["), explain)
    assert(explain.contains("IsNotNull(l_extendedprice)") || explain.contains("GreaterThan(l_extendedprice"), explain)
    val scanSchema = explain.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!scanSchema.contains("l_discount"), s"column not pruned: $scanSchema")
  }

  test("source_dsv2 pushes filters and prunes columns into the custom connector") {
    val df = operators.Scans.sourceDsv2(spark, sf001)
    val s = planString(df)
    // the scan's own description carries what reached the reader
    assert(s.contains("GraftTblScan"), s)
    assert(
      s.contains("GreaterThan(o_totalprice") && s.contains("EqualTo(o_orderstatus"),
      s
    )
    // the status column is consumed by the pushed predicate and the
    // query never projects it — pruning must drop it from the read
    val scanLine =
      s.linesIterator.find(_.contains("GraftTblScan")).getOrElse("")
    assert(!scanLine.contains("o_orderstatus") ||
      scanLine.indexOf("o_orderstatus") > scanLine.indexOf("PushedFilters"),
      scanLine)
    assert(scanLine.contains("o_orderkey"), scanLine)
    // fully-consumed predicates leave no residual Filter above the scan
    assert(!s.contains("Filter ("), s)
  }

  test("a DV'd snapshot read filters with the codegen'd dv_alive, no UDF") {
    import graft.sources.SnapshotLog
    val t = java.nio.file.Files.createTempDirectory("graft_dvplan").toString + "/t"
    SnapshotLog.commit(spark, t, spark.range(0, 1000).toDF("id"))
    SnapshotLog.deleteWhereMoR(spark, t, "id", 10, 20)
    val plan = SnapshotLog.read(spark, t).queryExecution.executedPlan.toString
    assert(plan.contains("dv_alive"), s"DV filter must be the native predicate:\n$plan")
    assert(!plan.contains("UDF"), "the round-11 UDF path must be gone")
    // `*(n)` markers = WholeStageCodegen spans; the dv_alive Filter
    // line must carry one (the UDF it replaced broke the span)
    assert(
      plan.linesIterator.exists(l => l.contains("dv_alive") && l.contains("*(")),
      s"the DV filter must live inside a codegen span:\n$plan")
  }

  test("a partitioned-table INSERT clusters by the partition column") {
    // the identity distribution must surface as an Exchange
    // hashpartitioning on the partition column — that clustering is
    // what makes every landed file value-pure
    val wtmp = java.nio.file.Files.createTempDirectory("graft_partplan").toString
    spark.conf.set("spark.sql.catalog.partplan",
      classOf[graft.sources.SnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.partplan.warehouse", wtmp)
    spark.sql("CREATE TABLE partplan.main.pp (id BIGINT, p BIGINT) PARTITIONED BY (p)")
    spark.range(0, 100).selectExpr("id", "id % 5 AS p")
      .createOrReplaceTempView("pp_src")
    spark.sql("INSERT INTO partplan.main.pp SELECT * FROM pp_src")
    val (kept, total) = graft.sources.SnapshotLog
      .prunedFiles(spark, s"$wtmp/main/pp", "p", 2, 2)
    assert(total >= 5 && kept.size < total,
      s"value-pure files must prune: ${kept.size}/$total")
  }

  test("join_broadcast plans a BroadcastHashJoin") {
    val s = planString(operators.Joins.joinBroadcast(spark, sf001))
    assert(s.contains("BroadcastHashJoin"), s)
  }

  test("topk_global plans TakeOrderedAndProject (no full sort)") {
    val s = planString(operators.SetOps.topkGlobal(spark, sf001))
    assert(s.contains("TakeOrderedAndProject"), s)
  }

  test("sim_topk_nn plans TakeOrderedAndProject over the fused cosine") {
    val s = planString(sim.Similarity.simTopkNn(spark, sf0001))
    assert(s.contains("TakeOrderedAndProject"), s)
    assert(s.contains("cosine_sim"), s)
  }

  test("sim_l2_topk plans TakeOrderedAndProject over the fused l2_sq") {
    val s = planString(sim.Similarity.simL2Topk(spark, sf0001))
    assert(s.contains("TakeOrderedAndProject"), s)
    assert(s.contains("l2_sq"), s)
  }

  test("sim_pairs_ann candidate join is key-equi on buckets, not a nested loop") {
    val s = planString(sim.Similarity.simPairsAnn(spark, sf0001))
    assert(
      s.contains("SortMergeJoin") || s.contains("ShuffledHashJoin") ||
        s.contains("BroadcastHashJoin"),
      s
    )
    assert(!s.contains("CartesianProduct"), s)
    assert(!s.contains("BroadcastNestedLoopJoin"), s)
  }

  test("agg_hash is a two-phase hash aggregate inside codegen") {
    val s = planString(operators.Aggregates.aggHash(spark, sf0001))
    assert(s.contains("partial_sum"), s) // map-side combine
    assert(s.contains("HashAggregate"), s)
    // AQE plan strings mark whole-stage-codegen stages as "*(n)"
    assert(s.contains("*(1)"), s)
  }

  test("join_theta_range keeps the user_id equality (no cartesian loop)") {
    val s = planString(operators.Joins.joinThetaRange(spark, sf0001))
    // equality conjunct becomes the hash/merge key; the band predicate
    // rides along as a post-join condition
    assert(
      s.contains("SortMergeJoin") || s.contains("ShuffledHashJoin") ||
        s.contains("BroadcastHashJoin"),
      s
    )
    assert(!s.contains("CartesianProduct") && !s.contains("BroadcastNestedLoopJoin"), s)
  }

  test("join_bucketed joins without shuffling either side") {
    // At sf0.001 Catalyst rightly broadcasts the small side; to prove
    // the bucketed path (the one that matters when neither side fits
    // in memory) disable broadcast and check the SMJ has no shuffle
    // under it.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val s = planString(operators.Joins.joinBucketed(spark, sf0001))
      assert(s.contains("Bucketed: true"), s)
      val joinIdx = s.indexOf("SortMergeJoin")
      assert(joinIdx >= 0, s)
      assert(!s.substring(joinIdx).contains("Exchange hashpartitioning"), s)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("ANN IVF rewrite fires on literal-probe cosine top-k, exact on clustered cells") {
    graft.functions.GraftFunctions.register(spark)
    graft.plans.AnnIvfRewrite.install(spark)
    import spark.implicits._
    // 10 tight clusters of 50: the true top-10 of an in-cluster probe all
    // live in the probe's cell, so the IVF path is exact here.
    val rnd = new scala.util.Random(11)
    val rows = (0 until 10).flatMap { ci =>
      val base = Array.fill(64)(rnd.nextGaussian())
      (0 until 50).map { j =>
        val v = base.map(x => (x + rnd.nextGaussian() * 0.05).toFloat)
        (ci.toLong * 50 + j, v, s"c$ci")
      }
    }
    val df = rows.toDF("vec_id", "embedding", "label")
    val probeSql = rows(123)._2
      .map(f => s"CAST($f AS FLOAT)")
      .mkString("array(", ",", ")")
    // the cell column must survive pruning (rule doc) — keep all columns
    def q = df
      .orderBy(expr(s"cosine_sim(embedding, $probeSql)").desc, col("vec_id"))
      .limit(10)
    val brute = q.collect().map(_.getAs[Long]("vec_id")).toSeq
    val bruteOpt = q.queryExecution.optimizedPlan.toString
    assert(!bruteOpt.contains("Join"), s"rewrite fired while gated off:\n$bruteOpt")
    spark.conf.set(graft.plans.AnnIvfRewrite.ConfKey, "true")
    try {
      val rewritten = q
      val got = rewritten.collect().map(_.getAs[Long]("vec_id")).toSeq
      val opt = rewritten.queryExecution.optimizedPlan.toString
      assert(opt.contains("Join"), s"IVF rewrite did not fire:\n$opt")
      assert(got == brute, s"IVF rewrite changed results: $got vs $brute")
    } finally spark.conf.unset(graft.plans.AnnIvfRewrite.ConfKey)
  }

  test("IVF rewrite fires on literal-probe inner_product (MIPS) top-k, exact on clustered cells") {
    graft.functions.GraftFunctions.register(spark)
    graft.plans.AnnIvfRewrite.install(spark)
    import spark.implicits._
    // clusters separated by magnitude too — MIPS ordering sees it
    val rnd = new scala.util.Random(59)
    val rows = (0 until 10).flatMap { ci =>
      val base = Array.fill(64)(rnd.nextGaussian() * (1.0 + ci))
      (0 until 50).map { j =>
        val v = base.map(x => (x + rnd.nextGaussian() * 0.05).toFloat)
        (ci.toLong * 50 + j, v, s"c$ci")
      }
    }
    val df = rows.toDF("vec_id", "embedding", "label")
    val probeSql = rows(473)._2
      .map(f => s"CAST($f AS FLOAT)")
      .mkString("array(", ",", ")")
    def q = df
      .orderBy(expr(s"inner_product(embedding, $probeSql)").desc, col("vec_id"))
      .limit(10)
    val brute = q.collect().map(_.getAs[Long]("vec_id")).toSeq
    spark.conf.set(graft.plans.AnnIvfRewrite.ConfKey, "true")
    try {
      val got = q.collect().map(_.getAs[Long]("vec_id")).toSeq
      val opt = q.queryExecution.optimizedPlan.toString
      assert(opt.contains("Join"), s"MIPS literal-probe rewrite did not fire:\n$opt")
      assert(got == brute, s"MIPS rewrite changed results: $got vs $brute")
    } finally spark.conf.unset(graft.plans.AnnIvfRewrite.ConfKey)
  }

  test("IVF rewrite fires on literal-probe l2_sq nearest (ASC), exact on clustered cells") {
    graft.functions.GraftFunctions.register(spark)
    graft.plans.AnnIvfRewrite.install(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(83)
    val rows = (0 until 10).flatMap { ci =>
      val base = Array.fill(64)(rnd.nextGaussian())
      (0 until 50).map { j =>
        val v = base.map(x => (x + rnd.nextGaussian() * 0.05).toFloat)
        (ci.toLong * 50 + j, v, s"c$ci")
      }
    }
    val df = rows.toDF("vec_id", "embedding", "label")
    val probeSql = rows(217)._2
      .map(f => s"CAST($f AS FLOAT)")
      .mkString("array(", ",", ")")
    // nearest = ASCENDING squared distance — the l2 arm's direction
    def q = df
      .orderBy(expr(s"l2_sq(embedding, $probeSql)").asc, col("vec_id"))
      .limit(10)
    val brute = q.collect().map(_.getAs[Long]("vec_id")).toSeq
    val bruteOpt = q.queryExecution.optimizedPlan.toString
    assert(!bruteOpt.contains("Join"), s"rewrite fired while gated off:\n$bruteOpt")
    spark.conf.set(graft.plans.AnnIvfRewrite.ConfKey, "true")
    try {
      val got = q.collect().map(_.getAs[Long]("vec_id")).toSeq
      val opt = q.queryExecution.optimizedPlan.toString
      assert(opt.contains("Join"), s"L2 literal-probe rewrite did not fire:\n$opt")
      assert(got == brute, s"L2 rewrite changed results: $got vs $brute")
      // farthest-point query (DESC distance) is NOT ANN — must stay brute
      val far = df
        .orderBy(expr(s"l2_sq(embedding, $probeSql)").desc, col("vec_id"))
        .limit(10)
      val farOpt = far.queryExecution.optimizedPlan.toString
      assert(!farOpt.contains("Join"), s"DESC l2_sq must not rewrite:\n$farOpt")
      // and ASC cosine (least similar) must stay brute symmetrically
      val asc = df
        .orderBy(expr(s"cosine_sim(embedding, $probeSql)").asc, col("vec_id"))
        .limit(10)
      val ascOpt = asc.queryExecution.optimizedPlan.toString
      assert(!ascOpt.contains("Join"), s"ASC cosine_sim must not rewrite:\n$ascOpt")
    } finally spark.conf.unset(graft.plans.AnnIvfRewrite.ConfKey)
  }

  test("per-row ANN join rewrite fires on l2_sq ASC window ordering") {
    graft.functions.GraftFunctions.register(spark)
    graft.plans.AnnIvfRewrite.install(spark)
    import org.apache.spark.sql.catalyst.plans.logical.Join
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{round => _, _}
    import spark.implicits._
    val rnd = new scala.util.Random(97)
    val rows = (0 until 10).flatMap { ci =>
      val base = Array.fill(64)(rnd.nextGaussian())
      (0 until 50).map { j =>
        val v = base.map(x => (x + rnd.nextGaussian() * 0.05).toFloat)
        (ci.toLong * 50 + j, v, s"c$ci")
      }
    }
    val df = rows.toDF("vec_id", "embedding", "label")
    val probes = df
      .filter($"vec_id" % 50 === 0)
      .select($"vec_id".as("pid"), $"embedding".as("pe"))
    def q = probes
      .join(df, $"pid" =!= $"vec_id")
      .withColumn(
        "rn",
        row_number().over(
          Window
            .partitionBy("pid")
            .orderBy(expr("l2_sq(embedding, pe)").asc, $"vec_id")
        )
      )
      .filter($"rn" <= 10)
      .select($"pid", $"vec_id", $"label", $"rn")
      .orderBy("pid", "rn")
    def rowsOf(d: DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getInt(3))).toSeq
    val brute = rowsOf(q)
    assert(q.queryExecution.optimizedPlan.collect { case j: Join => j }.length == 1)
    spark.conf.set(graft.plans.AnnIvfRewrite.ConfKey, "true")
    try {
      val opt = q.queryExecution.optimizedPlan
      assert(opt.toString.contains("__cell"), s"per-row L2 rewrite did not fire:\n$opt")
      assert(opt.collect { case j: Join => j }.length > 1, opt.toString)
      assert(rowsOf(q) == brute, "cell-pruned per-row L2 top-k diverged on clustered data")
    } finally spark.conf.unset(graft.plans.AnnIvfRewrite.ConfKey)
  }

  test("ANN IVF rewrite fires on a scalar-subquery vector-lookup probe") {
    graft.functions.GraftFunctions.register(spark)
    graft.plans.AnnIvfRewrite.install(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val rows = (0 until 8).flatMap { ci =>
      val base = Array.fill(64)(rnd.nextGaussian())
      (0 until 40).map { j =>
        val v = base.map(x => (x + rnd.nextGaussian() * 0.05).toFloat)
        (ci.toLong * 40 + j, v, s"c$ci")
      }
    }
    rows.toDF("vec_id", "embedding", "label").createOrReplaceTempView("pvecs")
    // probe by id — the vector-lookup idiom, not a literal array
    def q = spark.sql(
      """SELECT * FROM pvecs
        |ORDER BY cosine_sim(embedding,
        |  (SELECT embedding FROM pvecs WHERE vec_id = 123)) DESC, vec_id
        |LIMIT 10""".stripMargin
    )
    val brute = q.collect().map(_.getAs[Long]("vec_id")).toSeq
    val bruteOpt = q.queryExecution.optimizedPlan.toString
    assert(!bruteOpt.contains("centroid"), s"rewrite fired while gated off:\n$bruteOpt")
    spark.conf.set(graft.plans.AnnIvfRewrite.ConfKey, "true")
    try {
      val rewritten = q
      val opt = rewritten.queryExecution.optimizedPlan.toString
      assert(opt.contains("centroid"), s"IVF rewrite did not fire on subquery probe:\n$opt")
      val got = rewritten.collect().map(_.getAs[Long]("vec_id")).toSeq
      assert(got == brute, s"IVF rewrite changed results: $got vs $brute")
    } finally spark.conf.unset(graft.plans.AnnIvfRewrite.ConfKey)
  }

  test("per-row probe ANN join rewrite fires through the optimizer; brute plan when disabled") {
    graft.functions.GraftFunctions.register(spark)
    graft.plans.AnnIvfRewrite.install(spark)
    import org.apache.spark.sql.catalyst.plans.logical.Join
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{round => _, _}
    import spark.implicits._
    // tight clusters: every probe's true top-10 live in its own cell,
    // so the cell-pruned path is exact here
    val rnd = new scala.util.Random(17)
    val rows = (0 until 10).flatMap { ci =>
      val base = Array.fill(64)(rnd.nextGaussian())
      (0 until 50).map { j =>
        val v = base.map(x => (x + rnd.nextGaussian() * 0.05).toFloat)
        (ci.toLong * 50 + j, v, s"c$ci")
      }
    }
    val df = rows.toDF("vec_id", "embedding", "label")
    val probes = df
      .filter($"vec_id" % 50 === 0)
      .select($"vec_id".as("pid"), $"embedding".as("pe"))
    // label kept in the output: the cell column must survive pruning
    def q = probes
      .join(df, $"pid" =!= $"vec_id")
      .withColumn(
        "rn",
        row_number().over(
          Window
            .partitionBy("pid")
            .orderBy(expr("cosine_sim(embedding, pe)").desc, $"vec_id")
        )
      )
      .filter($"rn" <= 10)
      .select($"pid", $"vec_id", $"label", $"rn")
      .orderBy("pid", "rn")
    def rowsOf(d: DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getInt(3))).toSeq
    val brute = rowsOf(q)
    val bruteJoins = q.queryExecution.optimizedPlan.collect { case j: Join => j }
    assert(bruteJoins.length == 1, s"expected the single brute join:\n${q.queryExecution.optimizedPlan}")
    spark.conf.set(graft.plans.AnnIvfRewrite.ConfKey, "true")
    try {
      val opt = q.queryExecution.optimizedPlan
      assert(opt.toString.contains("__cell"), s"per-row rewrite did not fire:\n$opt")
      assert(opt.collect { case j: Join => j }.length > 1, opt.toString)
      assert(rowsOf(q) == brute, "cell-pruned per-row top-k diverged on clustered data")
    } finally spark.conf.unset(graft.plans.AnnIvfRewrite.ConfKey)
  }

  test("per-row ANN rewrite fires with an asymmetric probe side carrying its own label") {
    graft.functions.GraftFunctions.register(spark)
    graft.plans.AnnIvfRewrite.install(spark)
    import org.apache.spark.sql.catalyst.plans.logical.Join
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{round => _, _}
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val rows = (0 until 10).flatMap { ci =>
      val base = Array.fill(64)(rnd.nextGaussian())
      (0 until 50).map { j =>
        val v = base.map(x => (x + rnd.nextGaussian() * 0.05).toFloat)
        (ci.toLong * 50 + j, v, s"c$ci")
      }
    }
    val df = rows.toDF("vec_id", "embedding", "label")
    // a SEPARATE frame for the probe side (the operator reads the table
    // twice, too) — df(...) refs in a self-join would be ambiguous
    // the probe relation KEEPS a column literally named `label` — the
    // round-6 guard rejected this shape outright
    val probes = rows
      .toDF("vec_id", "embedding", "label")
      .filter($"vec_id" % 50 === 0)
      .select($"vec_id".as("pid"), $"label", $"embedding".as("pe"))
    def q = probes
      .join(df, $"pid" =!= df("vec_id"))
      .withColumn(
        "rn",
        row_number().over(
          Window
            .partitionBy("pid")
            .orderBy(expr("cosine_sim(embedding, pe)").desc, df("vec_id"))
        )
      )
      .filter($"rn" <= 10)
      .select(
        $"pid",
        probes("label").as("plabel"),
        df("vec_id"),
        df("label").as("clabel"),
        $"rn"
      )
      .orderBy("pid", "rn")
    def rowsOf(d: DataFrame) =
      d.collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3), r.getInt(4)))
        .toSeq
    val brute = rowsOf(q)
    spark.conf.set(graft.plans.AnnIvfRewrite.ConfKey, "true")
    try {
      val opt = q.queryExecution.optimizedPlan
      assert(opt.toString.contains("__cell"), s"asym per-row rewrite did not fire:\n$opt")
      assert(opt.collect { case j: Join => j }.length > 1, opt.toString)
      assert(rowsOf(q) == brute, "asym cell-pruned top-k diverged on clustered data")
      // the probe's own label must ride through untouched
      assert(brute.forall { case (pid, plabel, _, _, _) => plabel == s"c${pid / 50}" })
    } finally spark.conf.unset(graft.plans.AnnIvfRewrite.ConfKey)
  }

  test("per-row rewrite fires on inner_product ordering (MIPS) and stays exact on clustered cells") {
    graft.functions.GraftFunctions.register(spark)
    graft.plans.AnnIvfRewrite.install(spark)
    import org.apache.spark.sql.catalyst.plans.logical.Join
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{round => _, _}
    import spark.implicits._
    // clusters separated by MAGNITUDE as well as direction: cluster ci
    // scales its base by (1 + ci) so MIPS ordering (which, unlike
    // cosine, sees magnitude) still keeps each probe's true top-10 in
    // its own cell
    val rnd = new scala.util.Random(47)
    val rows = (0 until 10).flatMap { ci =>
      val base = Array.fill(64)(rnd.nextGaussian() * (1.0 + ci))
      (0 until 50).map { j =>
        val v = base.map(x => (x + rnd.nextGaussian() * 0.05).toFloat)
        (ci.toLong * 50 + j, v, s"c$ci")
      }
    }
    val df = rows.toDF("vec_id", "embedding", "label")
    val probes = rows
      .toDF("vec_id", "embedding", "label")
      .filter($"vec_id" % 50 === 0)
      .select($"vec_id".as("pid"), $"embedding".as("pe"))
    def q = probes
      .join(df, $"pid" =!= df("vec_id"))
      .withColumn(
        "rn",
        row_number().over(
          Window
            .partitionBy("pid")
            .orderBy(expr("inner_product(embedding, pe)").desc, df("vec_id"))
        )
      )
      .filter($"rn" <= 10)
      .select($"pid", df("vec_id"), df("label"), $"rn")
      .orderBy("pid", "rn")
    def rowsOf(d: DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getInt(3))).toSeq
    val brute = rowsOf(q)
    spark.conf.set(graft.plans.AnnIvfRewrite.ConfKey, "true")
    try {
      val opt = q.queryExecution.optimizedPlan
      assert(opt.toString.contains("__cell"), s"MIPS per-row rewrite did not fire:\n$opt")
      assert(opt.collect { case j: Join => j }.length > 1, opt.toString)
      assert(rowsOf(q) == brute, "MIPS cell-pruned top-k diverged on clustered data")
    } finally spark.conf.unset(graft.plans.AnnIvfRewrite.ConfKey)
  }

  test("per-row ANN rewrite with nprobe >= cell count is exact on ANY data") {
    // un-clustered (near-random labels): top-3 cells would miss true
    // neighbors, but probing every cell degenerates to exact search —
    // the recall dial's boundary law
    graft.functions.GraftFunctions.register(spark)
    graft.plans.AnnIvfRewrite.install(spark)
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.row_number
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val rows = (0 until 200).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextGaussian().toFloat), s"c${i % 10}")
    }
    val df = rows.toDF("vec_id", "embedding", "label")
    val probes = df
      .filter($"vec_id" < 5)
      .select($"vec_id".as("pid"), $"embedding".as("pe"))
    def q = probes
      .join(df, $"pid" =!= $"vec_id")
      .withColumn(
        "rn",
        row_number().over(
          Window
            .partitionBy("pid")
            .orderBy(expr("cosine_sim(embedding, pe)").desc, $"vec_id")
        )
      )
      .filter($"rn" <= 10)
      .select($"pid", $"vec_id", $"label", $"rn")
      .orderBy("pid", "rn")
    val brute = q.collect().toSeq
    spark.conf.set(graft.plans.AnnIvfRewrite.ConfKey, "true")
    spark.conf.set(graft.plans.AnnIvfRewrite.NprobeKey, "10")
    try {
      val opt = q.queryExecution.optimizedPlan.toString
      assert(opt.contains("__cell"), s"rewrite did not fire:\n$opt")
      assert(q.collect().toSeq == brute, "nprobe=all-cells must equal brute force")
    } finally {
      spark.conf.unset(graft.plans.AnnIvfRewrite.ConfKey)
      spark.conf.unset(graft.plans.AnnIvfRewrite.NprobeKey)
    }
  }

  test("ANN IVF auto mode is cost-gated on the child's estimated size") {
    graft.functions.GraftFunctions.register(spark)
    graft.plans.AnnIvfRewrite.install(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(12)
    val rows = (0 until 6).flatMap { ci =>
      val base = Array.fill(64)(rnd.nextGaussian())
      (0 until 40).map { j =>
        val v = base.map(x => (x + rnd.nextGaussian() * 0.05).toFloat)
        (ci.toLong * 40 + j, v, s"c$ci")
      }
    }
    val df = rows.toDF("vec_id", "embedding", "label")
    val probeSql = rows(60)._2
      .map(f => s"CAST($f AS FLOAT)")
      .mkString("array(", ",", ")")
    def q = df
      .orderBy(expr(s"cosine_sim(embedding, $probeSql)").desc, col("vec_id"))
      .limit(10)
    val brute = q.collect().map(_.getAs[Long]("vec_id")).toSeq
    spark.conf.set(graft.plans.AnnIvfRewrite.ConfKey, "auto")
    try {
      // below the default 128 MiB threshold: brute-force plan survives
      val small = q.queryExecution.optimizedPlan.toString
      assert(!small.contains("Join"), s"auto fired under the size gate:\n$small")
      // force the gate open: the same query flips to the pruned path
      spark.conf.set(graft.plans.AnnIvfRewrite.MinBytesKey, "1")
      val opt = q.queryExecution.optimizedPlan.toString
      assert(opt.contains("Join"), s"auto did not fire above the gate:\n$opt")
      assert(q.collect().map(_.getAs[Long]("vec_id")).toSeq == brute)
    } finally {
      spark.conf.unset(graft.plans.AnnIvfRewrite.ConfKey)
      spark.conf.unset(graft.plans.AnnIvfRewrite.MinBytesKey)
    }
  }

  test("sink_partitioned read prunes partitions at the directory level") {
    // partition-directory pruning is a different mechanism from the
    // row-group predicate pushdown scan_pruned pins: the filter on the
    // partition column must land in PartitionFilters so non-matching
    // directories are never listed into the scan at all
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    val df = operators.Scans.sinkPartitioned(spark, sf0001)
    // AQE wraps the physical plan — unwrap to reach the scan leaf
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case f: FileSourceScanExec    => Seq(f)
      case other                    => other.children.flatMap(scans)
    }
    val scan = scans(df.queryExecution.executedPlan).headOption
    assert(scan.isDefined, "expected a FileSourceScanExec leaf")
    val pf = scan.get.partitionFilters.map(_.sql).mkString(", ")
    assert(
      pf.contains("o_orderstatus"),
      s"partition filter not pushed to directory pruning: [$pf]"
    )
    // the pruned scan must see strictly fewer partition dirs than exist
    val selected = scan.get.relation.location.listFiles(scan.get.partitionFilters, Nil)
    val all = scan.get.relation.location.listFiles(Nil, Nil)
    assert(
      selected.length < all.length,
      s"pruning selected ${selected.length} of ${all.length} partitions"
    )
  }

  test("text_tfidf builder runs no aggregation job before the action") {
    // parquet schema inference may launch trivial single-stage jobs at
    // read time; what must NOT happen at build time is a shuffle-bearing
    // job like the eager corpus count() this builder used to run.
    val multiStage = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        if (j.stageInfos.size > 1) multiStage.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      text.TextOps.textTfidf(spark, sf0001) // build only, no action
      Thread.sleep(500) // listener bus is async
      assert(
        multiStage.get() == 0,
        s"builder eagerly ran ${multiStage.get()} shuffle job(s)"
      )
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("stream_join keys the shuffle on user_id (no nested loop)") {
    val s = planString(operators.StreamingBatch.streamJoin(spark, sf0001))
    assert(
      s.contains("SortMergeJoin") || s.contains("ShuffledHashJoin") ||
        s.contains("BroadcastHashJoin"),
      s
    )
    assert(!s.contains("CartesianProduct") && !s.contains("BroadcastNestedLoopJoin"), s)
  }

  test("ts_sessionize runs on a single user_id exchange") {
    val s = planString(operators.EventAnalytics.tsSessionize(spark, sf0001))
    val shuffles = "Exchange hashpartitioning".r.findAllIn(s).length
    assert(shuffles == 1, s"expected 1 shuffle, plan:\n$s")
  }

  test("win_rank_topk_per_group engages Spark's WindowGroupLimit pushdown") {
    // the rn <= k filter over row_number should plan the 3.5+ group-limit
    // operator, which caps per-group rows BEFORE the full window sort —
    // the built-in cousin of the custom TopKPerGroup node
    val s = planString(operators.Windows.winRankTopk(spark, sf001))
    assert(s.contains("WindowGroupLimit"), s)
  }

  test("ts_sessionize_exec plans the fused SessionizeExec on one exchange") {
    val s = planString(operators.EventAnalytics.tsSessionizeExec(spark, sf0001))
    // SparkPlan.nodeName strips the Exec suffix: the node prints as "Sessionize"
    assert(s.contains("Sessionize "), s"custom node missing, plan:\n$s")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(s).length
    assert(shuffles == 1, s"expected 1 shuffle, plan:\n$s")
    // no window operators survive — the fused pass replaced them
    assert(!s.contains("RunningWindowFunction") && !s.contains("Window"), s)
  }

  test("SessionizeExec participates in whole-stage codegen") {
    // the `*(n)` prefix in the printed tree marks nodes fused into
    // WholeStageCodegen span n (collect-based traversal would stop at
    // AQE query-stage boundaries, so assert on the rendered plan)
    val s = planString(operators.EventAnalytics.tsSessionizeExec(spark, sf0001))
    assert(
      s.linesIterator.exists(l => l.contains("Sessionize ") && l.contains("*(")),
      s"SessionizeExec not inside a WholeStageCodegen span:\n$s"
    )
  }

  test("runtime bloom filter prunes the fact side of a selective dim join") {
    // engine-knowledge pin: Spark injects a bloom filter from the
    // selective build side into the fact scan when the runtime filter
    // framework decides it pays — the 100 TB semi-join pruning we rely
    // on being available. Thresholds forced low so the tiny test corpus
    // qualifies.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100GB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1"
    )
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = Tables.lineitem(spark, sf001)
      val sel = Tables
        .orders(spark, sf001)
        .filter(col("o_totalprice") > 480000)
        .select("o_orderkey")
      val joined = li
        .join(sel, col("l_orderkey") === col("o_orderkey"))
        .select("l_orderkey", "l_quantity")
      val s = joined.queryExecution.optimizedPlan.toString
      assert(
        s.contains("might_contain") && s.contains("bloom_filter_agg"),
        s"runtime bloom filter not injected:\n$s"
      )
      assert(joined.count() > 0)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("etl_fuzzy_match joins on the block key, never all-pairs") {
    val s = planString(operators.Etl.etlFuzzyMatch(spark, sf0001))
    assert(!s.contains("CartesianProduct") && !s.contains("BroadcastNestedLoopJoin"), s)
  }

  test("sim_kmeans_assign broadcasts the centroid side") {
    val s = planString(sim.Similarity.simKmeansAssign(spark, sf0001))
    assert(s.contains("BroadcastExchange"), s)
    // the k-fold fan-out is pruned before the exchange by the custom node
    assert(s.contains("TopKPerGroupPartial"), s)
  }

  test("stream_topk heap-prunes each window's candidates before the exchange") {
    val s = planString(operators.StreamingBatch.streamTopk(spark, sf0001))
    val exIdx = s.indexOf("Exchange hashpartitioning")
    val partialIdx = s.indexOf("TopKPerGroupPartial")
    assert(partialIdx >= 0, s"partial heap missing, plan:\n$s")
    assert(exIdx >= 0 && exIdx < partialIdx, s)
  }

  test("MV rollup rewrite fires through the optimizer; source scan when disabled or non-decomposable") {
    import graft.plans.MvRewrite
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    // running the key registers the MV for sf0.001 (and stages it)
    operators.Aggregates.aggRollupMv(spark, sf0001).collect()
    MvRewrite.install(spark)
    def brute(aggs: Seq[org.apache.spark.sql.Column]) =
      Tables
        .lineitem(spark, sf0001)
        .filter(col("l_shipdate") <= org.apache.spark.sql.functions.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(aggs.head, aggs.tail: _*)
        .orderBy("l_returnflag", "l_linestatus")
    import org.apache.spark.sql.functions.{count => cnt, lit => l, sum, min, max, avg}
    val decomposable = Seq(
      cnt(l(1)).as("n_rows"),
      sum("l_quantity").as("sum_qty"),
      min("l_quantity").as("min_qty"),
      max("l_quantity").as("max_qty")
    )
    def srcScans(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.optimizedPlan.collect {
        case r: LogicalRelation
            if r.relation
              .isInstanceOf[org.apache.spark.sql.execution.datasources.HadoopFsRelation] &&
              r.relation
                .asInstanceOf[org.apache.spark.sql.execution.datasources.HadoopFsRelation]
                .location
                .rootPaths
                .exists(_.toString.contains("lineitem.parquet")) =>
          r
      }.size
    spark.conf.set(MvRewrite.ConfKey, "true")
    try {
      val mvDf = brute(decomposable)
      assert(
        MvRewrite.readsMv(mvDf.queryExecution.optimizedPlan),
        s"rewrite did not fire:\n${mvDf.queryExecution.optimizedPlan}"
      )
      assert(srcScans(mvDf) == 0, "MV plan still scans the source")
      // avg is float-order sensitive — with no avgExact declaration on
      // the registered MV the rule must bail to the source plan even
      // when enabled
      val avgDf = brute(decomposable :+ avg("l_quantity").as("avg_qty"))
      assert(!MvRewrite.readsMv(avgDf.queryExecution.optimizedPlan))
      assert(srcScans(avgDf) == 1, "avg query must keep the source scan")
      // rewritten and disabled plans agree row-for-row
      val mvRows = mvDf.collect().toSeq
      spark.conf.unset(MvRewrite.ConfKey)
      val bruteDf = brute(decomposable)
      assert(!MvRewrite.readsMv(bruteDf.queryExecution.optimizedPlan))
      assert(srcScans(bruteDf) == 1)
      assert(bruteDf.collect().toSeq == mvRows)
    } finally spark.conf.unset(MvRewrite.ConfKey)
  }

  test("MV avg rewrite fires ONLY for registrant-declared integral measures") {
    import graft.plans.MvRewrite
    import org.apache.spark.sql.functions.{avg, lit => l}
    // running the key registers the avgExact MV (and stages cntnn_*)
    operators.Aggregates.aggRollupAvg(spark, sf0001).collect()
    MvRewrite.install(spark)
    def brute(a: org.apache.spark.sql.Column) =
      Tables
        .lineitem(spark, sf0001)
        .filter(col("l_shipdate") <= l("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(a)
        .orderBy("l_returnflag", "l_linestatus")
    spark.conf.set(MvRewrite.ConfKey, "true")
    try {
      // declared measure: avg serves from the rollup's two sums
      val fired = brute(avg("l_quantity").as("avg_qty"))
      assert(
        MvRewrite.readsMv(fired.queryExecution.optimizedPlan),
        s"declared avg did not fire:\n${fired.queryExecution.optimizedPlan}")
      // an UNDECLARED measure (genuinely fractional prices) bails
      val bailed = brute(avg("l_extendedprice").as("avg_price"))
      assert(!MvRewrite.readsMv(bailed.queryExecution.optimizedPlan))
      // the rewritten avg equals the brute avg BIT-FOR-BIT (integral
      // sums below 2^53 reassociate exactly)
      val mvRows = fired.collect().toSeq
      spark.conf.unset(MvRewrite.ConfKey)
      val bruteRows = brute(avg("l_quantity").as("avg_qty")).collect().toSeq
      assert(mvRows == bruteRows)
    } finally spark.conf.unset(MvRewrite.ConfKey)
  }

  test("fn_sql_macro SQL functions inline into the plan (no UDF eval boundary)") {
    val df = functions.ScalarFns.fnSqlMacro(spark, sf0001)
    val s = planString(df)
    assert(!s.contains("ScalaUDF"), s"macro not inlined:\n$s")
    assert(!s.contains("BatchEvalPython"), s)
    // the inlined arithmetic participates in whole-stage codegen (the
    // *(n) stage markers) and the macro body is visible as plain
    // expressions in the projection
    assert("""\*\(\d+\)""".r.findFirstIn(s).isDefined, s)
    assert(s.contains("* (1.0 - l_discount"), s"macro body not inlined:\n$s")
  }

  test("text_boilerplate_rm hot-span join broadcasts by SIZE, not by hint") {
    // the hot set (df>5 spans) grows with the corpus, so the broadcast
    // must come from the size-based planner/AQE — which still fires
    // here because the set IS small at this SF...
    val s = planString(text.TextOps.textBoilerplateRm(spark, sf0001))
    assert(s.contains("BroadcastHashJoin"), s"hot-span join not broadcast:\n$s")
  }

  test("etl_pack_sequences plans exactly one range exchange, no window") {
    val df = operators.Etl.etlPackSequences(spark, sf0001)
    val s = planString(df)
    // the single-task Window.orderBy anti-pattern would appear as a
    // Window over Exchange SinglePartition — the two-phase scheme must
    // show one rangepartitioning exchange and no Window at all
    assert(!s.contains("Window"), s"window anti-pattern:\n$s")
    assert(!s.contains("SinglePartition"), s"single-partition exchange:\n$s")
    assert(
      "Exchange rangepartitioning".r.findAllIn(s).size >= 1,
      s"range exchange missing:\n$s"
    )
  }

  test("shingle consumers serve from the staged parquet, not a recompute") {
    // build-if-absent, then the consumer's scan leaves must include the
    // staged table (graft_stage path) and must NOT re-derive shingles
    // (no Generate/explode over documents.text in the plan)
    val df = text.Dedup.queries("dedup_decontaminate")(spark, sf0001)
    val s = planString(df)
    assert(s.contains("graft_stage"), s"staged scan missing:\n$s")
    assert(!s.contains("Generate explode"), s"shingles recomputed:\n$s")
  }

  test("sim_kmeans_refresh carries vectors through the heap, centroids broadcast") {
    val s = planString(sim.Similarity.simKmeansRefresh(spark, sf0001))
    assert(s.contains("BroadcastExchange"), s)
    assert(s.contains("TopKPerGroupPartial"), s)
    // one hash exchange for the (cell, dim) aggregate is expected; the
    // assignment itself must not add a corpus re-join (a second scan of
    // the embeddings table beyond centroids would show as a SortMerge)
    assert(!s.contains("SortMergeJoin"), s)
  }

  test("sim_batch_topk broadcasts probes and heap-prunes before the exchange") {
    val s = planString(sim.Similarity.simBatchTopk(spark, sf0001))
    assert(s.contains("BroadcastExchange"), s)
    val exIdx = s.indexOf("Exchange hashpartitioning")
    val partialIdx = s.indexOf("TopKPerGroupPartial")
    assert(partialIdx >= 0, s"partial heap missing, plan:\n$s")
    // printed top-down: the hash exchange must sit ABOVE the partial
    // prune, i.e. only <= k rows per probe per partition are shuffled
    assert(exIdx >= 0 && exIdx < partialIdx, s)
  }

  test("win_ntile_cume plans no window operator at all (two-phase ranks)") {
    // the old formulation was `Window.orderBy(...)` with no partitioning —
    // a single-partition WindowExec (Spark logs `WARN WindowExec: No
    // Partition Defined`). The two-phase rank/offset rewrite must leave
    // NO window node in the executed plan.
    val s = planString(operators.Windows.winNtileCume(spark, sf001))
    assert(!s.contains("Window"), s"window operator survived:\n$s")
    assert(s.contains("rangepartitioning"), s"range partitioning missing:\n$s")
  }

  test("agg_weighted_median windows only over bounded histograms, never raw fact rows") {
    // the old shape sorted the whole fact table into 3 window partitions
    // (one per l_returnflag). The bucket-histogram rewrite must place an
    // aggregate below EVERY window, so window state is bounded by the
    // constant bucket count, not the data size.
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    val df = operators.Aggregates.aggWeightedMedian(spark, sf001)
    val plan = df.queryExecution.sparkPlan
    val windows = plan.collect { case w: WindowExec => w }
    assert(windows.nonEmpty, s"expected histogram windows, plan:\n$plan")
    windows.foreach { w =>
      val aggsBelow = w.child.collect { case a: BaseAggregateExec => a }
      assert(
        aggsBelow.nonEmpty,
        s"WindowExec runs over raw (unaggregated) rows:\n$w"
      )
    }
  }

  test("etl_shard_assign plans no per-lang window (two-phase keyed offsets)") {
    // |langs| is tiny, so `Window.partitionBy(lang)` would sort the whole
    // corpus into a handful of tasks; the keyed two-phase offset rewrite
    // must leave no window node and range-partition on (lang, doc_id).
    val s = planString(operators.Etl.etlShardAssign(spark, sf001))
    assert(!s.contains("Window"), s"window operator survived:\n$s")
    assert(s.contains("rangepartitioning"), s"range partitioning missing:\n$s")
  }

  test("bench count() does not collapse the flagship aggregation") {
    // SURVEY §3.3 hazard: df.count() must still execute the aggregate
    val df = operators.Aggregates.aggHash(spark, sf0001)
    val counted = df.groupBy().count()
    val s = counted.queryExecution.executedPlan.toString
    assert(s.contains("HashAggregate"), s)
  }

  // INVERSE broadcast pins (round 10): these two queries carry tables
  // that GROW with the corpus (per-token document frequency, per-node
  // degree). A broadcast() hint there is unconditional — it fires at
  // 100 TB just as at sf0.001 and OOMs. The scale-safe form is a plain
  // shuffle join, leaving AQE free to demote to broadcast when RUNTIME
  // stats say the side is small. Proven by disabling the size-based
  // auto-broadcast entirely: any Broadcast*Join that still appears can
  // only come from a hint.
  private def withNoAutoBroadcast(body: => Unit): Unit = {
    // restore the PRIOR value, not a hardcoded default, so these tests
    // can't reorder-couple with any suite that tunes the threshold
    val prior = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try body
    finally {
      prior match {
        case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
        case None    => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  test("text_tfidf tf⋈df join is NOT hint-broadcast (vocabulary grows with corpus)") {
    withNoAutoBroadcast {
      val s = planString(graft.text.TextOps.textTfidf(spark, sf0001))
      assert(
        !s.contains("BroadcastHashJoin"),
        s"tf⋈df must shuffle-join, found hinted broadcast:\n$s"
      )
      // the single-row nDocs aggregate keeps its hint: with the size
      // threshold off, only the hint can produce this node
      assert(
        s.contains("BroadcastNestedLoopJoin"),
        s"nDocs single-row broadcast hint lost:\n$s"
      )
      assert(s.contains("SortMergeJoin"), s"expected shuffled tf⋈df join:\n$s")
    }
  }

  test("graph_jaccard degree joins are NOT hint-broadcast (nodes grow with corpus)") {
    withNoAutoBroadcast {
      val s = planString(graft.text.Dedup.graphJaccard(spark, sf0001))
      assert(
        !s.contains("BroadcastHashJoin") && !s.contains("BroadcastNestedLoopJoin"),
        s"degree joins must shuffle, found hinted broadcast:\n$s"
      )
      assert(s.contains("SortMergeJoin"), s"expected shuffled degree joins:\n$s")
    }
  }

  test("snapshot readPruned keeps parquet pushdown under the manifest layer") {
    // the manifest resolves WHICH files to open; inside them the range
    // predicate must still reach the parquet reader (row-group skipping)
    // — a table format that breaks scan pushdown has negative value
    val df = operators.Scans.scanSnapshotPruned(spark, sf0001)
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("PushedFilters: ["), s)
    assert(
      s.contains("GreaterThanOrEqual(o_orderkey") &&
        s.contains("LessThanOrEqual(o_orderkey"),
      s"range predicate not pushed to parquet:\n$s"
    )
  }

  test("text_boilerplate_rm hot-span join is NOT hint-broadcast (df>5 set grows)") {
    // ...and with the size-based path disabled, no Broadcast*Join may
    // remain: any survivor could only come from an unconditional hint,
    // the 100 TB OOM posture this round removed.
    withNoAutoBroadcast {
      val s = planString(text.TextOps.textBoilerplateRm(spark, sf0001))
      assert(
        !s.contains("BroadcastHashJoin") && !s.contains("BroadcastNestedLoopJoin"),
        s"hot-span join must be hint-free:\n$s"
      )
    }
  }

  test("text_index_search probes the posting table, never the text") {
    val s = planString(text.TextOps.textIndexSearch(spark, sf0001))
    // the query terms reach the posting scan as a pushed In filter —
    // on the range-sharded staged table that is file-level pruning
    assert(
      s.contains("In(term") || s.contains("EqualTo(term"),
      s"term probe must push into the posting scan:\n$s")
    // the document text column is never read at query time: the only
    // documents scan is the id-join projection
    val docScans = s.linesIterator.filter(l =>
      l.contains("ReadSchema") && l.contains("lang")).toList
    assert(
      docScans.nonEmpty && docScans.forall(!_.contains("text")),
      s"search must not scan document text:\n${docScans.mkString("\n")}")
  }
}
