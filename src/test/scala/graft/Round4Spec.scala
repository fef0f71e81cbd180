package graft

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Semantic checks for the round-4 operators beyond the DuckDB parity
  * gate: graph-shaped inputs the corpus doesn't contain (label
  * propagation over a multi-hop chain), plan-shape guarantees (the
  * binned interval join must never degenerate to a nested loop), and
  * equivalences (bitmap distinct vs count distinct, binned vs naive
  * range join).
  */
class Round4Spec extends SparkTestBase {

  import spark.implicits._

  test("dedup_cluster_cc labels a multi-hop chain with the component min") {
    // Chain 1-2-3-4 (diameter 3 forces >1 propagation round), pair 10-11,
    // singleton 20. Mirrors the operator's loop on a synthetic edge set.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("d1", "d2")
    val docs = Seq(1L, 2L, 3L, 4L, 10L, 11L, 20L).toDF("doc_id")
    val sym = edges.union(edges.select(col("d2"), col("d1"))).toDF("src", "dst")
    var lbl = docs.select(col("doc_id"), col("doc_id").as("cluster_id"))
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < 20) {
      val nbrMin = sym
        .join(lbl, col("dst") === col("doc_id"))
        .groupBy("src")
        .agg(min("cluster_id").as("nmin"))
      val next = lbl
        .join(nbrMin, col("doc_id") === col("src"), "left")
        .select(
          col("doc_id"),
          least(col("cluster_id"), coalesce(col("nmin"), col("cluster_id")))
            .as("cluster_id")
        )
      changed = next
        .join(lbl.withColumnRenamed("cluster_id", "prev"), "doc_id")
        .filter(col("cluster_id") =!= col("prev"))
        .count()
      lbl = next
      rounds += 1
    }
    val got = lbl.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L, 20L -> 20L))
    assert(rounds >= 3, s"chain of diameter 3 must need >=3 rounds, took $rounds")
  }

  test("dedup_cluster_cc on the corpus: canonical iff min of cluster, sizes consistent") {
    val res = text.Dedup.dedupClusterCc(spark, sf001).collect()
    val byCluster = res.groupBy(_.getAs[Long]("cluster_id"))
    byCluster.foreach { case (cid, rows) =>
      assert(rows.map(_.getAs[Long]("doc_id")).min == cid, s"cluster $cid label is not its min doc_id")
      assert(rows.forall(_.getAs[Long]("cluster_n") == rows.length))
      assert(rows.count(_.getAs[Boolean]("is_canonical")) == 1)
    }
    // the corpus has true dup clusters: at least one non-singleton
    assert(byCluster.exists(_._2.length > 1))
  }

  test("join_range_binned equals the naive range join and plans no nested loop") {
    val e = Tables.events(spark, sf0001)
    val naive = e
      .as("a")
      .join(
        e.as("b"),
        expr("b.ts > a.ts AND b.ts <= a.ts + INTERVAL 1 MINUTE")
      )
      .select(
        col("a.event_id").as("a_id"),
        col("b.event_id").as("b_id")
      )
    val binned = operators.Joins.joinRangeBinned(spark, sf0001)
    val n = naive.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = binned.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(b == n, s"binned=${b.size} naive=${n.size}")
    val plan = binned.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(
      !plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      plan
    )
  }

  test("agg_bitmap_distinct equals count distinct") {
    val exact = Tables
      .lineitem(spark, sf0001)
      .groupBy("l_returnflag")
      .agg(countDistinct("l_suppkey").as("d"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    val bitmap = operators.Aggregates
      .aggBitmapDistinct(spark, sf0001)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    assert(bitmap == exact)
  }

  test("agg_hll_sketch: ≤5% error and union-merge equals the global sketch") {
    val rows = operators.Aggregates.aggHllSketch(spark, sf001).collect()
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_supp").toDouble
      val exact = r.getAs[Long]("exact_supp").toDouble
      assert(math.abs(approx - exact) / exact <= 0.05, s"error > 5%: $r")
    }
    // merge law: union of per-group sketches == one global sketch
    val li = Tables.lineitem(spark, sf001)
    val merged = li
      .groupBy("l_returnflag")
      .agg(expr("hll_sketch_agg(l_suppkey)").as("sk"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
      .collect()(0)
      .getLong(0)
    val global = li
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(l_suppkey))").as("est"))
      .collect()(0)
      .getLong(0)
    assert(merged == global, s"merge law broken: merged=$merged global=$global")
  }

  test("ts_gapfill covers the full grid; gaps carry the previous value") {
    val res = operators.Etl.tsGapfill(spark, sf001)
    val rows = res.collect()
    val types = rows.map(_.getAs[String]("event_type")).distinct
    val perType = rows.length / types.length
    assert(rows.length == perType * types.length, "grid must be rectangular")
    // every gap row: n_events == 0 and ff_value equals the previous row's
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[java.sql.Timestamp]("h").getTime)
      sorted.sliding(2).foreach {
        case Array(prev, cur) if cur.getAs[Boolean]("is_gap") =>
          assert(cur.getAs[Long]("n_events") == 0L)
          if (!prev.isNullAt(prev.fieldIndex("ff_value"))) {
            assert(
              cur.getAs[Double]("ff_value") == prev.getAs[Double]("ff_value"),
              "gap must carry the previous filled value"
            )
          }
        case _ =>
      }
    }
  }

  test("etl_dq_checks: injected violations are counted") {
    // The clean corpus yields all-zero counts; inject one of each breach
    // into a copy and run the same rule SQL shapes over it.
    val li = Tables
      .lineitem(spark, sf0001)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_shipdate")
    val bad = Seq(
      (1L, 1, -5.0, 0.05, None: Option[java.sql.Timestamp]), // nonpositive qty + null date
      (1L, 1, 10.0, 1.5, Some(java.sql.Timestamp.valueOf("1995-01-01 00:00:00"))) // dup pk + discount range
    ).toDF("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_shipdate")
    val all = li.unionByName(bad)
    assert(all.filter(col("l_shipdate").isNull).count() == 1)
    assert(all.filter(col("l_quantity") <= 0).count() == 1)
    assert(all.filter(col("l_discount") < 0 || col("l_discount") > 1).count() == 1)
    val dups = all
      .groupBy("l_orderkey", "l_linenumber")
      .agg(count(lit(1)).as("c"))
      .filter(col("c") > 1)
      .count()
    assert(dups >= 1)
    // the production query: corpus is clean EXCEPT (l_orderkey,
    // l_linenumber) is genuinely not a unique key in this synthetic data
    // — the audit must report exactly the independently-counted rows in
    // duplicated key groups, and zero for every other rule
    val expectedDup = Tables
      .lineitem(spark, sf0001)
      .groupBy("l_orderkey", "l_linenumber")
      .agg(count(lit(1)).as("c"))
      .filter(col("c") > 1)
      .count()
    val audit = operators.Etl
      .etlDqChecks(spark, sf0001)
      .collect()
      .map(r => r.getAs[String]("rule") -> r.getAs[Long]("n_violations"))
      .toMap
    assert(audit.keySet.size == 5)
    assert(audit("duplicate_pk") == expectedDup && expectedDup > 0, audit.toString)
    assert((audit - "duplicate_pk").values.forall(_ == 0L), audit.toString)
  }
}
