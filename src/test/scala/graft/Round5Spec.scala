package graft

import org.apache.spark.sql.functions._

/** Semantic checks for the round-5 additions beyond the DuckDB parity
  * gate.
  */
class Round5Spec extends SparkTestBase {

  import spark.implicits._

  test("bigram_tf equals the explode+groupBy pipeline on the corpus") {
    functions.GraftFunctions.register(spark)
    val docs = Tables.documents(spark, sf001).filter(length(col("text")) >= 2)
    val fused = docs
      .select(col("doc_id"), explode(expr("bigram_tf(text)")))
      .toDF("doc_id", "b", "tf")
    val exploded = docs
      .select(
        col("doc_id"),
        explode(
          expr(
            "transform(sequence(1, length(text) - 1), i -> substring(text, i, 2))"
          )
        ).as("b")
      )
      .groupBy("doc_id", "b")
      .agg(count(lit(1)).as("tf"))
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getString(1), r.getLong(2))
    assert(fused.collect().map(key).toSet == exploded.collect().map(key).toSet)
  }

  test("TopKPerGroup: custom plan nodes fire, partial prunes before the exchange, result exact") {
    val li = Tables
      .lineitem(spark, sf001)
      .select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice")
      .repartition(8) // force multiple input partitions for the partial stage
    val topk = plans.TopKPerGroup.topKPerGroup(
      li,
      Seq("l_returnflag"),
      Seq(("l_extendedprice", false), ("l_orderkey", true), ("l_linenumber", true)),
      5
    )
    val rows = topk.collect()
    // plan shape: partial below the exchange, final above it
    val phys = topk.queryExecution.executedPlan.toString
    assert(phys.contains("TopKPerGroupPartial"), phys)
    assert(phys.contains("TopKPerGroupFinal"), phys)
    assert(phys.contains("Exchange hashpartitioning(l_returnflag"), phys)
    // exact same rows as the window-function formulation
    import org.apache.spark.sql.expressions.Window
    val w = Window
      .partitionBy("l_returnflag")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    val expected = li
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .drop("rn")
      .collect()
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getLong(1), r.getInt(2), r.getDouble(3))
    assert(rows.map(key).toSet == expected.map(key).toSet)
    // map-side prune: the partial stage emitted <= partitions * groups * k
    // rows into the shuffle — NOT the full input
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def allNodes(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => a +: allNodes(a.executedPlan)
      case q: QueryStageExec => q +: allNodes(q.plan)
      case other => other +: other.children.flatMap(allNodes)
    }
    val partial = allNodes(topk.queryExecution.executedPlan).collectFirst {
      case p: plans.TopKPerGroupPartialExec => p
    }.get
    val emitted = partial.metrics("numOutputRows").value
    val groups = 3
    assert(emitted <= 8L * groups * 5, s"partial emitted $emitted rows")
    assert(emitted < li.count(), "partial must prune, not forward, the input")
  }

  test("TopKPerGroup: groups smaller than k, ties, and null group keys") {
    val df = Seq(
      (Some("a"), 1, 10.0),
      (Some("a"), 2, 10.0), // tie on value -> tiebreak on id
      (Some("a"), 3, 5.0),
      (Some("b"), 4, 1.0), // group smaller than k
      (None: Option[String], 5, 7.0), // null group key is its own group
      (None: Option[String], 6, 9.0),
      (None: Option[String], 7, 3.0)
    ).toDF("g", "id", "v")
    val got = plans.TopKPerGroup
      .topKPerGroup(df, Seq("g"), Seq(("v", false), ("id", true)), 2)
      .collect()
      .map(r => (Option(r.getString(0)), r.getInt(1)))
      .toSet
    assert(
      got == Set(
        (Some("a"), 1),
        (Some("a"), 2),
        (Some("b"), 4),
        (None, 6),
        (None, 5)
      )
    )
  }

  test("bigram_tf: multi-byte codepoints, short strings, nulls") {
    functions.GraftFunctions.register(spark)
    val rows = Seq(
      (1L, Some("héllo")), // 2-byte é: codepoint bigrams, not byte bigrams
      (2L, Some("日本語です")), // 3-byte CJK
      (3L, Some("aaa")), // repeated bigram counted twice
      (4L, Some("x")), // <2 codepoints -> empty map
      (5L, Some("")),
      (6L, None)
    ).toDF("id", "s")
    val got = rows
      .select(col("id"), expr("bigram_tf(s)").as("m"))
      .collect()
      .map(r => r.getLong(0) -> Option(r.getMap[String, Long](1)).map(_.toMap))
      .toMap
    assert(got(1L).get == Map("hé" -> 1L, "él" -> 1L, "ll" -> 1L, "lo" -> 1L))
    assert(got(2L).get == Map("日本" -> 1L, "本語" -> 1L, "語で" -> 1L, "です" -> 1L))
    assert(got(3L).get == Map("aa" -> 2L))
    assert(got(4L).get.isEmpty && got(5L).get.isEmpty)
    assert(got(6L).isEmpty)
  }

  test("ts_funnel: stage counts are monotonically non-increasing") {
    val rows = operators.EventAnalytics
      .tsFunnel(spark, sf001)
      .collect()
      .sortBy(_.getInt(0))
      .map(_.getLong(2))
    assert(rows.length == 3)
    assert(rows(0) >= rows(1) && rows(1) >= rows(2))
    assert(rows(0) > 0)
  }

  test("ts_sessionize: intra-session gaps <= 30min, inter-session gaps > 30min") {
    val sess = operators.EventAnalytics
      .tsSessionize(spark, sf001)
      .collect()
      .map(r =>
        (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getTimestamp(3))
      )
      .groupBy(_._1)
    sess.values.foreach { ss =>
      val ordered = ss.sortBy(_._2)
      // session ids are contiguous from 1
      assert(ordered.map(_._2).toSeq == (1L to ordered.length).toSeq)
      // consecutive sessions separated by more than the 30-min gap
      ordered.sliding(2).foreach {
        case Array((_, _, _, end1), (_, _, start2, _)) =>
          assert(start2.getTime - end1.getTime > 1800L * 1000)
        case _ => ()
      }
    }
    // each session's span is consistent: start <= end
    sess.values.flatten.foreach { case (_, _, s, e) =>
      assert(!s.after(e))
    }
  }

  test("etl_snapshot_diff: ops partition correctly and balances reconcile") {
    val diff = operators.Etl
      .etlSnapshotDiff(spark, sf001)
      .collect()
      .map(r =>
        (r.getLong(0), r.getString(1), Option(r.get(2)), Option(r.get(3)))
      )
    assert(diff.nonEmpty)
    diff.foreach {
      case (k, "added", old, nw)   => assert(k >= 2000000 && old.isEmpty && nw.nonEmpty)
      case (k, "removed", old, nw) => assert(k % 13 == 0 && old.nonEmpty && nw.isEmpty)
      case (k, "changed", old, nw) =>
        assert(k % 7 == 0 && k % 13 != 0 && old.nonEmpty && nw.nonEmpty)
      case (_, op, _, _) => fail(s"unexpected op $op")
    }
  }

  test("agg_hist: buckets tile [min,max] and counts sum to the row count") {
    val h = operators.Aggregates
      .aggHist(spark, sf001)
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
    assert(h.map(_._1).toSeq == (0L to 9L))
    // adjacent buckets share an edge
    h.sliding(2).foreach {
      case Array((_, _, hi1, _), (_, lo2, _, _)) =>
        assert(math.abs(hi1 - lo2) < 1e-9)
      case _ => ()
    }
    val total = Tables.orders(spark, sf001).count()
    assert(h.map(_._4).sum == total)
  }

  test("ts_streaks: streak days are genuinely consecutive purchase days") {
    val streaks = operators.EventAnalytics
      .tsStreaks(spark, sf001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDate(2)))
    assert(streaks.nonEmpty)
    val purchaseDays = Tables
      .events(spark, sf001)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .distinct()
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate))
      .groupBy(_._1)
      .map { case (u, ds) => u -> ds.map(_._2).toSet }
    streaks.foreach { case (u, len, start) =>
      val days = purchaseDays(u)
      val s = start.toLocalDate
      (0L until len).foreach(i => assert(days.contains(s.plusDays(i))))
      // maximality: the day before the streak is not a purchase day
      assert(!days.contains(s.minusDays(1)))
    }
  }

  test("sim_kmeans_assign: argmax matches brute force and custom node fires") {
    val assign = sim.Similarity.simKmeansAssign(spark, sf001)
    val phys = assign.queryExecution.executedPlan.toString
    assert(phys.contains("TopKPerGroupPartial"), phys)
    val got = assign
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2))))
      .toMap
    // brute force argmax over the same rounded scores
    functions.GraftFunctions.register(spark)
    val emb = Tables.embeddings(spark, sf001)
    val cents = emb
      .filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val brute = emb
      .crossJoin(broadcast(cents))
      .select(
        col("vec_id"),
        col("cid"),
        round(expr("cosine_sim(embedding, ce)"), 4).as("cos")
      )
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)
      .map { case (v, rows) =>
        v -> rows.minBy(r => (-r._3, r._2))
      }
    brute.foreach { case (v, (_, cid, cos)) =>
      assert(got(v) == (cid, cos), s"vec $v")
    }
  }

  test("agg_entropy: bounded by ln(n_types) and zero only for single-type users") {
    val rows = operators.Aggregates
      .aggEntropy(spark, sf001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, h) =>
      assert(h >= 0.0 && h <= math.log(5) + 1e-9)
      if (n == 1) assert(h == 0.0)
    }
  }

  test("ts_interpolate: observed rows pass through, gaps lie within neighbor range") {
    val rows = operators.Etl
      .tsInterpolate(spark, sf001)
      .collect()
      .map(r =>
        (r.getString(0), r.getTimestamp(1), r.getBoolean(2), r.getDouble(3))
      )
    assert(rows.exists(_._3) && rows.exists(!_._3))
    rows.groupBy(_._1).values.foreach { series =>
      val s = series.sortBy(_._2.getTime)
      s.zipWithIndex.filter(_._1._3).foreach { case ((_, _, _, v), i) =>
        // nearest observed neighbors on each side
        val prev = s.take(i).reverse.find(!_._3).map(_._4)
        val next = s.drop(i + 1).find(!_._3).map(_._4)
        (prev, next) match {
          case (Some(p), Some(n)) =>
            assert(v >= math.min(p, n) - 1e-9 && v <= math.max(p, n) + 1e-9)
          case (None, Some(n)) => assert(v == n)
          case (Some(p), None) => assert(v == p)
          case _               => fail("series with no observations")
        }
      }
    }
  }

  test("etl_fuzzy_match: every dirty record links back to its own entity") {
    val m = operators.Etl
      .etlFuzzyMatch(spark, sf001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getInt(3)))
    val total = Tables.customer(spark, sf001).count()
    assert(m.length == total) // no dirty row lost to blocking
    m.foreach { case (key, matched, dist) =>
      assert(matched == key, s"dirty $key matched $matched")
      assert(dist == (if (key % 3 == 2) 0 else 1))
    }
  }

  test("agg_approx_quantile: rank error within the sketch's 1/accuracy bound") {
    val approx = operators.Aggregates
      .aggApproxQuantile(spark, sf001)
      .collect()
      .map(r =>
        r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      )
      .toMap
    val vals = Tables
      .lineitem(spark, sf001)
      .select("l_returnflag", "l_extendedprice")
      .collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).sorted }
    // percentile_approx(accuracy=10000) guarantees rank error <= n/10000
    approx.foreach { case (flag, (p50, p95, p99)) =>
      val sorted = vals(flag)
      val n = sorted.length
      val tol = math.max(1, n / 10000) + 1
      def rankOf(v: Double): Int = sorted.count(_ <= v)
      assert(math.abs(rankOf(p50) - 0.5 * n) <= tol, s"$flag p50")
      assert(math.abs(rankOf(p95) - 0.95 * n) <= tol, s"$flag p95")
      assert(math.abs(rankOf(p99) - 0.99 * n) <= tol, s"$flag p99")
    }
  }

  test("graph_pagerank: mass is conserved within damping leak, ranks ordered by degree") {
    val pr = text.Dedup
      .graphPagerank(spark, sf001)
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val n = pr.length
    val total = pr.map(_._2).sum
    // with no dangling redistribution total ∈ (0.15, 1]; isolated docs
    // sit at exactly 0.15/N after the first iteration
    assert(total > 0.15 && total <= 1.0 + 1e-9, s"mass $total")
    val floor = BigDecimal(0.15 / n)
      .setScale(8, BigDecimal.RoundingMode.HALF_UP)
      .toDouble
    assert(pr.exists(_._2 == floor), "no isolated vertex at the floor")
    assert(pr.exists(_._2 > floor), "no connected vertex above the floor")
  }

  test("etl_shard_assign: shards are monotone per lang and respect the budget") {
    val rows = operators.Etl
      .etlShardAssign(spark, sf001)
      .collect()
      .map(r => (r.getString(1), r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    rows.groupBy(_._1).values.foreach { perLang =>
      val s = perLang.sortBy(_._2)
      assert(s.head._5 == 0L) // first doc in shard 0
      s.sliding(2).foreach {
        case Array((_, _, _, _, sh1), (_, _, _, _, sh2)) =>
          assert(sh2 == sh1 || sh2 == sh1 + 1 || sh2 > sh1) // monotone
        case _ => ()
      }
      // endpoint binning: a shard covers <= budget of cumulative range,
      // so its char total exceeds the budget by at most one straddling doc
      s.groupBy(_._5).values.foreach { shard =>
        val chars = shard.map(_._3).sum
        assert(
          chars < 20000 + shard.map(_._3).max,
          s"overfull shard $chars"
        )
      }
    }
  }

  test("dedup_containment: directed, thresholded, and consistent with shingle sets") {
    val rows = text.Dedup
      .dedupContainment(spark, sf001)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    assert(rows.nonEmpty)
    assert(rows.map(_._1).distinct.length == rows.length, "duplicate directed pairs")
    rows.foreach { case ((a, b), c) =>
      assert(a != b && c >= 0.8 && c <= 1.0)
    }
    // recompute one pair's containment from raw shingle sets
    val ((a, b), c) = rows.head
    def shingleSet(id: Long): Set[String] = {
      val txt = Tables
        .documents(spark, sf001)
        .filter(col("doc_id") === id)
        .select("text")
        .collect()
        .head
        .getString(0)
      txt.split(" ").sliding(3).map(_.mkString(" ")).toSet
    }
    val (sa, sb) = (shingleSet(a), shingleSet(b))
    val expected = sa.intersect(sb).size.toDouble / sa.size
    assert(math.abs(c - expected) < 5e-5, s"got $c expected $expected")
  }

  test("ts_pattern_seq: matches are adjacent error->purchase within an hour") {
    val m = operators.EventAnalytics.tsPatternSeq(spark, sf001).collect()
    assert(m.nonEmpty)
    val events = Tables
      .events(spark, sf001)
      .select("user_id", "event_id", "event_type", "ts")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getTimestamp(3)))
    val byUser = events.groupBy(_._1).map { case (u, es) =>
      u -> es.sortBy(e => (e._4.getTime, e._2))
    }
    m.foreach { r =>
      val (u, errId, purId, gap) =
        (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4))
      val seq = byUser(u)
      val i = seq.indexWhere(_._2 == errId)
      assert(seq(i)._3 == "error")
      assert(seq(i + 1)._2 == purId && seq(i + 1)._3 == "purchase")
      assert(gap >= 0 && gap <= 3600)
    }
  }
}
