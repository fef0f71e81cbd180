package graft

import org.apache.spark.sql.functions._

/** Semantic checks for the round-6 additions beyond the DuckDB parity
  * gate.
  */
class Round6Spec extends SparkTestBase {

  import spark.implicits._

  test("applyMapping: required-null reasons fire before domain checks, in declared order") {
    val src = Seq(
      (1L, "ok", 10.0),
      (2L, null.asInstanceOf[String], 10.0), // required name missing
      (3L, "ok", 999.0), // domain breach
      (4L, null.asInstanceOf[String], 999.0) // both: required wins
    ).toDF("id", "name", "amount")
    val out = operators.Etl
      .applyMapping(
        src,
        Seq(
          operators.Etl.FieldMap("ref", "cast(id as string)", "string", required = true),
          operators.Etl.FieldMap("nm", "upper(name)", "string", required = true),
          operators.Etl.FieldMap("cents", "round(amount * 100, 0)", "bigint")
        ),
        Seq(("amount_out_of_range", "cents > 50000"))
      )
      .collect()
      .map(r => r.getAs[String]("ref") -> r.getAs[String]("reject_reason"))
      .toMap
    assert(out("1") == null)
    assert(out("2") == "missing_nm")
    assert(out("3") == "amount_out_of_range")
    assert(out("4") == "missing_nm", "required checks precede domain checks")
  }

  test("applyMapping marks valid rows and keeps one row per input") {
    val out = operators.Etl.etlMappingDsl(spark, sf0001)
    val n = Tables.orders(spark, sf0001).count()
    assert(out.count() == n, "mapping must not drop rows — routing is the caller's job")
    val split = out.groupBy("valid").count().collect().map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    assert(split.getOrElse(true, 0L) > 0 && split.getOrElse(false, 0L) > 0,
      s"expected both valid and quarantined rows, got $split")
  }

  test("5-gram decontamination flags a subset of the 3-gram audit (precision, not drift)") {
    val flag3 = text.Dedup.dedupDecontaminate(spark, sf0001)
      .select("doc_id").as[Long].collect().toSet
    val flag5 = text.Dedup.dedupDecontaminate5g(spark, sf0001)
      .select("doc_id").as[Long].collect().toSet
    assert(flag5.nonEmpty, "5-gram audit must gate something on this corpus")
    assert(flag5.subsetOf(flag3),
      s"a shared 5-gram implies shared 3-grams: ${flag5 -- flag3} flagged only at 5g")
    assert(flag5.size < flag3.size, "longer spans must flag strictly fewer docs here")
  }

  test("sim_ann_join returns exactly top-10 per probe with descending scores") {
    functions.GraftFunctions.register(spark)
    val rows = sim.Similarity.simAnnJoin(spark, sf0001).collect()
    val byProbe = rows.groupBy(_.getLong(0))
    assert(byProbe.size == 20, s"expected 20 probes, got ${byProbe.size}")
    byProbe.foreach { case (pid, rs) =>
      assert(rs.length == 10, s"probe $pid: ${rs.length} rows")
      val cos = rs.sortBy(_.getInt(4)).map(_.getDouble(3))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b },
        s"probe $pid scores not descending by rank")
      assert(!rs.exists(_.getLong(1) == pid), s"probe $pid matched itself")
    }
  }

  test("alternating-star CC collapses a 64-node chain to one component (the long-chain case)") {
    // a path graph is the worst case for min-label propagation
    // (diameter rounds); the star contraction must still land every
    // node on the component minimum within its 15-round budget
    val chain = (0L until 63L).map(i => (i, i + 1)).toDF("u", "v")
    val star = text.Dedup.alternatingStarCc(chain)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (1L until 64L).foreach { n =>
      assert(star.get(n).contains(0L), s"node $n labeled ${star.get(n)}, want 0")
    }
    assert(!star.contains(0L), "the component minimum labels itself")
    // and two disjoint chains stay separate
    val two = ((0L until 9L).map(i => (i, i + 1)) ++ (100L until 109L).map(i => (i, i + 1)))
      .toDF("u", "v")
    val star2 = text.Dedup.alternatingStarCc(two)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 9L).forall(n => star2(n) == 0L))
    assert((101L to 109L).forall(n => star2(n) == 100L))
  }

  test("alternating-star CC agrees with union-find on random graphs") {
    def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val p = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (p(r) != r) r = p(r); r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) p(math.max(ra, rb)) = math.min(ra, rb)
      }
      // path-compress to component minima (union always roots the min)
      (0 until n).map(i => i.toLong -> find(i).toLong).toMap
    }
    for (seed <- Seq(1, 7, 42)) {
      val rnd = new scala.util.Random(seed)
      val n = 24
      val edges = Seq.fill(20)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
        .distinct
      val expect = unionFind(n, edges)
      val star = text.Dedup
        .alternatingStarCc(edges.toDF("u", "v"))
        .collect()
        .map(r => r.getLong(0) -> r.getLong(1))
        .toMap
      (0L until n.toLong).foreach { v =>
        val got = star.getOrElse(v, v) // absent = labels itself
        assert(got == expect(v), s"seed $seed node $v: star=$got uf=${expect(v)}")
      }
    }
  }

  test("6-round peel is the exact 2-core when it converges, and honestly bounded when not") {
    // triangle {0,1,2} with a 3-node pendant chain: converges in 3
    // rounds — 6-round peel == true 2-core == the triangle
    def sym(edges: Seq[(Long, Long)]) =
      (edges ++ edges.map(_.swap)).toDF("u", "v")
    val short = sym(Seq((0L, 1L), (1L, 2L), (2L, 0L), (2L, 3L), (3L, 4L), (4L, 5L)))
    val core6 = text.Dedup.peelToCore(short, 6)
      .select("u").distinct().as[Long].collect().toSet
    assert(core6 == Set(0L, 1L, 2L), s"got $core6")
    // triangle with a 9-edge pendant chain: 6 rounds peel only 6 chain
    // nodes — the k-peel bound is real; 12 rounds finish the job
    val chain = (2L until 11L).map(i => (i, i + 1))
    val long = sym(Seq((0L, 1L), (1L, 2L), (2L, 0L)) ++ chain)
    val bounded = text.Dedup.peelToCore(long, 6)
      .select("u").distinct().as[Long].collect().toSet
    assert(bounded.size > 3, "a >6-edge pendant chain must not fully peel in 6 rounds")
    val converged = text.Dedup.peelToCore(long, 12)
      .select("u").distinct().as[Long].collect().toSet
    assert(converged == Set(0L, 1L, 2L), s"got $converged")
  }

  test("fixed-width round trip is byte-exact against the source table") {
    val back = operators.Scans.sourceFixedWidth(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val orig = Tables.nation(spark, sf0001)
      .select(col("n_nationkey").cast("long"), col("n_name"), col("n_regionkey").cast("long"))
      .orderBy("n_nationkey")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(back == orig)
  }
}
