package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.3 Joins (SURVEY.md).
  *
  * Scale posture: equi-joins shuffle on their keys and Catalyst/AQE
  * picks broadcast-hash automatically for dimension tables (nation,
  * region, customer at small SF); `join_broadcast` pins the hint
  * explicitly. The theta/as-of joins keep an equality conjunct
  * (user_id) so Spark plans a sort-merge join with a band condition
  * rather than a cartesian nested-loop — the property that keeps them
  * viable at 100 TB.
  */
object Joins {

  val joinInnerHash: Q = (spark, dir) =>
    Tables
      .orders(spark, dir)
      .join(
        Tables.customer(spark, dir),
        col("o_custkey") === col("c_custkey"),
        "inner"
      )
      .select("o_orderkey", "c_custkey", "c_name", "o_totalprice")
      .orderBy("o_orderkey")

  /** 4-hop star join, TPC-H Q5 shape — revenue per region. The three
    * dimension hops are broadcast by Catalyst; only lineitem⋈orders
    * shuffles. */
  val joinMultiway: Q = (spark, dir) =>
    Tables
      .lineitem(spark, dir)
      .join(
        Tables.orders(spark, dir),
        col("l_orderkey") === col("o_orderkey")
      )
      .join(
        Tables.customer(spark, dir),
        col("o_custkey") === col("c_custkey")
      )
      .join(
        Tables.nation(spark, dir),
        col("c_nationkey") === col("n_nationkey")
      )
      .join(
        Tables.region(spark, dir),
        col("n_regionkey") === col("r_regionkey")
      )
      .groupBy("r_name")
      .agg(
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 0)
          .cast("bigint")
          .as("revenue"),
        count(lit(1)).as("n_items")
      )
      .orderBy("r_name")

  val joinLeftOuter: Q = (spark, dir) =>
    Tables
      .customer(spark, dir)
      .join(
        Tables.orders(spark, dir),
        col("c_custkey") === col("o_custkey"),
        "left"
      )
      .select("c_custkey", "o_orderkey", "o_totalprice")
      .orderBy(col("c_custkey"), col("o_orderkey").asc_nulls_first)

  /** Full outer over two deliberately-offset slices so both sides
    * null-extend. coalesce(c,o) is a total order: matched rows share
    * the key and unmatched keys occur on exactly one side. */
  val joinFullOuter: Q = (spark, dir) => {
    val c = Tables
      .customer(spark, dir)
      .filter(col("c_custkey") <= 700)
      .select("c_custkey", "c_name")
    val o = Tables
      .orders(spark, dir)
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"))
      .filter(col("o_custkey") >= 300)
    c.join(o, col("c_custkey") === col("o_custkey"), "full")
      .select("c_custkey", "c_name", "o_custkey", "n_orders")
      .orderBy(coalesce(col("c_custkey"), col("o_custkey")))
  }

  val joinSemi: Q = (spark, dir) =>
    Tables
      .customer(spark, dir)
      .join(
        Tables.orders(spark, dir),
        col("c_custkey") === col("o_custkey"),
        "left_semi"
      )
      .select("c_custkey", "c_name", "c_acctbal")
      .orderBy("c_custkey")

  /** Absence join against a filtered right side (customers with no
    * high-value order) — every customer has *some* order in this
    * corpus, so the unfiltered anti-join would be vacuously empty. */
  val joinAnti: Q = (spark, dir) =>
    Tables
      .customer(spark, dir)
      .join(
        Tables.orders(spark, dir).filter(col("o_totalprice") > 350000),
        col("c_custkey") === col("o_custkey"),
        "left_anti"
      )
      .select("c_custkey", "c_name", "c_acctbal")
      .orderBy("c_custkey")

  /** Null-aware anti join — SQL NOT IN with a nullable probe column,
    * the three-valued-logic trap: a NULL probe is UNKNOWN against every
    * list element, so those rows are excluded (unlike left_anti on a
    * plain predicate, which keeps them). Expressed through spark.sql so
    * Catalyst plans its dedicated null-aware anti join. */
  val joinNullAwareAnti: Q = (spark, dir) => {
    Tables.customer(spark, dir).createOrReplaceTempView("v_naa_customer")
    Tables.supplier(spark, dir).createOrReplaceTempView("v_naa_supplier")
    spark.sql(
      """SELECT c_custkey, c_name, nullif(c_nationkey, 5) AS nk
        |FROM v_naa_customer
        |WHERE nullif(c_nationkey, 5) NOT IN
        |  (SELECT s_nationkey FROM v_naa_supplier WHERE s_nationkey < 10)
        |ORDER BY c_custkey""".stripMargin
    )
  }

  /** Explicit broadcast hint on the dimension side. */
  val joinBroadcast: Q = (spark, dir) =>
    Tables
      .customer(spark, dir)
      .join(
        broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey")
      )
      .groupBy("n_name")
      .agg(
        count(lit(1)).as("n_cust"),
        round(sum(col("c_acctbal")), 2).as("sum_bal")
      )
      .orderBy("n_name")

  /** Non-equi band join: consecutive-event pairs within one hour for
    * the same user. The user_id equality conjunct keeps this a
    * sort-merge join, not a nested loop. */
  val joinThetaRange: Q = (spark, dir) => {
    val e = Tables.events(spark, dir)
    e.as("a")
      .join(
        e.as("b"),
        expr(
          "a.user_id = b.user_id AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR"
        )
      )
      .select(
        col("a.event_id").as("a_id"),
        col("b.event_id").as("b_id"),
        col("a.user_id").as("user_id"),
        col("a.ts").as("a_ts"),
        col("b.ts").as("b_ts")
      )
      .orderBy("a_id", "b_id")
  }

  /** As-of join — each event matched to the latest order at-or-before
    * its timestamp for that customer. No Spark builtin (SURVEY.md
    * §2.3). Implemented as the union + last(ignoreNulls) window trick:
    * interleave both streams on the per-user timeline, sort once, and
    * carry the most recent order forward. One shuffle on user_id and
    * O(n log n) per user — unlike a range join, the intermediate never
    * multiplies events × orders-per-user, which is what survives a
    * 100× scale-up. Tie policy (verified in OperatorSpec): at equal
    * timestamps the order is visible to the event (at-or-BEFORE is
    * inclusive: is_order sorts first), and among same-date orders the
    * highest o_orderkey wins (sort asc + last). */
  val joinAsof: Q = (spark, dir) => {
    val o = Tables
      .orders(spark, dir)
      .select(
        col("o_custkey").as("user_id"),
        col("o_orderdate").as("t"),
        lit(1).as("is_order"),
        col("o_orderkey"),
        col("o_orderdate"),
        col("o_totalprice"),
        lit(null).cast("bigint").as("event_id"),
        lit(null).cast("timestamp").as("ts")
      )
    val e = Tables
      .events(spark, dir)
      .select(
        col("user_id"),
        col("ts").as("t"),
        lit(0).as("is_order"),
        lit(null).cast("bigint").as("o_orderkey"),
        lit(null).cast("timestamp").as("o_orderdate"),
        lit(null).cast("double").as("o_totalprice"),
        col("event_id"),
        col("ts")
      )
    val w = Window
      .partitionBy("user_id")
      .orderBy(col("t"), col("is_order").desc, col("o_orderkey").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    o.unionByName(e)
      .withColumn("a_orderkey", last("o_orderkey", ignoreNulls = true).over(w))
      .withColumn("a_orderdate", last("o_orderdate", ignoreNulls = true).over(w))
      .withColumn("a_totalprice", last("o_totalprice", ignoreNulls = true).over(w))
      .filter(col("is_order") === 0 && col("a_orderkey").isNotNull)
      .select(
        col("event_id"),
        col("user_id"),
        col("ts"),
        col("a_orderkey").as("o_orderkey"),
        col("a_orderdate").as("o_orderdate"),
        col("a_totalprice").as("o_totalprice")
      )
      .orderBy("event_id")
  }

  /** Forward as-of join — the other `merge_asof` direction: each error
    * event picks the same user's FIRST purchase at-or-after it (time to
    * recovery/conversion after a failure — unlike ts_pattern_seq this
    * looks past intervening events). Same single-shuffle
    * interleave-and-sort shape as [[joinAsof]], with the carry running
    * backward (`first(…, ignoreNulls)` over
    * [CURRENT ROW, UNBOUNDED FOLLOWING]). Tie policy: a purchase at the
    * exact error timestamp is visible (probes sort before quotes at
    * equal t, so it lands inside the forward frame), and among
    * equal-time purchases the lowest event_id wins. */
  val joinAsofFwd: Q = (spark, dir) => {
    val ev = Tables.events(spark, dir)
    val probe = ev
      .filter(col("event_type") === "error")
      .select(
        col("user_id"),
        col("ts").as("t"),
        lit(0).as("is_quote"),
        col("event_id").as("error_id"),
        col("ts").as("error_ts"),
        lit(null).cast("bigint").as("p_id"),
        lit(null).cast("timestamp").as("p_ts"),
        lit(null).cast("double").as("p_value")
      )
    val quote = ev
      .filter(col("event_type") === "purchase")
      .select(
        col("user_id"),
        col("ts").as("t"),
        lit(1).as("is_quote"),
        lit(null).cast("bigint").as("error_id"),
        lit(null).cast("timestamp").as("error_ts"),
        col("event_id").as("p_id"),
        col("ts").as("p_ts"),
        col("value").as("p_value")
      )
    val w = Window
      .partitionBy("user_id")
      .orderBy(col("t"), col("is_quote"), col("p_id").asc_nulls_first)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    probe
      .unionByName(quote)
      .withColumn("n_id", first("p_id", ignoreNulls = true).over(w))
      .withColumn("n_ts", first("p_ts", ignoreNulls = true).over(w))
      .withColumn("n_value", first("p_value", ignoreNulls = true).over(w))
      .filter(col("is_quote") === 0 && col("n_id").isNotNull)
      .select(
        col("error_id"),
        col("user_id"),
        col("error_ts"),
        col("n_id").as("purchase_id"),
        col("n_ts").as("purchase_ts"),
        col("n_value").as("purchase_value"),
        expr("(unix_micros(n_ts) - unix_micros(error_ts)) div 1000000")
          .as("recovery_seconds")
      )
      .orderBy("error_id")
  }

  private val joinAsofFwdSql =
    """WITH u AS (
      |  SELECT user_id, ts AS t, 0 AS is_quote, event_id AS error_id,
      |         ts AS error_ts, CAST(NULL AS BIGINT) AS p_id,
      |         CAST(NULL AS TIMESTAMP) AS p_ts, CAST(NULL AS DOUBLE) AS p_value
      |  FROM events WHERE event_type = 'error'
      |  UNION ALL
      |  SELECT user_id, ts, 1, NULL, NULL, event_id, ts, value
      |  FROM events WHERE event_type = 'purchase'),
      |c AS (
      |  SELECT *,
      |   first_value(p_id IGNORE NULLS) OVER w AS n_id,
      |   first_value(p_ts IGNORE NULLS) OVER w AS n_ts,
      |   first_value(p_value IGNORE NULLS) OVER w AS n_value
      |  FROM u
      |  WINDOW w AS (PARTITION BY user_id
      |               ORDER BY t, is_quote, p_id NULLS FIRST
      |               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
      |SELECT error_id, user_id, error_ts, n_id AS purchase_id,
      |       n_ts AS purchase_ts, n_value AS purchase_value,
      |       (epoch_us(n_ts) - epoch_us(error_ts)) // 1000000
      |         AS recovery_seconds
      |FROM c WHERE is_quote = 0 AND n_id IS NOT NULL
      |ORDER BY error_id""".stripMargin

  /** Nearest as-of join — the third `merge_asof` direction: each error
    * event picks the same user's CLOSEST purchase in either time
    * direction. Both carries come out of ONE interleave-and-sort (the
    * [[joinAsof]] shape): a backward `last(…) ignoreNulls` frame and a
    * forward `first(…) ignoreNulls` frame over the same window sort —
    * still a single shuffle on user_id. Tie policy (mirrored in the
    * oracle): equal distance prefers backward, and an exact-timestamp
    * purchase counts as backward (quotes sort before probes at equal
    * t, so only the backward frame sees them — distance 0 wins
    * regardless). */
  val joinAsofNearest: Q = (spark, dir) => {
    val ev = Tables.events(spark, dir)
    val probe = ev
      .filter(col("event_type") === "error")
      .select(
        col("user_id"),
        col("ts").as("t"),
        lit(0).as("is_quote"),
        col("event_id").as("error_id"),
        col("ts").as("error_ts"),
        lit(null).cast("bigint").as("p_id"),
        lit(null).cast("timestamp").as("p_ts")
      )
    val quote = ev
      .filter(col("event_type") === "purchase")
      .select(
        col("user_id"),
        col("ts").as("t"),
        lit(1).as("is_quote"),
        lit(null).cast("bigint").as("error_id"),
        lit(null).cast("timestamp").as("error_ts"),
        col("event_id").as("p_id"),
        col("ts").as("p_ts")
      )
    val sorted = Window
      .partitionBy("user_id")
      .orderBy(col("t"), col("is_quote").desc, col("p_id").asc_nulls_first)
    val wb = sorted.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = sorted.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    probe
      .unionByName(quote)
      .withColumn("b_id", last("p_id", ignoreNulls = true).over(wb))
      .withColumn("b_ts", last("p_ts", ignoreNulls = true).over(wb))
      .withColumn("f_id", first("p_id", ignoreNulls = true).over(wf))
      .withColumn("f_ts", first("p_ts", ignoreNulls = true).over(wf))
      .filter(col("is_quote") === 0)
      .withColumn("b_gap", expr("unix_micros(error_ts) - unix_micros(b_ts)"))
      .withColumn("f_gap", expr("unix_micros(f_ts) - unix_micros(error_ts)"))
      .withColumn(
        "use_fwd",
        col("f_id").isNotNull &&
          (col("b_id").isNull || col("f_gap") < col("b_gap"))
      )
      .filter(col("b_id").isNotNull || col("f_id").isNotNull)
      .withColumn("gap", when(col("use_fwd"), col("f_gap")).otherwise(col("b_gap")))
      .select(
        col("error_id"),
        col("user_id"),
        col("error_ts"),
        when(col("use_fwd"), col("f_id")).otherwise(col("b_id")).as("purchase_id"),
        when(col("use_fwd"), col("f_ts")).otherwise(col("b_ts")).as("purchase_ts"),
        when(col("use_fwd"), lit("fwd")).otherwise(lit("bwd")).as("direction"),
        expr("gap div 1000000").as("gap_seconds")
      )
      .orderBy("error_id")
  }

  private val joinAsofNearestSql =
    """WITH u AS (
      |  SELECT user_id, ts AS t, 0 AS is_quote, event_id AS error_id,
      |         ts AS error_ts, CAST(NULL AS BIGINT) AS p_id,
      |         CAST(NULL AS TIMESTAMP) AS p_ts
      |  FROM events WHERE event_type = 'error'
      |  UNION ALL
      |  SELECT user_id, ts, 1, NULL, NULL, event_id, ts
      |  FROM events WHERE event_type = 'purchase'),
      |c AS (
      |  SELECT *,
      |   last_value(p_id IGNORE NULLS) OVER wb AS b_id,
      |   last_value(p_ts IGNORE NULLS) OVER wb AS b_ts,
      |   first_value(p_id IGNORE NULLS) OVER wf AS f_id,
      |   first_value(p_ts IGNORE NULLS) OVER wf AS f_ts
      |  FROM u
      |  WINDOW wb AS (PARTITION BY user_id
      |                ORDER BY t, is_quote DESC, p_id NULLS FIRST
      |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |         wf AS (PARTITION BY user_id
      |                ORDER BY t, is_quote DESC, p_id NULLS FIRST
      |                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
      |g AS (
      |  SELECT *,
      |   epoch_us(error_ts) - epoch_us(b_ts) AS b_gap,
      |   epoch_us(f_ts) - epoch_us(error_ts) AS f_gap,
      |   f_id IS NOT NULL AND (b_id IS NULL OR
      |     epoch_us(f_ts) - epoch_us(error_ts)
      |       < epoch_us(error_ts) - epoch_us(b_ts)) AS use_fwd
      |  FROM c WHERE is_quote = 0)
      |SELECT error_id, user_id, error_ts,
      | CASE WHEN use_fwd THEN f_id ELSE b_id END AS purchase_id,
      | CASE WHEN use_fwd THEN f_ts ELSE b_ts END AS purchase_ts,
      | CASE WHEN use_fwd THEN 'fwd' ELSE 'bwd' END AS direction,
      | CAST((CASE WHEN use_fwd THEN f_gap ELSE b_gap END) // 1000000
      |      AS BIGINT) AS gap_seconds
      |FROM g WHERE b_id IS NOT NULL OR f_id IS NOT NULL
      |ORDER BY error_id""".stripMargin

  /** Bucketed co-located join: both sides pre-bucketed on the join key
    * (8 buckets) and read back through the catalog, so the join needs
    * NO shuffle of either side — the storage-layout answer to repeated
    * large joins at 100 TB (PlanShapeSpec asserts the missing
    * Exchange). */
  val joinBucketed: Q = (spark, dir) => {
    val base = s"${sys.props("java.io.tmpdir")}/graft_io/bucketed"
    Tables
      .orders(spark, dir)
      .write
      .mode("overwrite")
      .option("path", s"$base/orders_b")
      .bucketBy(8, "o_custkey")
      .sortBy("o_custkey")
      .saveAsTable("graft_orders_b")
    Tables
      .customer(spark, dir)
      .write
      .mode("overwrite")
      .option("path", s"$base/customer_b")
      .bucketBy(8, "c_custkey")
      .sortBy("c_custkey")
      .saveAsTable("graft_customer_b")
    spark
      .table("graft_orders_b")
      .join(
        spark.table("graft_customer_b"),
        col("o_custkey") === col("c_custkey")
      )
      .groupBy("c_mktsegment")
      .agg(
        count(lit(1)).as("n_orders"),
        round(sum("o_totalprice"), 0).cast("bigint").as("revenue")
      )
      .orderBy("c_mktsegment")
  }

  /** Manually salted join — the skew mitigation when one key dominates:
    * the big side carries a deterministic salt, the small side is
    * replicated across all salt values, and the join key becomes
    * (key, salt) so a hot key spreads over 8 tasks. (AQE's skew-join
    * split is the first resort; explicit salting is the portable
    * fallback.) Result is identical to the unsalted join — the oracle
    * is the plain SQL join. */
  val joinSalted: Q = (spark, dir) => {
    val l = Tables
      .lineitem(spark, dir)
      .withColumn("s1", pmod(col("l_linenumber"), lit(8)))
    val o = Tables
      .orders(spark, dir)
      .withColumn("s2", explode(sequence(lit(0), lit(7))))
    l.join(o, col("l_orderkey") === col("o_orderkey") && col("s1") === col("s2"))
      .groupBy("o_orderpriority")
      .agg(
        count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 0)
          .cast("bigint")
          .as("revenue")
      )
      .orderBy("o_orderpriority")
  }

  /** Explicit cartesian product of the two tiny dimensions. */
  val joinCross: Q = (spark, dir) =>
    Tables
      .region(spark, dir)
      .crossJoin(Tables.nation(spark, dir))
      .select("r_regionkey", "r_name", "n_nationkey", "n_name")
      .orderBy("r_regionkey", "n_nationkey")

  /** Binned interval join — the scale path for a PURE range predicate
    * (no equality conjunct): all event pairs ≤ 60 s apart, across ALL
    * users. Written naively that predicate is a BroadcastNestedLoopJoin
    * (O(n·m) comparisons); here each left row probes the two 1-minute
    * bins its match window can overlap (`explode` of [bin, bin+1]), the
    * join runs as a plain equi hash join on the bin key, and the exact
    * interval predicate re-filters the bin collisions. A pair lands in
    * exactly one (probe-bin, build-bin) combination, so no dedup is
    * needed. Bin width = window width keeps the fan-out at 2 probes per
    * row at any data size; the plan is asserted NLJ-free in
    * PlanShapeSpec. */
  val joinRangeBinned: Q = (spark, dir) => {
    val e = Tables.events(spark, dir)
    val probes = e
      .select(
        col("event_id").as("a_id"),
        col("ts").as("a_ts"),
        expr("unix_micros(ts) div 60000000").as("b0")
      )
      .select(
        col("a_id"),
        col("a_ts"),
        explode(expr("array(b0, b0 + 1)")).as("bin")
      )
    val build = e.select(
      col("event_id").as("b_id"),
      col("ts").as("b_ts"),
      expr("unix_micros(ts) div 60000000").as("bin")
    )
    probes
      .join(build, Seq("bin"))
      .filter(
        col("b_ts") > col("a_ts") &&
          col("b_ts") <= expr("a_ts + INTERVAL 1 MINUTE")
      )
      .select(
        col("a_id"),
        col("b_id"),
        expr("CAST(unix_micros(b_ts) - unix_micros(a_ts) AS BIGINT)").as("gap_us")
      )
      .orderBy("a_id", "b_id")
  }

  private val joinRangeBinnedSql =
    """SELECT a.event_id AS a_id, b.event_id AS b_id,
      | epoch_us(b.ts) - epoch_us(a.ts) AS gap_us
      |FROM events a JOIN events b
      | ON b.ts > a.ts AND b.ts <= a.ts + INTERVAL 1 MINUTE
      |ORDER BY a_id, b_id""".stripMargin

  /** SPATIAL radius join via grid-cell binning (round 11 cont.), the
    * canonical distributed spatial-join shape. Points live on an
    * integer 1000×1000 grid (coordinates derived deterministically
    * from the keys, so the oracle is integer-exact — no float libm
    * seam); the query finds every (customer, supplier) pair within
    * Euclidean distance 5. The naive plan is a cartesian product; here
    * each point maps to a radius-sized grid CELL, the smaller side
    * replicates to its 3×3 cell neighborhood (bounded ×9 fan-out,
    * broadcast-joined when small), and the join becomes an EQUI-join
    * on the cell with the exact distance predicate as a residual —
    * each pair meets at most once because the probe's cell is unique,
    * so no dedup pass. Pinned inline: the plan contains NO cartesian
    * or nested-loop join. At 100 TB this is one shuffle keyed by cell;
    * skewed cells fall out of AQE like any other equi-join skew. */
  val joinGeoGrid: Q = (spark, dir) => {
    val cell = 5
    val c = Tables
      .customer(spark, dir)
      .select(
        col("c_custkey"),
        (col("c_custkey") % 1000).as("x"),
        ((col("c_custkey") * 7) % 1000).as("y"))
      .withColumn("cx", col("x") / cell cast "long")
      .withColumn("cy", col("y") / cell cast "long")
    val offsets = array(
      (for { i <- -1 to 1; j <- -1 to 1 }
        yield struct(lit(i.toLong).as("di"), lit(j.toLong).as("dj"))): _*)
    val s = Tables
      .supplier(spark, dir)
      .select(
        col("s_suppkey"),
        (col("s_suppkey") % 1000).as("sx"),
        ((col("s_suppkey") * 13) % 1000).as("sy"))
      .withColumn("o", explode(offsets))
      .withColumn("cx", (col("sx") / cell cast "long") + col("o.di"))
      .withColumn("cy", (col("sy") / cell cast "long") + col("o.dj"))
      .drop("o")
    val d2 = (col("x") - col("sx")) * (col("x") - col("sx")) +
      (col("y") - col("sy")) * (col("y") - col("sy"))
    val out = c
      .join(s, Seq("cx", "cy"))
      .filter(d2 <= cell * cell)
      .select(col("c_custkey"), col("s_suppkey"), d2.cast("long").as("d2"))
      .orderBy("c_custkey", "s_suppkey")
    val plan = out.queryExecution.executedPlan.toString
    require(
      !plan.contains("CartesianProduct") && !plan.contains("NestedLoop"),
      s"the grid join must never fall back to a cartesian plan: $plan")
    out
  }

  private val joinGeoGridSql =
    """WITH c AS (SELECT c_custkey, c_custkey % 1000 AS x,
      |                  (c_custkey * 7) % 1000 AS y FROM customer),
      |     s AS (SELECT s_suppkey, s_suppkey % 1000 AS sx,
      |                  (s_suppkey * 13) % 1000 AS sy FROM supplier)
      |SELECT c.c_custkey, s.s_suppkey,
      |       (c.x - s.sx) * (c.x - s.sx) + (c.y - s.sy) * (c.y - s.sy) AS d2
      |FROM c, s
      |WHERE (c.x - s.sx) * (c.x - s.sx) + (c.y - s.sy) * (c.y - s.sy) <= 25
      |ORDER BY c_custkey, s_suppkey""".stripMargin

  /** Interval-overlap join, NLJ-free: per-(user, day) activity spans
    * [min ts, max ts] against a daily audit window (10:30–14:45,
    * half-open). The naive plan is a nested-loop over the raw overlap
    * predicate `s < we AND e >= ws`; instead BOTH interval sides
    * explode into the hour bins they cover — bounded fan-out: a span
    * covers ≤24 bins, the window 5 — and the join becomes an EQUI-join
    * on the bin with the exact predicate as a residual filter, then a
    * distinct to collapse multi-bin matches. At 100 TB this is one
    * shuffle on the bin key (or map-side if the window side
    * broadcasts); the nested loop never exists. Oracle joins on the
    * raw predicate directly — same pairs, hash-proven. */
  val joinIntervalOverlap: Q = (spark, dir) => {
    val spans = Tables
      .events(spark, dir)
      .groupBy(col("user_id"), to_date(col("ts")).as("sday"))
      .agg(min("ts").as("s"), max("ts").as("e"))
    val wins = spans
      .select(col("sday").as("day"))
      .distinct()
      .select(
        col("day"),
        (col("day").cast("timestamp") + expr("INTERVAL '10:30' HOUR TO MINUTE")).as("ws"),
        (col("day").cast("timestamp") + expr("INTERVAL '14:45' HOUR TO MINUTE")).as("we")
      )
    val spanBins = spans.withColumn(
      "bin",
      explode(expr("sequence(date_trunc('hour', s), date_trunc('hour', e), INTERVAL 1 HOUR)"))
    )
    val winBins = wins.withColumn(
      "bin",
      explode(
        expr(
          "sequence(date_trunc('hour', ws)," +
            " date_trunc('hour', we - INTERVAL 1 MICROSECOND), INTERVAL 1 HOUR)"
        )
      )
    )
    spanBins
      .join(
        winBins,
        spanBins("bin") === winBins("bin") &&
          col("s") < col("we") && col("e") >= col("ws")
      )
      .select(col("day"), col("user_id"), col("sday"))
      .distinct()
      .groupBy("day")
      .agg(count(lit(1)).as("n_overlap"))
      .orderBy("day")
  }

  private val joinIntervalOverlapSql =
    """WITH spans AS (
      |  SELECT user_id, CAST(ts AS DATE) AS sday, min(ts) AS s, max(ts) AS e
      |  FROM events GROUP BY 1, 2),
      |wins AS (
      |  SELECT DISTINCT sday AS day,
      |   CAST(sday AS TIMESTAMP) + INTERVAL '10 hours 30 minutes' AS ws,
      |   CAST(sday AS TIMESTAMP) + INTERVAL '14 hours 45 minutes' AS we
      |  FROM spans)
      |SELECT w.day, CAST(count(*) AS BIGINT) AS n_overlap
      |FROM wins w JOIN spans p ON p.s < w.we AND p.e >= w.ws
      |GROUP BY 1 ORDER BY day""".stripMargin

  val queries: Map[String, Q] = Map(
    "join_interval_overlap" -> joinIntervalOverlap,
    "join_range_binned" -> joinRangeBinned,
    "join_geo_grid" -> joinGeoGrid,
    "join_cross" -> joinCross,
    "join_bucketed" -> joinBucketed,
    "join_salted" -> joinSalted,
    "join_inner_hash" -> joinInnerHash,
    "join_multiway" -> joinMultiway,
    "join_left_outer" -> joinLeftOuter,
    "join_full_outer" -> joinFullOuter,
    "join_semi" -> joinSemi,
    "join_anti" -> joinAnti,
    "join_null_aware_anti" -> joinNullAwareAnti,
    "join_broadcast" -> joinBroadcast,
    "join_theta_range" -> joinThetaRange,
    "join_asof" -> joinAsof,
    "join_asof_fwd" -> joinAsofFwd,
    "join_asof_nearest" -> joinAsofNearest
  )

  val oracles: Map[String, String] = Map(
    "join_interval_overlap" -> joinIntervalOverlapSql,
    "join_geo_grid" -> joinGeoGridSql,
    "join_asof_fwd" -> joinAsofFwdSql,
    "join_asof_nearest" -> joinAsofNearestSql,
    "join_range_binned" -> joinRangeBinnedSql,
    "join_cross" ->
      """SELECT r_regionkey, r_name, n_nationkey, n_name
        |FROM region CROSS JOIN nation
        |ORDER BY r_regionkey, n_nationkey""".stripMargin,
    "join_bucketed" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        | CAST(round(sum(o_totalprice),0) AS BIGINT) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "join_salted" ->
      """SELECT o_orderpriority, count(*) AS n_items,
        | CAST(round(sum(l_extendedprice*(1-l_discount)),0) AS BIGINT) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "join_inner_hash" ->
      """SELECT o_orderkey, c_custkey, c_name, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,
    "join_multiway" ->
      """SELECT r_name,
        | CAST(round(sum(l_extendedprice*(1-l_discount)),0) AS BIGINT) AS revenue,
        | count(*) AS n_items
        |FROM lineitem
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "join_left_outer" ->
      """SELECT c_custkey, o_orderkey, o_totalprice
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |ORDER BY c_custkey, o_orderkey NULLS FIRST""".stripMargin,
    "join_full_outer" ->
      """SELECT c.c_custkey, c.c_name, o.o_custkey, o.n_orders
        |FROM (SELECT c_custkey, c_name FROM customer WHERE c_custkey <= 700) c
        |FULL OUTER JOIN (
        |  SELECT o_custkey, count(*) AS n_orders FROM orders
        |  GROUP BY o_custkey HAVING o_custkey >= 300) o
        |ON c.c_custkey = o.o_custkey
        |ORDER BY coalesce(c.c_custkey, o.o_custkey)""".stripMargin,
    "join_semi" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "join_null_aware_anti" ->
      """SELECT c_custkey, c_name, nullif(c_nationkey, 5) AS nk
        |FROM customer
        |WHERE nullif(c_nationkey, 5) NOT IN
        |  (SELECT s_nationkey FROM supplier WHERE s_nationkey < 10)
        |ORDER BY c_custkey""".stripMargin,
    "join_anti" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 350000)
        |ORDER BY c_custkey""".stripMargin,
    "join_broadcast" ->
      """SELECT n_name, count(*) AS n_cust, round(sum(c_acctbal),2) AS sum_bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "join_theta_range" ->
      """SELECT a.event_id AS a_id, b.event_id AS b_id,
        | a.user_id AS user_id, a.ts AS a_ts, b.ts AS b_ts
        |FROM events a JOIN events b
        | ON a.user_id = b.user_id AND b.ts > a.ts
        |  AND b.ts <= a.ts + INTERVAL 1 HOUR
        |ORDER BY a_id, b_id""".stripMargin,
    "join_asof" ->
      """SELECT event_id, user_id, ts, o_orderkey, o_orderdate, o_totalprice
        |FROM (
        |  SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_orderdate,
        |         o.o_totalprice,
        |         row_number() OVER (PARTITION BY e.event_id
        |           ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        |  FROM events e JOIN orders o
        |    ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts) t
        |WHERE rn = 1 ORDER BY event_id""".stripMargin
  )
}
