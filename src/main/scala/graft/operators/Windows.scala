package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.5 Window functions (SURVEY.md).
  *
  * Every window ORDER BY carries a unique tiebreak key so ranks and
  * frames are total-order deterministic across engines. Ranking is
  * done over integer-rounded revenue, not raw doubles, so ties are
  * exact on both sides. Windows partition by their natural key
  * (customer/user/brand) — at 100 TB each partition's state is small
  * and the single shuffle is on the partition key.
  */
object Windows {

  /** Top-3 parts by revenue per brand: ranking + filter. */
  val winRankTopk: Q = (spark, dir) => {
    val rev = Tables
      .lineitem(spark, dir)
      .join(Tables.part(spark, dir), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_partkey")
      .agg(
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 0)
          .cast("bigint")
          .as("revenue")
      )
    val w = Window
      .partitionBy("p_brand")
      .orderBy(col("revenue").desc, col("p_partkey"))
    rev
      .withColumn("rn", row_number().over(w))
      .withColumn("dr", dense_rank().over(w))
      .filter(col("rn") <= 3)
      .select("p_brand", "p_partkey", "revenue", "rn", "dr")
      .orderBy("p_brand", "rn")
  }

  /** Running sum + 3-row moving average of order totals per customer. */
  val winRunning: Q = (spark, dir) => {
    val w = Window
      .partitionBy("o_custkey")
      .orderBy("o_orderdate", "o_orderkey")
    Tables
      .orders(spark, dir)
      .select(
        col("o_orderkey"),
        col("o_custkey"),
        col("o_orderdate"),
        round(
          sum("o_totalprice")
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
          2
        ).as("run_sum"),
        round(avg("o_totalprice").over(w.rowsBetween(-2, 0)), 4).as("mov_avg")
      )
      .orderBy("o_custkey", "o_orderdate", "o_orderkey")
  }

  /** Per-user event deltas via lag/lead. Time deltas in integer
    * microseconds (unix_micros/epoch_us) — second-truncating casts
    * round differently across engines. */
  val winLagLead: Q = (spark, dir) => {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables
      .events(spark, dir)
      .select(
        col("event_id"),
        col("user_id"),
        col("ts"),
        col("value"),
        lag("value", 1).over(w).as("prev_val"),
        (col("value") - lag("value", 1).over(w)).as("delta"),
        (unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
          .as("delta_us"),
        lead("event_type", 1).over(w).as("next_type")
      )
      .orderBy("event_id")
  }

  /** Quartiles / distribution functions over account balances —
    * WITHOUT the single-partition `Window.orderBy` anti-pattern (an
    * unpartitioned window serializes every row through one task; Spark
    * itself warns `WindowExec: No Partition Defined`). Instead the
    * global rank comes from [[TwoPhase.prefixScan]] (the
    * etl_global_ids scheme): per-partition COUNTS prefix-summed into
    * rank offsets. ntile/cume_dist/percent_rank are then pure
    * arithmetic on (rank, n): the ordering key (c_acctbal, c_custkey)
    * is unique, so cume_dist = r/n and percent_rank = (r-1)/(n-1)
    * exactly as the window functions define them, and ntile uses the
    * standard first-(n mod k)-buckets-get-one-extra fill. Same oracle
    * as the window formulation; no task ever sees more than its range
    * slice. */
  val winNtileCume: Q = (spark, dir) => {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val in = Tables.customer(spark, dir).select("c_custkey", "c_acctbal")
    // carry the input's own field types (a DecimalType acctbal — the
    // usual TPC-H shape — must round-trip untouched, not assume Double)
    val outSchema = StructType(
      in.schema.fields.toSeq ++ Seq(
        StructField("nt", IntegerType, nullable = false),
        StructField("cd", DoubleType, nullable = false),
        StructField("pr", DoubleType, nullable = false)
      )
    )
    val k = 4L
    TwoPhase
      .prefixScan(
        in,
        8,
        Seq(col("c_acctbal"), col("c_custkey")),
        0L
      )(it => it.size.toLong)(_ + _)(outSchema) { (offset, n, it) =>
        val base = n / k
        val rem = n % k
        val pivot = rem * (base + 1) // rows in the first `rem` (larger) buckets
        var r = offset
        it.map { row =>
          r += 1
          val nt =
            if (rem > 0 && r <= pivot) (r - 1) / (base + 1) + 1
            else rem + (r - pivot - 1) / base + 1
          Row(
            row.get(0),
            row.get(1),
            nt.toInt,
            r.toDouble / n.toDouble,
            (r - 1).toDouble / (n - 1).toDouble
          )
        }
      }
      .orderBy("c_custkey")
  }

  /** 7-day trailing revenue per day: RANGE frame over epoch seconds. */
  val winRangeFrame: Q = (spark, dir) => {
    val daily = Tables
      .orders(spark, dir)
      .groupBy(
        date_trunc("day", col("o_orderdate")).cast("date").as("day"),
        unix_timestamp(date_trunc("day", col("o_orderdate"))).as("epoch_s")
      )
      .agg(sum("o_totalprice").as("day_rev"))
    daily
      .select(
        col("day"),
        round(col("day_rev"), 2).as("day_rev"),
        round(
          sum("day_rev").over(
            Window.orderBy("epoch_s").rangeBetween(-6L * 86400, 0)
          ),
          2
        ).as("trail7")
      )
      .orderBy("day")
  }

  /** 7-day rolling MEDIAN of daily revenue — the robust trend line a
    * dashboard plots beside the trailing sum (win_range_frame). Exact
    * `percentile` as a window aggregate over ROWS 6 PRECEDING; daily
    * revenue is rounded to the 2dp grid FIRST so both engines
    * interpolate identical inputs, and the median of 2dp values lies
    * on the 0.005 grid, so the 4dp output round can never sit on a
    * cross-engine half boundary. The window runs over the bounded
    * daily series (the corpus-sized work is the preceding aggregate). */
  val winRollingMedian: Q = (spark, dir) => {
    val daily = Tables
      .orders(spark, dir)
      .groupBy(date_trunc("day", col("o_orderdate")).cast("date").as("day"))
      .agg(round(sum("o_totalprice"), 2).as("day_rev"))
    val w = Window.orderBy("day").rowsBetween(-6, 0)
    daily
      .select(
        col("day"),
        col("day_rev"),
        round(expr("percentile(day_rev, 0.5)").over(w), 4).as("med7")
      )
      .orderBy("day")
  }

  private val winRollingMedianSql =
    """WITH d AS (
      |  SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
      |   round(sum(o_totalprice), 2) AS day_rev
      |  FROM orders GROUP BY 1)
      |SELECT day, day_rev,
      | round(quantile_cont(day_rev, 0.5) OVER (ORDER BY day
      |   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS med7
      |FROM d ORDER BY day""".stripMargin

  /** first_value / last_value / nth_value family per customer. */
  val winFirstLast: Q = (spark, dir) => {
    val wRun = Window
      .partitionBy("o_custkey")
      .orderBy("o_orderdate", "o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window
      .partitionBy("o_custkey")
      .orderBy("o_orderdate", "o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables
      .orders(spark, dir)
      .select(
        col("o_orderkey"),
        col("o_custkey"),
        first("o_orderkey").over(wRun).as("first_key"),
        last("o_orderkey").over(wAll).as("last_key"),
        nth_value(col("o_orderkey"), 2).over(wAll).as("second_key")
      )
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Relative-position window family: dense_rank (no gaps), percent_rank
    * ((rank−1)/(n−1)), and cume_dist per customer over order value. The
    * ordering key is made unique (totalprice, orderkey) so every rank
    * function is deterministic; percent_rank is rounded at 6dp — its
    * values are rationals with the group size in the denominator, which
    * never land on a decimal half boundary. */
  val winDensePercent: Q = (spark, dir) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window
      .partitionBy("o_custkey")
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables
      .orders(spark, dir)
      .select(
        col("o_custkey"),
        col("o_orderkey"),
        dense_rank().over(w).as("drank"),
        round(percent_rank().over(w), 6).as("prank"),
        round(cume_dist().over(w), 6).as("cdist")
      )
      .orderBy("o_custkey", "o_orderkey")
  }

  private val winDensePercentSql =
    """SELECT o_custkey, o_orderkey,
      | dense_rank() OVER w AS drank,
      | round(percent_rank() OVER w, 6) AS prank,
      | round(cume_dist() OVER w, 6) AS cdist
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** Top-5 lineitems per returnflag through the CUSTOM physical
    * operator (graft.plans.TopKPerGroup): logical node → strategy →
    * partial/final bounded-heap SparkPlans. Unlike winRankTopk's
    * window formulation, only ≤ k·groups rows per input partition
    * reach the exchange. The order is total (price DESC, then the
    * lineitem key), so the selection is deterministic and the
    * row_number oracle matches exactly. */
  val winTopkExec: Q = (spark, dir) => {
    val li = Tables
      .lineitem(spark, dir)
      .select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice")
    graft.plans.TopKPerGroup
      .topKPerGroup(
        li,
        Seq("l_returnflag"),
        Seq(
          ("l_extendedprice", false),
          ("l_orderkey", true),
          ("l_linenumber", true)
        ),
        5
      )
      .orderBy(
        col("l_returnflag"),
        col("l_extendedprice").desc,
        col("l_orderkey"),
        col("l_linenumber")
      )
  }

  private val winTopkExecSql =
    """SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice FROM (
      |  SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
      |   row_number() OVER (PARTITION BY l_returnflag
      |     ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
      |  FROM lineitem) t
      |WHERE rn <= 5
      |ORDER BY l_returnflag, l_extendedprice DESC, l_orderkey, l_linenumber""".stripMargin

  /** Running DISTINCT count per user over event time — not directly
    * expressible as a window aggregate (COUNT(DISTINCT) OVER is
    * unsupported in both engines), so it composes two windows on the
    * SAME (user_id) partitioning: a first-occurrence flag from
    * row_number over (user, event_type), then a running sum of flags
    * over the event-time order. One shuffle total; the standard
    * cumulative-cardinality feature at any scale. */
  val winCumDistinct: Q = (spark, dir) => {
    import org.apache.spark.sql.expressions.Window
    val firstSeen = Window
      .partitionBy("user_id", "event_type")
      .orderBy("ts", "event_id")
    val running = Window
      .partitionBy("user_id")
      .orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    graft.Tables
      .events(spark, dir)
      .select("user_id", "event_id", "event_type", "ts")
      .withColumn(
        "first_flag",
        when(row_number().over(firstSeen) === 1, 1L).otherwise(0L)
      )
      .withColumn("distinct_types_so_far", sum("first_flag").over(running))
      .select("user_id", "event_id", "event_type", "distinct_types_so_far")
      .orderBy("event_id")
  }

  private val winCumDistinctSql =
    """WITH f AS (
      |  SELECT user_id, event_id, event_type, ts,
      |   CASE WHEN row_number() OVER (PARTITION BY user_id, event_type
      |                                ORDER BY ts, event_id) = 1
      |        THEN 1 ELSE 0 END AS first_flag
      |  FROM events)
      |SELECT user_id, event_id, event_type,
      | CAST(sum(first_flag) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |   AS distinct_types_so_far
      |FROM f
      |ORDER BY event_id""".stripMargin

  val queries: Map[String, Q] = Map(
    "win_cum_distinct" -> winCumDistinct,
    "win_topk_exec" -> winTopkExec,
    "win_dense_percent" -> winDensePercent,
    "win_first_last" -> winFirstLast,
    "win_rank_topk_per_group" -> winRankTopk,
    "win_running" -> winRunning,
    "win_lag_lead" -> winLagLead,
    "win_ntile_cume" -> winNtileCume,
    "win_range_frame" -> winRangeFrame,
    "win_rolling_median" -> winRollingMedian
  )

  val oracles: Map[String, String] = Map(
    "win_cum_distinct" -> winCumDistinctSql,
    "win_topk_exec" -> winTopkExecSql,
    "win_dense_percent" -> winDensePercentSql,
    "win_first_last" ->
      """SELECT o_orderkey, o_custkey,
        | first_value(o_orderkey) OVER (PARTITION BY o_custkey
        |   ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_key,
        | last_value(o_orderkey) OVER (PARTITION BY o_custkey
        |   ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_key,
        | nth_value(o_orderkey, 2) OVER (PARTITION BY o_custkey
        |   ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_key
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "win_rank_topk_per_group" ->
      """WITH pr AS (
        |  SELECT p_brand, p_partkey,
        |   CAST(round(sum(l_extendedprice*(1-l_discount)),0) AS BIGINT) AS revenue
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY p_brand, p_partkey)
        |SELECT p_brand, p_partkey, revenue, rn, dr FROM (
        |  SELECT p_brand, p_partkey, revenue,
        |   row_number() OVER w AS rn, dense_rank() OVER w AS dr
        |  FROM pr WINDOW w AS (PARTITION BY p_brand ORDER BY revenue DESC, p_partkey)) t
        |WHERE rn <= 3 ORDER BY p_brand, rn""".stripMargin,
    "win_running" ->
      """SELECT o_orderkey, o_custkey, o_orderdate,
        | round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |   ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),2) AS run_sum,
        | round(avg(o_totalprice) OVER (PARTITION BY o_custkey
        |   ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),4) AS mov_avg
        |FROM orders ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,
    "win_lag_lead" ->
      """SELECT event_id, user_id, ts, value,
        | lag(value) OVER w AS prev_val,
        | value - lag(value) OVER w AS delta,
        | epoch_us(ts) - lag(epoch_us(ts)) OVER w AS delta_us,
        | lead(event_type) OVER w AS next_type
        |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin,
    "win_ntile_cume" ->
      """SELECT c_custkey, c_acctbal,
        | ntile(4) OVER w AS nt, cume_dist() OVER w AS cd,
        | percent_rank() OVER w AS pr
        |FROM customer WINDOW w AS (ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "win_range_frame" ->
      """WITH d AS (
        |  SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
        |   CAST(epoch(date_trunc('day', o_orderdate)) AS BIGINT) AS epoch_s,
        |   sum(o_totalprice) AS day_rev
        |  FROM orders GROUP BY 1, 2)
        |SELECT day, round(day_rev,2) AS day_rev,
        | round(sum(day_rev) OVER (ORDER BY epoch_s
        |   RANGE BETWEEN 518400 PRECEDING AND CURRENT ROW),2) AS trail7
        |FROM d ORDER BY day""".stripMargin,
    "win_rolling_median" -> winRollingMedianSql
  )
}
