package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-sequence analytics — funnel conversion, cohort retention,
  * gap-based sessionization, and adjacent-event pattern matching over
  * the `events` stream-shaped table [INFERRED, SURVEY.md §0: the
  * reference's event-log query family].
  *
  * Scale posture: every operator here keys its shuffles on `user_id`
  * only. After the first exchange the per-user slices are independent,
  * so a 1000-executor run partitions by user and never re-shuffles on a
  * wider key; no operator materializes anything proportional to the
  * corpus on the driver. Window functions use per-user frames (bounded
  * by a user's own event count), never a global ORDER BY.
  */
object EventAnalytics {

  /** Ordered funnel signup → click → purchase: a user counts for a
    * stage only if that stage's event happens strictly AFTER their
    * entry into the previous stage (first-touch semantics: min ts per
    * stage). Three co-partitioned aggregates on user_id — the stage
    * frames shrink monotonically, and each join key is the same
    * user_id, so AQE reuses the exchange; output is 3 rows at any
    * scale. */
  val tsFunnel: Q = (spark, dir) => {
    val e = Tables.events(spark, dir).select("user_id", "event_type", "ts")
    val signup = e
      .filter(col("event_type") === "signup")
      .groupBy("user_id")
      .agg(min("ts").as("signup_ts"))
    val click = e
      .filter(col("event_type") === "click")
      .join(signup, "user_id")
      .filter(col("ts") > col("signup_ts"))
      .groupBy("user_id")
      .agg(min("ts").as("click_ts"))
    val purchase = e
      .filter(col("event_type") === "purchase")
      .join(click, "user_id")
      .filter(col("ts") > col("click_ts"))
      .groupBy("user_id")
      .agg(min("ts").as("purchase_ts"))
    def stage(ord: Int, name: String, df: org.apache.spark.sql.DataFrame) =
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(ord).as("stage_ord"), lit(name).as("stage"), col("n_users"))
    stage(1, "signup", signup)
      .unionByName(stage(2, "click_after_signup", click))
      .unionByName(stage(3, "purchase_after_click", purchase))
      .orderBy("stage_ord")
  }

  private val tsFunnelSql =
    """WITH s AS (SELECT user_id, min(ts) AS st FROM events
      |           WHERE event_type = 'signup' GROUP BY 1),
      |c AS (SELECT e.user_id, min(e.ts) AS ct FROM events e
      |      JOIN s ON e.user_id = s.user_id
      |      WHERE e.event_type = 'click' AND e.ts > s.st GROUP BY 1),
      |p AS (SELECT e.user_id, min(e.ts) AS pt FROM events e
      |      JOIN c ON e.user_id = c.user_id
      |      WHERE e.event_type = 'purchase' AND e.ts > c.ct GROUP BY 1)
      |SELECT * FROM (
      |  SELECT 1 AS stage_ord, 'signup' AS stage,
      |         CAST(count(*) AS BIGINT) AS n_users FROM s
      |  UNION ALL
      |  SELECT 2, 'click_after_signup', CAST(count(*) AS BIGINT) FROM c
      |  UNION ALL
      |  SELECT 3, 'purchase_after_click', CAST(count(*) AS BIGINT) FROM p) u
      |ORDER BY stage_ord""".stripMargin

  /** Cohort retention: cohort = calendar day of a user's first event;
    * n_active = distinct users of that cohort seen again at each day
    * offset. One aggregate builds the (small, user-cardinality) cohort
    * map, re-joined on user_id, then a count-distinct keyed by
    * (cohort_day, offset) — bounded by days², not events. */
  val tsRetention: Q = (spark, dir) => {
    val e = Tables.events(spark, dir)
    val first = e
      .groupBy("user_id")
      .agg(min(to_date(col("ts"))).as("cohort_day"))
    e.join(first, "user_id")
      .select(
        col("cohort_day"),
        datediff(to_date(col("ts")), col("cohort_day")).cast("long").as("day_offset"),
        col("user_id")
      )
      .groupBy("cohort_day", "day_offset")
      .agg(countDistinct("user_id").as("n_active"))
      .orderBy("cohort_day", "day_offset")
  }

  private val tsRetentionSql =
    """WITH f AS (SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
      |           FROM events GROUP BY 1)
      |SELECT f.cohort_day,
      | date_diff('day', f.cohort_day, CAST(e.ts AS DATE)) AS day_offset,
      | CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_active
      |FROM events e JOIN f ON e.user_id = f.user_id
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  /** Batch sessionization (gaps-and-islands): a >30-minute silence
    * starts a new session; sessions are numbered per user by a running
    * sum of session-start flags. Two window passes over the SAME
    * (user_id)-partitioned sort — one shuffle total — then one
    * aggregate keyed by (user_id, session_id). The strict `>` on the
    * gap mirrors Spark's `session_window` merge rule (SURVEY.md §5). */
  val tsSessionize: Q = (spark, dir) => {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables
      .events(spark, dir)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn(
        "new_sess",
        when(
          col("prev_us").isNull ||
            unix_micros(col("ts")) - col("prev_us") > 1800L * 1000000L,
          1L
        ).otherwise(0L)
      )
      .withColumn(
        "session_id",
        sum("new_sess").over(byUser.rowsBetween(Window.unboundedPreceding, 0))
      )
      .groupBy("user_id", "session_id")
      .agg(
        min("ts").as("session_start"),
        max("ts").as("session_end"),
        count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("sum_value")
      )
      .orderBy("user_id", "session_id")
  }

  private val tsSessionizeSql =
    """WITH flagged AS (
      |  SELECT user_id, event_id, ts, value,
      |   CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
      |          OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
      |        THEN 1 ELSE 0 END AS new_sess
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sessed AS (
      |  SELECT user_id, ts, value,
      |   CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |     AS session_id
      |  FROM flagged)
      |SELECT user_id, session_id, min(ts) AS session_start,
      | max(ts) AS session_end, CAST(count(*) AS BIGINT) AS n_events,
      | round(sum(value), 2) AS sum_value
      |FROM sessed GROUP BY 1, 2
      |ORDER BY user_id, session_id""".stripMargin

  /** Adjacent-event pattern detection (MATCH_RECOGNIZE-lite): an
    * `error` whose very next event for the same user is a `purchase`
    * within one hour. One lead() pass over the per-user sort — the
    * same single shuffle as sessionization — then a row-local
    * predicate; no self-join. */
  val tsPatternSeq: Q = (spark, dir) => {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables
      .events(spark, dir)
      .select("user_id", "event_id", "event_type", "ts")
      .withColumn("next_type", lead("event_type", 1).over(byUser))
      .withColumn("next_id", lead("event_id", 1).over(byUser))
      .withColumn("next_ts", lead("ts", 1).over(byUser))
      .filter(
        col("event_type") === "error" && col("next_type") === "purchase" &&
          unix_micros(col("next_ts")) - unix_micros(col("ts")) <= 3600L * 1000000L
      )
      .select(
        col("user_id"),
        col("event_id").as("error_id"),
        col("ts").as("error_ts"),
        col("next_id").as("purchase_id"),
        expr("(unix_micros(next_ts) - unix_micros(ts)) div 1000000")
          .as("gap_seconds")
      )
      .orderBy("error_id")
  }

  private val tsPatternSeqSql =
    """WITH seq AS (
      |  SELECT user_id, event_id, event_type, ts,
      |   lead(event_type) OVER w AS next_type,
      |   lead(event_id) OVER w AS next_id,
      |   lead(epoch_us(ts)) OVER w AS next_us
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      |SELECT user_id, event_id AS error_id, ts AS error_ts,
      | next_id AS purchase_id,
      | (next_us - epoch_us(ts)) // 1000000 AS gap_seconds
      |FROM seq
      |WHERE event_type = 'error' AND next_type = 'purchase'
      |  AND next_us - epoch_us(ts) <= 3600000000
      |ORDER BY error_id""".stripMargin

  /** Longest consecutive-day purchase streak per user (gaps-and-islands
    * on the calendar): distinct purchase days, then `epoch_day - rn` as
    * the island key — constant within a run of consecutive days. Two
    * shuffles, both on user_id (the distinct and the window share the
    * key); ties on streak length resolve to the earliest start for a
    * deterministic one-row-per-user answer. */
  val tsStreaks: Q = (spark, dir) => {
    val byUser = Window.partitionBy("user_id").orderBy("day")
    val days = Tables
      .events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val streaks = days
      .withColumn("grp", unix_date(col("day")) - row_number().over(byUser))
      .groupBy("user_id", "grp")
      .agg(count(lit(1)).as("streak_len"), min("day").as("streak_start"))
    streaks
      .withColumn(
        "rn",
        row_number().over(
          Window
            .partitionBy("user_id")
            .orderBy(col("streak_len").desc, col("streak_start"))
        )
      )
      .filter(col("rn") === 1)
      .select("user_id", "streak_len", "streak_start")
      .orderBy("user_id")
  }

  private val tsStreaksSql =
    """WITH days AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
      |  FROM events WHERE event_type = 'purchase'),
      |grps AS (
      |  SELECT user_id, day,
      |   date_diff('day', DATE '1970-01-01', day)
      |     - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
      |  FROM days),
      |streaks AS (
      |  SELECT user_id, grp, CAST(count(*) AS BIGINT) AS streak_len,
      |         min(day) AS streak_start
      |  FROM grps GROUP BY 1, 2),
      |ranked AS (
      |  SELECT user_id, streak_len, streak_start,
      |   row_number() OVER (PARTITION BY user_id
      |                      ORDER BY streak_len DESC, streak_start) AS rn
      |  FROM streaks)
      |SELECT user_id, streak_len, streak_start
      |FROM ranked WHERE rn = 1
      |ORDER BY user_id""".stripMargin

  /** [[tsSessionize]] through the custom `Sessionize` physical
    * operator (graft.plans.Sessionize): the two window passes (lag +
    * running sum) collapse into one O(1)-state streamed pass over the
    * same single user_id exchange, and the per-session aggregate
    * reuses that exchange. Output — and oracle — are identical to the
    * window-idiom twin; PlanShapeSpec pins the plan shape
    * (SessionizeExec present, exactly one hash exchange). */
  val tsSessionizeExec: Q = (spark, dir) => {
    val sess = graft.plans.Sessionize.sessionize(
      Tables.events(spark, dir),
      "user_id",
      "ts",
      Seq("event_id"),
      1800L * 1000000L
    )
    sess
      .groupBy("user_id", "session_id")
      .agg(
        min("ts").as("session_start"),
        max("ts").as("session_end"),
        count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("sum_value")
      )
      .orderBy("user_id", "session_id")
  }

  /** OHLC downsampling to 5-minute bars per event_type — the classic
    * time-series resample. open/close are `min_by`/`max_by` keyed on
    * `event_id` (unique, event-time-ordered in this corpus), NOT on
    * `ts`: duplicate timestamps inside a bar would make a ts-keyed
    * first/last nondeterministic across engines. One hash aggregate
    * keyed by (bar, event_type) — map-side combine does the heavy
    * lifting, output is bounded by time-range/5min × |event_type| at
    * any corpus size. */
  val tsResample: Q = (spark, dir) =>
    Tables
      .events(spark, dir)
      .groupBy(window(col("ts"), "5 minutes").as("w"), col("event_type"))
      .agg(
        min_by(col("value"), col("event_id")).as("open"),
        max("value").as("high"),
        min("value").as("low"),
        max_by(col("value"), col("event_id")).as("close"),
        count(lit(1)).as("n"),
        round(sum("value"), 4).as("sum_val")
      )
      .select(
        col("w.start").as("bar"),
        col("event_type"),
        col("open"),
        col("high"),
        col("low"),
        col("close"),
        col("n"),
        col("sum_val")
      )
      .orderBy("bar", "event_type")

  private val tsResampleSql =
    """SELECT time_bucket(INTERVAL '5 minutes', ts) AS bar, event_type,
      | arg_min(value, event_id) AS open,
      | max(value) AS high, min(value) AS low,
      | arg_max(value, event_id) AS close,
      | CAST(count(*) AS BIGINT) AS n,
      | round(sum(value), 4) AS sum_val
      |FROM events GROUP BY 1, 2 ORDER BY bar, event_type""".stripMargin

  /** Z-score anomaly flags: an event is anomalous if its value is more
    * than 3 sample-stddevs from its event_type's mean. The per-type
    * stats table is |event_type| rows — broadcast back onto the fact
    * side, so the corpus is scanned twice but never shuffled on a wide
    * key. The 3σ comparison is done on raw doubles: mean/std drift
    * between engines is ~1e-12 relative (order of summation), far from
    * any realistic boundary; the reported z is rounded to 4dp. */
  val tsAnomaly: Q = (spark, dir) => {
    val e = Tables.events(spark, dir)
    val stats = e
      .groupBy("event_type")
      .agg(avg("value").as("mu"), stddev_samp("value").as("sigma"))
    e.join(broadcast(stats), "event_type")
      .filter(abs(col("value") - col("mu")) > lit(3.0) * col("sigma"))
      .select(
        col("event_id"),
        col("event_type"),
        col("value"),
        round((col("value") - col("mu")) / col("sigma"), 4).as("z")
      )
      .orderBy("event_id")
  }

  private val tsAnomalySql =
    """WITH s AS (
      |  SELECT event_type, avg(value) AS mu, stddev_samp(value) AS sigma
      |  FROM events GROUP BY 1)
      |SELECT e.event_id, e.event_type, e.value,
      | round((e.value - s.mu) / s.sigma, 4) AS z
      |FROM events e JOIN s ON e.event_type = s.event_type
      |WHERE abs(e.value - s.mu) > 3.0 * s.sigma
      |ORDER BY e.event_id""".stripMargin

  /** Week-over-week growth: weekly counts per event_type (Monday-start
    * weeks — Spark and DuckDB `date_trunc('week', …)` agree) with a
    * lag-based percent delta. Output is bounded by weeks × types; the
    * growth division is int/int in float64, exact before the 4dp
    * round. */
  val tsWowGrowth: Q = (spark, dir) => {
    val wk = Window.partitionBy("event_type").orderBy("week")
    Tables
      .events(spark, dir)
      .groupBy(to_date(date_trunc("week", col("ts"))).as("week"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("prev_cnt", lag("cnt", 1).over(wk))
      .withColumn(
        "wow_pct",
        round((col("cnt") - col("prev_cnt")) / col("prev_cnt") * 100, 4)
      )
      .orderBy("week", "event_type")
  }

  private val tsWowGrowthSql =
    """WITH w AS (
      |  SELECT CAST(date_trunc('week', ts) AS DATE) AS week, event_type,
      |         CAST(count(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY 1, 2)
      |SELECT week, event_type, cnt,
      | lag(cnt) OVER (PARTITION BY event_type ORDER BY week) AS prev_cnt,
      | round((cnt - lag(cnt) OVER (PARTITION BY event_type ORDER BY week))
      |       / lag(cnt) OVER (PARTITION BY event_type ORDER BY week) * 100, 4)
      |   AS wow_pct
      |FROM w ORDER BY week, event_type""".stripMargin

  /** 24-hour rolling correlation between hourly purchase revenue and
    * hourly click traffic — the metric-coupling signal an integration
    * dashboard tracks. The unpartitioned window is safe at any corpus
    * size: it runs over the HOURLY series, whose row count is bounded
    * by the time range (the corpus-sized work is the preceding hash
    * aggregate with map-side combine). The hourly series is built first (both inputs
    * rounded to the 4dp grid so the two engines correlate IDENTICAL
    * numbers — order-of-summation drift dies at the round), then
    * `corr` runs as a window aggregate over ROWS 23 PRECEDING.
    * Undefined frames (constant series, n<2) surface as NULL on both
    * sides: Spark's NaN is mapped through nullif-style guard. */
  val tsRollingCorr: Q = (spark, dir) => {
    val w24 = Window.orderBy("hour").rowsBetween(-23, 0)
    val hourly = Tables
      .events(spark, dir)
      .groupBy(date_trunc("hour", col("ts")).as("hour"))
      .agg(
        round(
          sum(when(col("event_type") === "purchase", col("value")).otherwise(0.0)),
          4
        ).as("purch_val"),
        count(when(col("event_type") === "click", lit(1))).as("click_cnt")
      )
    // explicit moment formula instead of corr(): (a) Spark 4 ANSI corr
    // raises DIVIDE_BY_ZERO on zero-variance frames, and (b) mirroring
    // the exact same expression in the oracle removes any dependence on
    // either engine's internal corr algorithm. Degenerate frames (n=1,
    // constant integer click counts, all-zero purchase hours) cancel
    // EXACTLY in float64 on both sides, so the vx/vy > 0 guard can't
    // disagree across engines.
    val x = col("purch_val")
    val y = col("click_cnt").cast("double")
    hourly
      .withColumn("n", count(lit(1)).over(w24).cast("double"))
      .withColumn("sx", sum(x).over(w24))
      .withColumn("sy", sum(y).over(w24))
      .withColumn("sxx", sum(x * x).over(w24))
      .withColumn("syy", sum(y * y).over(w24))
      .withColumn("sxy", sum(x * y).over(w24))
      .withColumn("vx", col("n") * col("sxx") - col("sx") * col("sx"))
      .withColumn("vy", col("n") * col("syy") - col("sy") * col("sy"))
      .select(
        col("hour"),
        col("purch_val"),
        col("click_cnt"),
        round(
          when(
            col("vx") > 0 && col("vy") > 0,
            (col("n") * col("sxy") - col("sx") * col("sy")) /
              sqrt(col("vx") * col("vy"))
          ),
          6
        ).as("corr_24h")
      )
      .orderBy("hour")
  }

  private val tsRollingCorrSql =
    """WITH h AS (
      |  SELECT date_trunc('hour', ts) AS hour,
      |   round(sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END), 4)
      |     AS purch_val,
      |   CAST(count(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT)
      |     AS click_cnt
      |  FROM events GROUP BY 1),
      |m AS (
      |  SELECT hour, purch_val, click_cnt,
      |   CAST(count(*) OVER w AS DOUBLE) AS n,
      |   sum(purch_val) OVER w AS sx,
      |   sum(CAST(click_cnt AS DOUBLE)) OVER w AS sy,
      |   sum(purch_val * purch_val) OVER w AS sxx,
      |   sum(CAST(click_cnt AS DOUBLE) * CAST(click_cnt AS DOUBLE)) OVER w AS syy,
      |   sum(purch_val * CAST(click_cnt AS DOUBLE)) OVER w AS sxy
      |  FROM h
      |  WINDOW w AS (ORDER BY hour ROWS BETWEEN 23 PRECEDING AND CURRENT ROW))
      |SELECT hour, purch_val, click_cnt,
      | round(CASE WHEN n*sxx - sx*sx > 0 AND n*syy - sy*sy > 0
      |   THEN (n*sxy - sx*sy) / sqrt((n*sxx - sx*sx) * (n*syy - sy*sy))
      |   END, 6) AS corr_24h
      |FROM m ORDER BY hour""".stripMargin

  /** Day-of-week × hour activity matrix — the seasonality heatmap an
    * event dashboard always draws. One aggregate on a 7×24-bounded key
    * space: partial aggregation collapses everything map-side, the
    * reduce side is ≤168 rows at any corpus size. Spark dayofweek is
    * 1=Sunday..7; DuckDB's is 0=Sunday..6, offset in the oracle. */
  val tsDowHour: Q = (spark, dir) =>
    Tables
      .events(spark, dir)
      .groupBy(dayofweek(col("ts")).as("dow"), hour(col("ts")).as("hr"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_val"))
      .orderBy("dow", "hr")

  private val tsDowHourSql =
    """SELECT dayofweek(ts) + 1 AS dow, hour(ts) AS hr,
      | count(*) AS n, round(sum(value), 4) AS sum_val
      |FROM events GROUP BY 1, 2 ORDER BY dow, hr""".stripMargin

  /** Exponentially weighted trailing revenue (α = 0.5, 8-day horizon)
    * per order priority. The recursive EWMA definition is re-expressed
    * as its closed finite-horizon form — each source day contributes
    * to the next 8 output days with weight 0.5^j — so the whole thing
    * is one bounded explode + one keyed aggregate instead of a
    * sequential scan: the scale shape a per-key recursion can never
    * have. Normalizing by the sum of PRESENT weights handles calendar
    * gaps deterministically. Numeric parity: daily revenue is rounded
    * to the 2dp grid first (both engines then weight IDENTICAL
    * numbers), the weights 0.5^j are exact in binary, and the final
    * 4dp round sits far above the summation-order noise floor. */
  val tsEwma: Q = (spark, dir) => {
    val daily = Tables
      .orders(spark, dir)
      .groupBy(
        col("o_orderpriority").as("prio"),
        to_date(date_trunc("day", col("o_orderdate"))).as("day")
      )
      .agg(round(sum("o_totalprice"), 2).as("rev"))
    val contrib = daily
      .select(col("prio"), col("day"), col("rev"), explode(expr("sequence(0, 7)")).as("j"))
      .select(
        col("prio"),
        date_add(col("day"), col("j")).as("day"),
        (col("rev") * pow(lit(0.5), col("j"))).as("wrev"),
        pow(lit(0.5), col("j")).as("w")
      )
      .groupBy("prio", "day")
      .agg(sum("wrev").as("num"), sum("w").as("den"))
    daily
      .join(contrib, Seq("prio", "day"))
      .select(
        col("prio"),
        col("day"),
        col("rev"),
        round(col("num") / col("den"), 4).as("ewma")
      )
      .orderBy("prio", "day")
  }

  private val tsEwmaSql =
    """WITH daily AS (
      |  SELECT o_orderpriority AS prio, CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
      |         round(sum(o_totalprice), 2) AS rev
      |  FROM orders GROUP BY 1, 2),
      |contrib AS (
      |  SELECT prio, day + CAST(j AS INTEGER) AS day,
      |         rev * power(0.5, j) AS wrev, power(0.5, j) AS w
      |  FROM daily, unnest(range(0, 8)) AS u(j)),
      |e AS (SELECT prio, day, sum(wrev) AS num, sum(w) AS den
      |      FROM contrib GROUP BY 1, 2)
      |SELECT d.prio, d.day, d.rev, round(e.num / e.den, 4) AS ewma
      |FROM daily d JOIN e USING (prio, day)
      |ORDER BY prio, day""".stripMargin

  /** CUSUM change detection over the per-type daily value series. The
    * textbook one-sided CUSUM `S_t = max(0, S_{t-1} + dev_t)` is a
    * sequential recursion; it is re-expressed through the identity
    * `S_t = P_t − min_{i≤t} P_i` (P = running prefix sum of
    * deviations), which needs only two running-frame window aggregates
    * — window-expressible in BOTH engines and partitioned on
    * event_type over the bounded DAILY series (the corpus-sized work
    * is the preceding hash aggregate). The min is clamped to 0 — the
    * EMPTY prefix P_0 = 0 participates, exactly as the recursion's
    * S_0 = 0 does (without the clamp the two diverge whenever the
    * series opens with positive deviations; Round7Spec pins the
    * identity against a sequential fold). Breach threshold = 2σ of the
    * per-type daily values, computed from the same 2dp-grid series so
    * the flag comparison is engine-stable. */
  val tsCusum: Q = (spark, dir) => {
    val daily = Tables
      .events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(round(sum("value"), 2).as("x"))
    // sd via the explicit moment formula over the 2dp-gridded x, not
    // each engine's own stddev_samp recurrence (round-8 advice): both
    // engines then derive the breach threshold from the same sums, so
    // the 4dp rounding boundary in the boolean can't flip on internal
    // algorithm differences (the ts_rolling_corr pattern).
    val stats = daily
      .groupBy("event_type")
      .agg(
        avg("x").as("mu"),
        count(lit(1)).cast("double").as("n_d"),
        sum("x").as("sx"),
        sum(col("x") * col("x")).as("sxx")
      )
      .withColumn(
        "sd",
        sqrt(
          (col("n_d") * col("sxx") - col("sx") * col("sx")) /
            (col("n_d") * (col("n_d") - 1))
        )
      )
      .select("event_type", "mu", "sd")
    val run = Window
      .partitionBy("event_type")
      .orderBy("day")
      .rowsBetween(Window.unboundedPreceding, 0)
    daily
      .join(broadcast(stats), "event_type")
      .withColumn("p", sum(col("x") - col("mu")).over(run))
      .withColumn("cusum", round(col("p") - least(min("p").over(run), lit(0.0)), 4))
      .select(
        col("event_type"),
        col("day"),
        col("x"),
        col("cusum"),
        (col("cusum") > round(lit(2.0) * col("sd"), 4)).as("breach")
      )
      .orderBy("event_type", "day")
  }

  private val tsCusumSql =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, round(sum(value), 2) AS x
      |  FROM events GROUP BY 1, 2),
      |s AS (SELECT event_type, avg(x) AS mu,
      |      sqrt((count(*) * sum(x*x) - sum(x) * sum(x))
      |           / (count(*) * (count(*) - 1.0))) AS sd
      |      FROM daily GROUP BY 1),
      |p AS (
      |  SELECT d.event_type, d.day, d.x, s.sd,
      |   sum(d.x - s.mu) OVER w AS p
      |  FROM daily d JOIN s USING (event_type)
      |  WINDOW w AS (PARTITION BY d.event_type ORDER BY d.day
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |SELECT event_type, day, x,
      | round(p - least(min(p) OVER w, 0.0), 4) AS cusum,
      | round(p - least(min(p) OVER w, 0.0), 4) > round(2.0 * sd, 4) AS breach
      |FROM p
      |WINDOW w AS (PARTITION BY event_type ORDER BY day
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY event_type, day""".stripMargin

  /** Lag-1..7 autocorrelation of the per-type daily value series — the
    * seasonality detector (a weekly cycle surfaces as an ACF peak at
    * lag 7). Lag pairs come from ONE bounded explode (each day joins
    * its 7 successors through an equi-join on the lagged date), and
    * the correlation uses the same explicit moment formula as
    * ts_rolling_corr so neither engine's internal corr algorithm is in
    * the hash. Daily sums land on the 2dp grid first; the reduce side
    * is |types| × 7 rows at any scale. */
  val tsAutocorr: Q = (spark, dir) => {
    val daily = Tables
      .events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(round(sum("value"), 2).as("x"))
    val pairs = daily
      .withColumn("k", explode(expr("sequence(1, 7)")))
      .select(
        col("event_type"),
        date_add(col("day"), col("k")).as("day"),
        col("k"),
        col("x").as("xlag")
      )
      .join(daily, Seq("event_type", "day"))
    val vx = col("n") * col("sxx") - col("sx") * col("sx")
    val vy = col("n") * col("syy") - col("sy") * col("sy")
    pairs
      .groupBy("event_type", "k")
      .agg(
        count(lit(1)).cast("double").as("n"),
        sum("xlag").as("sx"),
        sum("x").as("sy"),
        sum(col("xlag") * col("xlag")).as("sxx"),
        sum(col("x") * col("x")).as("syy"),
        sum(col("xlag") * col("x")).as("sxy")
      )
      .select(
        col("event_type"),
        col("k"),
        col("n").cast("long").as("n_pairs"),
        round(
          when(
            vx > 0 && vy > 0,
            (col("n") * col("sxy") - col("sx") * col("sy")) / sqrt(vx * vy)
          ),
          6
        ).as("acf")
      )
      .orderBy("event_type", "k")
  }

  private val tsAutocorrSql =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, round(sum(value), 2) AS x
      |  FROM events GROUP BY 1, 2),
      |pr AS (
      |  SELECT d1.event_type, u.k, d1.x AS xlag, d2.x AS x
      |  FROM daily d1
      |  CROSS JOIN unnest(range(1, 8)) AS u(k)
      |  JOIN daily d2 ON d2.event_type = d1.event_type
      |   AND d2.day = d1.day + CAST(u.k AS INTEGER)),
      |m AS (
      |  SELECT event_type, k, CAST(count(*) AS DOUBLE) AS n,
      |   sum(xlag) AS sx, sum(x) AS sy, sum(xlag*xlag) AS sxx,
      |   sum(x*x) AS syy, sum(xlag*x) AS sxy
      |  FROM pr GROUP BY 1, 2)
      |SELECT event_type, CAST(k AS INTEGER) AS k, CAST(n AS BIGINT) AS n_pairs,
      | round(CASE WHEN n*sxx - sx*sx > 0 AND n*syy - sy*sy > 0
      |   THEN (n*sxy - sx*sy) / sqrt((n*sxx - sx*sx) * (n*syy - sy*sy))
      |   END, 6) AS acf
      |FROM m ORDER BY event_type, k""".stripMargin

  val queries: Map[String, Q] = Map(
    "ts_autocorr" -> tsAutocorr,
    "ts_ewma" -> tsEwma,
    "ts_cusum" -> tsCusum,
    "ts_dow_hour" -> tsDowHour,
    "ts_wow_growth" -> tsWowGrowth,
    "ts_rolling_corr" -> tsRollingCorr,
    "ts_streaks" -> tsStreaks,
    "ts_funnel" -> tsFunnel,
    "ts_retention" -> tsRetention,
    "ts_sessionize" -> tsSessionize,
    "ts_sessionize_exec" -> tsSessionizeExec,
    "ts_pattern_seq" -> tsPatternSeq,
    "ts_resample" -> tsResample,
    "ts_anomaly" -> tsAnomaly
  )

  val oracles: Map[String, String] = Map(
    "ts_autocorr" -> tsAutocorrSql,
    "ts_ewma" -> tsEwmaSql,
    "ts_cusum" -> tsCusumSql,
    "ts_dow_hour" -> tsDowHourSql,
    "ts_wow_growth" -> tsWowGrowthSql,
    "ts_rolling_corr" -> tsRollingCorrSql,
    "ts_streaks" -> tsStreaksSql,
    "ts_funnel" -> tsFunnelSql,
    "ts_retention" -> tsRetentionSql,
    "ts_sessionize" -> tsSessionizeSql,
    // the fused-operator twin is exact — shares the window idiom's oracle
    "ts_sessionize_exec" -> tsSessionizeSql,
    "ts_pattern_seq" -> tsPatternSeqSql,
    "ts_resample" -> tsResampleSql,
    "ts_anomaly" -> tsAnomalySql
  )
}
