package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** ETL composite operators — the reference's home turf [INFERRED,
  * SURVEY.md §0]: upsert/merge and schema-drift tolerant unification.
  * Both are pure dataflows (no table format needed): merge is a full
  * outer join + coalesce, exactly what Delta/Iceberg MERGE plans
  * underneath, shuffling once on the merge key.
  */
object Etl {

  /** SCD1 upsert: apply a deterministic change-set (updates for
    * custkey % 10 = 0, inserts above the existing key range) onto
    * customer. Updated rows take the change-set's values; unmatched
    * base rows pass through; unmatched change rows are inserts. */
  val etlUpsertScd1: Q = (spark, dir) => {
    val base = Tables.customer(spark, dir)
    val updates = base
      .filter(col("c_custkey") % 10 === 0)
      .select(
        col("c_custkey").as("u_custkey"),
        concat(col("c_name"), lit("_v2")).as("u_name"),
        round(col("c_acctbal") + 100, 2).as("u_acctbal")
      )
    val inserts = base
      .filter(col("c_custkey") < 5)
      .select(
        (col("c_custkey") + 1000000).as("u_custkey"),
        concat(lit("NewCustomer#"), col("c_custkey")).as("u_name"),
        lit(0.0).as("u_acctbal")
      )
    val changes = updates.unionByName(inserts)
    base
      .join(changes, col("c_custkey") === col("u_custkey"), "full")
      .select(
        coalesce(col("c_custkey"), col("u_custkey")).as("custkey"),
        coalesce(col("u_name"), col("c_name")).as("name"),
        round(coalesce(col("u_acctbal"), col("c_acctbal")), 2).as("acctbal"),
        when(col("c_custkey").isNull, "insert")
          .when(col("u_custkey").isNull, "keep")
          .otherwise("update")
          .as("op")
      )
      .orderBy("custkey")
  }

  /** Schema drift: two batches of the same feed with different column
    * sets (an added column, a dropped column) unified into one frame —
    * unionByName(allowMissingColumns) null-fills the gaps, the
    * schema-on-read posture of a format-conversion pipeline. */
  val etlSchemaDrift: Q = (spark, dir) => {
    val v1 = Tables
      .supplier(spark, dir)
      .filter(col("s_suppkey") % 2 === 0)
      .select(col("s_suppkey"), col("s_name"), col("s_nationkey"))
    val v2 = Tables
      .supplier(spark, dir)
      .filter(col("s_suppkey") % 2 === 1)
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
    v1.unionByName(v2, allowMissingColumns = true)
      .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .orderBy("s_suppkey")
  }

  /** SQL entry point: the same engine drives `spark.sql` over
    * registered views — uncorrelated scalar subquery, IN-subquery, and
    * correlated EXISTS, all decorrelated by Catalyst into joins. */
  val sqlSubquery: Q = (spark, dir) => {
    Tables.orders(spark, dir).createOrReplaceTempView("v_orders")
    Tables.customer(spark, dir).createOrReplaceTempView("v_customer")
    spark.sql(
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS total
        |FROM v_orders o
        |WHERE o_totalprice > (SELECT avg(o_totalprice) * 1.8 FROM v_orders)
        |  AND o_custkey IN (SELECT c_custkey FROM v_customer
        |                    WHERE c_mktsegment = 'BUILDING')
        |  AND EXISTS (SELECT 1 FROM v_customer c
        |              WHERE c.c_custkey = o.o_custkey AND c.c_acctbal > 0)
        |ORDER BY o_orderkey""".stripMargin
    )
  }

  /** Recursive CTE (`WITH RECURSIVE`, Spark 4's UnionLoop execution):
    * a capped running fold S_t = min(cap, S_{t-1} + x_t) along each
    * (nation, segment) customer chain — a true sequential recursion no
    * window frame can express (the cap makes each step depend on the
    * folded value, not a prefix aggregate). All arithmetic is integer
    * cents so the Spark and DuckDB trajectories are bit-identical (no
    * float rounding at any step; see parity notes in SURVEY §5).
    * Scale shape: each iteration is one hash join of the frontier
    * (one row per chain) against the rn-indexed chain table — frontier
    * size is bounded by group count, not input rows, so the loop
    * shuffles O(groups) per level regardless of corpus size. Two
    * scale disciplines make the loop itself cheap: the walk depth is
    * BOUNDED BY DESIGN (rn ≤ 24, the same posture as pagerank's fixed
    * iteration count — an unbounded-depth recursive query is a latent
    * runaway at 100 TB, and Spark schedules one job per level, so
    * depth is the dominant cost term: the unbounded form cost 24 s at
    * sf0.1, this one 1-2 s), and the chain table is CACHED before the
    * loop so every iteration joins against the in-memory relation
    * instead of re-running scan+window per level (UnionLoop re-plans
    * the referenced subquery each iteration). */
  val sqlRecursiveCte: Q = (spark, dir) => {
    // Depth = walk cap (24) < the 100 default level limit; row limit
    // (1M default) is never approached: ≤ 24 rows per group total.
    Tables.customer(spark, dir).createOrReplaceTempView("v_customer")
    val chain = spark
      .sql(
        """SELECT c_nationkey AS nk, c_mktsegment AS seg,
          |       c_custkey AS ck,
          |       CAST(round(c_acctbal * 100) AS BIGINT) AS cents, rn
          |FROM (
          |  SELECT *, row_number() OVER (
          |      PARTITION BY c_nationkey, c_mktsegment
          |      ORDER BY c_custkey) AS rn
          |  FROM v_customer)
          |WHERE rn <= 24""".stripMargin
      )
      .cache()
    chain.createOrReplaceTempView("v_rcte_chain")
    val out = spark.sql(
      """WITH RECURSIVE walk AS (
        |  SELECT nk, seg, rn, ck,
        |         least(cents, CAST(100000 AS BIGINT)) AS bal
        |  FROM v_rcte_chain WHERE rn = 1
        |  UNION ALL
        |  SELECT c.nk, c.seg, c.rn, c.ck,
        |         least(w.bal + c.cents, CAST(100000 AS BIGINT)) AS bal
        |  FROM walk w JOIN v_rcte_chain c
        |    ON c.nk = w.nk AND c.seg = w.seg AND c.rn = w.rn + 1
        |)
        |SELECT nk, seg, CAST(max(rn) AS BIGINT) AS chain_len,
        |       CAST(sum(bal) AS BIGINT) AS total_capped_cents,
        |       CAST(max_by(bal, rn) AS BIGINT) AS final_capped_cents
        |FROM walk GROUP BY nk, seg ORDER BY nk, seg""".stripMargin
    )
    // Materialize (125 result rows) while the chain cache is live, then
    // release the cache so a long-lived session doesn't pin it.
    val materialized = out.localCheckpoint(eager = true)
    chain.unpersist()
    materialized
  }

  /** Full MERGE semantics (Delta/Iceberg `MERGE INTO` as a pure
    * dataflow): one change-set carrying updates, tombstones, and
    * inserts applied in a single full-outer join on the merge key —
    * WHEN MATCHED AND tombstone THEN DELETE, WHEN MATCHED AND the
    * update condition holds THEN UPDATE (condition false → source row
    * kept untouched), WHEN NOT MATCHED THEN INSERT. This is exactly
    * the join the table formats plan underneath; one shuffle on the
    * key at any scale, and the change-set side broadcasts whenever it
    * is small relative to the base. */
  val etlMerge: Q = (spark, dir) =>
    customerMerge(Tables.customer(spark, dir))

  /** The MERGE dataflow itself, parameterized on the base relation so
    * the transactional variant (Scans.etl_merge_snapshot, round 10) can
    * apply the SAME change-set to a snapshot-table read and commit the
    * result — both keys share one oracle, so the dataflow is proven
    * identical through either storage path. `base` needs c_custkey,
    * c_name, c_acctbal. */
  private[operators] def customerMerge(base: org.apache.spark.sql.DataFrame) =
    applyMergeChanges(base, customerChanges(base))

  /** The MERGE change set alone (updates, tombstones, inserts keyed by
    * m_custkey), split out (round 11) so the copy-on-write snapshot
    * variant can derive it from the SOURCE relation and hand its keys
    * to [[graft.sources.SnapshotLog.touchedFiles]] for file selection
    * before the join ever runs. */
  private[operators] def customerChanges(
      source: org.apache.spark.sql.DataFrame
  ): org.apache.spark.sql.DataFrame = {
    val matched = source
      .filter(col("c_custkey") % 5 === 0)
      .select(
        col("c_custkey").as("m_custkey"),
        concat(col("c_name"), lit("_m")).as("m_name"),
        round(col("c_acctbal") + 100, 2).as("m_acctbal"),
        (col("c_custkey") % 10 === 5).as("m_delete")
      )
    val inserts = source
      .filter(col("c_custkey") < 5)
      .select(
        (col("c_custkey") + 2000000).as("m_custkey"),
        concat(lit("Merged#"), col("c_custkey")).as("m_name"),
        lit(1.0).as("m_acctbal"),
        lit(false).as("m_delete")
      )
    matched.unionByName(inserts)
  }

  /** The MERGE join/apply half, against an arbitrary change set — for
    * the CoW path this `base` is only the stats-admitted file subset,
    * and the unmatched-change-row → insert arm is exactly why that is
    * sound: a change key absent from every admitted file is absent from
    * the TABLE (skipping can only exclude provably-disjoint files). */
  private[operators] def applyMergeChanges(
      base: org.apache.spark.sql.DataFrame,
      changes: org.apache.spark.sql.DataFrame
  ): org.apache.spark.sql.DataFrame = {
    base
      .join(changes, col("c_custkey") === col("m_custkey"), "full")
      // WHEN MATCHED AND m_delete THEN DELETE
      .filter(!(col("c_custkey").isNotNull && col("m_custkey").isNotNull
        && col("m_delete")))
      .select(
        coalesce(col("c_custkey"), col("m_custkey")).as("custkey"),
        // conditional update: only positive-balance rows take the new
        // values; a matched row failing the condition stays untouched
        when(col("c_custkey").isNotNull && col("m_custkey").isNotNull
          && col("c_acctbal") >= 0, col("m_name"))
          .otherwise(coalesce(col("c_name"), col("m_name")))
          .as("name"),
        round(
          when(col("c_custkey").isNotNull && col("m_custkey").isNotNull
            && col("c_acctbal") >= 0, col("m_acctbal"))
            .otherwise(coalesce(col("c_acctbal"), col("m_acctbal"))),
          2
        ).as("acctbal"),
        when(col("c_custkey").isNull, "insert")
          .when(col("m_custkey").isNull, "keep")
          .when(col("c_acctbal") >= 0, "update")
          .otherwise("keep_cond")
          .as("op")
      )
      .orderBy("custkey")
  }

  /** SCD2 history build: each user's events become validity intervals
    * [valid_from, valid_to) via lead(); the open interval marks the
    * current row. One shuffle on user_id — the standard history-table
    * materialization at any scale. */
  val etlScd2: Q = (spark, dir) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("valid_from", "event_id")
    Tables
      .events(spark, dir)
      .select(
        col("event_id"),
        col("user_id"),
        col("event_type"),
        col("ts").as("valid_from")
      )
      .withColumn("valid_to", lead("valid_from", 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .orderBy("event_id")
  }

  /** Deterministic stratified sampling by content hash: md5 of the key
    * decides membership, so the sample is reproducible across engines,
    * runs, and cluster sizes (rand()-based sampling is none of those).
    * Per-stratum rates — 4/16 of 'O' orders, 2/16 of 'F', 1/16 of the
    * rest — the held-out-set carve a training-data pipeline does. */
  val etlSampleHash: Q = (spark, dir) => {
    val h = substring(expr("md5(cast(o_orderkey as string))"), 1, 1)
    Tables
      .orders(spark, dir)
      .filter(
        when(col("o_orderstatus") === "O", h.isin("0", "1", "2", "3"))
          .when(col("o_orderstatus") === "F", h.isin("0", "1"))
          .otherwise(h === "0")
      )
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      .orderBy("o_orderkey")
  }

  /** FIXED-COUNT stratified sampling (round 14): exactly K documents
    * per language, chosen by a deterministic multiplicative hash rank
    * — the balanced per-stratum carve a training-data mixture needs
    * when rates (etl_sample_hash) would over/under-fill small strata.
    * Determinism is the contract: the same corpus yields the same
    * sample on any cluster size, any run (rand() is none of that).
    * The top-K-per-stratum runs on the bounded-heap [[graft.plans
    * .TopKPerGroup]] operator — partial per-partition heaps cap the
    * shuffle at K·partitions rows per stratum, so a 100 TB corpus
    * never sorts or windows globally. The oracle recomputes the hash
    * rank with a window function — same rows, proving the heap
    * operator against the textbook plan. */
  val etlSampleStratified: Q = (spark, dir) => {
    val k = 20
    val docs = Tables
      .documents(spark, dir)
      .select("doc_id", "lang", "n_chars")
      // Knuth multiplicative hash in exact LONG space (doc_id stays
      // far below the overflow bound), reproducible in any engine
      .withColumn(
        "h", (col("doc_id") * lit(2654435761L)) % lit(2147483647L))
    graft.plans.TopKPerGroup
      .topKPerGroup(docs, Seq("lang"), Seq(("h", true), ("doc_id", true)), k)
      .select("doc_id", "lang", "n_chars")
      .orderBy("lang", "doc_id")
  }

  /** Contiguous global id assignment WITHOUT the single-partition
    * window anti-pattern (`row_number() OVER (ORDER BY …)` serializes
    * the corpus through one task): range-partition + sort within
    * partitions, then the two-phase zipWithIndex scheme — a first pass
    * collects only the per-partition COUNTS (bounded by the partition
    * count, driver-safe at any data size), whose prefix sums become
    * per-partition id offsets for the main pass. The extra counting
    * pass is inherent to contiguous ids (RDD.zipWithIndex does the
    * same); ids equal the global doc_id rank, which is what the oracle
    * checks. */
  val etlGlobalIds: Q = (spark, dir) => {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.LongType
    val docs = Tables
      .documents(spark, dir)
      .select("doc_id", "lang", "n_chars")
      .repartitionByRange(8, col("doc_id"))
      .sortWithinPartitions("doc_id")
    val counts = docs.rdd
      .mapPartitionsWithIndex((i, it) => Iterator((i, it.size.toLong)))
      .collect()
      .sortBy(_._1)
      .map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _)
    val withIds = docs.rdd.mapPartitionsWithIndex { (i, it) =>
      var id = offsets(i)
      it.map { row => val r = Row.fromSeq(row.toSeq :+ id); id += 1; r }
    }
    docs.sparkSession
      .createDataFrame(withIds, docs.schema.add("gid", LongType))
      .orderBy("doc_id")
  }

  /** Sequence packing (concat-and-chunk at a 256-token budget): the
    * canonical LLM training-data assembly step — documents in doc_id
    * order are concatenated into one global token stream and cut into
    * fixed-length sequences; each doc reports its global token offset
    * and the first/last sequence it lands in (seq_first < seq_last =
    * a boundary-straddling doc the loader either splits or re-pads).
    * The global running offset is [[TwoPhase.prefixScan]] (one bounded
    * summary per range partition, never the single-task
    * `Window.orderBy` anti-pattern), so the plan shape is unchanged at
    * 100 TB: tokenize map-side, ONE range exchange, O(partitions)
    * driver state — the same posture as etl_global_ids, which packing
    * generalizes from counting rows to summing token lengths. */
  val etlPackSequences: Q = (spark, dir) => {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val budget = 256L
    val toks = Tables
      .documents(spark, dir)
      .select(
        col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tok")
      )
    val schema = StructType(
      Seq(
        StructField("doc_id", LongType),
        StructField("n_tok", LongType),
        StructField("start_off", LongType),
        StructField("seq_first", LongType),
        StructField("seq_last", LongType)
      )
    )
    TwoPhase
      .prefixScan(toks, 8, Seq(col("doc_id")), 0L)(
        _.foldLeft(0L)((a, r) => a + r.getLong(1))
      )(_ + _)(schema) { (before, _, rows) =>
        var off = before
        rows.map { r =>
          val n = r.getLong(1) // >= 1: split("") is [""]
          val out =
            Row(r.getLong(0), n, off, off / budget, (off + n - 1) / budget)
          off += n
          out
        }
      }
      .orderBy("doc_id")
  }

  /** Training-data MIXTURE sampling (round 11 cont.): downsample every
    * source to a 40 % token budget, greedily in doc_id order — the
    * data-mixing step an LLM pre-training pipeline runs to hit per-
    * source token proportions. A doc is admitted while its source's
    * cumulative token count BEFORE it is under budget (so the doc that
    * crosses the line still lands — budgets are fill targets, not
    * caps), which makes the selection fully deterministic and
    * oracle-checkable. The budget test is pure integer arithmetic
    * (`before * 10 < total * 4`), so Spark and DuckDB agree bit-for-bit
    * with no float rounding seam.
    *
    * Scale shape: tokenize map-side, then ONE range exchange on
    * (source, doc_id) through [[TwoPhase.prefixScan]] with a per-source
    * token-subtotal MAP as the bounded partition summary — the
    * per-source running sums every partition needs arrive as O(sources)
    * driver state, never a single-task `Window.orderBy` and never a
    * second pass. A source 1000× bigger than the rest just spans more
    * range partitions; no task sees more than its slice. */
  val etlDataMixture: Q = (spark, dir) => {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val toks = Tables
      .documents(spark, dir)
      .select(
        col("doc_id"),
        col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tok")
      )
    val schema = StructType(
      Seq(
        StructField("doc_id", LongType),
        StructField("source", StringType),
        StructField("n_tok", LongType)
      )
    )
    TwoPhase
      .prefixScan(
        toks, 8, Seq(col("source"), col("doc_id")),
        Map.empty[String, Long]
      )(
        _.foldLeft(Map.empty[String, Long]) { (m, r) =>
          val s = r.getString(1)
          m.updated(s, m.getOrElse(s, 0L) + r.getLong(2))
        }
      )((a, b) => b.foldLeft(a) { case (m, (k, v)) => m.updated(k, m.getOrElse(k, 0L) + v) })(
        schema
      ) { (before, total, rows) =>
        val cum = scala.collection.mutable.Map.empty[String, Long]
        rows.flatMap { r =>
          val s = r.getString(1)
          val n = r.getLong(2)
          val at = cum.getOrElse(s, before.getOrElse(s, 0L))
          cum(s) = at + n
          // admit while the source's tokens BEFORE this doc are under
          // 40% of its grand total (integer-exact: at/total < 4/10)
          if (at * 10 < total(s) * 4) Some(Row(r.getLong(0), s, n)) else None
        }
      }
      .orderBy("doc_id")
  }

  /** Data-quality audit: constraint-violation counts over the fact
    * table — null keys, domain-range breaches, duplicate primary keys,
    * and referential orphans — assembled as a union of independent
    * small aggregates. Each rule is one distributed pass (the orphan
    * check an anti join against the broadcastable orders key set); the
    * result is a handful of rows regardless of input size, the shape a
    * pipeline health gate wants at any scale. */
  val etlDqChecks: Q = (spark, dir) => {
    val li = Tables.lineitem(spark, dir)
    // n_total as a broadcast single-row aggregate, NOT an eager
    // li.count() at plan-build time (that would be an extra full pass
    // before the action even runs)
    val total = li.agg(count(lit(1)).as("n_total"))
    def rule(name: String, viol: org.apache.spark.sql.DataFrame) =
      viol
        .select(lit(name).as("rule"), count(lit(1)).as("n_violations"))
        .crossJoin(broadcast(total))
    val dup = li
      .groupBy("l_orderkey", "l_linenumber")
      .agg(count(lit(1)).as("c"))
      .filter(col("c") > 1)
    val orphan = li.join(
      Tables.orders(spark, dir).select(col("o_orderkey")),
      col("l_orderkey") === col("o_orderkey"),
      "left_anti"
    )
    rule("null_shipdate", li.filter(col("l_shipdate").isNull))
      .unionByName(rule("nonpositive_qty", li.filter(col("l_quantity") <= 0)))
      .unionByName(
        rule(
          "discount_out_of_range",
          li.filter(col("l_discount") < 0 || col("l_discount") > 1)
        )
      )
      .unionByName(rule("duplicate_pk", dup))
      .unionByName(rule("orphan_orderkey", orphan))
      .orderBy("rule")
  }

  private val etlDqChecksSql =
    """WITH t AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM lineitem)
      |SELECT * FROM (
      |  SELECT 'null_shipdate' AS rule,
      |   CAST((SELECT count(*) FROM lineitem WHERE l_shipdate IS NULL) AS BIGINT) AS n_violations,
      |   n_total FROM t
      |  UNION ALL
      |  SELECT 'nonpositive_qty',
      |   CAST((SELECT count(*) FROM lineitem WHERE l_quantity <= 0) AS BIGINT), n_total FROM t
      |  UNION ALL
      |  SELECT 'discount_out_of_range',
      |   CAST((SELECT count(*) FROM lineitem WHERE l_discount < 0 OR l_discount > 1) AS BIGINT),
      |   n_total FROM t
      |  UNION ALL
      |  SELECT 'duplicate_pk',
      |   CAST((SELECT count(*) FROM (
      |      SELECT l_orderkey, l_linenumber FROM lineitem
      |      GROUP BY l_orderkey, l_linenumber HAVING count(*) > 1) d) AS BIGINT),
      |   n_total FROM t
      |  UNION ALL
      |  SELECT 'orphan_orderkey',
      |   CAST((SELECT count(*) FROM lineitem l
      |         WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                           WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT),
      |   n_total FROM t) u
      |ORDER BY rule""".stripMargin

  /** Time-series resample + gap-fill: hourly event counts and value
    * totals per type over a complete hour grid (global min/max bounds),
    * missing hours get count 0 and a forward-filled total
    * (last-observation-carried-forward via `last(ignoreNulls)` over an
    * unbounded-preceding frame). The grid is generated distributed
    * (sequence + explode per key — no driver loop); the fill is one
    * window per key, the standard sensor/metrics densification at any
    * scale. Totals are rounded at the data's own
    * 2dp grid BEFORE the fill (an avg lands off-grid and collides with
    * round-half boundaries — hit at sf0.1), so carried values are
    * grid-identical across engines. */
  val tsGapfill: Q = (spark, dir) => {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.events(spark, dir)
    val hourly = e
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("sum_value")
      )
    val bounds = e.agg(
      date_trunc("hour", min("ts")).as("h0"),
      date_trunc("hour", max("ts")).as("h1")
    )
    val grid = e
      .select("event_type")
      .distinct()
      .crossJoin(broadcast(bounds))
      .select(
        col("event_type"),
        explode(expr("sequence(h0, h1, interval 1 hour)")).as("h")
      )
    grid
      .join(hourly, Seq("event_type", "h"), "left")
      .select(
        col("event_type"),
        col("h"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        last("sum_value", ignoreNulls = true)
          .over(
            Window
              .partitionBy("event_type")
              .orderBy("h")
              .rowsBetween(Window.unboundedPreceding, 0)
          )
          .as("ff_value"),
        col("sum_value").isNull.as("is_gap")
      )
      .orderBy("event_type", "h")
  }

  private val tsGapfillSql =
    """WITH hourly AS (
      |  SELECT event_type, date_trunc('hour', ts) AS h,
      |   CAST(count(*) AS BIGINT) AS n_events, round(sum(value), 2) AS sum_value
      |  FROM events GROUP BY 1, 2),
      |bounds AS (SELECT date_trunc('hour', min(ts)) AS h0,
      |                  date_trunc('hour', max(ts)) AS h1 FROM events),
      |grid AS (
      |  SELECT t.event_type, unnest(generate_series(b.h0, b.h1, INTERVAL 1 HOUR)) AS h
      |  FROM (SELECT DISTINCT event_type FROM events) t, bounds b)
      |SELECT g.event_type, g.h,
      | coalesce(h2.n_events, 0) AS n_events,
      | last_value(h2.sum_value IGNORE NULLS) OVER (
      |   PARTITION BY g.event_type ORDER BY g.h
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ff_value,
      | h2.sum_value IS NULL AS is_gap
      |FROM grid g LEFT JOIN hourly h2 ON g.event_type = h2.event_type AND g.h = h2.h
      |ORDER BY g.event_type, g.h""".stripMargin

  /** Snapshot diff (CDC derive): given two snapshots of the customer
    * dimension — v2 deterministically deletes custkey%13=0, bumps
    * acctbal on custkey%7=0, and appends new keys — emit the change
    * rows (added/removed/changed) a downstream incremental consumer
    * would apply. One full-outer join on the key, row-local compare; at
    * scale both snapshots shuffle once on the same key, and the output
    * is proportional to the churn, not the table. */
  val etlSnapshotDiff: Q = (spark, dir) => {
    val base = Tables
      .customer(spark, dir)
      .select("c_custkey", "c_name", "c_acctbal")
    val v2 = base
      .filter(col("c_custkey") % 13 =!= 0)
      .withColumn(
        "c_acctbal",
        when(
          col("c_custkey") % 7 === 0,
          round(col("c_acctbal") + 50, 2)
        ).otherwise(col("c_acctbal"))
      )
      .unionByName(
        base
          .filter(col("c_custkey") < 10)
          .select(
            (col("c_custkey") + 2000000).as("c_custkey"),
            concat(lit("Joined#"), col("c_custkey")).as("c_name"),
            lit(10.0).as("c_acctbal")
          )
      )
    val v1r = base.select(
      col("c_custkey").as("k1"),
      col("c_acctbal").as("bal1")
    )
    val v2r = v2.select(
      col("c_custkey").as("k2"),
      col("c_acctbal").as("bal2")
    )
    v1r
      .join(v2r, col("k1") === col("k2"), "full")
      .withColumn(
        "op",
        when(col("k1").isNull, "added")
          .when(col("k2").isNull, "removed")
          .when(col("bal1") =!= col("bal2"), "changed")
          .otherwise("unchanged")
      )
      .filter(col("op") =!= "unchanged")
      .select(
        coalesce(col("k1"), col("k2")).as("custkey"),
        col("op"),
        col("bal1").as("old_acctbal"),
        col("bal2").as("new_acctbal")
      )
      .orderBy("custkey")
  }

  private val etlSnapshotDiffSql =
    """WITH base AS (SELECT c_custkey, c_name, c_acctbal FROM customer),
      |v2 AS (
      |  SELECT c_custkey,
      |   CASE WHEN c_custkey % 7 = 0 THEN round(c_acctbal + 50, 2)
      |        ELSE c_acctbal END AS c_acctbal
      |  FROM base WHERE c_custkey % 13 <> 0
      |  UNION ALL
      |  SELECT c_custkey + 2000000, 10.0 FROM base WHERE c_custkey < 10)
      |SELECT coalesce(b.c_custkey, v.c_custkey) AS custkey,
      | CASE WHEN b.c_custkey IS NULL THEN 'added'
      |      WHEN v.c_custkey IS NULL THEN 'removed'
      |      ELSE 'changed' END AS op,
      | b.c_acctbal AS old_acctbal,
      | v.c_acctbal AS new_acctbal
      |FROM base b FULL OUTER JOIN v2 v ON b.c_custkey = v.c_custkey
      |WHERE b.c_custkey IS NULL OR v.c_custkey IS NULL
      |   OR b.c_acctbal <> v.c_acctbal
      |ORDER BY custkey""".stripMargin

  /** Linear interpolation over the hourly grid (the gapfill twin that
    * estimates rather than carries forward): gap hours take
    * prev + (next − prev) · elapsed/spanned, from the nearest observed
    * neighbors on each side; leading/trailing gaps fall back to the
    * single available neighbor. Four window functions over ONE
    * (event_type)-partitioned sort — same single-shuffle shape as
    * ts_gapfill; the hour positions are exact integers so the
    * interpolation factor is IEEE-identical across engines. */
  val tsInterpolate: Q = (spark, dir) => {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.events(spark, dir)
    val hourly = e
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(round(sum("value"), 2).as("v"))
    val bounds = e.agg(
      date_trunc("hour", min("ts")).as("h0"),
      date_trunc("hour", max("ts")).as("h1")
    )
    val grid = e
      .select("event_type")
      .distinct()
      .crossJoin(broadcast(bounds))
      .select(
        col("event_type"),
        explode(expr("sequence(h0, h1, interval 1 hour)")).as("h")
      )
    val byType = Window.partitionBy("event_type").orderBy("h")
    val back = byType.rowsBetween(Window.unboundedPreceding, 0)
    val fwd = byType.rowsBetween(0, Window.unboundedFollowing)
    val pos = expr("unix_micros(h) div 3600000000")
    grid
      .join(hourly, Seq("event_type", "h"), "left")
      .select(col("event_type"), col("h"), col("v"), pos.as("p"))
      .withColumn("pv", last("v", ignoreNulls = true).over(back))
      .withColumn(
        "pp",
        last(when(col("v").isNotNull, col("p")), ignoreNulls = true).over(back)
      )
      .withColumn("nv", first("v", ignoreNulls = true).over(fwd))
      .withColumn(
        "np",
        first(when(col("v").isNotNull, col("p")), ignoreNulls = true).over(fwd)
      )
      .select(
        col("event_type"),
        col("h"),
        col("v").isNull.as("is_gap"),
        // no final round: pv/nv are 2dp-grid doubles identical across
        // engines and +,-,*,/ are IEEE-identical, so the raw double is
        // bit-equal — while ANY decimal rounding of an off-grid
        // interpolant hits half-boundary collisions (seen at sf0.001)
        when(col("v").isNotNull, col("v"))
          .when(col("pv").isNull, col("nv"))
          .when(col("nv").isNull, col("pv"))
          .otherwise(
            col("pv") + (col("nv") - col("pv")) *
              ((col("p") - col("pp")) / (col("np") - col("pp")))
          )
          .as("v_interp")
      )
      .orderBy("event_type", "h")
  }

  private val tsInterpolateSql =
    """WITH hourly AS (
      |  SELECT event_type, date_trunc('hour', ts) AS h,
      |         round(sum(value), 2) AS v
      |  FROM events GROUP BY 1, 2),
      |bounds AS (SELECT date_trunc('hour', min(ts)) AS h0,
      |                  date_trunc('hour', max(ts)) AS h1 FROM events),
      |grid AS (
      |  SELECT t.event_type,
      |         unnest(generate_series(b.h0, b.h1, INTERVAL 1 HOUR)) AS h
      |  FROM (SELECT DISTINCT event_type FROM events) t, bounds b),
      |j AS (
      |  SELECT g.event_type, g.h, h2.v, epoch_us(g.h) // 3600000000 AS p
      |  FROM grid g LEFT JOIN hourly h2
      |    ON g.event_type = h2.event_type AND g.h = h2.h),
      |w AS (
      |  SELECT event_type, h, v, p,
      |   last_value(v IGNORE NULLS) OVER wb AS pv,
      |   last_value(CASE WHEN v IS NOT NULL THEN p END IGNORE NULLS)
      |     OVER wb AS pp,
      |   first_value(v IGNORE NULLS) OVER wf AS nv,
      |   first_value(CASE WHEN v IS NOT NULL THEN p END IGNORE NULLS)
      |     OVER wf AS np
      |  FROM j
      |  WINDOW
      |   wb AS (PARTITION BY event_type ORDER BY h
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |   wf AS (PARTITION BY event_type ORDER BY h
      |          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
      |SELECT event_type, h, v IS NULL AS is_gap,
      | CASE
      |   WHEN v IS NOT NULL THEN v
      |   WHEN pv IS NULL THEN nv
      |   WHEN nv IS NULL THEN pv
      |   ELSE pv + (nv - pv) * (CAST(p - pp AS DOUBLE) / CAST(np - pp AS DOUBLE))
      | END AS v_interp
      |FROM w
      |ORDER BY event_type, h""".stripMargin

  /** Fuzzy entity matching with blocking — the record-linkage core of
    * a data-integration tool: a "dirty" registry (deterministic typos
    * injected per key: one digit deleted, or '#'→'@') is matched back
    * to the clean dimension by Levenshtein distance ≤ 1, but ONLY
    * within blocks sharing the last-3-character suffix. Blocking keeps
    * the candidate join linear (suffix blocks are ~uniform), the
    * classic ER shape at any scale — never the all-pairs edit-distance
    * join. Best match per dirty row = (lowest distance, lowest key),
    * deterministic. */
  val etlFuzzyMatch: Q = (spark, dir) => {
    import org.apache.spark.sql.expressions.Window
    val clean = Tables.customer(spark, dir).select("c_custkey", "c_name")
    val dirty = clean.select(
      col("c_custkey").as("d_key"),
      when(
        col("c_custkey") % 3 === 0,
        expr(
          "concat(substring(c_name, 1, 9 + (c_custkey div 3) % 3)," +
            " substring(c_name, 11 + (c_custkey div 3) % 3, 100))"
        )
      ).when(col("c_custkey") % 3 === 1, regexp_replace(col("c_name"), "#", "@"))
        .otherwise(col("c_name"))
        .as("d_name")
    )
    val cand = dirty
      .withColumn("blk", expr("right(d_name, 3)"))
      .join(clean.withColumn("blk", expr("right(c_name, 3)")), "blk")
      .withColumn("dist", levenshtein(col("d_name"), col("c_name")))
      .filter(col("dist") <= 1)
    cand
      .withColumn(
        "rn",
        row_number().over(
          Window.partitionBy("d_key").orderBy(col("dist"), col("c_custkey"))
        )
      )
      .filter(col("rn") === 1)
      .select(
        col("d_key").as("custkey"),
        col("d_name").as("dirty_name"),
        col("c_custkey").as("matched_key"),
        col("dist")
      )
      .orderBy("custkey")
  }

  private val etlFuzzyMatchSql =
    """WITH clean AS (SELECT c_custkey, c_name FROM customer),
      |dirty AS (
      |  SELECT c_custkey AS d_key,
      |   CASE WHEN c_custkey % 3 = 0 THEN
      |     substring(c_name, 1, 9 + (c_custkey // 3) % 3) ||
      |     substring(c_name, 11 + (c_custkey // 3) % 3, 100)
      |   WHEN c_custkey % 3 = 1 THEN replace(c_name, '#', '@')
      |   ELSE c_name END AS d_name
      |  FROM clean),
      |cand AS (
      |  SELECT d.d_key, d.d_name, c.c_custkey,
      |         levenshtein(d.d_name, c.c_name) AS dist
      |  FROM dirty d JOIN clean c ON right(d.d_name, 3) = right(c.c_name, 3)
      |  WHERE levenshtein(d.d_name, c.c_name) <= 1),
      |r AS (SELECT d_key, d_name, c_custkey, dist,
      |       row_number() OVER (PARTITION BY d_key
      |                          ORDER BY dist, c_custkey) AS rn
      |      FROM cand)
      |SELECT d_key AS custkey, d_name AS dirty_name,
      |       c_custkey AS matched_key, dist
      |FROM r WHERE rn = 1
      |ORDER BY custkey""".stripMargin

  /** Size-budgeted shard assignment (the WebDataset/TFRecord export
    * carve): documents pack into ~20 kB shards per language by a
    * running character total; `(cum − 1) div budget` bins the prefix
    * sum so a single oversized doc still lands in its own shard.
    * |langs| is small, so a per-lang window prefix-sum would sort the
    * whole corpus into a handful of tasks. Instead this is
    * [[TwoPhase.prefixScan]] with a per-lang subtotal MAP as the
    * partition summary: range-partition on (lang, doc_id) — so every
    * lang's rows sit in doc_id order across MANY partitions — phase 1
    * collects only per-(partition, lang) character totals (bounded by
    * partitions × languages), and the prefix-merged maps seed phase
    * 2's local running sums. Same output as the window formulation at
    * any parallelism. */
  val etlShardAssign: Q = (spark, dir) => {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val outSchema = StructType(
      Seq(
        StructField("doc_id", LongType),
        StructField("lang", StringType),
        StructField("n_chars", LongType),
        StructField("cum_chars", LongType, nullable = false),
        StructField("shard", LongType, nullable = false)
      )
    )
    TwoPhase
      .prefixScan(
        Tables.documents(spark, dir).select("doc_id", "lang", "n_chars"),
        8,
        Seq(col("lang"), col("doc_id")),
        Map.empty[String, Long]
      ) { it =>
        val acc = scala.collection.mutable.LinkedHashMap.empty[String, Long]
        it.foreach { r =>
          acc.update(r.getString(1), acc.getOrElse(r.getString(1), 0L) + r.getLong(2))
        }
        acc.toMap
      } { (a, b) =>
        b.foldLeft(a) { case (m, (l, s)) => m.updated(l, m.getOrElse(l, 0L) + s) }
      }(outSchema) { (offsets, _, it) =>
        val run = scala.collection.mutable.HashMap.empty[String, Long]
        it.map { r =>
          val lang = r.getString(1)
          val cum = run.getOrElse(lang, offsets.getOrElse(lang, 0L)) + r.getLong(2)
          run.update(lang, cum)
          Row(r.getLong(0), lang, r.getLong(2), cum, (cum - 1) / 20000L)
        }
      }
      .orderBy("doc_id")
  }

  private val etlShardAssignSql =
    """SELECT doc_id, lang, n_chars,
      | CAST(sum(n_chars) OVER (PARTITION BY lang ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |   AS cum_chars,
      | (CAST(sum(n_chars) OVER (PARTITION BY lang ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - 1)
      |   // 20000 AS shard
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** Incremental-ingest dedup: a re-offered batch (every 10th doc plus
    * genuinely new synthetic docs) is anti-joined against the corpus on
    * the content hash, so only never-seen content survives — the
    * admission gate of a continuously-fed training corpus. The join
    * keys on md5(text): at scale both sides shuffle once on the hash
    * (or the corpus side becomes a bloom/broadcast when small), never
    * on the full text. */
  val etlDedupIncremental: Q = (spark, dir) => {
    val docs = Tables.documents(spark, dir)
    val batch = docs
      .filter(col("doc_id") % 10 === 0)
      .select(col("doc_id").as("b_id"), col("text"))
      .unionByName(
        docs
          .filter(col("doc_id") < 5)
          .select(
            (col("doc_id") + 1000000).as("b_id"),
            concat(lit("NEW "), col("text")).as("text")
          )
      )
    batch
      .withColumn("h", md5(col("text")))
      .join(
        docs.select(md5(col("text")).as("h")),
        Seq("h"),
        "left_anti"
      )
      .select(col("b_id"), col("h"))
      .orderBy("b_id")
  }

  private val etlDedupIncrementalSql =
    """WITH batch AS (
      |  SELECT doc_id AS b_id, text FROM documents WHERE doc_id % 10 = 0
      |  UNION ALL
      |  SELECT doc_id + 1000000, 'NEW ' || text FROM documents
      |  WHERE doc_id < 5)
      |SELECT b.b_id, md5(b.text) AS h
      |FROM batch b
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM documents d WHERE md5(d.text) = md5(b.text))
      |ORDER BY b_id""".stripMargin

  /** One declared field mapping: target column name, source expression
    * (any SQL over the source schema), target type, and whether a null
    * after mapping quarantines the row. */
  case class FieldMap(
      target: String,
      sourceExpr: String,
      targetType: String,
      required: Boolean = false
  )

  /** Compiles a declarative mapping spec + domain checks into ONE
    * narrow projection pass: every target column is
    * `cast(sourceExpr as targetType)`, required-null and domain
    * violations fold into a first-match `reject_reason` CASE chain, and
    * the caller routes on `valid` (`reject_reason IS NULL`). This is a
    * generic interpreter, not a one-off query — the spec is data, so
    * integrating the next "complex system" is a new spec, not new
    * code. One projection = one map-side pass at any corpus size;
    * nothing here shuffles. */
  def applyMapping(
      df: org.apache.spark.sql.DataFrame,
      spec: Seq[FieldMap],
      checks: Seq[(String, String)]
  ): org.apache.spark.sql.DataFrame = {
    val mapped = df.select(
      spec.map(f => expr(f.sourceExpr).cast(f.targetType).as(f.target)): _*
    )
    val allChecks =
      spec.filter(_.required).map(f => (s"missing_${f.target}", s"${f.target} IS NULL")) ++
        checks
    val reason = allChecks.foldRight(lit(null).cast("string")) {
      case ((why, pred), els) => when(expr(pred), lit(why)).otherwise(els)
    }
    mapped
      .withColumn("reject_reason", reason)
      .withColumn("valid", col("reject_reason").isNull)
  }

  /** The reference's core job (BASELINE.json:6 — "formatting data from
    * one complex system to another"): orders reshaped into a target
    * system's order feed via [[applyMapping]] — key prefixing + zero
    * padding, enum recode, money-to-cents, date normalization, a
    * parsed priority rank — with required-field and domain-range
    * quarantine reasons inline. Valid and rejected rows ship in one
    * output keyed by `valid`/`reject_reason`, the split an integration
    * pipeline routes on. */
  val etlMappingDsl: Q = (spark, dir) => {
    val spec = Seq(
      FieldMap(
        "order_ref",
        "concat('ORD-', lpad(cast(o_orderkey as string), 10, '0'))",
        "string",
        required = true
      ),
      FieldMap("customer_ref", "cast(o_custkey as string)", "string", required = true),
      FieldMap(
        "status_code",
        "CASE o_orderstatus WHEN 'O' THEN 1 WHEN 'F' THEN 2 WHEN 'P' THEN 3 ELSE 0 END",
        "int"
      ),
      FieldMap("total_cents", "round(o_totalprice * 100, 0)", "bigint"),
      FieldMap("order_date", "cast(o_orderdate as date)", "date"),
      FieldMap(
        "priority_rank",
        "cast(substring(o_orderpriority, 1, 1) as int)",
        "int",
        required = true
      )
    )
    val checks = Seq(
      ("total_out_of_range", "total_cents > 45000000"),
      ("unknown_status", "status_code = 0")
    )
    applyMapping(Tables.orders(spark, dir), spec, checks)
      .orderBy("order_ref")
  }

  private val etlMappingDslSql =
    """WITH m AS (
      |  SELECT 'ORD-' || lpad(CAST(o_orderkey AS VARCHAR), 10, '0') AS order_ref,
      |         CAST(o_custkey AS VARCHAR) AS customer_ref,
      |         CAST(CASE o_orderstatus WHEN 'O' THEN 1 WHEN 'F' THEN 2
      |              WHEN 'P' THEN 3 ELSE 0 END AS INT) AS status_code,
      |         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS total_cents,
      |         CAST(o_orderdate AS DATE) AS order_date,
      |         CAST(substring(o_orderpriority, 1, 1) AS INT) AS priority_rank
      |  FROM orders)
      |SELECT *, reject_reason IS NULL AS valid FROM (
      |  SELECT *,
      |    CASE WHEN order_ref IS NULL THEN 'missing_order_ref'
      |         WHEN customer_ref IS NULL THEN 'missing_customer_ref'
      |         WHEN priority_rank IS NULL THEN 'missing_priority_rank'
      |         WHEN total_cents > 45000000 THEN 'total_out_of_range'
      |         WHEN status_code = 0 THEN 'unknown_status'
      |         ELSE NULL END AS reject_reason
      |  FROM m) t
      |ORDER BY order_ref""".stripMargin

  /** k-anonymity suppression (k = 5) over the (nation, segment)
    * quasi-identifier pair — the privacy gate a training-data export
    * runs before release: any combination identifying fewer than k
    * customers has both quasi-identifiers masked. Group cardinality is
    * bounded by |nations| × |segments|, so the violating-group list
    * broadcasts and the whole operator is one map-side pass over the
    * fact side after a bounded aggregate — no per-row shuffle at any
    * scale. */
  val etlKanonymity: Q = (spark, dir) => {
    val k = 5
    val cust = Tables.customer(spark, dir)
    val groups = cust
      .groupBy("c_nationkey", "c_mktsegment")
      .agg(count(lit(1)).as("grp_n"))
    cust
      .join(broadcast(groups), Seq("c_nationkey", "c_mktsegment"))
      .select(
        col("c_custkey"),
        when(col("grp_n") < k, lit("*"))
          .otherwise(col("c_nationkey").cast("string"))
          .as("nation_q"),
        when(col("grp_n") < k, lit("*"))
          .otherwise(col("c_mktsegment"))
          .as("segment_q"),
        col("grp_n"),
        (col("grp_n") < k).as("suppressed")
      )
      .orderBy("c_custkey")
  }

  private val etlKanonymitySql =
    """WITH g AS (
      |  SELECT c_nationkey, c_mktsegment, count(*) AS grp_n
      |  FROM customer GROUP BY 1, 2)
      |SELECT c_custkey,
      | CASE WHEN grp_n < 5 THEN '*' ELSE CAST(c_nationkey AS VARCHAR) END AS nation_q,
      | CASE WHEN grp_n < 5 THEN '*' ELSE c_mktsegment END AS segment_q,
      | grp_n, grp_n < 5 AS suppressed
      |FROM customer JOIN g USING (c_nationkey, c_mktsegment)
      |ORDER BY c_custkey""".stripMargin

  /** Deterministic keyed pseudonymization — the privacy transform
    * BETWEEN plain export and k-anonymity: the natural key (c_name) is
    * replaced by a peppered hash, referential integrity survives (the
    * same customer always maps to the same pid, so joins and rollups
    * still work), and the raw identifier never leaves. The order
    * aggregate runs keyed on o_custkey FIRST (one shuffle with
    * map-side combine), then one join projects the pid — grouping on
    * the derived pid directly would shuffle the fact table a second
    * time for the same answer. Customers without orders survive the
    * left join with zeroed metrics (the referential-completeness
    * check). */
  val etlPseudonymize: Q = (spark, dir) => {
    val byCust = Tables
      .orders(spark, dir)
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("rev"))
    Tables
      .customer(spark, dir)
      .join(byCust, col("c_custkey") === col("o_custkey"), "left")
      .select(
        md5(concat(lit("graft-pepper-1"), col("c_name"))).as("pid"),
        col("c_mktsegment"),
        coalesce(col("n"), lit(0L)).as("n_orders"),
        coalesce(col("rev"), lit(0.0)).as("revenue")
      )
      .orderBy("pid")
  }

  private val etlPseudonymizeSql =
    """WITH o AS (
      |  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n,
      |         round(sum(o_totalprice), 2) AS rev
      |  FROM orders GROUP BY 1)
      |SELECT md5('graft-pepper-1' || c_name) AS pid, c_mktsegment,
      | coalesce(n, 0) AS n_orders, coalesce(rev, 0.0) AS revenue
      |FROM customer LEFT JOIN o ON c_custkey = o_custkey
      |ORDER BY pid""".stripMargin

  /** Column-level lineage of a representative integration query (see
    * [[graft.plans.Lineage]]): 3-table join → grouped aggregate → a
    * derived multi-source column. The lineage of a FIXED query is
    * deterministic plan metadata, so the oracle is the expected
    * mapping itself declared as a VALUES table — the same golden-
    * answer contract as a scalatest assertion, routed through the
    * driver gate. Extraction never touches data: the result is
    * identical at every SF (and would be at 100 TB). */
  val etlLineage: Q = (spark, dir) => {
    val q = Tables
      .orders(spark, dir)
      .join(
        Tables.customer(spark, dir),
        col("o_custkey") === col("c_custkey")
      )
      .join(
        Tables.nation(spark, dir),
        col("c_nationkey") === col("n_nationkey")
      )
      .groupBy(col("n_name"), col("c_mktsegment"))
      .agg(
        sum("o_totalprice").as("revenue"),
        countDistinct("o_custkey").as("n_custs")
      )
      .select(
        concat_ws("-", col("n_name"), col("c_mktsegment")).as("region_seg"),
        col("revenue"),
        col("n_custs")
      )
    graft.plans.Lineage.columnLineage(q)
  }

  /** Single-pass pipeline observability via Spark's `Observation` API:
    * DQ metrics (row count, null count, domain breaches, value sums)
    * collected ON THE SAME JOB that produces the output — the observe
    * node rides the scan as an accumulator, so at 100 TB the metrics
    * cost ZERO extra passes (etl_dq_checks, by contrast, is a
    * dedicated audit scan; both postures are needed — this one is the
    * per-run health telemetry every production pipeline emits). The
    * observed action here is the pipeline's real output (a filtered
    * write-shaped aggregate); the key returns the metrics row, which
    * the oracle recomputes relationally. The one-row driver-side
    * collect is the metric VALUES, bounded by construction. */
  val etlObserveMetrics: Q = (spark, dir) => {
    val obs = new org.apache.spark.sql.Observation()
    val out = Tables
      .lineitem(spark, dir)
      .observe(
        obs,
        count(lit(1)).as("n_rows"),
        sum(when(col("l_quantity") > 45, 1).otherwise(0)).as("n_hi_qty"),
        count(when(col("l_returnflag").isNull, 1)).as("n_null_flag"),
        round(sum("l_extendedprice"), 2).as("sum_price")
      )
      .filter(col("l_quantity") > 45)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"))
    out.collect() // the pipeline's own action; metrics ride it
    val m = obs.get
    import spark.implicits._
    Seq(
      (
        m("n_rows").asInstanceOf[Long],
        m("n_hi_qty").asInstanceOf[Long],
        m("n_null_flag").asInstanceOf[Long],
        m("sum_price").asInstanceOf[Double]
      )
    ).toDF("n_rows", "n_hi_qty", "n_null_flag", "sum_price")
  }

  /** Recursively flatten nested struct columns into top-level columns
    * with underscore-joined names — the normalization step between a
    * document-shaped source (JSON/XML/VARIANT ingest) and a columnar
    * warehouse table. Pure projection: one codegen'd map pass, no
    * shuffle, and column pruning still reaches the scan because the
    * flattened columns are ordinary nested-field references (Catalyst
    * pushes struct-field extraction into parquet's column indexes).
    * Arrays are left as values (explode is a row-multiplying decision
    * the caller owns — see text_chunk_words/udtf_generator for that
    * posture). */
  def flattenNested(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.types.StructType
    def cols(
        schema: StructType,
        path: Seq[String]
    ): Seq[org.apache.spark.sql.Column] =
      schema.fields.toSeq.flatMap { f =>
        val p = path :+ f.name
        f.dataType match {
          case st: StructType => cols(st, p)
          case _ =>
            Seq(col(p.mkString(".")).as(p.mkString("_")))
        }
      }
    df.select(cols(df.schema, Nil): _*)
  }

  /** [[flattenNested]] over a document-shaped projection of customer —
    * the oracle rebuilds the flat table directly from source. */
  val etlFlattenNested: Q = (spark, dir) =>
    flattenNested(
      Tables
        .customer(spark, dir)
        .select(
          col("c_custkey"),
          struct(
            col("c_name").as("name"),
            struct(
              col("c_acctbal").as("bal"),
              col("c_mktsegment").as("seg")
            ).as("account")
          ).as("profile")
        )
    ).orderBy("c_custkey")

  val queries: Map[String, Q] = Map(
    "etl_flatten_nested" -> etlFlattenNested,
    "etl_observe_metrics" -> etlObserveMetrics,
    "etl_lineage" -> etlLineage,
    "etl_pseudonymize" -> etlPseudonymize,
    "etl_kanonymity" -> etlKanonymity,
    "etl_mapping_dsl" -> etlMappingDsl,
    "etl_dedup_incremental" -> etlDedupIncremental,
    "etl_shard_assign" -> etlShardAssign,
    "etl_fuzzy_match" -> etlFuzzyMatch,
    "ts_interpolate" -> tsInterpolate,
    "etl_snapshot_diff" -> etlSnapshotDiff,
    "etl_dq_checks" -> etlDqChecks,
    "etl_pack_sequences" -> etlPackSequences,
    "etl_data_mixture" -> etlDataMixture,
    "ts_gapfill" -> tsGapfill,
    "etl_global_ids" -> etlGlobalIds,
    "etl_upsert_scd1" -> etlUpsertScd1,
    "etl_schema_drift" -> etlSchemaDrift,
    "etl_scd2" -> etlScd2,
    "etl_sample_hash" -> etlSampleHash,
    "etl_sample_stratified" -> etlSampleStratified,
    "etl_merge" -> etlMerge,
    "sql_subquery" -> sqlSubquery,
    "sql_recursive_cte" -> sqlRecursiveCte
  )

  val oracles: Map[String, String] = Map(
    "etl_flatten_nested" ->
      """SELECT c_custkey, c_name AS profile_name,
        | c_acctbal AS profile_account_bal,
        | c_mktsegment AS profile_account_seg
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "etl_observe_metrics" ->
      """SELECT count(*) AS n_rows,
        | CAST(sum(CASE WHEN l_quantity > 45 THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_hi_qty,
        | count(CASE WHEN l_returnflag IS NULL THEN 1 END) AS n_null_flag,
        | round(sum(l_extendedprice), 2) AS sum_price
        |FROM lineitem""".stripMargin,
    // golden expected mapping — lineage of a fixed query is plan
    // metadata, constant across SFs (see etlLineage scaladoc)
    "etl_lineage" ->
      """SELECT * FROM (VALUES
        | ('n_custs',    'orders',   'o_custkey'),
        | ('region_seg', 'customer', 'c_mktsegment'),
        | ('region_seg', 'nation',   'n_name'),
        | ('revenue',    'orders',   'o_totalprice')
        |) AS t(out_col, src_table, src_col)
        |ORDER BY out_col, src_table, src_col""".stripMargin,
    "etl_pseudonymize" -> etlPseudonymizeSql,
    "etl_kanonymity" -> etlKanonymitySql,
    "etl_mapping_dsl" -> etlMappingDslSql,
    "etl_dedup_incremental" -> etlDedupIncrementalSql,
    "etl_shard_assign" -> etlShardAssignSql,
    "etl_fuzzy_match" -> etlFuzzyMatchSql,
    "ts_interpolate" -> tsInterpolateSql,
    "etl_snapshot_diff" -> etlSnapshotDiffSql,
    "etl_dq_checks" -> etlDqChecksSql,
    "etl_pack_sequences" ->
      """WITH t AS (SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |  FROM documents),
        |c AS (SELECT doc_id, n_tok,
        |  SUM(n_tok) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cs
        |  FROM t)
        |SELECT doc_id, n_tok,
        |  CAST(cs - n_tok AS BIGINT) AS start_off,
        |  CAST((cs - n_tok) // 256 AS BIGINT) AS seq_first,
        |  CAST((cs - 1) // 256 AS BIGINT) AS seq_last
        |FROM c ORDER BY doc_id""".stripMargin,
    // greedy per-source 40%-token-budget fill, integer-exact admission
    "etl_data_mixture" ->
      """WITH t AS (SELECT doc_id, source,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |  FROM documents),
        |tot AS (SELECT source, SUM(n_tok) AS total FROM t GROUP BY source),
        |c AS (SELECT doc_id, source, n_tok,
        |  COALESCE(SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
        |  FROM t)
        |SELECT c.doc_id, c.source, c.n_tok
        |FROM c JOIN tot ON c.source = tot.source
        |WHERE c.before * 10 < tot.total * 4
        |ORDER BY c.doc_id""".stripMargin,
    "ts_gapfill" -> tsGapfillSql,
    "etl_global_ids" ->
      """SELECT doc_id, lang, n_chars,
        | row_number() OVER (ORDER BY doc_id) - 1 AS gid
        |FROM documents ORDER BY doc_id""".stripMargin,
    "etl_scd2" ->
      """SELECT event_id, user_id, event_type, ts AS valid_from,
        | lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
        | lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current
        |FROM events ORDER BY event_id""".stripMargin,
    "etl_sample_hash" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |FROM orders
        |WHERE CASE
        |  WHEN o_orderstatus = 'O'
        |    THEN substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) IN ('0','1','2','3')
        |  WHEN o_orderstatus = 'F'
        |    THEN substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) IN ('0','1')
        |  ELSE substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) = '0' END
        |ORDER BY o_orderkey""".stripMargin,
    // the bounded-heap top-K-per-stratum must equal the textbook
    // window-rank plan row for row
    "etl_sample_stratified" ->
      """WITH ranked AS (
        |  SELECT doc_id, lang, n_chars,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY (doc_id * 2654435761) % 2147483647, doc_id) AS rn
        |  FROM documents)
        |SELECT doc_id, lang, n_chars FROM ranked
        |WHERE rn <= 20 ORDER BY lang, doc_id""".stripMargin,
    "etl_upsert_scd1" ->
      """WITH updates AS (
        |  SELECT c_custkey AS u_custkey, c_name || '_v2' AS u_name,
        |         round(c_acctbal + 100, 2) AS u_acctbal
        |  FROM customer WHERE c_custkey % 10 = 0),
        |inserts AS (
        |  SELECT c_custkey + 1000000 AS u_custkey,
        |         'NewCustomer#' || c_custkey AS u_name,
        |         0.0 AS u_acctbal
        |  FROM customer WHERE c_custkey < 5),
        |changes AS (SELECT * FROM updates UNION ALL SELECT * FROM inserts)
        |SELECT coalesce(c_custkey, u_custkey) AS custkey,
        | coalesce(u_name, c_name) AS name,
        | round(coalesce(u_acctbal, c_acctbal), 2) AS acctbal,
        | CASE WHEN c_custkey IS NULL THEN 'insert'
        |      WHEN u_custkey IS NULL THEN 'keep'
        |      ELSE 'update' END AS op
        |FROM customer FULL OUTER JOIN changes ON c_custkey = u_custkey
        |ORDER BY custkey""".stripMargin,
    "etl_schema_drift" ->
      """SELECT s_suppkey, s_name, s_nationkey, CAST(NULL AS DOUBLE) AS s_acctbal
        |FROM supplier WHERE s_suppkey % 2 = 0
        |UNION ALL
        |SELECT s_suppkey, s_name, CAST(NULL AS INT) AS s_nationkey, s_acctbal
        |FROM supplier WHERE s_suppkey % 2 = 1
        |ORDER BY s_suppkey""".stripMargin,
    "etl_merge" ->
      """WITH matched AS (
        |  SELECT c_custkey AS m_custkey, c_name || '_m' AS m_name,
        |         round(c_acctbal + 100, 2) AS m_acctbal,
        |         c_custkey % 10 = 5 AS m_delete
        |  FROM customer WHERE c_custkey % 5 = 0),
        |inserts AS (
        |  SELECT c_custkey + 2000000 AS m_custkey,
        |         'Merged#' || c_custkey AS m_name,
        |         1.0 AS m_acctbal, false AS m_delete
        |  FROM customer WHERE c_custkey < 5),
        |changes AS (SELECT * FROM matched UNION ALL SELECT * FROM inserts),
        |merged AS (
        |  SELECT c_custkey, c_name, c_acctbal,
        |         m_custkey, m_name, m_acctbal, m_delete
        |  FROM customer FULL OUTER JOIN changes ON c_custkey = m_custkey
        |  WHERE NOT (c_custkey IS NOT NULL AND m_custkey IS NOT NULL
        |             AND m_delete))
        |SELECT coalesce(c_custkey, m_custkey) AS custkey,
        | CASE WHEN c_custkey IS NOT NULL AND m_custkey IS NOT NULL
        |           AND c_acctbal >= 0 THEN m_name
        |      ELSE coalesce(c_name, m_name) END AS name,
        | round(CASE WHEN c_custkey IS NOT NULL AND m_custkey IS NOT NULL
        |           AND c_acctbal >= 0 THEN m_acctbal
        |      ELSE coalesce(c_acctbal, m_acctbal) END, 2) AS acctbal,
        | CASE WHEN c_custkey IS NULL THEN 'insert'
        |      WHEN m_custkey IS NULL THEN 'keep'
        |      WHEN c_acctbal >= 0 THEN 'update'
        |      ELSE 'keep_cond' END AS op
        |FROM merged ORDER BY custkey""".stripMargin,
    "sql_recursive_cte" ->
      """WITH RECURSIVE chain AS (
        |  SELECT * FROM (
        |    SELECT c_nationkey AS nk, c_mktsegment AS seg,
        |           c_custkey AS ck,
        |           CAST(round(c_acctbal * 100) AS BIGINT) AS cents,
        |           row_number() OVER (PARTITION BY c_nationkey, c_mktsegment
        |                              ORDER BY c_custkey) AS rn
        |    FROM customer) t
        |  WHERE rn <= 24
        |),
        |walk AS (
        |  SELECT nk, seg, rn, ck,
        |         least(cents, CAST(100000 AS BIGINT)) AS bal
        |  FROM chain WHERE rn = 1
        |  UNION ALL
        |  SELECT c.nk, c.seg, c.rn, c.ck,
        |         least(w.bal + c.cents, CAST(100000 AS BIGINT)) AS bal
        |  FROM walk w JOIN chain c
        |    ON c.nk = w.nk AND c.seg = w.seg AND c.rn = w.rn + 1
        |)
        |SELECT nk, seg, CAST(max(rn) AS BIGINT) AS chain_len,
        |       CAST(sum(bal) AS BIGINT) AS total_capped_cents,
        |       CAST(max_by(bal, rn) AS BIGINT) AS final_capped_cents
        |FROM walk GROUP BY nk, seg ORDER BY nk, seg""".stripMargin,
    "sql_subquery" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS total
        |FROM orders o
        |WHERE o_totalprice > (SELECT avg(o_totalprice) * 1.8 FROM orders)
        |  AND o_custkey IN (SELECT c_custkey FROM customer
        |                    WHERE c_mktsegment = 'BUILDING')
        |  AND EXISTS (SELECT 1 FROM customer c
        |              WHERE c.c_custkey = o.o_custkey AND c.c_acctbal > 0)
        |ORDER BY o_orderkey""".stripMargin
  )
}
