package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** §2.6 Sort / limit / top-k / set operations (SURVEY.md).
  *
  * `topk_global` compiles to TakeOrderedAndProjectExec — a streaming
  * per-partition top-k heap + driver merge, O(n log k), never a full
  * sort: exactly what you want at 100 TB. Set ops are distinct
  * aggregates under the hood and shuffle once on the full row.
  */
object SetOps {

  val sortMulti: Q = (spark, dir) =>
    Tables
      .supplier(spark, dir)
      .orderBy(col("s_nationkey").desc, col("s_acctbal").asc, col("s_suppkey"))

  val topkGlobal: Q = (spark, dir) =>
    Tables
      .orders(spark, dir)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)

  /** UNION ALL + grouped dedup: n_src records whether a customer came
    * from one slice or both, exercising bag and set semantics at once. */
  val setUnionDedup: Q = (spark, dir) => {
    val c = Tables.customer(spark, dir)
    val a = c.filter(col("c_mktsegment") === "AUTOMOBILE")
      .select("c_custkey", "c_name")
    val b = c.filter(col("c_acctbal") > 8000).select("c_custkey", "c_name")
    a.unionByName(b)
      .groupBy("c_custkey", "c_name")
      .agg(count(lit(1)).as("n_src"))
      .orderBy("c_custkey")
  }

  val setIntersect: Q = (spark, dir) =>
    Tables
      .customer(spark, dir)
      .filter(col("c_mktsegment") === "AUTOMOBILE")
      .select(col("c_custkey").as("custkey"))
      .intersect(
        Tables.orders(spark, dir).select(col("o_custkey").as("custkey"))
      )
      .orderBy("custkey")

  val setExcept: Q = (spark, dir) =>
    Tables
      .customer(spark, dir)
      .filter(col("c_mktsegment") === "AUTOMOBILE")
      .select(col("c_custkey").as("custkey"))
      .except(
        Tables
          .orders(spark, dir)
          .filter(col("o_totalprice") > 450000)
          .select(col("o_custkey").as("custkey"))
      )
      .orderBy("custkey")

  /** Z-order (Morton) interleave of two 8-bit dimensions, shared as one
    * SQL fragment between Spark and the oracle (and mirrored in
    * PropertySpec's bijection law). */
  private[graft] val zExprSql: String = {
    val terms = (0 until 8).flatMap { b =>
      Seq(
        s"((zx >> $b) & 1) * ${1L << (2 * b)}",
        s"((zy >> $b) & 1) * ${1L << (2 * b + 1)}"
      )
    }
    terms.mkString(" + ")
  }

  /** Z-order layout keys: interleave (custkey, order-day) bits into a
    * Morton code and range-sort by it — rows close in BOTH dimensions
    * land in the same files, so either-dimension predicates prune at
    * 100 TB (the multi-dimensional clustering trick parquet min/max
    * stats need; a straight sort clusters only its leading column). */
  val sortZorder: Q = (spark, dir) =>
    Tables
      .orders(spark, dir)
      .withColumn("zx", (col("o_custkey") % 256).cast("bigint"))
      .withColumn("zy", dayofyear(col("o_orderdate")).cast("bigint") % 256)
      .withColumn("z", expr(zExprSql))
      .select("o_orderkey", "zx", "zy", "z")
      .orderBy("z", "o_orderkey")

  /** Multiset difference (EXCEPT ALL): open-order custkey occurrences
    * minus finished-order occurrences, multiplicity-aware — Catalyst
    * rewrites it into one count aggregate + replication generate, so
    * the shuffle is keyed on the value and carries counts, not copies.
    * Emitted as (custkey, surviving multiplicity) so the output is
    * deterministic for the hash gate. */
  val setExceptAll: Q = (spark, dir) => {
    val o = Tables.orders(spark, dir)
    o.filter(col("o_orderstatus") === "O")
      .select(col("o_custkey").as("custkey"))
      .exceptAll(
        o.filter(col("o_orderstatus") === "F")
          .select(col("o_custkey").as("custkey"))
      )
      .groupBy("custkey")
      .agg(count(lit(1)).as("n"))
      .orderBy("custkey")
  }

  /** SYMMETRIC multiset difference — rows on exactly one side, with
    * multiplicity: (A ∖ B) ⊎ (B ∖ A), the "what changed in either
    * direction" primitive reconciliation jobs run. Both legs are the
    * same count-based exceptAll rewrite (two-phase hash aggregation on
    * the key, no sort), unioned map-side and re-aggregated — at 100 TB
    * this is two shuffles on the key and nothing else. A `side` tag
    * disambiguates provenance, which a plain UNION of excepts would
    * lose. */
  val setSymmetricDiff: Q = (spark, dir) => {
    val o = Tables.orders(spark, dir)
    def leg(a: String, b: String, tag: String) =
      o.filter(col("o_orderstatus") === a)
        .select(col("o_custkey").as("custkey"))
        .exceptAll(
          o.filter(col("o_orderstatus") === b)
            .select(col("o_custkey").as("custkey")))
        .withColumn("side", lit(tag))
    leg("O", "F", "only_open")
      .unionByName(leg("F", "O", "only_finished"))
      .groupBy("custkey", "side")
      .agg(count(lit(1)).as("n"))
      .orderBy("custkey", "side")
  }

  /** Multiset intersection (INTERSECT ALL): per-custkey min(open
    * occurrences, finished occurrences) — same count-based rewrite. */
  val setIntersectAll: Q = (spark, dir) => {
    val o = Tables.orders(spark, dir)
    o.filter(col("o_orderstatus") === "O")
      .select(col("o_custkey").as("custkey"))
      .intersectAll(
        o.filter(col("o_orderstatus") === "F")
          .select(col("o_custkey").as("custkey"))
      )
      .groupBy("custkey")
      .agg(count(lit(1)).as("n"))
      .orderBy("custkey")
  }

  val queries: Map[String, Q] = Map(
    "sort_zorder" -> sortZorder,
    "sort_multi" -> sortMulti,
    "topk_global" -> topkGlobal,
    "set_union_dedup" -> setUnionDedup,
    "set_intersect" -> setIntersect,
    "set_except" -> setExcept,
    "set_except_all" -> setExceptAll,
    "set_intersect_all" -> setIntersectAll,
    "set_symmetric_diff" -> setSymmetricDiff
  )

  val oracles: Map[String, String] = Map(
    "set_except_all" ->
      """WITH d AS (
        |  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
        |  EXCEPT ALL
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
        |SELECT custkey, CAST(count(*) AS BIGINT) AS n
        |FROM d GROUP BY 1 ORDER BY custkey""".stripMargin,
    "set_symmetric_diff" ->
      """WITH a AS (
        |  SELECT o_custkey AS custkey, 'only_open' AS side FROM
        |  (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |   EXCEPT ALL
        |   SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')),
        |b AS (
        |  SELECT o_custkey AS custkey, 'only_finished' AS side FROM
        |  (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |   EXCEPT ALL
        |   SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'))
        |SELECT custkey, side, CAST(count(*) AS BIGINT) AS n
        |FROM (SELECT * FROM a UNION ALL SELECT * FROM b) t
        |GROUP BY 1, 2 ORDER BY custkey, side""".stripMargin,
    "set_intersect_all" ->
      """WITH d AS (
        |  SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
        |  INTERSECT ALL
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
        |SELECT custkey, CAST(count(*) AS BIGINT) AS n
        |FROM d GROUP BY 1 ORDER BY custkey""".stripMargin,
    "sort_zorder" ->
      s"""SELECT o_orderkey, zx, zy, $zExprSql AS z FROM (
         |  SELECT o_orderkey,
         |   CAST(o_custkey % 256 AS BIGINT) AS zx,
         |   CAST(dayofyear(o_orderdate) AS BIGINT) % 256 AS zy
         |  FROM orders) t
         |ORDER BY z, o_orderkey""".stripMargin,
    "sort_multi" ->
      """SELECT * FROM supplier
        |ORDER BY s_nationkey DESC, s_acctbal, s_suppkey""".stripMargin,
    "topk_global" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "set_union_dedup" ->
      """SELECT c_custkey, c_name, count(*) AS n_src FROM (
        |  SELECT c_custkey, c_name FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
        |  UNION ALL
        |  SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 8000) t
        |GROUP BY c_custkey, c_name ORDER BY c_custkey""".stripMargin,
    "set_intersect" ->
      """SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
        |INTERSECT
        |SELECT o_custkey AS custkey FROM orders
        |ORDER BY custkey""".stripMargin,
    "set_except" ->
      """SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
        |EXCEPT
        |SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 450000
        |ORDER BY custkey""".stripMargin
  )
}
