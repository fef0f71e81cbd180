package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** §2.2 Projection, schema mapping, predicates (SURVEY.md).
  *
  * `project_rename_cast` is the reference's core capability
  * [INFERRED, SURVEY.md §1.1]: map a source schema onto a target
  * schema — rename, reorder, cast, derive. All narrow (no shuffle);
  * Catalyst collapses the projections into the scan.
  */
object Project {

  val projectRenameCast: Q = (spark, dir) =>
    Tables
      .lineitem(spark, dir)
      .select(
        col("l_orderkey").as("order_id"),
        col("l_linenumber").as("line_no"),
        floor(col("l_quantity")).cast("int").as("qty"),
        // price and discount each have 2 decimals, so the exact product
        // has 4 — rounding at 2 would sit exactly on half-cent boundaries
        // where HALF_UP (Spark) and HALF_EVEN (DuckDB doubles) disagree.
        round(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
          .as("net_price"),
        to_date(col("l_shipdate")).as("ship_date"),
        concat_ws("-", col("l_returnflag"), col("l_linestatus"))
          .as("flag_status")
      )
      .orderBy("order_id", "line_no")

  /** Conjunctive + disjunctive predicates, BETWEEN, IN, comparison. */
  val filterPred: Q = (spark, dir) =>
    Tables
      .lineitem(spark, dir)
      .filter(
        (col("l_returnflag") === "A" || col("l_linestatus") === "O") &&
          col("l_quantity").between(5, 24) &&
          col("l_discount").isin(0.02, 0.03, 0.05, 0.08) &&
          expr("l_shipdate >= TIMESTAMP '1996-06-01'")
      )
      .select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        "l_linestatus",
        "l_quantity",
        "l_discount"
      )
      .orderBy("l_orderkey", "l_linenumber")

  /** Three-valued-logic correctness: NOT IN over a nullable column
    * drops nulls; the null-safe comparison (`<=>` /
    * IS NOT DISTINCT FROM) re-admits them. */
  val filterNullHandling: Q = (spark, dir) =>
    Tables
      .orders(spark, dir)
      .withColumn("s", expr("nullif(o_orderstatus, 'P')"))
      .filter(!col("s").isin("O") || col("s") <=> lit(null))
      .select("o_orderkey", "s")
      .orderBy("o_orderkey")

  val queries: Map[String, Q] = Map(
    "project_rename_cast" -> projectRenameCast,
    "filter_pred" -> filterPred,
    "filter_null_handling" -> filterNullHandling
  )

  val oracles: Map[String, String] = Map(
    "project_rename_cast" ->
      """SELECT l_orderkey AS order_id, l_linenumber AS line_no,
        | CAST(floor(l_quantity) AS INT) AS qty,
        | round(l_extendedprice*(1-l_discount),4) AS net_price,
        | CAST(l_shipdate AS DATE) AS ship_date,
        | concat_ws('-', l_returnflag, l_linestatus) AS flag_status
        |FROM lineitem ORDER BY order_id, line_no""".stripMargin,
    "filter_pred" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus,
        | l_quantity, l_discount
        |FROM lineitem
        |WHERE (l_returnflag = 'A' OR l_linestatus = 'O')
        |  AND l_quantity BETWEEN 5 AND 24
        |  AND l_discount IN (0.02, 0.03, 0.05, 0.08)
        |  AND l_shipdate >= TIMESTAMP '1996-06-01'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "filter_null_handling" ->
      """SELECT o_orderkey, nullif(o_orderstatus,'P') AS s
        |FROM orders
        |WHERE NOT (nullif(o_orderstatus,'P') IN ('O'))
        |   OR nullif(o_orderstatus,'P') IS NOT DISTINCT FROM NULL
        |ORDER BY o_orderkey""".stripMargin
  )
}
