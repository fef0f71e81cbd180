package graft

import graft.operators.Scans
import org.apache.spark.sql.functions._

/** The JDBC connector keys against embedded Derby: round-trip
  * fidelity, the partitioned-extraction shape, WHERE-clause filter
  * pushdown, and DSv2 aggregate pushdown — all pinned on the PLAN,
  * not just the result, because pushdown silently not engaging would
  * still produce correct rows while shipping the whole table.
  */
class JdbcSpec extends SparkTestBase {

  test("source_jdbc: round-trips through Derby, filter pushed, 8 partitions") {
    val out = Scans.sourceJdbc(spark, sf0001)
    val expected = Tables
      .customer(spark, sf0001)
      .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
      .filter(col("c_acctbal") > 0)
      .orderBy("c_custkey")
    assert(out.columns.toSeq ==
      Seq("c_custkey", "c_name", "c_acctbal", "c_mktsegment"))
    assert(out.collect().toSeq == expected.collect().toSeq,
      "JDBC round-trip must be byte-identical to the source projection")
    // the partitioned read: 8 range-predicated remote queries (the
    // key ends in orderBy, so count partitions on the SCAN node's
    // metadata, not the post-sort output)
    val scan = Scans.sourceJdbc(spark, sf0001)
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("numPartitions=8"),
      s"partitionColumn/numPartitions must shape the extraction into" +
        s" 8 range queries, plan was:\n$plan")
    // the filter reached the remote WHERE clause: PushedFilters in
    // the scan metadata
    assert(plan.contains("PushedFilters:") && plan.contains("c_acctbal"),
      s"filter must push into the JDBC scan, plan was:\n$plan")
  }

  test("source_jdbc_pushdown: the aggregate compiles into the remote query") {
    val out = Scans.sourceJdbcPushdown(spark, sf0001)
    val expected = Tables
      .orders(spark, sf0001)
      .groupBy("o_orderstatus")
      .agg(
        count(lit(1)).as("n_orders"),
        round(sum("o_totalprice"), 2).as("sum_price"),
        max("o_orderkey").as("max_key"))
      .orderBy("o_orderstatus")
    assert(out.columns.toSeq ==
      Seq("o_orderstatus", "n_orders", "sum_price", "max_key"))
    assert(out.collect().toSeq == expected.collect().toSeq,
      "remote aggregation must match Spark recomputing from parquet")
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregates"),
      s"COUNT/SUM/MAX must push into the remote query, plan was:\n$plan")
    assert(plan.contains("PushedGroupByExpressions"),
      s"GROUP BY must push into the remote query, plan was:\n$plan")
  }

  test("fresh() is a deterministic empty slate across reruns in one JVM") {
    // second run of the same key in the same JVM: the booted database
    // shuts down, the directory clears, the overwrite recreates — no
    // duplicate rows, no lock refusal
    val again = Scans.sourceJdbc(spark, sf0001)
    val n = Tables
      .customer(spark, sf0001)
      .filter(col("c_acctbal") > 0)
      .count()
    assert(again.count() == n, "rerun must not duplicate or lose rows")
  }
}
