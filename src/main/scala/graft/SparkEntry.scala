package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the declared operator inventory (SURVEY.md §2): one entry
  * per operator, assembled from the per-category modules. `oracleSql`
  * carries the DuckDB-equivalent ANSI SQL for every hash-checkable query.
  */
object SparkEntry {

  private val modules: Seq[(Map[String, Q], Map[String, String])] = Seq(
    (operators.Scans.queries, operators.Scans.oracles),
    (operators.Project.queries, operators.Project.oracles),
    (operators.Aggregates.queries, operators.Aggregates.oracles),
    (operators.Joins.queries, operators.Joins.oracles),
    (operators.Windows.queries, operators.Windows.oracles),
    (operators.SetOps.queries, operators.SetOps.oracles),
    (operators.StreamingBatch.queries, operators.StreamingBatch.oracles),
    (operators.Etl.queries, operators.Etl.oracles),
    (operators.EventAnalytics.queries, operators.EventAnalytics.oracles),
    (functions.ScalarFns.queries, functions.ScalarFns.oracles),
    (functions.Udfs.queries, functions.Udfs.oracles),
    (text.TextOps.queries, text.TextOps.oracles),
    (text.Dedup.queries, text.Dedup.oracles),
    (sim.Similarity.queries, sim.Similarity.oracles),
    (multimodal.Multimodal.queries, multimodal.Multimodal.oracles)
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Aggregates.aggHash(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.iterator.flatMap(_._1).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    modules.iterator.flatMap(_._2).toMap
}
