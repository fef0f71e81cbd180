package graft

import org.scalatest.funsuite.AnyFunSuite

/** Inventory consistency: module maps must not collide (Map ++ would
  * silently drop queries) and every oracle must have a query. */
class InventorySpec extends AnyFunSuite {

  private val moduleMaps: Seq[(String, Map[String, Q])] = Seq(
    "Scans" -> operators.Scans.queries,
    "Project" -> operators.Project.queries,
    "Aggregates" -> operators.Aggregates.queries,
    "Joins" -> operators.Joins.queries,
    "Windows" -> operators.Windows.queries,
    "SetOps" -> operators.SetOps.queries,
    "StreamingBatch" -> operators.StreamingBatch.queries,
    "Etl" -> operators.Etl.queries,
    "EventAnalytics" -> operators.EventAnalytics.queries,
    "ScalarFns" -> functions.ScalarFns.queries,
    "Udfs" -> functions.Udfs.queries,
    "TextOps" -> text.TextOps.queries,
    "Dedup" -> text.Dedup.queries,
    "Similarity" -> sim.Similarity.queries,
    "Multimodal" -> multimodal.Multimodal.queries
  )

  test("no duplicate query keys across modules") {
    val all = moduleMaps.flatMap { case (m, qs) => qs.keys.map(_ -> m) }
    val dups = all.groupBy(_._1).filter(_._2.size > 1)
    assert(dups.isEmpty, s"duplicate keys: $dups")
    assert(SparkEntry.queries.size == all.size)
  }

  test("every oracle key has a matching query; oracle SQL is non-empty") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      assert(sql.trim.nonEmpty, s"empty oracle for $k")
    }
  }

  test("declared inventory covers every SURVEY §2 area") {
    val keys = SparkEntry.queries.keySet
    val areas = Map(
      "scan" -> "scan_parquet", "source" -> "source_csv",
      "sink" -> "sink_partitioned", "project" -> "project_rename_cast",
      "filter" -> "filter_pred", "join" -> "join_asof",
      "agg" -> "agg_hash", "window" -> "win_running",
      "setop" -> "set_intersect", "scalar" -> "fn_date",
      "udf" -> "udf_scalar", "udaf" -> "udaf_typed",
      "udtf" -> "udtf_generator", "text" -> "text_tokens_tf",
      "dedup" -> "dedup_minhash_near", "sim" -> "sim_topk_nn",
      "multimodal" -> "mm_decode_stub", "streaming" -> "stream_session"
    )
    areas.foreach { case (area, key) =>
      assert(keys.contains(key), s"area $area missing key $key")
    }
  }
}
