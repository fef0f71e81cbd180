package graft.operators

import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{Column, DataFrame, Row}

/** The shared two-phase range-partition/prefix-offset scheme (the
  * etl_global_ids pattern): a GLOBAL ordered scan — rank, keyed prefix
  * sum, running max — computed without the single-task
  * `Window.orderBy` anti-pattern that serializes the whole table
  * through one partition at any scale.
  *
  * Phase 1 range-partitions on the order keys, sorts within
  * partitions, and collects ONE bounded summary per partition (a
  * count, a per-key subtotal map, a max — never rows). Phase 2
  * prefix-combines the summaries on the driver and re-scans each
  * partition seeded with the combined summary of everything BEFORE it,
  * so every task sees only its own range slice while producing the
  * exact global-order answer. Previously hand-rolled three times
  * (win_ntile_cume, etl_shard_assign, stream_watermark_late); the
  * round-6 handoff flagged the duplication.
  */
private[graft] object TwoPhase {

  /** Runs `body(prefixBefore, grandTotal, rows)` over each range
    * partition, where `prefixBefore` is `combine` folded over the
    * summaries of all partitions strictly before this one (seeded with
    * `zero`) and `grandTotal` is the fold over ALL partitions.
    *
    * The sorted frame is deliberately NOT cached: both passes share
    * the one range exchange via Spark's ReuseExchange, and the phase-1
    * pass reduces each partition to a single summary value, so the
    * recompute is the cheaper side of a materialization.
    *
    * DETERMINISM REQUIREMENT: `df` must be a deterministic frame and
    * `keys` a total order (unique across rows). The two jobs evaluate
    * the same lazy plan independently, so the range boundaries and the
    * within-partition row order must reproduce exactly between the
    * summary pass and the output pass — a non-deterministic source
    * (sampling, rand(), a shuffling non-stable input) or a key with
    * duplicates would silently misalign prefix offsets with partition
    * contents. Every current caller orders by a unique key suffix
    * (c_custkey / o_orderkey / event id) over a parquet scan, which
    * satisfies both.
    */
  def prefixScan[S](
      df: DataFrame,
      numPartitions: Int,
      keys: Seq[Column],
      zero: S
  )(summarize: Iterator[Row] => S)(combine: (S, S) => S)(
      outSchema: StructType
  )(body: (S, S, Iterator[Row]) => Iterator[Row]): DataFrame = {
    val sorted = df
      .repartitionByRange(numPartitions, keys: _*)
      .sortWithinPartitions(keys: _*)
    val summaries = sorted.rdd
      .mapPartitionsWithIndex((i, it) => Iterator((i, summarize(it))))
      .collect()
      .toVector
      .sortBy(_._1)
      .map(_._2)
    val prefixes = summaries.scanLeft(zero)(combine)
    val total = prefixes.last
    val out = sorted.rdd.mapPartitionsWithIndex { (i, it) =>
      body(prefixes(i), total, it)
    }
    df.sparkSession.createDataFrame(out, outSchema)
  }
}
