package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Morton (z-order) curve value over N columns, built entirely from
  * builtin functions — the clustering key behind multi-dimensional
  * file skipping.
  *
  * Lexicographic `sortBy(a, b)` clusters files tightly on `a` but
  * leaves `b` spanning its whole domain in every file — a probe on `b`
  * alone prunes nothing. Interleaving the bits of per-column RANKS
  * gives every file a bounded extent in EVERY dimension, so
  * single-column probes prune on each key independently (the OPTIMIZE
  * ZORDER rationale; at 100 TB this is the difference between one
  * privileged query key and a whole family of prunable predicates).
  *
  * Ranks are EQUI-DEPTH: each column is bucketed by its own
  * `approxQuantile` cut points, so skewed columns still spread across
  * the full bucket range (equi-width `width_bucket` would collapse a
  * heavy-tailed column into a few buckets and lose the curve's
  * balance). The cuts are a bounded driver-side array (≤255 doubles
  * per column) embedded as an array literal; the per-row bucket is the
  * count of cuts ≤ value, computed with the `aggregate` higher-order
  * function — no UDF, no join, no shuffle, scales with the row count
  * only.
  */
object ZCurve {

  /** Z-value column for `df` over `cols` (each cast to double for
    * ranking; nulls rank lowest). `bits` buckets per column as
    * 2^bits; cols.size * bits must fit a long. The returned column
    * references only `cols`, so it can be attached to any DataFrame
    * with the same columns — but the cuts are computed from THIS
    * df's distribution. */
  def zValue(df: DataFrame, cols: Seq[String], bits: Int = 8): Column = {
    require(cols.nonEmpty, "zValue needs at least one column")
    require(cols.size * bits <= 62, s"${cols.size} cols x $bits bits overflows a long")
    val nCuts = (1 << bits) - 1
    val probes = (1 to nCuts).map(_.toDouble / (nCuts + 1)).toArray
    // ONE pass computes every column's cut points (bounded driver-side
    // metadata: ≤255 doubles per column) — not a job per column
    val allCuts = df
      .select(cols.map(c => col(c).cast("double").as(c)): _*)
      .stat
      .approxQuantile(cols.toArray, probes, 0.001)
    val buckets = cols.zip(allCuts).map { case (c, raw) =>
      val cuts = raw.distinct.sorted
      val v = col(c).cast("double")
      // equi-depth bucket = #cuts <= value, via the aggregate HOF over
      // the cut array literal; nulls contribute 0 (lowest bucket)
      aggregate(
        array(cuts.map(lit(_)): _*),
        lit(0),
        (acc, cut) => acc + when(v.isNotNull && v >= cut, 1).otherwise(0)
      ).cast("long")
    }
    // interleave: bit b of column i lands at position b*k + i
    val k = cols.size
    val terms = for {
      b <- 0 until bits
      i <- 0 until k
    } yield shiftleft(shiftright(buckets(i), b).bitwiseAND(lit(1L)), b * k + i)
    terms.reduce(_ + _)
  }
}
