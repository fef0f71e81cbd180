package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

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
  * Ranks are EQUI-DEPTH: each column is bucketed by its own cut
  * points, so skewed columns still spread across the full bucket range
  * (equi-width `width_bucket` would collapse a heavy-tailed column
  * into a few buckets and lose the curve's balance). Numeric columns
  * get their cuts from ONE `approxQuantile` pass; STRING columns —
  * the natural clustering keys of a text corpus (source, language,
  * URL host), which approxQuantile rejects — get rank-based cuts from
  * a bounded uniform sample sorted driver-side (the manifest's
  * short-string footer stats make the resulting layout prunable via
  * `readPrunedString`). Either way the cuts are a bounded driver-side
  * array (≤255 values per column) embedded as literals; the per-row
  * bucket is the count of cuts ≤ value, computed with the `aggregate`
  * higher-order function — no UDF, no join, no shuffle, scales with
  * the row count only.
  */
object ZCurve {

  /** Z-value column for `df` over `cols` (numeric cols cast to double
    * for ranking, string cols ranked lexicographically; nulls rank
    * lowest). `bits` buckets per column as 2^bits; cols.size * bits
    * must fit a long. The returned column references only `cols`, so
    * it can be attached to any DataFrame with the same columns — but
    * the cuts are computed from THIS df's distribution. */
  def zValue(df: DataFrame, cols: Seq[String], bits: Int = 8): Column = {
    require(cols.nonEmpty, "zValue needs at least one column")
    require(cols.size * bits <= 62, s"${cols.size} cols x $bits bits overflows a long")
    val nCuts = (1 << bits) - 1
    val isStr: Map[String, Boolean] =
      cols.map(c => c -> (df.schema(c).dataType == StringType)).toMap
    val numCols = cols.filterNot(isStr)
    val strCols = cols.filter(isStr)
    // ONE pass computes every numeric column's cut points (bounded
    // driver-side metadata: ≤255 doubles per column) — not a job per
    // column
    val probes = (1 to nCuts).map(_.toDouble / (nCuts + 1)).toArray
    // Quantile accuracy tied to the layout's own granularity
    // (optimization round 19, guide §1.2 "don't compute more than you
    // use"): a cut that is off by half a bucket WIDTH only smears rows
    // between two adjacent equi-depth buckets — indistinguishable, for
    // file skipping, from the sampling drift the string path already
    // accepts — while the Greenwald-Khanna sketch the pass builds
    // costs O(1/ε) per merge. The former ε=0.001 was ~4x finer than a
    // 256-bucket layout can express; at a 100 TB OPTIMIZE ZORDER the
    // cut pass is a full-table scan and its sketch cost is the
    // driver's merge wall. Correctness is untouched by construction:
    // the z column orders the REWRITE's layout and is dropped before
    // commit, so cut values can never reach a query result. At coarse
    // relErr (small caller-supplied `bits`, e.g. bits=2 → ε=0.125)
    // approxQuantile may return colliding or even inverted cuts; that
    // is absorbed by the `.distinct.sorted` at the bucket expression
    // below, so the safety does not depend on the sketch returning
    // monotone cuts.
    val relErr = 1.0 / (2.0 * (nCuts + 1))
    val numCuts: Map[String, Array[Double]] =
      if (numCols.isEmpty) Map.empty
      else
        numCols
          .zip(
            df.select(numCols.map(c => col(c).cast("double").as(c)): _*)
              .stat
              .approxQuantile(numCols.toArray, probes, relErr))
          .toMap
    // string columns: equi-depth cuts from a seeded uniform sample —
    // ~20 sampled values per bucket bound both the sample job and the
    // driver sort; sampling error only smears bucket boundaries
    // (layout quality), never correctness, by the skipping invariant
    val strCuts: Map[String, Array[String]] =
      if (strCols.isEmpty) Map.empty
      else {
        val total = df.count()
        val target = (nCuts + 1) * 20L
        val fraction =
          math.min(1.0, target.toDouble / math.max(1L, total).toDouble)
        strCols.map { c =>
          val vals = df
            .select(col(c))
            .na.drop(Seq(c))
            .sample(withReplacement = false, fraction, seed = 42)
            .collect()
            .map(_.getString(0))
            .sorted
          val cuts =
            if (vals.isEmpty) Array.empty[String]
            else
              (1 to nCuts)
                .map(i =>
                  vals(((i.toLong * vals.length) / (nCuts + 1)).toInt
                    .min(vals.length - 1)))
                .toArray
                .distinct
                .sorted
          c -> cuts
        }.toMap
      }
    val buckets = cols.map { c =>
      // equi-depth bucket = #cuts <= value, via the aggregate HOF over
      // the cut array literal; nulls contribute 0 (lowest bucket)
      // an all-null / empty column yields no cuts: constant bucket 0
      // (an empty array literal would be NULL-typed and fail analysis)
      if (isStr(c)) {
        val cuts = strCuts(c)
        val v = col(c)
        if (cuts.isEmpty) lit(0L)
        else
          aggregate(
            array(cuts.map(lit(_)): _*),
            lit(0),
            (acc, cut) => acc + when(v.isNotNull && v >= cut, 1).otherwise(0)
          ).cast("long")
      } else {
        val cuts = numCuts(c).distinct.sorted
        val v = col(c).cast("double")
        if (cuts.isEmpty) lit(0L)
        else
          aggregate(
            array(cuts.map(lit(_)): _*),
            lit(0),
            (acc, cut) => acc + when(v.isNotNull && v >= cut, 1).otherwise(0)
          ).cast("long")
      }
    }
    // interleave: bit b of column i lands at position b*k + i.
    // Optimization round 19 (guide §4): the former per-bit spelling
    // (bits × cols shift/mask terms, each re-referencing its bucket
    // expression) duplicated every bucket's aggregate HOF — which is
    // CodegenFallback, so each of the `bits` copies re-ran the whole
    // cut loop per row. The bit-spread of a bucket value depends only
    // on the value, so it is precomputed here as a 2^bits-entry lookup
    // table, embedded as a foldable array literal (constant-folded to
    // one Literal): each bucket expression now appears EXACTLY ONCE,
    // and the per-row work per column is one cut loop + one O(1)
    // array lookup. The produced z value is bit-identical:
    // spread(bucket_i) << i == Σ_b bit_b(bucket_i) << (b*k + i).
    val k = cols.size
    val spread: IndexedSeq[Long] = (0 to nCuts).map { v =>
      (0 until bits).map(b => ((v.toLong >> b) & 1L) << (b * k)).sum
    }
    val spreadLit = array(spread.map(lit(_)): _*)
    val terms = buckets.zipWithIndex.map { case (bkt, i) =>
      shiftleft(element_at(spreadLit, (bkt + lit(1L)).cast("int")), i)
    }
    terms.reduce(_ + _)
  }
}
