package graft.functions

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Encoder, Encoders}

/** §2.8 UDF / UDAF / UDTF surface (SURVEY.md). */
object Udfs {

  /** Typed input/buffer for the weighted-mean Aggregator. */
  case class WPoint(x: Double, w: Double)
  case class WBuf(s: Double, w: Double)

  /** Custom typed aggregate: weighted mean. The buffer is a flat case
    * class, so merge is a cheap two-double combine — map-side partials
    * at any scale, exactly like the builtin sum/avg pair. */
  object WeightedMean extends Aggregator[WPoint, WBuf, Double] {
    override def zero: WBuf = WBuf(0.0, 0.0)
    override def reduce(b: WBuf, p: WPoint): WBuf =
      WBuf(b.s + p.x * p.w, b.w + p.w)
    override def merge(a: WBuf, b: WBuf): WBuf = WBuf(a.s + b.s, a.w + b.w)
    override def finish(b: WBuf): Double =
      if (b.w == 0.0) Double.NaN else b.s / b.w
    override def bufferEncoder: Encoder[WBuf] = Encoders.product[WBuf]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Count-Min sketch as a typed Aggregator — the novel-sketch slot of
    * the custom-aggregation surface. Buffer = flat d×w counter array
    * (merge is elementwise add, so map-side partials combine like any
    * builtin agg); depth 4 × width 512 gives ε = e/512 ≈ 0.53% of the
    * stream length as the overestimate bound with prob ≥ 1 − e⁻⁴.
    * Hashes are MurmurHash3 with fixed per-row seeds — deterministic
    * across JVMs/executors. Frequencies are never underestimated
    * (asserted, with the ε bound, in PipelineOpsSpec). */
  object CountMin {
    val Depth = 4
    val Width = 512

    def slot(row: Int, s: String): Int = {
      val h = scala.util.hashing.MurmurHash3.stringHash(s, 0x9747b28c + row)
      math.floorMod(h, Width)
    }

    object Sketch extends Aggregator[String, Array[Long], Array[Long]] {
      override def zero: Array[Long] = Array.ofDim[Long](Depth * Width)
      override def reduce(b: Array[Long], s: String): Array[Long] = {
        var r = 0
        while (r < Depth) { b(r * Width + slot(r, s)) += 1; r += 1 }
        b
      }
      override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
        var i = 0
        while (i < a.length) { a(i) += b(i); i += 1 }
        a
      }
      override def finish(b: Array[Long]): Array[Long] = b
      override def bufferEncoder: Encoder[Array[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
      override def outputEncoder: Encoder[Array[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    }

    def estimate(sketch: Array[Long], s: String): Long = {
      var best = Long.MaxValue
      var r = 0
      while (r < Depth) {
        val c = sketch(r * Width + slot(r, s))
        if (c < best) best = c
        r += 1
      }
      best
    }
  }

  /** Sketch the corpus term stream once, then report the CMS estimate
    * next to the exact count for the 20 most frequent terms. The
    * sketch is a single 16 KB array — constant state regardless of
    * vocabulary size, the point of a sketch at 100 TB (exact counting
    * shuffles the whole vocabulary). No SQL oracle (sketch internals
    * aren't SQL-expressible); bounds are asserted in PipelineOpsSpec. */
  val aggCountmin: Q = (spark, dir) => {
    import spark.implicits._
    val words = Tables
      .documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("w"))
    val sketch = udaf(CountMin.Sketch)
    val sk = words.agg(sketch(col("w")).as("sk"))
    val est = udf((sk: Seq[Long], w: String) =>
      CountMin.estimate(sk.toArray, w)
    )
    words
      .groupBy("w")
      .agg(count(lit(1)).as("cnt"))
      // top-20 selection: orderBy+limit plans as a TakeOrderedAndProject
      // heap (no full sort of the vocabulary)
      .orderBy(col("cnt").desc, col("w"))
      .limit(20)
      .crossJoin(broadcast(sk))
      .select(col("w"), col("cnt"), est(col("sk"), col("w")).as("est"))
      // output order: the join does not guarantee row order, and this
      // sort touches exactly the 20 surviving rows
      .orderBy(col("cnt").desc, col("w"))
  }

  /** Heavy hitters without shuffling the vocabulary: each partition
    * keeps a bounded Space-Saving summary (capacity 256 — when full,
    * the minimum-count entry is evicted and its count inherited, so
    * any term with local count > localN/256 survives); the union of
    * summaries is a small broadcast candidate set whose EXACT counts
    * come from one candidate-restricted aggregation. The full groupBy
    * ships every distinct term through the shuffle; this ships ≤ 256
    * terms per partition regardless of vocabulary size. Result equals
    * the exact top-20 on this corpus (asserted in PipelineOpsSpec);
    * rows-only for the driver gate (summary internals aren't SQL). */
  val aggHeavyHitters: Q = (spark, dir) => {
    import spark.implicits._
    val words = Tables
      .documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("w"))
    val cand = words
      .as[String]
      .mapPartitions { it =>
        val cap = 256
        val m = scala.collection.mutable.HashMap.empty[String, Long]
        it.foreach { w =>
          if (m.contains(w)) m(w) += 1
          else if (m.size < cap) m(w) = 1L
          else {
            val (minW, minC) = m.minBy(_._2)
            m.remove(minW)
            m(w) = minC + 1
          }
        }
        m.keysIterator
      }
      .toDF("w")
      .distinct()
    words
      .join(broadcast(cand), "w")
      .groupBy("w")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w"))
      .limit(20)
  }

  /** Scalar UDF: normalize a product name to a snake_case key. Kept as
    * a genuine Scala udf to cover the surface; the oracle re-expresses
    * it in SQL. (Production guidance stays "builtin over udf" — see
    * ScalarFns.) */
  val udfScalar: Q = (spark, dir) => {
    val norm = udf((s: String) =>
      if (s == null) null
      else s.trim.toLowerCase.split("\\s+").mkString("_")
    )
    Tables
      .part(spark, dir)
      .select(
        col("p_partkey"),
        norm(col("p_name")).as("norm_name"),
        norm(concat_ws(" ", col("p_type"), col("p_brand"))).as("norm_type")
      )
      .orderBy("p_partkey")
  }

  val udafTyped: Q = (spark, dir) => {
    val wmean = udaf(WeightedMean)
    Tables
      .lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        round(wmean(col("l_extendedprice"), col("l_quantity")), 4)
          .as("wmean_price"),
        count(lit(1)).as("n_rows")
      )
      .orderBy("l_returnflag")
  }

  /** Generator (UDTF shape): one row per token with its position.
    * posexplode is Spark's native Generator — distributed row
    * expansion, no driver involvement. */
  val udtfGenerator: Q = (spark, dir) =>
    Tables
      .documents(spark, dir)
      .select(
        col("doc_id"),
        posexplode(split(col("text"), " "))
      )
      .toDF("doc_id", "pos", "word")
      .orderBy("doc_id", "pos")

  val queries: Map[String, Q] = Map(
    "udf_scalar" -> udfScalar,
    "udaf_typed" -> udafTyped,
    "agg_countmin" -> aggCountmin,
    "agg_heavy_hitters" -> aggHeavyHitters,
    "udtf_generator" -> udtfGenerator
  )

  val oracles: Map[String, String] = Map(
    "udf_scalar" ->
      """SELECT p_partkey,
        | regexp_replace(lower(trim(p_name)), '\s+', '_', 'g') AS norm_name,
        | regexp_replace(lower(trim(concat_ws(' ', p_type, p_brand))), '\s+', '_', 'g') AS norm_type
        |FROM part ORDER BY p_partkey""".stripMargin,
    "udaf_typed" ->
      """SELECT l_returnflag,
        | round(sum(l_extendedprice*l_quantity)/sum(l_quantity), 4) AS wmean_price,
        | count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "udtf_generator" ->
      """SELECT doc_id, i-1 AS pos, ts[i] AS word
        |FROM (SELECT doc_id, string_split(text,' ') AS ts FROM documents) t,
        |     unnest(range(1, len(ts)+1)) AS u(i)
        |ORDER BY doc_id, pos""".stripMargin
  )
}
