package graft.plans

import graft.functions.CosineSim
import org.apache.spark.sql.catalyst.expressions.{
  Attribute,
  Descending,
  Expression,
  IntegerLiteral,
  ScalarSubquery,
  SortOrder
}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType}
import org.apache.spark.sql.{GraftPlanBridge, SparkSession}

/** §4/§8 Catalyst extension: conf-gated logical rewrite of brute-force
  * cosine top-k to the IVF search path.
  *
  * Pattern: `Limit(k, Sort(cosine_sim(emb, <probe>) DESC, ...))` where
  * the probe is evaluable at plan time (foldable expression or an
  * uncorrelated scalar-subquery vector lookup — see [[probeOf]])
  * over a join/aggregate-free child that carries a `label` column (the
  * IVF cells). Rewritten to: per-label centroids → score the ~|labels|
  * centroids against the probe → visit the top-3 cells → the ORIGINAL
  * sort+limit over only those cells' members. At scale this replaces a
  * full-corpus scan-and-sort with one cheap map-side centroid aggregate
  * plus a pruned exact scan — the genuine IVF shape (sim_ivf_topk), but
  * chosen by the optimizer instead of hand-written.
  *
  * Gated on `spark.graft.ann.ivfRewrite` because IVF is APPROXIMATE:
  * results match brute force exactly when the true top-k live in the
  * visited cells (guaranteed on clustered corpora — plan- and
  * result-asserted in PlanShapeSpec — not on near-orthogonal data).
  * Modes:
  *   - `true`  — rewrite every eligible top-k (the round-2 behavior);
  *   - `auto`  — COST-GATED: rewrite only when the child's estimated
  *     size (`child.stats.sizeInBytes`, logical statistics) reaches
  *     `spark.graft.ann.ivfRewrite.minBytes` (default 128 MiB). Small
  *     scans keep the brute-force plan — a full pass over a broadcast-
  *     sized corpus beats building centroids; at 100 TB the same query
  *     flips to the pruned path with no query change. The user still
  *     opts into approximation once; WHERE it applies is the
  *     optimizer's cost decision.
  * The guard on join/aggregate-free children keeps the rule from
  * re-firing on its own output (whose child contains the cell join) and
  * from touching the centroid subplan (whose sort child is an
  * Aggregate).
  */
object AnnIvfRewrite {
  val ConfKey = "spark.graft.ann.ivfRewrite"
  val MinBytesKey = "spark.graft.ann.ivfRewrite.minBytes"
  val DefaultMinBytes: Long = 128L << 20

  /** Runtime injection into an existing session (idempotent) — same
    * contract as GraftFunctions.register; the build-time path is
    * `spark.sql.extensions=graft.functions.GraftExtensions`. */
  def install(spark: SparkSession): Unit = {
    val em = spark.sessionState.experimentalMethods
    if (!em.extraOptimizations.exists(_.isInstanceOf[AnnIvfRewriteRule]))
      em.extraOptimizations = em.extraOptimizations :+ AnnIvfRewriteRule(spark)
  }
}

case class AnnIvfRewriteRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def mode: String =
    spark.conf.getOption(AnnIvfRewrite.ConfKey).getOrElse("false")

  private def enabled: Boolean = mode == "true" || mode == "auto"

  private def minBytes: Long =
    spark.conf
      .getOption(AnnIvfRewrite.MinBytesKey)
      .map(_.toLong)
      .getOrElse(AnnIvfRewrite.DefaultMinBytes)

  /** Conservative eligibility: a scan-like child (no joins, no aggs)
    * with the IVF cell column present; in `auto` mode additionally the
    * cost gate on the child's estimated scan size. */
  private def eligible(plan: LogicalPlan): Boolean =
    plan.collectFirst {
      case j: Join      => j
      case a: Aggregate => a
    }.isEmpty && plan.output.exists(_.name == "label") &&
      (mode != "auto" || plan.stats.sizeInBytes >= minBytes)

  /** Extracts the probe vector from any expression the rewrite can
    * evaluate at plan time:
    *   - any FOLDABLE float-array expression (literal probes, `array(
    *     CAST(…))`, constant `transform`s — the round-3 pattern and its
    *     constant-folded relatives);
    *   - an UNCORRELATED scalar subquery — the vector-lookup idiom
    *     `cosine_sim(emb, (SELECT emb FROM t WHERE id = …))`. The
    *     subquery is a one-row plan, so executing it during
    *     optimization costs what the physical plan would pay anyway
    *     (the sort's own copy still evaluates in the final plan, and
    *     the rule cannot re-enter: its rewritten child contains a Join,
    *     which [[eligible]] rejects before this runs again).
    */
  private def probeOf(e: Expression): Option[Seq[Double]] = e match {
    case _ if e.foldable =>
      e.dataType match {
        case ArrayType(FloatType, _) =>
          Option(e.eval(null)).map(
            _.asInstanceOf[ArrayData].toFloatArray.toSeq.map(_.toDouble)
          )
        case _ => None
      }
    case s: ScalarSubquery
        if s.outerAttrs.isEmpty && s.plan.output.length == 1 &&
          (s.plan.output.head.dataType match {
            case ArrayType(FloatType, _) => true
            case _                       => false
          }) =>
      val rows = GraftPlanBridge.ofRows(spark, s.plan).collect()
      if (rows.length == 1 && !rows(0).isNullAt(0))
        Some(rows(0).getSeq[Float](0).map(_.toDouble).toSeq)
      else None
    case _ => None
  }

  /** Matches `Sort(cosine_sim(attr, <plan-time probe>) DESC, ...)` and
    * returns (order, emb attr, probe floats, child, hint). NOTE: the
    * cell column `label` must survive column pruning — i.e. be part of
    * the query output — because this batch runs after pruning. */
  private object CosineTopSort {
    def unapply(plan: LogicalPlan): Option[
      (Seq[SortOrder], Attribute, Seq[Double], LogicalPlan, Option[SortHint])
    ] = plan match {
      case Sort(
            order @ SortOrder(CosineSim(emb: Attribute, probeExpr), Descending, _, _) +: _,
            true,
            child,
            sortHint
          ) if eligible(child) =>
        probeOf(probeExpr).map(p => (order, emb, p, child, sortHint))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformDown {
      case Limit(le @ IntegerLiteral(k), CosineTopSort(order, emb, probe, child, hint))
          if k <= 1000 =>
        Limit(
          le,
          Sort(order, global = true, pruneToTopCells(child, emb.name, probe), hint)
        )
      // column pruning often parks a Project between the limit and sort
      case Limit(
            le @ IntegerLiteral(k),
            Project(projList, CosineTopSort(order, emb, probe, child, hint))
          ) if k <= 1000 =>
        Project(
          projList,
          Limit(
            le,
            Sort(order, global = true, pruneToTopCells(child, emb.name, probe), hint)
          )
        )
    }
  }

  /** Builds (via the DataFrame API) the cell-pruned child: centroid per
    * label, probe-scored, top-3 cells kept, members semi-joined in via
    * a broadcast. Output attributes are exactly `child.output` (USING
    * join keeps the left side's attrs), so the original Sort re-binds
    * unchanged. */
  private def pruneToTopCells(
      child: LogicalPlan,
      embCol: String,
      probe: Seq[Double]
  ): LogicalPlan = {
    val df = GraftPlanBridge.ofRows(spark, child)
    val cent = df
      .select(col("label"), posexplode(col(embCol)))
      .groupBy("label", "pos")
      .agg(avg(col("col").cast("double")).as("m"))
      .groupBy("label")
      .agg(
        expr("transform(sort_array(collect_list(struct(pos, m))), x -> x.m)")
          .as("centroid")
      )
    val top3 = cent
      .withColumn("pe", typedlit(probe))
      .withColumn(
        "cscore",
        expr(
          "aggregate(zip_with(centroid, pe, (c, p) -> c * p), 0D, (a, x) -> a + x)" +
            " / (sqrt(aggregate(centroid, 0D, (a, c) -> a + c * c))" +
            " * sqrt(aggregate(pe, 0D, (a, p) -> a + p * p)))"
        )
      )
      .orderBy(col("cscore").desc, col("label"))
      .limit(3)
      .select("label")
    // optimizedPlan, not analyzed: this batch runs after hint
    // elimination, so an injected ResolvedHint (from broadcast()) would
    // survive to physical planning and fail; re-entrant optimization
    // folds it into the join hint. The rule can't re-fire inside — the
    // subplan's only Sort orders by the centroid score, not cosine_sim.
    // The outer Project restores `child.output` order (a USING join
    // moves the key column first, and downstream row decoding is
    // positional).
    Project(
      child.output,
      df.join(broadcast(top3), "label").queryExecution.optimizedPlan
    )
  }
}
