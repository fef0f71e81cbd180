package graft.plans

import graft.functions.CosineSim
import org.apache.spark.sql.catalyst.expressions.{
  Alias,
  And,
  Ascending,
  Attribute,
  Descending,
  EqualTo,
  Expression,
  IntegerLiteral,
  LessThan,
  LessThanOrEqual,
  RowNumber,
  ScalarSubquery,
  SortOrder,
  WindowExpression
}
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
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
  *     optimizer's cost decision. The estimate is as good as the stats
  *     pipeline feeding it: on a raw path scan it is the file size, and
  *     the size-only estimator passes Filter through untouched, so a
  *     selective slice of a huge table still opens the gate. With the
  *     table ANALYZEd (`stats_analyze`) and `spark.sql.cbo.enabled`,
  *     `plan.stats` carries selectivity-refined row counts and the gate
  *     follows the data instead (Round8Spec pins both directions).
  * The guard on join/aggregate-free children keeps the rule from
  * re-firing on its own output (whose child contains the cell join) and
  * from touching the centroid subplan (whose sort child is an
  * Aggregate).
  */
object AnnIvfRewrite {
  val ConfKey = "spark.graft.ann.ivfRewrite"
  val MinBytesKey = "spark.graft.ann.ivfRewrite.minBytes"
  val DefaultMinBytes: Long = 128L << 20

  /** Cells visited per probe (IVF nprobe) — the query-time recall/cost
    * dial. Setting it to ≥ the cell count makes the rewrite EXACT on
    * any data (every cell scanned), which PlanShapeSpec asserts. */
  val NprobeKey = "spark.graft.ann.ivfRewrite.nprobe"
  val DefaultNprobe = 3

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

  private def nprobe: Int =
    spark.conf
      .getOption(AnnIvfRewrite.NprobeKey)
      .map(_.toInt)
      .getOrElse(AnnIvfRewrite.DefaultNprobe)

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
      // the one-row eval launches a driver-side job at PLAN time, and
      // fixed-point optimization can re-match the same pattern several
      // times — memoize per canonicalized subquery plan so the job runs
      // once, and fall back to no-rewrite (None) instead of failing the
      // whole planning if the probe lookup errors
      val key = s.plan.canonicalized
      probeMemo.synchronized {
        probeMemo.get(key) match {
          case cached: Option[Seq[Double]] @unchecked if cached != null =>
            cached
          case _ =>
            try {
              val rows = GraftPlanBridge.ofRows(spark, s.plan).collect()
              val res =
                if (rows.length == 1 && !rows(0).isNullAt(0))
                  Some(rows(0).getSeq[Float](0).map(_.toDouble).toSeq)
                else None
              probeMemo.put(key, res)
              res
            } catch {
              // fall back to no-rewrite but do NOT memoize: a transient
              // eval failure (lost executor, concurrent compaction) must
              // not permanently disable the rewrite for this plan
              case _: Exception => None
            }
        }
      }
    case _ => None
  }

  /** Bounded plan-time probe cache (see [[probeOf]]); insertion-order
    * eviction keeps it from growing across a long session. */
  private val probeMemo =
    new java.util.LinkedHashMap[LogicalPlan, Option[Seq[Double]]]() {
      override def removeEldestEntry(
          e: java.util.Map.Entry[LogicalPlan, Option[Seq[Double]]]
      ): Boolean = size() > 32
    }

  /** Matches `Sort(cosine_sim(attr, <plan-time probe>) DESC, ...)`,
    * the `inner_product` (MIPS) DESC ordering, or the `l2_sq`
    * (Euclidean) ASC ordering — and returns (order, emb attr, probe
    * floats, child, hint, metric) with metric ∈ {cos, mips, l2}.
    * Direction is part of the pattern: a DESCENDING l2_sq (farthest
    * points) or ASCENDING cosine is not a nearest-neighbor query and
    * must not be rewritten. NOTE: the cell column `label` must survive
    * column pruning — i.e. be part of the query output — because this
    * batch runs after pruning. */
  private object CosineTopSort {
    def unapply(plan: LogicalPlan): Option[
      (Seq[SortOrder], Attribute, Seq[Double], LogicalPlan, Option[SortHint], String)
    ] = plan match {
      case Sort(
            order @ SortOrder(CosineSim(emb: Attribute, probeExpr), Descending, _, _) +: _,
            true,
            child,
            sortHint
          ) if eligible(child) =>
        probeOf(probeExpr).map(p => (order, emb, p, child, sortHint, "cos"))
      case Sort(
            order @ SortOrder(
              graft.functions.InnerProduct(emb: Attribute, probeExpr),
              Descending,
              _,
              _
            ) +: _,
            true,
            child,
            sortHint
          ) if eligible(child) =>
        probeOf(probeExpr).map(p => (order, emb, p, child, sortHint, "mips"))
      case Sort(
            order @ SortOrder(
              graft.functions.L2Sq(emb: Attribute, probeExpr),
              Ascending,
              _,
              _
            ) +: _,
            true,
            child,
            sortHint
          ) if eligible(child) =>
        probeOf(probeExpr).map(p => (order, emb, p, child, sortHint, "l2"))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformDown {
      case Limit(le @ IntegerLiteral(k), CosineTopSort(order, emb, probe, child, hint, metric))
          if k <= 1000 =>
        Limit(
          le,
          Sort(order, global = true, pruneToTopCells(child, emb.name, probe, metric), hint)
        )
      // column pruning often parks a Project between the limit and sort
      case Limit(
            le @ IntegerLiteral(k),
            Project(projList, CosineTopSort(order, emb, probe, child, hint, metric))
          ) if k <= 1000 =>
        Project(
          projList,
          Limit(
            le,
            Sort(order, global = true, pruneToTopCells(child, emb.name, probe, metric), hint)
          )
        )
      // per-row probe batch: Filter(rn <= k, Window(row_number ...
      // order by cosine_sim(corpusEmb, probeEmb) DESC, Join(P, C)))
      case f @ Filter(cond, w: Window) =>
        rewritePerRowTopK(f, cond, w).getOrElse(f)
    }
  }

  /** Column-probe ANN join rewrite (the batch-serving shape): every row
    * of a probe relation P ranks the corpus C by
    * `cosine_sim(C.emb, P.probe)` through the standard
    * row_number-over-join idiom. Brute force, that Join is a cross
    * product — |P|·|C| scored rows. Rewritten: per-`label` centroids
    * from C (one map-side aggregate), each probe scores the broadcast
    * centroid set and keeps its top-3 cells, and the Join becomes an
    * EQUI-join `P.__cell = C.label` — a hash join whose output is only
    * each probe's candidate cells (~3/|cells| of the corpus per probe).
    * The original Window + rank Filter re-bind unchanged on top, so
    * results match the IVF semantics of [[pruneToTopCells]] probe-by-
    * probe. Guards: exactly ONE Join below the window (the rewritten
    * child contains several, so the rule cannot re-enter), both sides
    * join/agg-free, the window partition keys all on the probe side,
    * and in `auto` mode the corpus-size cost gate. The probe side may
    * be ASYMMETRIC — carry its own `label` column (a probe relation
    * that is itself an IVF-indexed corpus slice): the corpus cell is
    * referenced by attribute and the rewrite's working columns use
    * reserved `__`-names, so only genuine name collisions with those
    * reserved names disqualify a plan. Ordering by the raw
    * `inner_product` kernel (MIPS) rewrites too — cells then rank by
    * the centroid DOT product, unnormalized, because dividing by the
    * norms is exactly what MIPS ordering must not do. */
  private def rewritePerRowTopK(
      f: Filter,
      cond: Expression,
      w: Window
  ): Option[LogicalPlan] = {
    // rank predicate over the single row_number window expression
    val rank = cond match {
      case LessThanOrEqual(a: Attribute, IntegerLiteral(k)) => Some((a, k))
      case LessThan(a: Attribute, IntegerLiteral(k))        => Some((a, k - 1))
      case _                                                => None
    }
    rank match {
      case Some((rnAttr, k)) if k >= 1 && k <= 1000 =>
        val rnOk = w.windowExpressions match {
          case Seq(al: Alias) =>
            al.child match {
              case WindowExpression(_: RowNumber, _) => al.exprId == rnAttr.exprId
              case _                                 => false
            }
          case _ => false
        }
        // the optimizer extracts window order expressions into a Project
        // below (`cosine_sim(...) AS _w0`), so the order key is usually
        // an Attribute — chase it to its defining Alias in the child.
        // All three scoring kernels rewrite: cosine (IVF proper), raw
        // inner product (MIPS), and squared L2 — the metric picks the
        // centroid scoring AND binds the required sort direction
        // (similarity kernels DESC, distance kernel ASC; the wrong
        // direction is a farthest-point query, not ANN).
        def scoreIn(e: Expression): Option[(Attribute, Attribute, String)] =
          e.collectFirst {
            case CosineSim(a: Attribute, b: Attribute) => (a, b, "cos")
            case graft.functions.InnerProduct(a: Attribute, b: Attribute) =>
              (a, b, "mips")
            case graft.functions.L2Sq(a: Attribute, b: Attribute) =>
              (a, b, "l2")
          }
        def resolveScore(oe: Expression): Option[(Attribute, Attribute, String)] =
          scoreIn(oe).orElse(oe match {
            case a: Attribute =>
              w.child
                .collect { case pr: Project => pr.projectList }
                .flatten
                .collectFirst { case al: Alias if al.exprId == a.exprId => al }
                .flatMap(al => scoreIn(al.child))
            case _ => None
          })
        val cos = w.orderSpec.headOption.flatMap {
          case SortOrder(oe, Descending, _, _) => resolveScore(oe).filter(_._3 != "l2")
          case SortOrder(oe, Ascending, _, _)  => resolveScore(oe).filter(_._3 == "l2")
          case _                               => None
        }
        val pids = w.partitionSpec.flatMap {
          case a: Attribute => Some(a)
          case _            => None
        }
        val joins = w.child.collect { case j: Join => j }
        (cos, joins) match {
          case (Some((embA, probeA, metric)), Seq(j))
              if rnOk && pids.length == w.partitionSpec.length &&
                (j.joinType == Inner || j.joinType == Cross) =>
            val sides =
              if (j.right.outputSet.contains(embA) && j.left.outputSet.contains(probeA))
                Some((j.left, j.right))
              else if (j.left.outputSet.contains(embA) && j.right.outputSet.contains(probeA))
                Some((j.right, j.left))
              else None
            sides.flatMap { case (pSide, cSide) =>
              val joinFree = (p: LogicalPlan) =>
                p.collectFirst {
                  case jj: Join      => jj
                  case a: Aggregate  => a
                  case ww: Window    => ww
                }.isEmpty
              val namesOk = (p: LogicalPlan) =>
                p.output.map(_.name).distinct.length == p.output.length
              // an ASYMMETRIC probe side may carry its own `label`
              // column (a probe relation that is itself an IVF-indexed
              // corpus slice) — the rewrite only rejects its RESERVED
              // working names; the corpus cell column is referenced by
              // attribute, never by a bare name, so the two labels
              // cannot cross
              val reserved = Set("__cell", "__cscore", "__crn", "__ivf_label", "__cent")
              val eligibleSides =
                joinFree(pSide) && joinFree(cSide) &&
                  namesOk(pSide) && namesOk(cSide) &&
                  cSide.output.exists(_.name == "label") &&
                  !cSide.output.exists(a => reserved(a.name)) &&
                  !pSide.output.exists(a => reserved(a.name)) &&
                  pids.forall(pSide.outputSet.contains) &&
                  (mode != "auto" || cSide.stats.sizeInBytes >= minBytes)
              if (!eligibleSides) None
              else {
                val pruned =
                  pruneJoinToProbeCells(j, pSide, cSide, embA, probeA, pids, metric)
                val newChild = w.child.transformUp {
                  case jj: Join if jj eq j => pruned
                }
                Some(Filter(cond, w.copy(child = newChild)))
              }
            }
          case _ => None
        }
      case _ => None
    }
  }

  /** Builds the cell-pruned replacement for the probe×corpus Join: the
    * same 6dp-rounded per-label centroids as [[pruneToTopCells]], a
    * broadcast centroid fan-out scored per probe, top-3 cells per probe
    * (window over the probe keys — |P|·|cells| rows, tiny), then the
    * equi-join on the candidate cell. Output attrs are exactly
    * `j.output` so the window above re-binds unchanged; the original
    * join condition (e.g. probe != corpus id) is kept alongside the
    * cell equality. */
  private def pruneJoinToProbeCells(
      j: Join,
      pSide: LogicalPlan,
      cSide: LogicalPlan,
      embA: Attribute,
      probeA: Attribute,
      pids: Seq[Attribute],
      metric: String = "cos"
  ): LogicalPlan = {
    import org.apache.spark.sql.expressions.{Window => W}
    val pDf = GraftPlanBridge.ofRows(spark, pSide)
    val cDf = GraftPlanBridge.ofRows(spark, cSide)
    // the centroid frame's cell column is renamed to a reserved name so
    // a probe side carrying its OWN `label` column stays unambiguous
    // through the cross join below
    val cent = cDf
      .select(col("label"), posexplode(col(s"`${embA.name}`")))
      .groupBy("label", "pos")
      .agg(avg(col("col").cast("double")).as("m"))
      .groupBy("label")
      .agg(
        expr("transform(sort_array(collect_list(struct(pos, m))), x -> round(x.m, 6) + 0.0)")
          .as("__cent")
      )
      .withColumnRenamed("label", "__ivf_label")
    val pn = s"`${probeA.name}`"
    // MIPS cells rank by the raw centroid dot product — the norms that
    // make it cosine are exactly what MIPS ordering must NOT divide by;
    // L2 cells by squared distance to the centroid, ASCENDING (nearest)
    val dotSql =
      s"aggregate(zip_with(__cent, $pn, (c, p) -> c * CAST(p AS DOUBLE)), 0D, (a, x) -> a + x)"
    val csSql = metric match {
      case "l2" =>
        s"aggregate(zip_with(__cent, $pn, (c, p) -> (c - CAST(p AS DOUBLE))" +
          s" * (c - CAST(p AS DOUBLE))), 0D, (a, x) -> a + x)"
      case "mips" => dotSql
      case _ =>
        dotSql +
          s" / (sqrt(aggregate(__cent, 0D, (a, c) -> a + c * c))" +
          s" * sqrt(aggregate($pn, 0D, (a, p) -> a + CAST(p AS DOUBLE) * CAST(p AS DOUBLE))))"
    }
    val topCells = pDf
      .crossJoin(broadcast(cent))
      .withColumn("__cscore", expr(csSql))
      .withColumn(
        "__crn",
        row_number().over(
          W.partitionBy(pids.map(a => col(s"`${a.name}`")): _*)
            .orderBy(
              (if (metric == "l2") col("__cscore").asc else col("__cscore").desc),
              col("__ivf_label")
            )
        )
      )
      .filter(col("__crn") <= nprobe)
      .select(
        pSide.output.map(a => col(s"`${a.name}`")) :+ col("__ivf_label").as("__cell"): _*
      )
    // optimizedPlan folds the broadcast ResolvedHint (see pruneToTopCells)
    val topPlan = topCells.queryExecution.optimizedPlan
    val cellAttr = topPlan.output.find(_.name == "__cell").get
    val labelAttr = cSide.output.find(_.name == "label").get
    val eq = EqualTo(cellAttr, labelAttr)
    val newCond = j.condition.map(And(eq, _)).getOrElse(eq)
    Project(j.output, Join(topPlan, cSide, Inner, Some(newCond), JoinHint.NONE))
  }

  /** Builds (via the DataFrame API) the cell-pruned child: centroid per
    * label, probe-scored, top-3 cells kept, members semi-joined in via
    * a broadcast. Output attributes are exactly `child.output` (USING
    * join keeps the left side's attrs), so the original Sort re-binds
    * unchanged. */
  private def pruneToTopCells(
      child: LogicalPlan,
      embCol: String,
      probe: Seq[Double],
      metric: String = "cos"
  ): LogicalPlan = {
    val df = GraftPlanBridge.ofRows(spark, child)
    // centroids on the 6dp grid, same as the per-row arm: float-sum
    // order inside avg() differs between engines (and between runs of
    // a distributed aggregate), and the rounded grid is what keeps the
    // cell RANKING deterministic — which round 8's oracle-checked
    // sim_l2_ivf_topk now depends on, not just the fire/exactness specs
    val cent = df
      .select(col("label"), posexplode(col(embCol)))
      .groupBy("label", "pos")
      .agg(avg(col("col").cast("double")).as("m"))
      .groupBy("label")
      .agg(
        expr("transform(sort_array(collect_list(struct(pos, m))), x -> round(x.m, 6) + 0.0)")
          .as("centroid")
      )
    // MIPS cells rank by the raw dot product (see pruneJoinToProbeCells);
    // L2 cells by NEAREST centroid — squared distance, ASCENDING
    val dotSql =
      "aggregate(zip_with(centroid, pe, (c, p) -> c * p), 0D, (a, x) -> a + x)"
    val l2Sql =
      "aggregate(zip_with(centroid, pe, (c, p) -> (c - p) * (c - p)), 0D, (a, x) -> a + x)"
    val top3 = cent
      .withColumn("pe", typedlit(probe))
      .withColumn(
        "cscore",
        expr(
          metric match {
            case "l2"   => l2Sql
            case "mips" => dotSql
            case _ =>
              dotSql +
                " / (sqrt(aggregate(centroid, 0D, (a, c) -> a + c * c))" +
                " * sqrt(aggregate(pe, 0D, (a, p) -> a + p * p)))"
          }
        )
      )
      .orderBy(
        (if (metric == "l2") col("cscore").asc else col("cscore").desc),
        col("label")
      )
      .limit(nprobe)
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
