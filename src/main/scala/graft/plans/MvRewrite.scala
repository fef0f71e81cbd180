package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  Alias,
  Attribute,
  AttributeReference,
  Expression,
  Literal,
  NamedExpression
}
import org.apache.spark.sql.catalyst.expressions.aggregate.{
  AggregateExpression,
  Complete,
  Count,
  Max,
  Min,
  Sum
}
import org.apache.spark.sql.catalyst.plans.logical.{
  Aggregate,
  Filter,
  LogicalPlan,
  Project
}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{
  HadoopFsRelation,
  LogicalRelation
}
import org.apache.spark.sql.SparkSession

/** §4/§8 Catalyst extension #2: MATERIALIZED-VIEW ROLLUP REWRITE
  * (aggregate navigation) — the warehouse-side dual of the staged ANN
  * index. A rollup MV stores partial aggregates of a source table at a
  * fine grain (dims + `cnt` + `sum_/min_/max_<measure>` columns,
  * staged once via [[graft.Stage]]); this rule rewrites any matching
  * aggregate over the SOURCE scan into a re-aggregation of the MV:
  *
  *   - `count(*)`  → `sum(cnt)`         - `sum(x)` → `sum(sum_x)`
  *   - `min(x)`    → `min(min_x)`       - `max(x)` → `max(max_x)`
  *
  * provided the query's GROUP BY columns are a subset of the MV's dims
  * (coarser grains roll up from finer ones — never the reverse) and
  * any residual Filter references dims only (the predicate transplants
  * onto the MV scan, where it prunes with full pushdown). Distinct
  * aggregates, expression-valued groupings, and non-decomposable
  * functions (percentiles) make the rule bail to the source plan — the
  * rewrite only fires when the rollup answer is EXACT: counts,
  * integral-valued sums, min/max are reassociation-safe, so the
  * rewritten query is hash-identical to the source aggregate (the
  * DuckDB oracle for `agg_rollup_mv` computes from source, proving
  * it). `avg(m)` rewrites to `sum(sum_m)/sum(cntnn_m)` ONLY for
  * measures the registrant declared integral-valued
  * ([[MvRewrite.MvDef.avgExact]]); float-valued avg keeps the bail.
  *
  * At 100 TB this is the difference between scanning the fact table
  * and scanning a table |dims-cross| rows long: the daily-grain
  * lineitem rollup is ~4 orders of magnitude smaller than its source,
  * and every dashboard-style aggregate at or above that grain serves
  * from it with no query change — the optimizer, not the analyst,
  * decides. Conf-gated (`spark.graft.mv.rewrite`) with an explicit
  * registry: an MV is declared for a source path, and freshness rides
  * the Stage fingerprint (a changed source file maps to a new staged
  * path at registration time, so the registry can never serve a stale
  * rollup for re-registered sources).
  */
object MvRewrite {
  val ConfKey = "spark.graft.mv.rewrite"

  /** A registered rollup MV for `sourcePath`: parquet at `mvPath` with
    * columns `dims ++ (cnt +: measures.flatMap(m => sum_m/min_m/max_m))`.
    *
    * `avgExact` lists measures the REGISTRANT declares integral-valued
    * (quantities, counts, cents): their double sums reassociate
    * exactly below 2^53, so `avg(m)` may rewrite to
    * `sum(sum_m) / sum(cntnn_m)` (the MV must then also carry the
    * non-null count `cntnn_m` — count(*) is the wrong denominator
    * under NULLs). An undeclared measure keeps the bail: avg over
    * genuinely fractional doubles is order-sensitive and the rewrite
    * only fires where the answer is provably exact. The declaration
    * carries the responsibility, exactly like a CHECK constraint. */
  case class MvDef(
      sourcePath: String,
      mvPath: String,
      dims: Seq[String],
      measures: Seq[String],
      avgExact: Seq[String] = Nil
  )

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, MvDef]()

  private def norm(p: String): String =
    p.stripPrefix("file:").replaceAll("/+$", "")

  private[plans] def samePath(a: String, b: String): Boolean =
    norm(a) == norm(b)

  /** The one derived MV key grain the shape gate admits. */
  private[plans] val ToDateRe = """to_date\((\w+)\)""".r

  def register(mv: MvDef): Unit = registry.put(norm(mv.sourcePath), mv)

  def lookup(sourcePath: String): Option[MvDef] =
    Option(registry.get(norm(sourcePath)))

  /** True iff the plan scans files under `tablePath` — the fired/
    * bailed probe for the MANAGED-MV serve path (the snapshot read
    * plans the MV's manifest files as a parquet relation, so the MV
    * table's directory prefixes every root path). */
  def readsPath(plan: LogicalPlan, tablePath: String): Boolean = {
    val p = norm(tablePath)
    plan.collectFirst {
      case rel: LogicalRelation
          if rel.relation.isInstanceOf[HadoopFsRelation] &&
            rel.relation.asInstanceOf[HadoopFsRelation]
              .location.rootPaths.exists { rp =>
                val n = norm(rp.toString)
                n == p || n.startsWith(p + "/")
              } =>
        rel
    }.isDefined
  }

  /** True iff the plan scans a registered MV path — the fired/bailed
    * probe the eager key and the plan pins assert on. */
  def readsMv(plan: LogicalPlan): Boolean = {
    val mvPaths = {
      import scala.jdk.CollectionConverters._
      registry.values().asScala.map(d => norm(d.mvPath)).toSet
    }
    plan
      .collectFirst {
        case rel: LogicalRelation
            if rel.relation.isInstanceOf[HadoopFsRelation] &&
              rel.relation
                .asInstanceOf[HadoopFsRelation]
                .location
                .rootPaths
                .exists(p => mvPaths(norm(p.toString))) =>
          rel
      }
      .isDefined
  }

  /** Runtime injection (idempotent), same contract as
    * [[AnnIvfRewrite.install]]. */
  def install(spark: SparkSession): Unit = {
    val em = spark.sessionState.experimentalMethods
    if (!em.extraOptimizations.exists(_.isInstanceOf[MvRollupRewriteRule]))
      em.extraOptimizations = em.extraOptimizations :+ MvRollupRewriteRule(spark)
  }
}

case class MvRollupRewriteRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    spark.conf.getOption(MvRewrite.ConfKey).contains("true")

  /** Strips attribute-only Projects and at most one Filter above a
    * file-source scan of a registered path, returning the residual
    * condition and the MV definition. */
  private def sourceOf(
      plan: LogicalPlan
  ): Option[(Option[Expression], MvRewrite.MvDef)] = plan match {
    case Project(projList, child)
        if projList.forall(_.isInstanceOf[AttributeReference]) =>
      sourceOf(child)
    case Filter(cond, child) =>
      // one residual filter max; nested filters collapse earlier in
      // optimization, so a second one means a shape we don't claim
      sourceOf(child).collect { case (None, mv) => (Some(cond), mv) }
    case rel: LogicalRelation =>
      rel.relation match {
        case fs: HadoopFsRelation =>
          fs.location.rootPaths
            .flatMap(p => MvRewrite.lookup(p.toString))
            .headOption
            .map(mv => (None, mv))
        case _ => None
      }
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformDown { case agg @ Aggregate(_, _, _, _) =>
      rewrite(agg).orElse(rewriteManaged(agg)).getOrElse(agg)
    }
  }

  private def rewrite(agg: Aggregate): Option[LogicalPlan] =
    for {
      (condOpt, mv) <- sourceOf(agg.child)
      dimNames = mv.dims.toSet
      // every grouping expression a bare dim attribute
      groupAttrs <- seqOpt(agg.groupingExpressions.map {
        case a: AttributeReference if dimNames(a.name) => Some(a)
        case _                                         => None
      })
      // residual predicate touches dims only — measures' row-level
      // values no longer exist in the rollup
      if condOpt.forall(_.references.forall(a => dimNames(a.name)))
      mvPlan = spark.read.parquet(mv.mvPath).queryExecution.analyzed
      mvAttr = mvPlan.output.map(a => a.name -> a).toMap
      // all MV columns the mapping can target must exist
      if mv.dims.forall(mvAttr.contains) && mvAttr.contains("cnt")
      newAggExprs <- seqOpt(agg.aggregateExpressions.map {
        case a: AttributeReference if dimNames(a.name) =>
          Some(Alias(mvAttr(a.name), a.name)(exprId = a.exprId))
        case al @ Alias(
              AggregateExpression(fn, Complete, false, None, _),
              name
            ) =>
          val merged: Option[Expression] = fn match {
            case c: Count if c.children == Seq(Literal(1)) =>
              Some(Sum(mvAttr("cnt")).toAggregateExpression())
            case Sum(x: AttributeReference, _)
                if mvAttr.contains(s"sum_${x.name}") =>
              Some(Sum(mvAttr(s"sum_${x.name}")).toAggregateExpression())
            case Min(x: AttributeReference)
                if mvAttr.contains(s"min_${x.name}") =>
              Some(Min(mvAttr(s"min_${x.name}")).toAggregateExpression())
            case Max(x: AttributeReference)
                if mvAttr.contains(s"max_${x.name}") =>
              Some(Max(mvAttr(s"max_${x.name}")).toAggregateExpression())
            // avg ONLY over a measure the registrant DECLARED
            // integral-valued (see MvDef.avgExact): the exact sum over
            // the partials divided by the exact non-null count — the
            // same double any evaluation order produces below 2^53.
            // cntnn_m, not cnt, is the denominator: avg ignores NULLs.
            case org.apache.spark.sql.catalyst.expressions.aggregate
                  .Average(x: AttributeReference, _)
                if mv.avgExact.contains(x.name) &&
                  // the rewrite produces DoubleType; only measure types
                  // whose Average is ALSO DoubleType may fire (a decimal
                  // measure's avg is DecimalType — a declared one bails
                  // rather than silently changing the schema)
                  (x.dataType == org.apache.spark.sql.types.LongType ||
                    x.dataType == org.apache.spark.sql.types.IntegerType ||
                    x.dataType == org.apache.spark.sql.types.DoubleType ||
                    x.dataType == org.apache.spark.sql.types.FloatType) &&
                  mvAttr.contains(s"sum_${x.name}") &&
                  mvAttr.contains(s"cntnn_${x.name}") =>
              import org.apache.spark.sql.catalyst.expressions.{Cast, Divide}
              import org.apache.spark.sql.types.DoubleType
              Some(Divide(
                Cast(
                  Sum(mvAttr(s"sum_${x.name}")).toAggregateExpression(),
                  DoubleType),
                Cast(
                  Sum(mvAttr(s"cntnn_${x.name}")).toAggregateExpression(),
                  DoubleType)))
            case _ => None
          }
          merged.map(m => Alias(m, name)(exprId = al.exprId))
        case _ => None
      })
    } yield {
      val scan = condOpt match {
        case Some(cond) =>
          Filter(
            cond.transform { case a: AttributeReference => mvAttr(a.name) },
            mvPlan
          )
        case None => mvPlan
      }
      Aggregate(groupAttrs.map(a => mvAttr(a.name)), newAggExprs, scan)
    }

  private def seqOpt[T](xs: Seq[Option[T]]): Option[Seq[T]] =
    if (xs.forall(_.isDefined)) Some(xs.map(_.get)) else None

  // ------------------------------------------------------------------
  // MANAGED-MV serving (round 14): aggregate navigation over the
  // snapshot catalog's refresh-maintained MVs (sql_mv_* family). The
  // two halves of the warehouse story compose here: refreshMv keeps
  // the rollup exact at a committed watermark, and this match serves
  // `SELECT k, sum(m) FROM src GROUP BY k` from it — a pure O(keys)
  // MV scan with NO aggregate at all (the MV is already at key grain),
  // instead of a 100 TB source scan + shuffle. Freshness is the gate:
  // the MV's committed `mvv` watermark must equal the EXACT snapshot
  // version the scanned relation pinned at analysis (tip reads and
  // VERSION AS OF alike) — a stale or ahead MV bails to the source
  // plan, correctness before speed. Discovery is the source table's
  // `mv_refs` reverse pointer (one props read), each ref re-verified
  // against the MV's own props before it may serve.
  // ------------------------------------------------------------------

  import org.apache.spark.sql.execution.datasources.v2.{
    DataSourceV2Relation,
    DataSourceV2ScanRelation
  }

  /** Strips attribute-only Projects and at most one Filter above a
    * DSv2 scan of a snapshot-catalog table, returning (residual
    * condition, table path, pinned snapshot version). Both the
    * pre-pushdown relation and the post-pushdown ScanRelation match —
    * extraOptimizations run after V2ScanRelationPushDown, and our
    * builder keeps every pushed filter residual in the plan, so no
    * predicate can hide inside the scan. */
  private def managedSourceOf(
      plan: LogicalPlan
  ): Option[(Option[Expression], String, Int)] = plan match {
    case Project(projList, child)
        if projList.forall(_.isInstanceOf[AttributeReference]) =>
      managedSourceOf(child)
    case Filter(cond, child) =>
      managedSourceOf(child).collect { case (None, p, v) => (Some(cond), p, v) }
    case r: DataSourceV2Relation     => snapshotTableOf(r.table)
    case s: DataSourceV2ScanRelation => snapshotTableOf(s.relation.table)
    case _                           => None
  }

  private def snapshotTableOf(
      t: org.apache.spark.sql.connector.catalog.Table
  ): Option[(Option[Expression], String, Int)] = t match {
    case st: graft.sources.SnapshotSqlTable =>
      scala.util.Try(st.version().toInt).toOption.map(v => (None, st.path, v))
    case _ => None
  }

  /** PullOutGroupingExpressions rewrites `GROUP BY to_date(ts)` into
    * a Project computing `_groupingexpression = cast(ts as date)`
    * under the Aggregate — inline such aliases back so the derived-key
    * match sees the expression itself. Only deterministic aliases
    * inline; anything else leaves the plan untouched (and the
    * attribute-only stripper then bails as before). */
  private def inlineGroupingProject(agg: Aggregate): Aggregate =
    agg.child match {
      case Project(pl, c)
          if pl.exists(!_.isInstanceOf[AttributeReference]) &&
            pl.forall {
              case _: AttributeReference => true
              case al: Alias             => al.child.deterministic
              case _                     => false
            } =>
        val aliasMap: Map[Long, Expression] = pl.collect {
          case al: Alias => al.exprId.id -> al.child
        }.toMap
        def subst(e: Expression): Expression = e.transformUp {
          case a: AttributeReference if aliasMap.contains(a.exprId.id) =>
            aliasMap(a.exprId.id)
        }
        // a pulled-out grouping attr can sit BARE in the output (the
        // query aliased nothing) — re-wrap it so the output stays named
        def substNamed(ne: NamedExpression): NamedExpression = ne match {
          case a: AttributeReference if aliasMap.contains(a.exprId.id) =>
            Alias(aliasMap(a.exprId.id), a.name)(exprId = a.exprId)
          case other => subst(other).asInstanceOf[NamedExpression]
        }
        Aggregate(
          agg.groupingExpressions.map(subst),
          agg.aggregateExpressions.map(substNamed),
          c)
      case _ => agg
    }

  private def rewriteManaged(agg0: Aggregate): Option[LogicalPlan] = {
    val agg = inlineGroupingProject(agg0)
    for {
      (condOpt, srcPath, srcVersion) <- managedSourceOf(agg.child)
      refs = scala.util
        .Try(graft.sources.SnapshotLog.tableProps(spark, srcPath))
        .toOption.flatMap(_.get("mv_refs")).toSeq
        .flatMap(_.split(',')).filter(_.nonEmpty)
      plan <- refs.view.flatMap { mvPath =>
        scala.util
          .Try(serveManaged(agg, condOpt, srcPath, srcVersion, mvPath))
          .toOption.flatten
      }.headOption
    } yield plan
  }

  /** One candidate MV: verify provenance + freshness, then map the
    * aggregate's output 1:1 onto the MV's stored columns. Any shape
    * the stored grain cannot answer EXACTLY returns None (bail to the
    * source plan). */
  private def serveManaged(
      agg: Aggregate,
      condOpt: Option[Expression],
      srcPath: String,
      srcVersion: Int,
      mvPath: String
  ): Option[LogicalPlan] = {
    import graft.sources.SnapshotLog
    import org.apache.spark.sql.catalyst.expressions.{KnownNotNull, Multiply}
    val props = SnapshotLog.tableProps(spark, mvPath)
    if (!props.get("mv_source").exists(s => MvRewrite.samePath(s, srcPath)))
      return None
    val key = props.getOrElse("mv_key", return None)
    val measure = props.getOrElse("mv_agg", return None)
    val kind = props.getOrElse("mv_kind", "sum")
    // the committed mvv watermark is authoritative; the props copy
    // backs pre-header MVs. Serving requires EXACT equality with the
    // relation's pinned snapshot: MV@v ≡ aggregate(source@v). The MV
    // VERSION is pinned FIRST and the watermark evaluated AS OF it —
    // checking the tip's watermark and then reading an unpinned tip
    // would let a refresh landing in between serve data newer than
    // the query's snapshot.
    val mvVersions = SnapshotLog.versions(spark, mvPath)
    if (mvVersions.isEmpty) return None
    val mvV = mvVersions.last
    val wm = SnapshotLog
      .committedWatermark(spark, mvPath, "mvv", upTo = Some(mvV))
      .orElse(props.get("mv_version").flatMap(s =>
        scala.util.Try(s.toInt).toOption))
    if (!wm.contains(srcVersion)) return None
    // grains that serve: the MV's own key grain (1:1 column mapping,
    // no aggregate at all) — a plain column, or the DERIVED day grain
    // `to_date(col)` (the optimizer spells it Cast(col AS DATE); the
    // MV's recorded mv_key_expr names the same source column) — and
    // the GLOBAL grain (GROUP BY () — the rollup re-aggregates: sum
    // over per-key sums, min over per-key mins, count(*) = sum of
    // per-key counts; all reassociation-safe).
    val keyExprCol: Option[String] = props.get("mv_key_expr").flatMap {
      case MvRewrite.ToDateRe(c) => Some(c)
      case _                     => None
    }
    if (props.contains("mv_key_expr") && keyExprCol.isEmpty) return None
    // the query-side grouping expression that IS the MV key, if any
    def isDerivedKey(e: Expression): Boolean = keyExprCol.exists(c =>
      e match {
        case org.apache.spark.sql.catalyst.expressions
              .Cast(a: AttributeReference, org.apache.spark.sql.types
              .DateType, _, _) => a.name == c
        case _ => false
      })
    val global = agg.groupingExpressions.isEmpty
    if (!global) {
      agg.groupingExpressions match {
        case Seq(a: AttributeReference)
            if keyExprCol.isEmpty && a.name == key => ()
        case Seq(e) if isDerivedKey(e)             => ()
        case _                                     => return None
      }
    }
    // a residual filter may reference the plain key only — a derived
    // key never appears as a source column, so any filter bails there
    if (keyExprCol.isDefined && condOpt.nonEmpty) return None
    if (!condOpt.forall(_.references.forall(_.name == key))) return None
    val mvPlan =
      SnapshotLog.read(spark, mvPath, Some(mvV)).queryExecution.analyzed
    val mvAttr = mvPlan.output.map(a => a.name -> a).toMap
    if (!mvAttr.contains(key)) return None
    // type must match EXACTLY and declared non-nullability is
    // re-asserted (MV parquet columns read nullable, but a group key
    // exists by construction and counts are never null)
    def fit(child: Expression, want: NamedExpression): Option[Expression] =
      if (child.dataType != want.dataType) None
      else if (!want.nullable && child.nullable) Some(KnownNotNull(child))
      else Some(child)
    val outs: Seq[Option[NamedExpression]] = agg.aggregateExpressions.map {
      case a: AttributeReference
          if !global && keyExprCol.isEmpty && a.name == key =>
        fit(mvAttr(key), a).map(e => Alias(e, a.name)(exprId = a.exprId))
      // the derived day key surfaces as Alias(Cast(col AS DATE), name)
      case al @ Alias(e, name) if !global && isDerivedKey(e) =>
        fit(mvAttr(key), al).map(x => Alias(x, name)(exprId = al.exprId))
      case al @ Alias(AggregateExpression(fn, Complete, false, None, _), name) =>
        // (stored MV column, how the GLOBAL grain re-aggregates it)
        val served: Option[(Attribute, String)] = fn match {
          case c: Count if c.children == Seq(Literal(1)) =>
            mvAttr.get("mv_n").map((_, "count"))
          case Sum(x: AttributeReference, _)
              if x.name == measure && (kind == "sum" || kind == "stats") =>
            mvAttr.get("mv_sum").map((_, "sum"))
          case Min(x: AttributeReference)
              if x.name == measure && kind == "minmax" =>
            mvAttr.get("mv_min").map((_, "min"))
          case Max(x: AttributeReference)
              if x.name == measure && kind == "minmax" =>
            mvAttr.get("mv_max").map((_, "max"))
          case Sum(Multiply(x: AttributeReference, y: AttributeReference, _), _)
              if x.name == measure && y.name == measure && kind == "stats" =>
            mvAttr.get("mv_sumsq").map((_, "sum"))
          case _ => None
        }
        served.flatMap { case (c, reagg) =>
          val e: Expression =
            if (!global) c
            else reagg match {
              // count over empty is 0, sum over empty is NULL — the
              // coalesce keeps the empty-source answer exact
              case "count" =>
                org.apache.spark.sql.catalyst.expressions.Coalesce(Seq(
                  Sum(c).toAggregateExpression(),
                  Literal(0L)))
              case "sum" => Sum(c).toAggregateExpression()
              case "min" => Min(c).toAggregateExpression()
              case "max" => Max(c).toAggregateExpression()
            }
          fit(e, al).map(x => Alias(x, name)(exprId = al.exprId))
        }
      case _ => None
    }
    if (outs.exists(_.isEmpty)) return None
    val base = condOpt match {
      case Some(cond) =>
        Filter(
          cond.transform {
            case a: AttributeReference if a.name == key => mvAttr(key)
          },
          mvPlan)
      case None => mvPlan
    }
    Some(
      if (global) Aggregate(Nil, outs.map(_.get), base)
      else Project(outs.map(_.get), base))
  }
}
