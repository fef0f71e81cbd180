package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{
  Alias,
  Attribute,
  ExprId,
  Expression,
  NamedExpression
}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.{
  HadoopFsRelation,
  LogicalRelation
}

/** Column-level lineage extracted from the ANALYZED logical plan — the
  * audit/impact-analysis surface every data-integration tool carries:
  * "which source columns feed this output column?". Because the
  * extraction walks Catalyst's resolved plan (exprId chains, not
  * strings), it is exact under aliasing, self-joins, and repeated
  * column names, and it prices at plan-analysis cost — no data is
  * touched, so the same call is free on a 100 TB input.
  *
  * Scope: DIRECT (dataflow) lineage — the columns whose VALUES reach
  * the output. Filter predicates and join keys influence which ROWS
  * survive but not what a column's value is computed from; that
  * indirect/control lineage is a different question and deliberately
  * out of scope (the standard direct/indirect split in lineage
  * systems).
  *
  * Source naming: a path-based scan is attributed to the file's base
  * name (`…/lineitem.parquet` → `lineitem`); a catalog table to its
  * table identifier. Plans whose leaves are neither (in-memory
  * ranges, streaming sources) attribute to `<leafname>`.
  */
object Lineage {

  private type SrcMap = Map[ExprId, Set[(String, String)]]

  private def merge(ms: Seq[SrcMap]): SrcMap =
    ms.foldLeft(Map.empty: SrcMap) { (acc, m) =>
      m.foldLeft(acc) { case (a, (k, v)) =>
        a.updated(k, a.getOrElse(k, Set.empty) ++ v)
      }
    }

  private def refs(e: Expression, cm: SrcMap): Set[(String, String)] =
    e.references.toSeq.flatMap(a => cm.getOrElse(a.exprId, Set.empty)).toSet

  private def named(nes: Seq[NamedExpression], cm: SrcMap): SrcMap =
    cm ++ nes.map {
      case a: Alias     => a.exprId -> refs(a.child, cm)
      case ne           => ne.exprId -> refs(ne, cm)
    }

  private def leafName(leaf: LeafNode): String = leaf match {
    case lr: LogicalRelation =>
      lr.relation match {
        case fs: HadoopFsRelation =>
          fs.location.rootPaths.headOption
            .map { p =>
              val n = p.getName
              val dot = n.indexOf('.')
              if (dot > 0) n.substring(0, dot) else n
            }
            .getOrElse("<relation>")
        case _ =>
          lr.catalogTable.map(_.identifier.table).getOrElse("<relation>")
      }
    case other => s"<${other.nodeName}>"
  }

  private def sources(plan: LogicalPlan): SrcMap = plan match {
    case leaf: LeafNode =>
      val t = leafName(leaf)
      leaf.output.map(a => a.exprId -> Set(t -> a.name)).toMap
    case p: Project   => named(p.projectList, sources(p.child))
    case a: Aggregate => named(a.aggregateExpressions, sources(a.child))
    case w: Window =>
      named(w.windowExpressions, sources(w.child))
    case e: Expand =>
      // grouping-set expansion: each output position draws from every
      // projection's expression at that position
      val cm = sources(e.child)
      cm ++ e.output.zipWithIndex.map { case (a, i) =>
        a.exprId -> e.projections.flatMap(proj => refs(proj(i), cm)).toSet
      }
    case g: Generate =>
      val cm = sources(g.child)
      cm ++ g.generatorOutput.map(a => a.exprId -> refs(g.generator, cm))
    // Filter/Join/Sort/Limit/SetOps/SubqueryAlias/...: attributes pass
    // through untouched; union the children's maps
    case other => merge(other.children.map(sources))
  }

  /** One row per (output column, contributing source column) of `df`'s
    * analyzed plan, ordered for stable comparison. */
  def columnLineage(df: DataFrame): DataFrame = {
    val analyzed = df.queryExecution.analyzed
    val cm = sources(analyzed)
    val spark = df.sparkSession
    import spark.implicits._
    analyzed.output
      .flatMap { a: Attribute =>
        cm.getOrElse(a.exprId, Set.empty).toSeq.map { case (t, c) =>
          (a.name, t, c)
        }
      }
      .toDF("out_col", "src_table", "src_col")
      .orderBy("out_col", "src_table", "src_col")
  }
}
