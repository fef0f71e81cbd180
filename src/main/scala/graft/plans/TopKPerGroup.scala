package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.expressions.{
  Ascending,
  Attribute,
  Descending,
  Expression,
  SortOrder,
  UnsafeProjection
}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution,
  Distribution,
  Partitioning
}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.{DataFrame, GraftPlanBridge, SparkSession}

/** §4 Catalyst extension, the whole-operator layer: top-k rows per
  * group as a first-class plan node — custom `LogicalPlan` →
  * `SparkStrategy` → two physical `SparkPlan`s, registered through
  * `SparkSessionExtensions.injectPlannerStrategy` (build-time) or
  * `spark.experimental.extraStrategies` (runtime).
  *
  * Why a physical operator instead of the window-function idiom
  * (`row_number() OVER (PARTITION BY g ORDER BY o) <= k`): the window
  * form must shuffle EVERY row of the input to its group's partition
  * and sort the whole partition before it can rank anything. This
  * operator plans as
  *
  *   TopKPerGroupFinal
  *     +- Exchange hashpartitioning(g)
  *        +- TopKPerGroupPartial
  *           +- scan
  *
  * — the partial node keeps a bounded heap of k rows per group per
  * input partition, so at most `k · groups` rows per partition reach
  * the exchange, and the final node repeats the same O(n log k) pass on
  * the co-located survivors. No full sort anywhere, shuffle volume
  * independent of input row count — the aggregation-style
  * partial/final contract applied to a ranking operator, which is what
  * survives a 100 TB scan with a handful of groups. Selection is
  * deterministic whenever the order is total (callers add tiebreak
  * columns), which PlanShapeSpec and the DuckDB oracle both pin.
  */
case class TopKPerGroup(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan
) extends UnaryNode {
  require(groupExprs.nonEmpty, "topKPerGroup needs at least one group column")
  require(k >= 1, s"k must be >= 1, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

/** Shared bounded-heap pass: one group-keyed heap map per partition,
  * worst kept row at the head, O(n log k) and O(groups · k) memory. */
trait TopKHeapExec extends UnaryExecNode {
  def groupExprs: Seq[Expression]
  def order: Seq[SortOrder]
  def k: Int

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows")
  )

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val childOutput = child.output
    val g = groupExprs
    val o = order
    val kk = k
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(g, childOutput)
      val ord = GenerateOrdering.generate(o, childOutput)
      // heap head = worst retained row, so `better than head` = replace
      val worstFirst = new java.util.Comparator[InternalRow] {
        override def compare(a: InternalRow, b: InternalRow): Int = ord.compare(b, a)
      }
      val heaps =
        new java.util.HashMap[InternalRow, java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](kk + 1, worstFirst)
          heaps.put(key.copy(), heap)
        }
        if (heap.size() < kk) heap.offer(row.copy())
        else if (ord.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.offer(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap { h =>
        numOutputRows += h.size()
        h.iterator().asScala
      }
    }, preservesPartitioning = true)
  }
}

/** Map-side prune: no distribution requirement, emits ≤ k rows per
  * group per INPUT partition. */
case class TopKPerGroupPartialExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan
) extends TopKHeapExec {
  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

/** Reduce side: requires clustering on the group keys (EnsureRequirements
  * inserts the hash exchange), emits the exact global top k per group. */
case class TopKPerGroupFinalExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan
) extends TopKHeapExec {
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupExprs) :: Nil
  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, o, k, child) =>
      TopKPerGroupFinalExec(
        g,
        o,
        k,
        TopKPerGroupPartialExec(g, o, k, planLater(child))
      ) :: Nil
    case _ => Nil
  }
}

object TopKPerGroup {
  /** Runtime injection into an existing session (idempotent) — same
    * contract as GraftFunctions.register / AnnIvfRewrite.install. */
  def install(spark: SparkSession): Unit = {
    val em = spark.experimental
    if (!em.extraStrategies.contains(TopKPerGroupStrategy))
      em.extraStrategies = em.extraStrategies :+ TopKPerGroupStrategy
  }

  /** DataFrame-facing constructor: top `k` rows per `groupCols` group
    * under `orderCols` ((name, ascending) pairs — add tiebreaks to make
    * the order total if deterministic selection matters). */
  def topKPerGroup(
      df: DataFrame,
      groupCols: Seq[String],
      orderCols: Seq[(String, Boolean)],
      k: Int
  ): DataFrame = {
    val analyzed = df.queryExecution.analyzed
    def attr(n: String): Attribute =
      analyzed.output
        .find(_.name == n)
        .getOrElse(
          throw new IllegalArgumentException(
            s"column $n not in ${analyzed.output.map(_.name).mkString(", ")}"
          )
        )
    val order = orderCols.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending)
    }
    install(df.sparkSession)
    GraftPlanBridge.ofRows(
      df.sparkSession,
      TopKPerGroup(groupCols.map(attr), order, k, analyzed)
    )
  }
}
