package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending,
  Attribute,
  AttributeReference,
  AttributeSet,
  BindReferences,
  Expression,
  GenericInternalRow,
  JoinedRow,
  SortOrder,
  UnsafeProjection,
  UnsafeRow
}
import org.apache.spark.sql.catalyst.expressions.codegen.{
  CodegenContext,
  CodeGenerator,
  ExprCode,
  JavaCode
}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution,
  Distribution,
  Partitioning
}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.execution.{
  CodegenSupport,
  SparkPlan,
  SparkStrategy,
  UnaryExecNode
}
import org.apache.spark.sql.types.{IntegerType, LongType, TimestampType}
import org.apache.spark.sql.{DataFrame, GraftPlanBridge, SparkSession}

/** §4 Catalyst extension #2: gap-based sessionization as a first-class
  * plan node — the batch twin of Structured Streaming's
  * `SessionWindowStateStoreSaveExec`, which Spark does not offer for
  * batch relations (batch `session_window` plans as an aggregate over
  * merged windows, and the SQL idiom needs two window-function passes:
  * lag + running sum).
  *
  * `Sessionize` appends a per-user 1-based `session_id` in ONE streamed
  * pass over rows clustered by `user` and sorted by (`user`, `ts`,
  * tiebreaks): a new session starts on user change or when
  * `ts - prev_ts > gap` (strictly — an event at exactly prev + gap
  * CONTINUES the session, mirroring `session_window`'s merge rule,
  * SURVEY.md §5). The physical node declares
  * `requiredChildDistribution`/`requiredChildOrdering`, so
  * EnsureRequirements plans exactly one hash exchange + one sort — the
  * same shuffle the window idiom pays — but replaces BOTH window
  * operators with an O(1)-state iterator: no frame buffering, no
  * second pass, and the downstream per-session aggregate reuses the
  * exchange (hashpartitioning(user) satisfies clustering on
  * (user, session_id)). At 100 TB the cost is one shuffle of the
  * events, full stop.
  */
case class Sessionize(
    user: Expression,
    ts: Expression,
    tiebreaks: Seq[Expression],
    gapMicros: Long,
    sessionAttr: Attribute,
    child: LogicalPlan
) extends UnaryNode {
  require(gapMicros > 0, s"gap must be positive, got $gapMicros")
  override def output: Seq[Attribute] = child.output :+ sessionAttr
  // session_id is minted here, not read from the child — without this
  // the analyzer reports it as a missing input attribute
  override def producedAttributes: AttributeSet = AttributeSet(sessionAttr :: Nil)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

case class SessionizeExec(
    user: Expression,
    ts: Expression,
    tiebreaks: Seq[Expression],
    gapMicros: Long,
    sessionAttr: Attribute,
    child: SparkPlan
) extends UnaryExecNode
    with CodegenSupport {

  override def output: Seq[Attribute] = child.output :+ sessionAttr
  override def producedAttributes: AttributeSet = AttributeSet(sessionAttr :: Nil)
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(user :: Nil) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    ((user +: ts +: tiebreaks).map(SortOrder(_, Ascending))) :: Nil
  override def outputOrdering: Seq[SortOrder] = child.outputOrdering
  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numSessions" -> SQLMetrics.createMetric(sparkContext, "number of sessions")
  )

  protected override def doExecute(): RDD[InternalRow] = {
    val numSessions = longMetric("numSessions")
    val childOutput = child.output
    val out = output
    val u = user
    val t = ts
    val gap = gapMicros
    val sa = sessionAttr
    child.execute().mapPartitions(
      { iter =>
        val keyProj = UnsafeProjection.create(u :: Nil, childOutput)
        val tsProj = UnsafeProjection.create(t :: Nil, childOutput)
        val outProj = UnsafeProjection.create(out, childOutput :+ sa)
        val sessRow = new GenericInternalRow(1)
        val joined = new JoinedRow
        var curKey: UnsafeRow = null
        var lastTs = 0L
        var sid = 0L
        iter.map { row =>
          val k = keyProj(row)
          val tv = tsProj(row).getLong(0)
          if (curKey == null || k != curKey) {
            curKey = k.copy(); sid = 1L; numSessions += 1
          } else if (tv - lastTs > gap) {
            sid += 1L; numSessions += 1
          }
          lastTs = tv
          sessRow.setLong(0, sid)
          outProj(joined(row, sessRow))
        }
      },
      preservesPartitioning = true
    )
  }

  // ---- whole-stage codegen (the iterator doExecute above remains the
  // interpreted fallback). The per-row state machine is three scalars
  // (prev key, prev ts, running session id) kept as generated-class
  // mutable state — a WholeStageCodegen instance is created per
  // partition, so state starts fresh at every partition boundary, same
  // as the mapPartitions closure. Gated to fixed-width key types: a
  // long/int user key compares with `!=`; wider types keep the
  // interpreted path rather than pay reference-equality bugs.
  override def supportCodegen: Boolean =
    (user.dataType == LongType || user.dataType == IntegerType) &&
      ts.dataType == TimestampType

  override def inputRDDs(): Seq[RDD[InternalRow]] =
    child.asInstanceOf[CodegenSupport].inputRDDs()

  override protected def doProduce(ctx: CodegenContext): String =
    child.asInstanceOf[CodegenSupport].produce(ctx, this)

  override def doConsume(
      ctx: CodegenContext,
      input: Seq[ExprCode],
      row: ExprCode
  ): String = {
    val numSessions = metricTerm(ctx, "numSessions")
    val init = ctx.addMutableState(CodeGenerator.JAVA_BOOLEAN, "sessInit")
    val prevUser = ctx.addMutableState(CodeGenerator.JAVA_LONG, "sessPrevUser")
    val prevNull = ctx.addMutableState(CodeGenerator.JAVA_BOOLEAN, "sessPrevNull")
    val lastTs = ctx.addMutableState(CodeGenerator.JAVA_LONG, "sessLastTs")
    val sidState = ctx.addMutableState(CodeGenerator.JAVA_LONG, "sessSid")
    ctx.currentVars = input
    val userEv = BindReferences.bindReference(user, child.output).genCode(ctx)
    val tsEv = BindReferences.bindReference(ts, child.output).genCode(ctx)
    val changed = ctx.freshName("sessChanged")
    val sidTerm = ctx.freshName("sessionId")
    val sidCode = ExprCode.forNonNullValue(JavaCode.variable(sidTerm, LongType))
    s"""
       |${userEv.code}
       |${tsEv.code}
       |boolean $changed = !$init || ($prevNull != ${userEv.isNull}) ||
       |  (!${userEv.isNull} && ${userEv.value} != $prevUser);
       |if ($changed) {
       |  $sidState = 1L;
       |  $numSessions.add(1);
       |} else if (${tsEv.value} - $lastTs > ${gapMicros}L) {
       |  $sidState += 1L;
       |  $numSessions.add(1);
       |}
       |$init = true;
       |$prevNull = ${userEv.isNull};
       |if (!${userEv.isNull}) { $prevUser = ${userEv.value}; }
       |$lastTs = ${tsEv.value};
       |long $sidTerm = $sidState;
       |${consume(ctx, input :+ sidCode)}
     """.stripMargin
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

object SessionizeStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case Sessionize(u, t, tb, gap, sa, child) =>
      SessionizeExec(u, t, tb, gap, sa, planLater(child)) :: Nil
    case _ => Nil
  }
}

object Sessionize {
  /** Runtime injection (idempotent) — same contract as
    * TopKPerGroup.install. */
  def install(spark: SparkSession): Unit = {
    val em = spark.experimental
    if (!em.extraStrategies.contains(SessionizeStrategy))
      em.extraStrategies = em.extraStrategies :+ SessionizeStrategy
  }

  /** DataFrame-facing constructor: appends `session_id` (1-based per
    * `userCol` under (`tsCol`, tiebreaks) order; a silence strictly
    * longer than `gapMicros` starts a new session). `tsCol` must be a
    * TIMESTAMP column. */
  def sessionize(
      df: DataFrame,
      userCol: String,
      tsCol: String,
      tiebreakCols: Seq[String],
      gapMicros: Long
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
    require(
      attr(tsCol).dataType == TimestampType,
      s"$tsCol must be TIMESTAMP, got ${attr(tsCol).dataType}"
    )
    install(df.sparkSession)
    GraftPlanBridge.ofRows(
      df.sparkSession,
      Sessionize(
        attr(userCol),
        attr(tsCol),
        tiebreakCols.map(attr),
        gapMicros,
        AttributeReference("session_id", LongType, nullable = false)(),
        analyzed
      )
    )
  }
}
