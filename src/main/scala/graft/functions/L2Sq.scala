package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Fused squared Euclidean distance over two `array<float>` columns in
  * float64 — the third scoring kernel beside [[CosineSim]] and
  * [[InnerProduct]], and the metric PQ codebook assignment already
  * uses in expression form. Squared (no terminal sqrt) because nearest
  * ordering is monotone in the square and every consumer — k-means
  * assignment, ADC, nearest-neighbor top-k — only orders or sums.
  * Sequential accumulation matches DuckDB's `sum(pow(x-y, 2))` over
  * parallel `unnest` exactly, so L2 oracles hash-compare. */
case class L2Sq(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(e =>
      e.dataType match {
        case ArrayType(FloatType, _) => true
        case _                       => false
      }
    )
    if (ok) TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"l2_sq expects (array<float>, array<float>), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})"
      )
  }

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def prettyName: String = "l2_sq"

  // Mismatched vector lengths return NULL, not a silently-truncated
  // score (round-8 advice): a plausible-but-wrong distance from a
  // min-length fold is the worst failure mode for a ranking kernel.
  // Stricter than the CosineSim precedent; safe because every staged
  // embedding column is fixed-width by construction.
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = x.getFloat(i).toDouble - y.getFloat(i).toDouble
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val acc = ctx.freshName("acc")
        val d = ctx.freshName("d")
        s"""
           |int $n = $a.numElements();
           |if ($n != $b.numElements()) {
           |  ${ev.isNull} = true;
           |} else {
           |  double $acc = 0.0;
           |  for (int $i = 0; $i < $n; $i++) {
           |    double $d = (double) $a.getFloat($i) - (double) $b.getFloat($i);
           |    $acc += $d * $d;
           |  }
           |  ${ev.value} = $acc;
           |}
         """.stripMargin
      }
    )

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression
  ): Expression = copy(left = newLeft, right = newRight)
}
