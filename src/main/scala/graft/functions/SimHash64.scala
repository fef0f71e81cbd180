package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Fused 64-bit SimHash over a token array: one pass hashes every
  * token occurrence with xxhash64 (seed 42 — identical to the builtin
  * `xxhash64(token)` the exploded dedup_simhash pipeline uses) and
  * accumulates the 64 bit votes in registers; the sign of each vote
  * becomes the fingerprint bit.
  *
  * Equivalent to the explode→groupBy pipeline (summing ±1 per
  * OCCURRENCE equals weighting distinct tokens by their counts) but
  * with no row expansion and no shuffle: per-document cost drops from
  * 64 exploded rows × aggregation to a single codegen'd loop —
  * DedupSimSpec asserts bit-identical fingerprints, BASELINE.md the
  * speedup.
  *
  * Null handling: a null array yields null; null elements are skipped.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"simhash64 expects array<string>, got ${other.simpleString}"
      )
  }

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) fp |= (1L << b)
      b += 1
    }
    fp
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      a => {
        val votes = ctx.freshName("votes")
        val i = ctx.freshName("i")
        val b = ctx.freshName("b")
        val h = ctx.freshName("h")
        val s = ctx.freshName("s")
        val fp = ctx.freshName("fp")
        val xxh = classOf[XxHash64Function.type].getName.stripSuffix("$") + "$.MODULE$"
        val stringType = "org.apache.spark.sql.types.StringType$.MODULE$"
        s"""
           |int[] $votes = new int[64];
           |for (int $i = 0; $i < $a.numElements(); $i++) {
           |  if (!$a.isNullAt($i)) {
           |    UTF8String $s = $a.getUTF8String($i);
           |    long $h = $xxh.hash($s, $stringType, 42L);
           |    for (int $b = 0; $b < 64; $b++) {
           |      if ((($h >>> $b) & 1L) == 1L) $votes[$b]++; else $votes[$b]--;
           |    }
           |  }
           |}
           |long $fp = 0L;
           |for (int $b = 0; $b < 64; $b++) {
           |  if ($votes[$b] > 0) $fp |= (1L << $b);
           |}
           |${ev.value} = $fp;
         """.stripMargin
      }
    )

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
