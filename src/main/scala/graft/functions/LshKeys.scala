package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused random-hyperplane LSH bucket keys over an `array<float>`
  * embedding: returns `tables` sign-bit strings of `bits` chars each,
  * all computed in one codegen'd pass.
  *
  * Replaces the compositional pipeline in graft.sim.Similarity
  * (typedlit 64×64 plane matrix + interpreted `zip_with`/`aggregate`
  * per band bit) whose higher-order functions dominated the ANN pair
  * queries' bucket-generation cost. Semantics are bit-identical:
  *   - hyperplane weights come from the same LCG formula
  *     `((1103515245·idx + 12345) mod 2^31) / 2^31 · 2 − 1` with
  *     `idx = (t·bits + p)·64 + d`, so the DuckDB oracle replicas of
  *     sim_pairs_ann / dedup_embed_ann need no change;
  *   - the dot product accumulates sequentially over element index
  *     (same order as the `aggregate` fold it replaces);
  *   - the sum is rounded to 6dp (HALF_UP, same as Spark's `round`)
  *     before the sign test so float-summation order can't flip a
  *     boundary bit across engines.
  *
  * A null embedding yields null; null elements count as 0.
  */
case class LshKeys(child: Expression, bits: Int, tables: Int)
    extends UnaryExpression {

  require(bits >= 1 && tables >= 1 && bits * tables <= 64,
    "lsh_keys supports at most 64 planes (bits * tables <= 64)")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"lsh_keys expects array<float>, got ${other.simpleString}"
      )
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullable: Boolean = child.nullable

  override def prettyName: String = "lsh_keys"

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = x.numElements()
    val keys = new Array[AnyRef](tables)
    var t = 0
    while (t < tables) {
      val chars = new Array[Byte](bits)
      var p = 0
      while (p < bits) {
        val plane = t * bits + p
        var dot = 0.0
        var d = 0
        while (d < n && d < 64) {
          if (!x.isNullAt(d)) {
            val idx = plane * 64L + d
            val w = ((1103515245L * idx + 12345L) % 2147483648L) / 2147483648.0 * 2 - 1
            dot += x.getFloat(d).toDouble * w
          }
          d += 1
        }
        val rounded = java.math.BigDecimal
          .valueOf(dot)
          .setScale(6, java.math.RoundingMode.HALF_UP)
          .doubleValue()
        chars(p) = if (rounded >= 0.0) '1'.toByte else '0'.toByte
        p += 1
      }
      keys(t) = UTF8String.fromBytes(chars)
      t += 1
    }
    new GenericArrayData(keys)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      a => {
        val n = ctx.freshName("n")
        val keys = ctx.freshName("keys")
        val chars = ctx.freshName("chars")
        val t = ctx.freshName("t")
        val p = ctx.freshName("p")
        val d = ctx.freshName("d")
        val idx = ctx.freshName("idx")
        val w = ctx.freshName("w")
        val dot = ctx.freshName("dot")
        val rounded = ctx.freshName("rounded")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), 64);
           |Object[] $keys = new Object[$tables];
           |for (int $t = 0; $t < $tables; $t++) {
           |  byte[] $chars = new byte[$bits];
           |  for (int $p = 0; $p < $bits; $p++) {
           |    double $dot = 0.0;
           |    for (int $d = 0; $d < $n; $d++) {
           |      if (!$a.isNullAt($d)) {
           |        long $idx = ($t * ${bits}L + $p) * 64L + $d;
           |        double $w = ((1103515245L * $idx + 12345L) % 2147483648L) / 2147483648.0 * 2 - 1;
           |        $dot += (double) $a.getFloat($d) * $w;
           |      }
           |    }
           |    double $rounded = java.math.BigDecimal.valueOf($dot)
           |      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue();
           |    $chars[$p] = ($rounded >= 0.0) ? (byte) '1' : (byte) '0';
           |  }
           |  $keys[$t] = UTF8String.fromBytes($chars);
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($keys);
         """.stripMargin
      }
    )

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
