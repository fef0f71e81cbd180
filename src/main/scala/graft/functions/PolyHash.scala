package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused polynomial rolling hash over a string's code points:
  * h = fold(0, (h, cp) -> (h·31 + cp) mod 1e9+7) — bit-identical to the
  * expression-level idiom in text_fingerprint
  * (`aggregate(transform(split(text,''), c -> ascii(c)), …)`, since
  * `ascii`/DuckDB `unicode` are exactly the code point), but WITHOUT
  * materializing a one-UTF8String-per-character array first. The HOF
  * form allocates O(|text|) objects per document before folding; this
  * expression is a single register loop inside whole-stage codegen, the
  * difference that matters when documents are megabytes at 100 TB.
  *
  * Null handling: null string yields null. */
case class PolyHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"poly_hash expects string, got ${other.simpleString}"
      )
  }

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def prettyName: String = "poly_hash"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 31L + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      a => {
        val s = ctx.freshName("s")
        val h = ctx.freshName("h")
        val i = ctx.freshName("i")
        val cp = ctx.freshName("cp")
        s"""
           |java.lang.String $s = $a.toString();
           |long $h = 0L;
           |int $i = 0;
           |while ($i < $s.length()) {
           |  int $cp = $s.codePointAt($i);
           |  $h = ($h * 31L + $cp) % 1000000007L;
           |  $i += java.lang.Character.charCount($cp);
           |}
           |${ev.value} = $h;
         """.stripMargin
      }
    )

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
