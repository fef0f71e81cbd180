package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData}
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused character-bigram term frequencies over a string: one O(len)
  * pass yields `map<bigram, count>` for the whole document.
  *
  * Replaces the `explode(transform(sequence(1, len-1), i ->
  * substring(text, i, 2)))` + `groupBy(doc_id, b)` pipeline whose cost
  * is quadratic per document — Spark's `substring` re-scans the
  * UTF8String from the start to find the codepoint offset on every
  * call — and whose row expansion (one row per CHARACTER of corpus)
  * forces a (doc_id, bigram) shuffle before any aggregation can
  * happen. Here the per-document counts never leave the row: callers
  * `explode` the map and get (bigram, tf) directly, so the only
  * shuffles left in text_bigram_score are the small model/score
  * aggregations.
  *
  * Semantics are identical to the exploded pipeline (and to the DuckDB
  * oracle): bigrams are CODEPOINT pairs, exactly `substring(text, i,
  * 2)` for i in 1..numChars-1 — byte boundaries are walked once and
  * each bigram is sliced by offset, so multi-byte UTF-8 text costs the
  * same as ASCII. A string with fewer than 2 codepoints yields an
  * empty map (explodes to zero rows); a null string yields null.
  *
  * Codegen delegates to [[compute]] through a reference object — the
  * loop body stays in one JIT-friendly method while the projection
  * remains inside whole-stage codegen.
  */
case class BigramTf(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"bigram_tf expects string, got ${other.simpleString}"
      )
  }

  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)

  override def nullable: Boolean = child.nullable

  override def prettyName: String = "bigram_tf"

  def compute(s: UTF8String): MapData = {
    val bytes = s.getBytes
    // codepoint start offsets; starts(numChars) = total bytes
    var nChars = 0
    var i = 0
    while (i < bytes.length) {
      i += UTF8String.numBytesForFirstByte(bytes(i))
      nChars += 1
    }
    if (nChars < 2) {
      return new ArrayBasedMapData(
        new GenericArrayData(Array.empty[Any]),
        new GenericArrayData(Array.empty[Any])
      )
    }
    val starts = new Array[Int](nChars + 1)
    i = 0
    var c = 0
    while (i < bytes.length) {
      starts(c) = i
      i += UTF8String.numBytesForFirstByte(bytes(i))
      c += 1
    }
    starts(nChars) = bytes.length
    val counts = new java.util.LinkedHashMap[UTF8String, Array[Long]]()
    var k = 0
    while (k < nChars - 1) {
      val b = UTF8String.fromBytes(bytes, starts(k), starts(k + 2) - starts(k))
      val cell = counts.get(b)
      if (cell == null) counts.put(b, Array(1L)) else cell(0) += 1L
      k += 1
    }
    val n = counts.size()
    val keys = new Array[Any](n)
    val vals = new Array[Any](n)
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      keys(j) = e.getKey
      vals(j) = e.getValue()(0)
      j += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bigramTf", this, classOf[BigramTf].getName)
    nullSafeCodeGen(
      ctx,
      ev,
      a =>
        s"${ev.value} = (org.apache.spark.sql.catalyst.util.MapData) $ref.compute($a);"
    )
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
