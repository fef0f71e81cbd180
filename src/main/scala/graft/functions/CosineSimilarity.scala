package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** Fused cosine similarity over two `array<float>` columns, computed in
  * float64 with a single pass (dot product and both norms in one loop).
  *
  * A native Catalyst `Expression` with `doGenCode`, so it stays inside
  * whole-stage codegen — no UDF serialization, no per-row boxing of the
  * 64-element arrays. Accumulation is sequential over element index,
  * which matches DuckDB's `sum(x*y)` over parallel `unnest` exactly
  * (verified — the oracle for the sim_* queries relies on it).
  *
  * Returns NULL when either vector has zero norm (or either input is
  * NULL) rather than dividing by zero under ANSI mode.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

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
        s"cosine_sim expects (array<float>, array<float>), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})"
      )
  }

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var nx = 0.0
    var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi
      nx += xi * xi
      ny += yi * yi
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) null
    else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val dot = ctx.freshName("dot")
        val na = ctx.freshName("na")
        val nb = ctx.freshName("nb")
        val xi = ctx.freshName("xi")
        val yi = ctx.freshName("yi")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $xi = (double) $a.getFloat($i);
           |  double $yi = (double) $b.getFloat($i);
           |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
           |}
           |if ($na == 0.0 || $nb == 0.0) {
           |  ${ev.isNull} = true;
           |} else {
           |  ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
           |}
         """.stripMargin
      }
    )

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression
  ): Expression = copy(left = newLeft, right = newRight)
}

/** Registration for graft's native expressions.
  *
  * Two paths: `GraftExtensions` for session-build-time injection
  * (`spark.sql.extensions=graft.functions.GraftExtensions`), and
  * `GraftFunctions.register` for runtime injection into an existing
  * session (the driver builds the session itself, so query fns call
  * this — it is idempotent).
  */
object GraftFunctions {
  val cosineBuilder: Seq[Expression] => Expression = {
    case Seq(a, b) => CosineSim(a, b)
    case other =>
      throw new IllegalArgumentException(
        s"cosine_sim expects 2 arguments, got ${other.size}"
      )
  }

  val innerProductBuilder: Seq[Expression] => Expression = {
    case Seq(a, b) => InnerProduct(a, b)
    case other =>
      throw new IllegalArgumentException(
        s"inner_product expects 2 arguments, got ${other.size}"
      )
  }

  val l2SqBuilder: Seq[Expression] => Expression = {
    case Seq(a, b) => L2Sq(a, b)
    case other =>
      throw new IllegalArgumentException(
        s"l2_sq expects 2 arguments, got ${other.size}"
      )
  }

  val simhashBuilder: Seq[Expression] => Expression = {
    case Seq(a) => SimHash64(a)
    case other =>
      throw new IllegalArgumentException(
        s"simhash64 expects 1 argument, got ${other.size}"
      )
  }

  val lshKeysBuilder: Seq[Expression] => Expression = {
    case Seq(a, bits, tables) if bits.foldable && tables.foldable =>
      LshKeys(
        a,
        bits.eval().asInstanceOf[Number].intValue(),
        tables.eval().asInstanceOf[Number].intValue()
      )
    case other =>
      throw new IllegalArgumentException(
        s"lsh_keys expects (embedding, bits literal, tables literal), got ${other.size} args"
      )
  }

  val bigramTfBuilder: Seq[Expression] => Expression = {
    case Seq(a) => BigramTf(a)
    case other =>
      throw new IllegalArgumentException(
        s"bigram_tf expects 1 argument, got ${other.size}"
      )
  }

  val polyHashBuilder: Seq[Expression] => Expression = {
    case Seq(a) => PolyHash(a)
    case other =>
      throw new IllegalArgumentException(
        s"poly_hash expects 1 argument, got ${other.size}"
      )
  }

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim",
      cosineBuilder,
      "built-in"
    )
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "inner_product",
      innerProductBuilder,
      "built-in"
    )
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "l2_sq",
      l2SqBuilder,
      "built-in"
    )
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "poly_hash",
      polyHashBuilder,
      "built-in"
    )
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bigram_tf",
      bigramTfBuilder,
      "built-in"
    )
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64",
      simhashBuilder,
      "built-in"
    )
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "lsh_keys",
      lshKeysBuilder,
      "built-in"
    )
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // the view-SQL surface: Spark 4.1 wires no SQL statement to the
    // ViewCatalog API, so the parser wrapper owns CREATE/DROP/ALTER
    // VIEW + view expansion for snapshot catalogs (plans/ViewSql.scala)
    ext.injectParser((session, delegate) =>
      new graft.plans.GraftViewParser(session, delegate))
    ext.injectFunction(
      (
        new FunctionIdentifier("cosine_sim"),
        new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
        GraftFunctions.cosineBuilder
      )
    )
    ext.injectFunction(
      (
        new FunctionIdentifier("inner_product"),
        new ExpressionInfo(classOf[InnerProduct].getName, "inner_product"),
        GraftFunctions.innerProductBuilder
      )
    )
    ext.injectFunction(
      (
        new FunctionIdentifier("l2_sq"),
        new ExpressionInfo(classOf[L2Sq].getName, "l2_sq"),
        GraftFunctions.l2SqBuilder
      )
    )
    ext.injectFunction(
      (
        new FunctionIdentifier("simhash64"),
        new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
        GraftFunctions.simhashBuilder
      )
    )
    ext.injectFunction(
      (
        new FunctionIdentifier("lsh_keys"),
        new ExpressionInfo(classOf[LshKeys].getName, "lsh_keys"),
        GraftFunctions.lshKeysBuilder
      )
    )
    ext.injectFunction(
      (
        new FunctionIdentifier("bigram_tf"),
        new ExpressionInfo(classOf[BigramTf].getName, "bigram_tf"),
        GraftFunctions.bigramTfBuilder
      )
    )
    // conf-gated IVF rewrite of cosine top-k (graft.plans.AnnIvfRewrite;
    // runtime twin: AnnIvfRewrite.install)
    ext.injectOptimizerRule(sp => graft.plans.AnnIvfRewriteRule(sp))
    // conf-gated MV aggregate navigation — Stage-registered rollups AND
    // managed snapshot-catalog MVs serve matching source aggregates
    // transparently (runtime twin: MvRewrite.install)
    ext.injectOptimizerRule(sp => graft.plans.MvRollupRewriteRule(sp))
    // custom whole-operator layer: TopKPerGroup logical node → partial/
    // final bounded-heap SparkPlans (runtime twin: TopKPerGroup.install)
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerGroupStrategy)
  }
}
