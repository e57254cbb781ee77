package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.SparkSessionExtensions

/** Native Catalyst expression for cosine similarity over two
  * array<float> columns (SURVEY.md §4.3's sanctioned stretch: promote
  * the similarity kernel from UDF → codegen'd Expression).
  *
  * Generated code is a primitive double loop — no per-element lambda
  * dispatch (higher-order functions evaluate their lambda interpreted
  * per element), no Seq boxing (the Scala-UDF cost). Semantics are
  * identical to [[Udfs.cosSimDblExpr]]: ascending-index IEEE-double
  * fold, so the DuckDB twin remains [[Udfs.sqlCosSimDbl]].
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<float> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine_sim"

  // A null ELEMENT (parquet list elements are containsNull=true even
  // when no nulls exist) propagates NULL — matching the SQL twin's
  // list_transform/list_reduce semantics — rather than silently
  // contributing 0 to the dot product.
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val denom = ctx.freshName("denom")
      val hasNull = ctx.freshName("hasNull")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |boolean $hasNull = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { $hasNull = true; break; }
         |  double $x = (double) $a.getFloat($i);
         |  double $y = (double) $b.getFloat($i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |if ($hasNull) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |  ${ev.value} = ($denom == 0.0) ? 0.0 : $dot / $denom;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  val NAME = "graft_cosine_sim"

  private[graft] val info = new ExpressionInfo(classOf[CosineSim].getName, NAME)
  private[graft] val builder: Seq[Expression] => Expression = {
    case Seq(a, b) => CosineSim(a, b)
    case exprs => throw new IllegalArgumentException(
      s"$NAME expects 2 arguments, got ${exprs.size}")
  }

  /** Idempotent per-session registration (the harness constructs the
    * SparkSession, so operators self-register instead of relying on
    * spark.sql.extensions being set). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(NAME), info, builder)
}

/** SparkSessionExtensions hook for library users:
  * `spark.sql.extensions=graft.functions.GraftExtensions` injects the
  * native functions at session build time. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // reuse the arity/foldability-checked builders so the extension path
    // and per-session register() path reject malformed calls identically
    ext.injectFunction(
      (FunctionIdentifier(CosineSim.NAME), CosineSim.info, CosineSim.builder))
    ext.injectFunction(
      (FunctionIdentifier(RollingHash.NAME), RollingHash.info,
        RollingHash.builder))
    ext.injectFunction(
      (FunctionIdentifier(KmvAgg.NAME), KmvAgg.info, KmvAgg.builder))
    // whole-operator extension: partial/final per-key top-k, plus the
    // conf-gated rewrite that swaps it in for row_number()<=k windows
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
    ext.injectOptimizerRule(_ => graft.plans.TopKRewriteRule)
  }
}
