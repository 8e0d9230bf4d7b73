package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: cosine similarity of two `array<float>`
  * columns, accumulated in DOUBLE left-to-right — bit-identical to the
  * `aggregate(zip_with(...))` formulation used elsewhere (and to the
  * DuckDB oracle's list_reduce mirror), but compiled into the
  * whole-stage-codegen loop instead of interpreted per element (the
  * built-in higher-order array functions have no doGenCode).
  *
  * This is the decision-table case from SURVEY.md §7.4: a custom scalar
  * Expression is justified exactly where the built-ins can't keep the hot
  * path in codegen. Dot product and both norms come from one fused pass.
  *
  * Null handling: null if either array is null (BinaryExpression default)
  * or if the lengths differ (mirroring the HOF version, where zip_with's
  * null padding poisons the fold).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null // matches the HOF version's null result
    else {
      var dot = 0.0
      var na = 0.0
      var nb = 0.0
      var i = 0
      while (i < n) {
        val xv = x.getFloat(i).toDouble
        val yv = y.getFloat(i).toDouble
        dot += xv * yv; na += xv * xv; nb += yv * yv
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $x = (double) $a.getFloat($i);
         |    double $y = (double) $b.getFloat($i);
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Runtime registration of the engine's native functions (usable from
  * both the Column API via call_function and SQL text). Also exposed as a
  * SparkSessionExtensions installer for the spark.sql.extensions config
  * path.
  */
object GraftFunctions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.{Column, SparkSession}

  val all: Seq[(String, (String, Seq[Expression] => Expression))] = Seq(
    "cosine_sim" -> ((classOf[CosineSimilarity].getName,
      args => CosineSimilarity(args(0), args(1)))),
    "bloom_might_contain" -> ((classOf[BloomMightContain].getName,
      args => BloomMightContain(args(0), args(1)))),
    "char_entropy" -> ((classOf[CharEntropy].getName,
      args => CharEntropy(args(0)))),
    "jaro_winkler" -> ((classOf[JaroWinkler].getName,
      args => JaroWinkler(args(0), args(1)))))

  /** Idempotent per-session registration. */
  def register(spark: SparkSession): Unit = all.foreach {
    case (name, (cls, b)) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name),
        new ExpressionInfo(cls, name),
        args => b(args))
  }

  /** Column-API handle (requires register(spark) once per session). */
  def cosineSim(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("cosine_sim", a, b)

  /** Column-API bloom probe (requires register(spark) once per session). */
  def bloomMightContain(filter: Column, value: Column): Column =
    org.apache.spark.sql.functions.call_function(
      "bloom_might_contain", filter, value)

  /** Column-API char entropy (requires register(spark) once per session). */
  def charEntropy(text: Column): Column =
    org.apache.spark.sql.functions.call_function("char_entropy", text)

  /** Column-API Jaro–Winkler (requires register(spark) once per session). */
  def jaroWinkler(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("jaro_winkler", a, b)
}

/** `spark.sql.extensions=graft.functions.GraftExtensions` installer. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, (cls, b)) =>
      ext.injectFunction((
        org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new ExpressionInfo(cls, name),
        (args: Seq[Expression]) => b(args)))
    }
}
