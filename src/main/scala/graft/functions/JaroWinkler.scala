package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared Jaro–Winkler implementation, called from both the interpreted
  * and the generated code path (the match-window flag arrays don't
  * inline pleasantly; a static call keeps the expression inside
  * whole-stage codegen, the same shape as Spark's own `levenshtein`).
  *
  * Semantics mirror DuckDB's `jaro_winkler_similarity` FOR ASCII
  * INPUTS (validated bitwise on a 5000-pair ASCII-name fuzz): classic
  * Jaro with the ⌊max/2⌋−1 match window and integer-halved
  * transpositions, the Winkler ≤4-char prefix bonus (p=0.1) applied
  * only above the standard 0.7 boost threshold, 0.0 when either side
  * is empty — so the expression is oracle-comparable with no tolerance
  * on most inputs (a 1e-9 tolerance still guards the final float
  * chain). The parity contract is scoped to ASCII: this
  * implementation compares UTF-16 code units (`String.charAt`), so
  * surrogate pairs and other non-BMP input can score differently from
  * DuckDB's byte-level comparison — the q121/q166 oracles only feed it
  * the ASCII name dictionary, which is inside the contract. A
  * general-Unicode caller should normalize or transliterate first.
  */
object JaroWinklerAlgo {
  def similarity(l: UTF8String, r: UTF8String): Double = {
    val a = l.toString
    val b = r.toString
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val aM = new Array[Boolean](la)
    val bM = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bM(j) && a.charAt(i) == b.charAt(j)) {
          aM(i) = true; bM(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var mismatch = 0
    var k = 0
    i = 0
    while (i < la) {
      if (aM(i)) {
        while (!bM(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) mismatch += 1
        k += 1
      }
      i += 1
    }
    val t = mismatch / 2
    val md = m.toDouble
    val jaro = (md / la + md / lb + (md - t) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var p = 0
    while (p < math.min(4, math.min(la, lb)) && a.charAt(p) == b.charAt(p))
      p += 1
    jaro + p * 0.1 * (1.0 - jaro)
  }
}

/** Native Catalyst expression: `jaro_winkler(string, string) -> double`
  * — the normalized fuzzy comparator for entity resolution (q166),
  * complementing the integer `levenshtein` path (q121). Null if either
  * input is null (BinaryExpression default).
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two string arguments, " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerAlgo.similarity(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinklerAlgo.similarity($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}
