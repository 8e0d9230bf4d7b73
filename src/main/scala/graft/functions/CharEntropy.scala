package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Shannon entropy (bits per character) of a
  * string's character-frequency distribution — the cheap "is this text
  * or noise" quality signal a corpus filter runs beside length/stopword
  * ratios (near-zero entropy = repeated filler, near-log2(alphabet) =
  * random bytes; natural English sits ~4.1 bits).
  *
  * Computed per row in ONE local pass (histogram + closed-form sum) —
  * no explode to characters, no shuffle, stays inside whole-stage
  * codegen via a static helper call. Summation order is FIXED (character
  * code ascending) so the double result is bit-deterministic across
  * partitionings and runs; the DuckDB oracle recomputes the same formula
  * with its own (unordered) summation and the q110 contract compares
  * under a 1e-9 tolerance.
  *
  * Characters are UTF-16 code units (the corpus is ASCII, where units =
  * code points = characters); empty/null-length input yields 0.0.
  */
object CharEntropy {

  /** H = log2(n) - (Σ c_i·log2(c_i))/n over per-character counts c_i,
    * summed in character-code order. Called from generated code.
    */
  def compute(s: UTF8String): Double = {
    val str = s.toString
    val n = str.length
    if (n == 0) return 0.0
    val counts = new java.util.TreeMap[Character, Long]()
    var i = 0
    while (i < n) {
      counts.merge(str.charAt(i), 1L, (a, b) => a + b)
      i += 1
    }
    var acc = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next().toDouble
      acc += c * (math.log(c) / math.log(2.0))
    }
    math.log(n.toDouble) / math.log(2.0) - acc / n
  }
}

case class CharEntropy(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, " +
        s"got ${child.dataType.simpleString}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "char_entropy"

  override protected def nullSafeEval(v: Any): Any =
    CharEntropy.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CharEntropy.compute($c)")

  override protected def withNewChildInternal(
      newChild: Expression): CharEntropy = copy(child = newChild)
}
