package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst expression: membership probe of a long key against a
  * serialized `org.apache.spark.util.sketch.BloomFilter` — the scan-side
  * half of a bloom semi-join reduction (the filter itself is built once
  * from the dim side with `DataFrameStatFunctions.bloomFilter`, which
  * aggregates distributed and merges per-partition filters at the
  * driver).
  *
  * The filter argument must be a FOLDABLE binary (a `lit(bytes)` of the
  * serialized filter): it is deserialized ONCE per executor when the
  * expression is first evaluated and then referenced from generated code
  * (`ctx.addReferenceObj`), so the probe stays inside whole-stage codegen
  * — one `mightContainLong` call per row, no UDF serialization, no
  * per-row deserialization.
  *
  * Spark's own runtime-filter machinery has an equivalent internal
  * expression it injects during optimization; this one is part of the
  * engine's public surface so a pipeline can build the filter from any
  * dim-side state (including a persisted one) and apply it explicitly.
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a binary serialized bloom filter, " +
          s"got ${left.dataType.simpleString}")
    else if (!left.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable (literal) bloom filter argument")
    else if (right.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a bigint probe value, " +
          s"got ${right.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"
  override def nullable: Boolean = true

  @transient private lazy val filter: BloomFilter = {
    val bytes = left.eval().asInstanceOf[Array[Byte]]
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
  }

  override protected def nullSafeEval(f: Any, v: Any): Any =
    filter.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bf = ctx.addReferenceObj("bloomFilter", filter,
      classOf[BloomFilter].getName)
    // the filter is a codegen-time reference; only the probe child is
    // evaluated per row
    defineCodeGen(ctx, ev, (_, value) => s"$bf.mightContainLong($value)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}
