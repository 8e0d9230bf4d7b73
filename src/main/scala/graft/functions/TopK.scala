package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions.udaf

/** One candidate row for the bounded top-k aggregate: `value` is the
  * integer sort key (cents — exact, total order), `id` the tie-break,
  * `payload` whatever must survive to the output (here the original
  * 2-dp price, so no lossy cents→double round trip on emit).
  */
case class Ranked(value: Long, id: Long, payload: Double)

/** Bounded-heap top-k-per-key typed aggregate — the scalable form of
  * "top k rows per group".
  *
  * WHY an Aggregator and not a window: `row_number().over(partitionBy
  * (group))` materializes and SORTS every group in one task, so a
  * low-cardinality group column (5 market segments) serializes the
  * whole corpus through 5 tasks at 100 TB. As an aggregate, top-k gets
  * Spark's two-phase machinery for free: every input partition reduces
  * to ≤k rows per group BEFORE the exchange (ObjectHashAggregate
  * partial), the shuffle moves ≤ k·|partitions| rows per group instead
  * of the corpus, and the merge is an O(k) sorted-list union. This is
  * preference (b) of the custom-operator ladder — a typed aggregate,
  * not a whole planner strategy, because the aggregate path already
  * gives the partial/final split a custom SparkPlan would hand-build.
  *
  * Determinism: the buffer is kept sorted by (value DESC, id ASC) and
  * ids are unique, so the result is a total-order prefix — identical
  * under any partitioning or merge order (DeterminismSpec pins it).
  */
class TopKAgg(k: Int)
    extends Aggregator[Ranked, Seq[Ranked], Seq[Ranked]] {

  private def beats(a: Ranked, b: Ranked): Boolean =
    a.value > b.value || (a.value == b.value && a.id < b.id)

  private def insert(buf: Seq[Ranked], x: Ranked): Seq[Ranked] =
    if (buf.lengthCompare(k) >= 0 && beats(buf.last, x)) buf
    else {
      val (pre, post) = buf.span(beats(_, x))
      (pre ++ (x +: post)).take(k)
    }

  override def zero: Seq[Ranked] = Vector.empty
  override def reduce(buf: Seq[Ranked], x: Ranked): Seq[Ranked] =
    insert(buf, x)
  override def merge(a: Seq[Ranked], b: Seq[Ranked]): Seq[Ranked] =
    b.foldLeft(a)(insert)
  override def finish(r: Seq[Ranked]): Seq[Ranked] = r
  override def bufferEncoder: ExpressionEncoder[Seq[Ranked]] =
    ExpressionEncoder[Seq[Ranked]]()
  override def outputEncoder: ExpressionEncoder[Seq[Ranked]] =
    ExpressionEncoder[Seq[Ranked]]()
}

object TopK {
  /** Column-API handle: `topk(3)(struct fields value, id, payload)`.
    * Call as `topk3(col("value"), col("id"), col("payload"))`.
    */
  def topk(k: Int): UserDefinedFunction =
    udaf(new TopKAgg(k), ExpressionEncoder[Ranked]())
}
