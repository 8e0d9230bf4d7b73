package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering key — the multi-dimensional layout
  * primitive behind Delta's OPTIMIZE ZORDER: map each clustering column
  * to a bounded bucket ordinal, then bit-interleave the bucket bits so
  * rows close in EVERY dimension land close in the 1-D sort order.
  * Written range-partitioned and sorted on this key, a table's per-file
  * min/max stats become selective in all clustered dimensions at once —
  * a 2-D box probe prunes to the files whose z-range intersects the
  * box, instead of the 1-D case where only the leading sort column
  * prunes. Pure codegen'd integer arithmetic (shifts/and/add) — no UDF,
  * no shuffle of its own; the layout write pays one range exchange.
  */
object ZOrder {

  /** Interleave the low `bits` bits of each bucket column: bucket `j`'s
    * bit `i` lands at position `i * d + j` (d = dimension count), so
    * z < 2^(bits·d). Buckets must already be in [0, 2^bits).
    */
  def interleave(buckets: Seq[Column], bits: Int): Column = {
    require(buckets.size >= 2, "z-order needs at least 2 dimensions")
    val d = buckets.size
    (0 until bits).flatMap { i =>
      buckets.zipWithIndex.map { case (b, j) =>
        shiftleft(
          shiftrightunsigned(b.cast("long"), i).bitwiseAND(lit(1L)),
          i * d + j)
      }
    }.reduce(_ + _)
  }

  /** Z-key over integral columns with driver-known [min, max] ranges:
    * each value is bucketed by a plain right shift sized so the whole
    * range fits in `bits` bits (shift-based bucketing is exact integer
    * arithmetic — no float quantile edge cases — and at 100 TB the
    * min/max come from the table layer's own manifest stats, not a
    * scan).
    */
  def zkey(cols: Seq[Column], mins: Seq[Long], maxs: Seq[Long],
      bits: Int): Column = {
    require(cols.size == mins.size && cols.size == maxs.size)
    val buckets = cols.zip(mins.zip(maxs)).map { case (c, (mn, mx)) =>
      val spanBits =
        if (mx <= mn) 0
        else 64 - java.lang.Long.numberOfLeadingZeros(mx - mn)
      val shift = math.max(spanBits - bits, 0)
      shiftrightunsigned(c.cast("long") - lit(mn), shift)
    }
    interleave(buckets, bits)
  }
}
