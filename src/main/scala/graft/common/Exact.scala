package graft.common

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Aggregation helpers that hash-match a DuckDB oracle bit-for-bit.
  *
  * A plain `sum(double)` is order-dependent (floating-point addition is not
  * associative) and Spark's partial-aggregation order is nondeterministic
  * across shuffles, so its low bits never reliably equal another engine's
  * sum. Casting each row to DECIMAL(18,4) first makes the sum exact and
  * order-independent; the final cast back to DOUBLE is then deterministic.
  *
  * SQL mirror (DuckDB): `CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE)`.
  *
  * This costs a little per-row work but nothing at the shuffle, and at
  * 100 TB it additionally removes run-to-run jitter from the results —
  * exact decimal partial aggregates merge associatively on any cluster
  * topology.
  */
object Exact {
  private val Dec = DecimalType(18, 4)

  /** 2-decimal money value as exact decimal (inputs are 2-dp doubles). */
  def money(c: Column): Column = c.cast(DecimalType(12, 2))

  /** 2-decimal rate in [0,1] (discount/tax) as exact decimal. */
  def rate(c: Column): Column = c.cast(DecimalType(3, 2))

  /** Exact decimal `1 - rate` / `1 + rate` factors. DECIMAL(3,2)
    * arithmetic keeps every intermediate exact, so the product sums are
    * bit-identical across engines and cluster topologies — unlike a
    * double product rounded to decimal, whose round-half ties fall
    * differently per engine.
    */
  def oneMinus(c: Column): Column = lit(1).cast(DecimalType(3, 2)) - rate(c)
  def onePlus(c: Column): Column = lit(1).cast(DecimalType(3, 2)) + rate(c)

  /** Order-independent sum of a double column, returned as double. */
  def dsum(c: Column): Column = sum(c.cast(Dec)).cast("double")

  /** Order-independent mean: exact decimal sum / count, double division. */
  def davg(c: Column): Column =
    (sum(c.cast(Dec)).cast("double") / count(c)).cast("double")

  def lcount(c: Column): Column = count(c).cast("long")

  def lcountAll: Column = count(lit(1)).cast("long")

  /** Integer cents of a 2-dp dollar value: ⌊100·v + 0.5⌉. The repo's
    * one rounding convention for money quantization — cross-row sums of
    * cents are associativity-exact, and the floor(+0.5) sequence is the
    * same correctly-rounded IEEE ops in both engines. Mirror SQL via
    * [[centsSql]]; change BOTH together or the bit-parity contract with
    * every money oracle breaks.
    */
  def cents(c: Column): Column = floor(c * 100.0 + 0.5).cast("long")

  /** DuckDB mirror of [[cents]]. */
  def centsSql(e: String): String =
    s"CAST(floor($e * 100.0 + 0.5) AS BIGINT)"
}
