package graft.queries

import graft.QueryDef
import graft.common.Tables.load
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Winsorization — the robust-curation clip that caps a metric at its
  * per-group [p01, p99] positional bounds before aggregation, so a
  * single fat-finger event cannot move a training feature. The fit
  * (bounds) and the audit (how much mass was clipped) in one pass.
  */
object Winsorize {

  /** q146: per-event-type winsorization audit. Bounds are POSITIONAL
    * quantiles on the cents multiset — lo = value at rank ⌈n/100⌉,
    * hi = value at rank ⌈99n/100⌉ (1-based, integer-arithmetic ranks:
    * (n+99) div 100 and (99n+99) div 100 — no float rank, so both
    * engines pick the identical element even at ties). The audit
    * reports clipped counts and the exact pre/post sums.
    *
    * Scale: ONE event_type exchange feeds the rank window, the
    * per-type count, and the final aggregate (same partitioning, no
    * re-key); the bounds frame is |types| rows broadcast back onto the
    * ranked rows. At 100 TB this is the standard two-window one-shuffle
    * robust-scaling plan; a skewed type's partition is the only hot
    * spot and salting the rank is the known escape.
    *
    * Exactness: cents, ranks, and sums are all integers.
    */
  private val q146 = QueryDef(
    (s, d) => {
      val byType = Window.partitionBy(col("event_type"))
      val ranked = load(s, d, "events").select(
        col("event_type"), col("event_id"),
        graft.common.Exact.cents(col("value")).as("cents"))
        .withColumn("rn", row_number().over(
          byType.orderBy(col("cents").asc, col("event_id").asc)))
        .withColumn("n", count(lit(1)).over(byType))
      val bounds = ranked
        .filter(col("rn") === expr("(n + 99) div 100") ||
          col("rn") === expr("(99 * n + 99) div 100"))
        .groupBy(col("event_type"))
        .agg(
          min(when(col("rn") === expr("(n + 99) div 100"), col("cents")))
            .as("lo_cents"),
          min(when(col("rn") === expr("(99 * n + 99) div 100"), col("cents")))
            .as("hi_cents"))
      ranked.join(broadcast(bounds), "event_type")
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n_events"),
          min(col("lo_cents")).as("lo_cents"),
          min(col("hi_cents")).as("hi_cents"),
          sum(when(col("cents") < col("lo_cents"), 1L).otherwise(0L))
            .as("n_clipped_low"),
          sum(when(col("cents") > col("hi_cents"), 1L).otherwise(0L))
            .as("n_clipped_high"),
          sum(col("cents")).as("sum_cents"),
          sum(least(greatest(col("cents"), col("lo_cents")), col("hi_cents")))
            .as("sum_winsorized_cents"))
    },
    Some(s"""WITH c AS (
              SELECT event_type, event_id,
                ${graft.common.Exact.centsSql("value")} AS cents
              FROM events
            ), ranked AS (
              SELECT event_type, event_id, cents,
                ROW_NUMBER() OVER (PARTITION BY event_type
                  ORDER BY cents ASC, event_id ASC) AS rn,
                COUNT(*) OVER (PARTITION BY event_type) AS n
              FROM c
            ), bounds AS (
              SELECT event_type,
                MIN(CASE WHEN rn = (n + 99) // 100 THEN cents END)
                  AS lo_cents,
                MIN(CASE WHEN rn = (99 * n + 99) // 100 THEN cents END)
                  AS hi_cents
              FROM ranked
              WHERE rn = (n + 99) // 100 OR rn = (99 * n + 99) // 100
              GROUP BY 1
            )
            SELECT r.event_type,
              CAST(count(*) AS BIGINT) AS n_events,
              MIN(b.lo_cents) AS lo_cents,
              MIN(b.hi_cents) AS hi_cents,
              CAST(SUM(CASE WHEN r.cents < b.lo_cents THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clipped_low,
              CAST(SUM(CASE WHEN r.cents > b.hi_cents THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clipped_high,
              CAST(SUM(r.cents) AS BIGINT) AS sum_cents,
              CAST(SUM(least(greatest(r.cents, b.lo_cents), b.hi_cents))
                AS BIGINT) AS sum_winsorized_cents
            FROM ranked r JOIN bounds b ON r.event_type = b.event_type
            GROUP BY 1"""),
    "winsorization audit: integer positional bounds, one type exchange [curation]")

  def all: Seq[(String, QueryDef)] = Seq(
    "q146_winsorize" -> q146)
}
