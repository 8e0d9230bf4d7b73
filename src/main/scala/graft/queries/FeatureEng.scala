package graft.queries

import graft.QueryDef
import graft.common.Tables.load
import org.apache.spark.sql.functions._

/** Feature-engineering encoders — the transforms a training-data export
  * applies to categorical columns before a model sees them. First
  * entry: smoothed target encoding (a.k.a. James-Stein / empirical-Bayes
  * encoding), the high-cardinality-safe alternative to one-hot.
  */
object FeatureEng {

  /** Additive-smoothing pseudo-count: categories with fewer than ~α rows
    * shrink strongly toward the global prior, killing the
    * small-category overfit that makes naive target encoding leak.
    */
  private val Alpha = "100.0"

  /** q128: target-encode o_orderpriority against the binary target
    * "order finished" (o_orderstatus = 'F') with additive smoothing:
    * enc = (k_c + α·prior) / (n_c + α), prior = K/N.
    *
    * Scale: one keyed aggregate to |categories| rows (map-side
    * combined); the global prior folds from that tiny frame and joins
    * back as a broadcast. The encoding table itself is the OUTPUT — at
    * apply time it broadcast-joins onto the fact table, so the encode
    * step never shuffles the corpus. For leakage-free training the same
    * aggregate runs per CV fold (q125's assignment) with the fold's own
    * rows held out — the plan shape is identical, k× the tiny frames.
    *
    * Float parity: counts are exact longs; prior, the α product, and
    * the final quotient are single IEEE ops written in the same operand
    * order in both engines — exact oracle, no tolerance.
    */
  private val q128 = QueryDef(
    (s, d) => {
      val byCat = load(s, d, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L))
            .as("n_pos"))
      val totals = byCat.agg(
        sum(col("n_orders")).as("n_total"), sum(col("n_pos")).as("k_total"))
      byCat.crossJoin(broadcast(totals))
        .withColumn("prior",
          col("k_total").cast("double") / col("n_total").cast("double"))
        .withColumn("encoded",
          (col("n_pos").cast("double") + lit(Alpha.toDouble) * col("prior")) /
            (col("n_orders").cast("double") + lit(Alpha.toDouble)))
        .select(col("o_orderpriority"), col("n_orders"), col("n_pos"),
          col("prior"), col("encoded"))
    },
    Some(s"""WITH s AS (
              SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders,
                CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_pos
              FROM orders GROUP BY 1
            ), t AS (
              SELECT CAST(SUM(n_orders) AS BIGINT) AS n_total,
                CAST(SUM(n_pos) AS BIGINT) AS k_total
              FROM s
            )
            SELECT s.o_orderpriority, s.n_orders, s.n_pos,
              CAST(t.k_total AS DOUBLE) / CAST(t.n_total AS DOUBLE)
                AS prior,
              (CAST(s.n_pos AS DOUBLE) + $Alpha *
                (CAST(t.k_total AS DOUBLE) / CAST(t.n_total AS DOUBLE))) /
                (CAST(s.n_orders AS DOUBLE) + $Alpha) AS encoded
            FROM s, t"""),
    "smoothed target encoding: keyed agg + broadcast prior, exact arithmetic [feature-eng]")

  def all: Seq[(String, QueryDef)] = Seq(
    "q128_target_encoding" -> q128)
}
