package graft.queries

import graft.QueryDef
import graft.common.Tables.load
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate/sketch variants of exact operators — the 100 TB escape
  * hatch called out in SURVEY.md §7.6: exact countDistinct shuffles every
  * distinct value; HLL++ ships fixed-size sketches and merges them
  * associatively, and quantile sketches replace full sorts.
  *
  * DERIVED ORACLES: a sketch estimate is estimator-specific, so its raw
  * value can never hash-match an oracle computed by a different engine.
  * What IS portable is the error contract — so each query emits the
  * exact value (engine-computed, bit-portable) plus a `within_bound`
  * boolean asserting the sketch landed inside its documented error
  * envelope, and the DuckDB oracle recomputes the exact value and emits
  * `true`. A sketch drifting out of contract flips the boolean and
  * fails the driver's hash compare. The raw estimates stay visible via
  * [[approxDistinctRaw]]/[[approxMedianRaw]] and their accuracy is
  * additionally asserted in ApproxOpsSpec.
  */
object ApproxOps {

  /** HLL++ estimate next to the exact count, per event_type — the
    * diagnostic surface (estimator-specific values; not oracle-checked).
    */
  def approxDistinctRaw(s: SparkSession, d: String): DataFrame =
    load(s, d, "events")
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        approx_count_distinct(col("user_id"), 0.01).cast("long")
          .as("approx_users"),
        countDistinct(col("user_id")).cast("long").as("exact_users"))

  /** HLL++ distinct users per event_type (approx twin of q41's exact
    * n_users at the day grain), oracle-checked through the derived
    * error-bound contract: rsd 0.01 ⇒ |approx−exact| ≤ 5%·exact is a
    * ≥5σ envelope, deterministic for a fixed dataset.
    */
  private val q45 = QueryDef(
    (s, d) =>
      approxDistinctRaw(s, d).select(
        col("event_type"), col("n_events"), col("exact_users"),
        (abs(col("approx_users") - col("exact_users")) <=
          col("exact_users") * 0.05).as("within_bound")),
    Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
              CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
              true AS within_bound
            FROM events GROUP BY 1"""),
    "HLL++ distinct within 5% of exact, per event_type [approx,scale]")

  /** GK-sketch median next to the exact median, per priority — the
    * diagnostic surface (estimator-specific values).
    */
  def approxMedianRaw(s: SparkSession, d: String): DataFrame =
    load(s, d, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        percentile_approx(col("o_totalprice"), lit(0.5), lit(10000))
          .as("approx_median"),
        expr("percentile(o_totalprice, 0.5)").as("exact_median"),
        expr("percentile(o_totalprice, 0.49)").as("p49"),
        expr("percentile(o_totalprice, 0.51)").as("p51"),
        count(lit(1)).as("n_orders"))

  /** Approximate median of order value per priority, oracle-checked
    * through the derived RANK bound: accuracy 10000 ⇒ rank error
    * ≤ n/10000 ≪ 0.01·n, so the returned element must lie between the
    * exact 0.49 and 0.51 quantiles. (A relative-VALUE bound is unsound:
    * adjacent order totals can differ by more than any fixed fraction
    * in a small group, as they do at sf0.001.) The exact median rides
    * along as an oracle-checked column — Spark's `percentile` and
    * DuckDB's `quantile_cont` interpolate identically
    * (lower + (upper−lower)·f in double).
    */
  private val q46 = QueryDef(
    (s, d) =>
      approxMedianRaw(s, d).select(
        col("o_orderpriority"), col("n_orders"), col("exact_median"),
        (col("approx_median") >= col("p49") &&
          col("approx_median") <= col("p51")).as("within_bound")),
    Some("""SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders,
              quantile_cont(o_totalprice, 0.5) AS exact_median,
              true AS within_bound
            FROM orders GROUP BY 1"""),
    "GK-sketch median inside the exact [p49, p51] rank window [approx,scale]")

  def all: Seq[(String, QueryDef)] = Seq(
    "q45_approx_distinct" -> q45,
    "q46_approx_quantiles" -> q46)
}
