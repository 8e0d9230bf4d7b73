package graft.queries

import graft.QueryDef
import graft.common.Tables.load
import org.apache.spark.sql.functions._

/** Approximate/sketch variants of exact operators — the 100 TB escape
  * hatch called out in SURVEY.md §7.6: exact countDistinct shuffles every
  * distinct value; HLL++ ships fixed-size sketches and merges them
  * associatively, and quantile sketches replace full sorts. Rows-only
  * driver checks; accuracy vs the exact counterparts is asserted in
  * ApproxOpsSpec.
  */
object ApproxOps {

  /** HLL++ distinct orders/users per event_type (approx twin of q41's
    * exact n_users at the day grain).
    */
  private val q45 = QueryDef(
    (s, d) =>
      load(s, d, "events")
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n_events"),
          approx_count_distinct(col("user_id"), 0.01).cast("long")
            .as("approx_users"),
          countDistinct(col("user_id")).cast("long").as("exact_users")),
    None, // sketch results are estimator-specific; spec asserts the bound
    "HLL++ approx distinct vs exact, per event_type [approx,scale]")

  /** Approximate quantiles of order value per priority via percentile_approx
    * (GK sketch) next to the exact median for error measurement.
    */
  private val q46 = QueryDef(
    (s, d) =>
      load(s, d, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          percentile_approx(col("o_totalprice"), lit(0.5), lit(10000))
            .as("approx_median"),
          expr("percentile(o_totalprice, 0.5)").as("exact_median"),
          count(lit(1)).as("n_orders")),
    None,
    "GK-sketch approx median vs exact, per priority [approx,scale]")

  def all: Seq[(String, QueryDef)] = Seq(
    "q45_approx_distinct" -> q45,
    "q46_approx_quantiles" -> q46)
}
