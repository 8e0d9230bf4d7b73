package graft.queries

import graft.QueryDef
import graft.common.Exact._
import graft.common.Tables.load
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Survival analysis over customer order histories: the Kaplan–Meier
  * estimator of "how long does a customer stay active", with right-
  * censoring for customers still active at the observation horizon —
  * the retention readout behind every churn curve.
  */
object Survival {

  /** Customers whose last order falls within this many days of the
    * corpus max date are right-censored (still alive at cutoff), not
    * churn events.
    */
  private val HorizonDays = 90

  /** q159: Kaplan–Meier curve over customer lifetime (days between
    * first and last order). Per duration t: the risk set nₜ, events dₜ,
    * censored cₜ, and S(t) = Π_{s≤t}(1 − d_s/n_s).
    *
    * Scale: the corpus collapses to one row per customer in a single
    * map-side-combined aggregate, then to one row per DISTINCT DURATION
    * — a calendar-bounded frame (≤ a few thousand day values no matter
    * the corpus size), so the ordered window over it is safe by
    * construction (the q151 bounded-window argument; the unbounded-
    * cardinality analogue would use operators.PrefixSum).
    *
    * Exactness: nₜ/dₜ/cₜ are exact integers (risk set = N minus an
    * integer running sum). S(t) = exp(Σ ln(1−d/n)) is the one ordered
    * float fold, so the oracle re-derives it from the exact-joined
    * integer evidence and admits rows within 1e-9 (q110 tolerance
    * contract). A terminal duration where the whole risk set dies is
    * guarded to S=0 in both engines (ln(0) is an error in DuckDB).
    */
  private val q159 = QueryDef(
    (s, d) => {
      val orders = load(s, d, "orders")
      val perCust = orders.groupBy(col("o_custkey"))
        .agg(min(col("o_orderdate")).as("first_ts"),
          max(col("o_orderdate")).as("last_ts"))
      val mx = orders.agg(max(col("o_orderdate")).as("m"))
      val subj = perCust.crossJoin(broadcast(mx))
        .select(
          datediff(col("last_ts"), col("first_ts")).cast("long").as("t"),
          (col("last_ts").cast("date") <
            date_sub(col("m").cast("date"), HorizonDays)).as("ev"))
      val n = subj.count()
      val km = subj.groupBy(col("t"))
        .agg(sum(when(col("ev"), 1L).otherwise(0L)).as("d"),
          sum(when(col("ev"), 0L).otherwise(1L)).as("c"))
      val w = Window.orderBy(col("t").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      km
        .withColumn("n_risk",
          lit(n) - sum(col("d") + col("c")).over(w) + col("d") + col("c"))
        .withColumn("term",
          when(col("d") < col("n_risk"),
            log(lit(1.0) - col("d").cast("double") /
              col("n_risk").cast("double"))).otherwise(lit(0.0)))
        .withColumn("cum_ln", sum(col("term")).over(w))
        .select(col("t"), col("n_risk"), col("d").as("n_event"),
          col("c").as("n_censored"),
          when(col("d") < col("n_risk"), exp(col("cum_ln")))
            .otherwise(lit(0.0)).as("survival"))
    },
    Some(s"""WITH pc AS (
              SELECT o_custkey, MIN(o_orderdate) AS f,
                MAX(o_orderdate) AS l
              FROM orders GROUP BY 1
            ), m AS (SELECT MAX(o_orderdate) AS m FROM orders),
            subj AS (
              SELECT CAST(date_diff('day', CAST(f AS DATE), CAST(l AS DATE))
                  AS BIGINT) AS t,
                CAST(l AS DATE) < CAST(m AS DATE) - $HorizonDays AS ev
              FROM pc, m
            ), km AS (
              SELECT t,
                CAST(SUM(CASE WHEN ev THEN 1 ELSE 0 END) AS BIGINT) AS d,
                CAST(SUM(CASE WHEN ev THEN 0 ELSE 1 END) AS BIGINT) AS c
              FROM subj GROUP BY 1
            ), nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM subj),
            r AS (
              SELECT t, d, c,
                n - SUM(d + c) OVER (ORDER BY t ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  + d + c AS n_risk
              FROM km, nn
            ), sv AS (
              SELECT t, n_risk, d, c,
                CASE WHEN d < n_risk THEN
                  exp(SUM(CASE WHEN d < n_risk
                    THEN ln(1 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE))
                    ELSE 0 END) OVER (ORDER BY t ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
                ELSE 0.0 END AS survival
              FROM r
            ), emitted AS (
              SELECT * FROM read_parquet(
                '${graft.QueryDef.OutDirToken}/q159_km_survival/*.parquet')
            )
            SELECT e.t, e.n_risk, e.n_event, e.n_censored, e.survival
            FROM emitted e JOIN sv
              ON e.t = sv.t AND e.n_risk = sv.n_risk
              AND e.n_event = sv.d AND e.n_censored = sv.c
            WHERE abs(e.survival - sv.survival) < 1e-9"""),
    "Kaplan-Meier churn curve: exact risk sets, tolerance-checked survival [survival]")

  def all: Seq[(String, QueryDef)] = Seq(
    "q159_km_survival" -> q159)
}
