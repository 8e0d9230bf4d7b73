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

  /** q270's group-1 market segment (vs everyone else). */
  private val LrSegment = "BUILDING"

  /** q270: the log-rank test — "do BUILDING-segment customers churn on
    * a DIFFERENT schedule than the rest?" The hypothesis-test
    * companion q159's Kaplan-Meier curves need: two curves always look
    * different somewhere, and the log-rank statistic is the standard
    * censoring-correct way to ask whether they actually are. At each
    * distinct lifetime with an event, the observed group-1 events d₁ₜ
    * compare against the hypergeometric expectation dₜ·n₁ₜ/nₜ;
    * χ² = (Σ(d₁ₜ−e₁ₜ))²/Σvₜ with the standard variance
    * vₜ = dₜ·n₁ₜ·n₂ₜ·(nₜ−dₜ)/(nₜ²·(nₜ−1)).
    *
    * Exactness: risk sets and event counts are exact integers from
    * per-group running sums over the calendar-bounded duration frame
    * (q159's bounded-window argument); n₁/n₂ and Σd₁/Σd₂ emit as
    * BIGINT evidence the oracle joins EXACTLY. The per-time e₁ₜ/vₜ
    * doubles fold in pinned duration order, but at ~10³ fold elements
    * DuckDB's windowed SUM is no longer a strict left fold (segment-
    * tree combine, measured 1e-14 relative divergence at sf0.01) — so
    * the three fold outputs take q159's derived-oracle tolerance
    * (|diff| < 1e-9) rather than pretending cross-engine bit equality
    * holds on long float reductions.
    *
    * Scale: one orders fold per customer + one keyed customer join →
    * the per-duration frame; every window after is calendar-bounded.
    */
  private val q270 = QueryDef(
    (s, d) => {
      val orders = load(s, d, "orders")
      val perCust = orders.groupBy(col("o_custkey"))
        .agg(min(col("o_orderdate")).as("first_ts"),
          max(col("o_orderdate")).as("last_ts"))
        .join(load(s, d, "customer")
          .select(col("c_custkey"), col("c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
      val mx = orders.agg(max(col("o_orderdate")).as("m"))
      val subj = perCust.crossJoin(broadcast(mx))
        .select(
          datediff(col("last_ts"), col("first_ts")).cast("long").as("t"),
          (col("last_ts").cast("date") <
            date_sub(col("m").cast("date"), HorizonDays)).as("ev"),
          (col("c_mktsegment") === LrSegment).as("g1"))
      val km = subj.groupBy(col("t")).agg(
        sum(when(col("ev") && col("g1"), 1L).otherwise(0L)).as("d1"),
        sum(when(col("ev") && !col("g1"), 1L).otherwise(0L)).as("d2"),
        sum(when(!col("ev") && col("g1"), 1L).otherwise(0L)).as("c1"),
        sum(when(!col("ev") && !col("g1"), 1L).otherwise(0L)).as("c2"))
      val w = Window.orderBy(col("t").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      val risks = km
        .withColumn("nn1", sum(col("d1") + col("c1")).over(tot))
        .withColumn("nn2", sum(col("d2") + col("c2")).over(tot))
        .withColumn("r1",
          col("nn1") - sum(col("d1") + col("c1")).over(w) +
            col("d1") + col("c1"))
        .withColumn("r2",
          col("nn2") - sum(col("d2") + col("c2")).over(w) +
            col("d2") + col("c2"))
        .withColumn("dd", col("d1") + col("d2"))
        .withColumn("rr", col("r1") + col("r2"))
      val contrib = risks
        .withColumn("e1",
          when(col("dd") > 0L,
            col("dd").cast("double") * col("r1").cast("double") /
              col("rr").cast("double")).otherwise(lit(0.0)))
        .withColumn("v",
          when(col("dd") > 0L && col("rr") > 1L,
            col("dd").cast("double") * col("r1").cast("double") *
              col("r2").cast("double") *
              (col("rr") - col("dd")).cast("double") /
              (col("rr").cast("double") * col("rr").cast("double") *
                (col("rr") - 1L).cast("double"))).otherwise(lit(0.0)))
      contrib
        .withColumn("ome_run",
          sum(col("d1").cast("double") - col("e1")).over(w))
        .withColumn("var_run", sum(col("v")).over(w))
        .withColumn("sd1", sum(col("d1")).over(tot))
        .withColumn("sd2", sum(col("d2")).over(tot))
        .withColumn("last", row_number().over(
          Window.orderBy(col("t").desc)))
        .filter(col("last") === 1)
        .select(col("nn1").as("n1"), col("nn2").as("n2"),
          col("sd1").as("events1"), col("sd2").as("events2"),
          col("ome_run").as("o_minus_e"), col("var_run").as("var_lr"),
          when(col("var_run") > 0.0,
            col("ome_run") * col("ome_run") / col("var_run"))
            .as("chi2_logrank"))
    },
    Some(s"""WITH pc AS (
              SELECT o.o_custkey, MIN(o.o_orderdate) AS f,
                MAX(o.o_orderdate) AS l, c.c_mktsegment
              FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
              GROUP BY 1, 4
            ), m AS (SELECT MAX(o_orderdate) AS m FROM orders),
            subj AS (
              SELECT CAST(date_diff('day', CAST(f AS DATE), CAST(l AS DATE))
                  AS BIGINT) AS t,
                CAST(l AS DATE) < CAST(m AS DATE) - $HorizonDays AS ev,
                c_mktsegment = '$LrSegment' AS g1
              FROM pc, m
            ), km AS (
              SELECT t,
                CAST(SUM(CASE WHEN ev AND g1 THEN 1 ELSE 0 END) AS BIGINT)
                  AS d1,
                CAST(SUM(CASE WHEN ev AND NOT g1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS d2,
                CAST(SUM(CASE WHEN NOT ev AND g1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS c1,
                CAST(SUM(CASE WHEN NOT ev AND NOT g1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS c2
              FROM subj GROUP BY 1
            ), risks AS (
              SELECT t, d1, d2,
                SUM(d1 + c1) OVER () AS nn1,
                SUM(d2 + c2) OVER () AS nn2,
                SUM(d1 + c1) OVER () - SUM(d1 + c1) OVER wr + d1 + c1
                  AS r1,
                SUM(d2 + c2) OVER () - SUM(d2 + c2) OVER wr + d2 + c2
                  AS r2,
                d1 + d2 AS dd
              FROM km
              WINDOW wr AS (ORDER BY t ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            ), contrib AS (
              SELECT t, d1, d2, nn1, nn2, r1, r2, dd, r1 + r2 AS rr,
                CASE WHEN dd > 0 THEN CAST(dd AS DOUBLE)
                  * CAST(r1 AS DOUBLE) / CAST(r1 + r2 AS DOUBLE)
                  ELSE 0.0 END AS e1,
                CASE WHEN dd > 0 AND r1 + r2 > 1 THEN
                  CAST(dd AS DOUBLE) * CAST(r1 AS DOUBLE)
                    * CAST(r2 AS DOUBLE)
                    * CAST(r1 + r2 - dd AS DOUBLE)
                    / (CAST(r1 + r2 AS DOUBLE) * CAST(r1 + r2 AS DOUBLE)
                      * CAST(r1 + r2 - 1 AS DOUBLE))
                  ELSE 0.0 END AS v
              FROM risks
            ), folded AS (
              SELECT nn1, nn2,
                SUM(CAST(d1 AS DOUBLE) - e1) OVER wr AS ome_run,
                SUM(v) OVER wr AS var_run,
                SUM(d1) OVER () AS sd1,
                SUM(d2) OVER () AS sd2,
                ROW_NUMBER() OVER (ORDER BY t DESC) AS last
              FROM contrib
              WINDOW wr AS (ORDER BY t ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            ), ref AS (
              SELECT CAST(nn1 AS BIGINT) AS n1, CAST(nn2 AS BIGINT) AS n2,
                CAST(sd1 AS BIGINT) AS events1,
                CAST(sd2 AS BIGINT) AS events2,
                ome_run AS o_minus_e, var_run AS var_lr,
                CASE WHEN var_run > 0 THEN ome_run * ome_run / var_run
                  END AS chi2_logrank
              FROM folded WHERE last = 1
            ), emitted AS (
              SELECT * FROM read_parquet(
                '${graft.QueryDef.OutDirToken}/q270_logrank/*.parquet')
            )
            SELECT e.n1, e.n2, e.events1, e.events2,
              e.o_minus_e, e.var_lr, e.chi2_logrank
            FROM emitted e JOIN ref r
              ON e.n1 = r.n1 AND e.n2 = r.n2
              AND e.events1 = r.events1 AND e.events2 = r.events2
            WHERE abs(e.o_minus_e - r.o_minus_e) < 1e-9
              AND abs(e.var_lr - r.var_lr) < 1e-9
              AND abs(COALESCE(e.chi2_logrank, 0)
                - COALESCE(r.chi2_logrank, 0)) < 1e-9"""),
    "log-rank test: BUILDING vs rest churn schedules, exact integer " +
      "evidence, 1e-9 derived-oracle bands on the long float folds [stats]")

  def all: Seq[(String, QueryDef)] = Seq(
    "q159_km_survival" -> q159,
    "q270_logrank" -> q270)
}
