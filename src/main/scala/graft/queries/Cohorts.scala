package graft.queries

import graft.QueryDef
import graft.common.Exact._
import graft.common.Tables.load
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cohort lifetime-value curves: customers grouped by first-order
  * month, revenue accumulated by months-since-acquisition — the
  * "when does a cohort pay back" table behind every LTV model.
  */
object Cohorts {

  /** q162: cumulative LTV per acquisition cohort. Cohort = calendar
    * month of the customer's first order (as integer year·12+month so
    * month arithmetic is exact integer subtraction, no interval
    * semantics to disagree on); each (cohort, months_since) cell sums
    * that month's revenue in exact cents; the curve is the running
    * total divided by the cohort's (fixed) user count.
    *
    * Scale: one customer-keyed fold finds cohorts, one broadcast-joined
    * (cohort, month) aggregate collapses the corpus, and the cumulative
    * window runs per cohort over ≤ months-of-history rows — calendar-
    * bounded like q159's KM frame.
    *
    * Exactness: month indices, counts, and cents are integers; the
    * only double is the final single division per cell.
    */
  private val q162 = QueryDef(
    (s, d) => {
      val orders = load(s, d, "orders").select(
        col("o_custkey"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
          .cast("long").as("ym"),
        cents(col("o_totalprice")).as("rev"))
      val firstYm = orders.groupBy(col("o_custkey"))
        .agg(min(col("ym")).as("cohort"))
      val cohortSize = firstYm.groupBy(col("cohort"))
        .agg(lcountAll.as("n_users"))
      val cells = orders.join(firstYm, "o_custkey")
        .groupBy(col("cohort"), (col("ym") - col("cohort")).as("months_since"))
        .agg(sum("rev").as("rev_cents"))
      val cum = Window.partitionBy(col("cohort"))
        .orderBy(col("months_since").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      cells.join(cohortSize, "cohort")
        .withColumn("cum_cents", sum("rev_cents").over(cum))
        .select(col("cohort"), col("months_since"), col("n_users"),
          col("rev_cents"), col("cum_cents"),
          (col("cum_cents").cast("double") / col("n_users").cast("double"))
            .as("ltv_cents_per_user"))
    },
    Some(s"""WITH o AS (
              SELECT o_custkey,
                CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
                  AS ym,
                ${centsSql("o_totalprice")} AS rev
              FROM orders
            ), fy AS (
              SELECT o_custkey, MIN(ym) AS cohort FROM o GROUP BY 1
            ), cs AS (
              SELECT cohort, CAST(count(*) AS BIGINT) AS n_users
              FROM fy GROUP BY 1
            ), cells AS (
              SELECT fy.cohort, o.ym - fy.cohort AS months_since,
                CAST(SUM(o.rev) AS BIGINT) AS rev_cents
              FROM o JOIN fy ON o.o_custkey = fy.o_custkey
              GROUP BY 1, 2
            )
            SELECT cells.cohort,
              CAST(months_since AS BIGINT) AS months_since,
              cs.n_users, rev_cents,
              CAST(SUM(rev_cents) OVER (PARTITION BY cells.cohort
                ORDER BY months_since ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum_cents,
              CAST(SUM(rev_cents) OVER (PARTITION BY cells.cohort
                ORDER BY months_since ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) / CAST(cs.n_users AS DOUBLE)
                AS ltv_cents_per_user
            FROM cells JOIN cs ON cells.cohort = cs.cohort"""),
    "cohort LTV curve: exact cents, calendar-bounded cumulative window [behavior]")

  def all: Seq[(String, QueryDef)] = Seq(
    "q162_cohort_ltv" -> q162)
}
