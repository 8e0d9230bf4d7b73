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

  /** q172: daily active users decomposed into new vs returning, plus
    * the running registered-user base — the growth-accounting table
    * (every DAU chart with a "new/returning" split). A user is new on
    * the day of their FIRST event; `cum_users` is the running sum of
    * daily new users, which equals the distinct user base through that
    * day because each user is new exactly once.
    *
    * Scale: the corpus collapses to distinct (day, user) pairs in one
    * exchange; the first-day fold and the join both ride the user key;
    * the daily fold and its cumulative window run on the calendar-
    * bounded day frame. All integers — exact.
    */
  private val q172 = QueryDef(
    (s, d) => {
      val pairs = load(s, d, "events")
        .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
      val first = pairs.groupBy(col("user_id"))
        .agg(min(col("day")).as("first_day"))
      val daily = pairs.join(first, "user_id")
        .groupBy(col("day"))
        .agg(lcountAll.as("n_active"),
          sum(when(col("day") === col("first_day"), 1L).otherwise(0L))
            .as("n_new"))
        .withColumn("n_returning", col("n_active") - col("n_new"))
      val w = Window.orderBy(col("day").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      daily.withColumn("cum_users", sum("n_new").over(w))
    },
    Some("""WITH pairs AS (
              SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
            ), fst AS (
              SELECT user_id, MIN(day) AS first_day FROM pairs GROUP BY 1
            ), daily AS (
              SELECT p.day,
                CAST(COUNT(*) AS BIGINT) AS n_active,
                CAST(SUM(CASE WHEN p.day = f.first_day THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_new
              FROM pairs p JOIN fst f ON p.user_id = f.user_id
              GROUP BY 1
            )
            SELECT day, n_active, n_new,
              n_active - n_new AS n_returning,
              CAST(SUM(n_new) OVER (ORDER BY day) AS BIGINT) AS cum_users
            FROM daily"""),
    "growth accounting: new vs returning DAU + running user base [behavior]")

  /** q174: the engagement power curve — how many users were active on
    * exactly k distinct days, with each tier's share and the "at least
    * k days" cumulative (the retention-quality curve consumer apps
    * read L5+/L28 numbers off). Corpus → distinct pairs → per-user day
    * counts → a ≤|days|-row histogram; the two divisions are the only
    * doubles and both are single exact-integer divisions.
    */
  private val q174 = QueryDef(
    (s, d) => {
      val perUser = load(s, d, "events")
        .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
        .groupBy(col("user_id"))
        .agg(lcountAll.as("n_active_days"))
      val hist = perUser.groupBy(col("n_active_days"))
        .agg(lcountAll.as("n_users"))
      val tot = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      val ge = Window.orderBy(col("n_active_days").asc)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      hist.select(col("n_active_days"), col("n_users"),
        (col("n_users").cast("double") /
          sum("n_users").over(tot).cast("double")).as("user_share"),
        sum("n_users").over(ge).as("cum_users_ge"))
    },
    Some("""WITH pu AS (
              SELECT user_id,
                CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT)
                  AS n_active_days
              FROM events GROUP BY 1
            ), hist AS (
              SELECT n_active_days, CAST(COUNT(*) AS BIGINT) AS n_users
              FROM pu GROUP BY 1
            )
            SELECT n_active_days, n_users,
              CAST(n_users AS DOUBLE) /
                CAST(SUM(n_users) OVER () AS DOUBLE) AS user_share,
              CAST(SUM(n_users) OVER (ORDER BY n_active_days
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                AS BIGINT) AS cum_users_ge
            FROM hist"""),
    "engagement power curve: active-day histogram with L-ness cumulative [behavior]")

  /** q175: purchase-cadence histogram — days between each customer's
    * consecutive orders, folded to a gap-day frequency table with
    * share and cumulative share. The replenishment-cycle distribution
    * a retention model and an inventory forecast both start from
    * ("most repeat purchases arrive within N days").
    *
    * Scale: one customer-keyed exchange feeds the lag window (frames
    * are per-customer order counts); the histogram fold collapses to
    * ≤ calendar-span rows, where the two windows run. All integers +
    * single divisions.
    */
  private val q175 = QueryDef(
    (s, d) => {
      val byCust = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      val gaps = load(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
        .withColumn("prev_date", lag(col("o_orderdate"), 1).over(byCust))
        .filter(col("prev_date").isNotNull)
        .select(datediff(to_date(col("o_orderdate")),
          to_date(col("prev_date"))).cast("long").as("gap_days"))
      val hist = gaps.groupBy(col("gap_days"))
        .agg(lcountAll.as("n_gaps"))
      val tot = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      val cum = Window.orderBy(col("gap_days").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      hist.select(col("gap_days"), col("n_gaps"),
        (col("n_gaps").cast("double") /
          sum("n_gaps").over(tot).cast("double")).as("gap_share"),
        (sum("n_gaps").over(cum).cast("double") /
          sum("n_gaps").over(tot).cast("double")).as("cum_share"))
    },
    Some("""WITH g AS (
              SELECT CAST(date_diff('day',
                  CAST(LAG(o_orderdate) OVER w AS DATE),
                  CAST(o_orderdate AS DATE)) AS BIGINT) AS gap_days
              FROM orders
              WINDOW w AS (PARTITION BY o_custkey
                ORDER BY o_orderdate ASC, o_orderkey ASC)
            ), hist AS (
              SELECT gap_days, CAST(COUNT(*) AS BIGINT) AS n_gaps
              FROM g WHERE gap_days IS NOT NULL GROUP BY 1
            )
            SELECT gap_days, n_gaps,
              CAST(n_gaps AS DOUBLE) /
                CAST(SUM(n_gaps) OVER () AS DOUBLE) AS gap_share,
              CAST(SUM(n_gaps) OVER (ORDER BY gap_days) AS DOUBLE) /
                CAST(SUM(n_gaps) OVER () AS DOUBLE) AS cum_share
            FROM hist"""),
    "purchase cadence: inter-order gap histogram with cumulative share [behavior]")

  /** q181: behavioral-diversity score — Shannon entropy of each user's
    * event-type mix (0 = does one thing, ln(T) = uniform across all T
    * types), with the type and event counts alongside. The engagement-
    * quality feature that separates "500 clicks" from "500 clicks,
    * carts, and purchases" in a churn model.
    *
    * Scale: one (user, type)-keyed count fold (map-side combined), then
    * user-keyed windows over ≤|event types| rows per user. The entropy
    * fold is a WINDOWED running sum ordered by type — a sequential
    * left fold, so the float accumulation order is pinned and the
    * Spark-side result is partition-invariant (a plain SUM of float
    * terms would drift with partial-aggregation order). The ln itself
    * is tolerance-checked by the derived oracle (the repo-wide ln
    * contract); counts join bit-exactly.
    */
  private val q181 = QueryDef(
    (s, d) => {
      val byType = load(s, d, "events")
        .groupBy(col("user_id"), col("event_type"))
        .agg(lcountAll.as("c"))
      val perUser = Window.partitionBy(col("user_id"))
      val ordered = Window.partitionBy(col("user_id"))
        .orderBy(col("event_type").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      byType
        .withColumn("n_events", sum("c").over(perUser))
        .withColumn("n_types", count(lit(1)).over(perUser))
        .withColumn("share",
          col("c").cast("double") / col("n_events").cast("double"))
        .withColumn("ent_run",
          sum(-col("share") * log(col("share"))).over(ordered))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("user_id"))
            .orderBy(col("event_type").desc)))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("n_events"), col("n_types"),
          col("ent_run").as("entropy"))
    },
    Some(s"""WITH bt AS (
              SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS c
              FROM events GROUP BY 1, 2
            ), w AS (
              SELECT user_id, c,
                SUM(c) OVER (PARTITION BY user_id) AS n
              FROM bt
            ), ref AS (
              SELECT user_id,
                CAST(MAX(n) AS BIGINT) AS n_events,
                CAST(COUNT(*) AS BIGINT) AS n_types,
                SUM(-(CAST(c AS DOUBLE) / n)
                  * ln(CAST(c AS DOUBLE) / n)) AS entropy
              FROM w GROUP BY user_id
            ), emitted AS (
              SELECT * FROM read_parquet(
                '${QueryDef.OutDirToken}/q181_behavior_entropy/*.parquet')
            )
            SELECT e.user_id, e.n_events, e.n_types, e.entropy
            FROM emitted e JOIN ref r ON e.user_id = r.user_id
              AND e.n_events = r.n_events AND e.n_types = r.n_types
            WHERE abs(e.entropy - r.entropy) < 1e-9"""),
    "behavioral diversity: event-mix entropy per user, ordered-fold exact [behavior]")

  def all: Seq[(String, QueryDef)] = Seq(
    "q162_cohort_ltv" -> q162,
    "q172_new_vs_returning" -> q172,
    "q174_power_curve" -> q174,
    "q175_purchase_cadence" -> q175,
    "q181_behavior_entropy" -> q181)
}
