package graft.queries

import graft.QueryDef
import graft.common.Exact
import graft.common.Tables.load
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Revenue-concentration analytics: the Lorenz decile table and an
  * EXACT integer Gini coefficient. The one-number answer to "how
  * concentrated is our revenue across customers" — and because every
  * cross-row sum here is an integer (cents, ranks), the coefficient is
  * bitwise-reproducible on any cluster topology and hash-comparable
  * against the DuckDB oracle, unlike the usual float-prefix-sum Gini.
  */
object Concentration {

  /** q167: Lorenz deciles + exact Gini of per-customer revenue.
    * Customers rank ascending by lifetime revenue (cents); each decile
    * row carries its customer count, revenue, and the cumulative
    * revenue share at that depth (the Lorenz curve the "top 10% of
    * customers drive 40% of revenue" sentence reads off); every row
    * also carries the corpus Gini.
    *
    * Exactness: Gini uses the rank identity G = (2·Σi·xᵢ − (n+1)·Σx) /
    * (n·Σx) over ascending-sorted x with 1-based rank i — numerator and
    * denominator are DECIMAL(38,0) integer sums (rank·cents products
    * exceed i64 at data-center scale, so the fold is decimal from the
    * start), and the only float op is the final single division, which
    * is the same correctly-rounded IEEE op in both engines.
    *
    * Scale: one custkey-keyed aggregate (map-side combined) builds the
    * revenue frame; the global rank is Curation.globalOrder's range
    * partition + per-partition offsets (no one-partition ROW_NUMBER);
    * the Gini fold is a 1-row aggregate broadcast back onto the 10-row
    * decile frame, and the cumulative window orders 10 rows.
    */
  private val q167 = QueryDef(
    (s, d) => {
      val rev = load(s, d, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum(Exact.cents(col("o_totalprice"))).as("rev_cents"))
      val n = rev.count()
      val ordered = Curation.globalOrder(
        rev, Seq(col("rev_cents").asc, col("o_custkey").asc))
      val dec38 = DecimalType(38, 0)
      val gini = ordered.agg(
        sum((col("position") + 1L).cast(dec38) *
          col("rev_cents").cast(dec38)).as("rank_dot"),
        sum(col("rev_cents").cast(dec38)).as("total"))
        .select(
          ((lit(2L).cast(dec38) * col("rank_dot") -
            lit(n + 1L).cast(dec38) * col("total")).cast("double") /
            (lit(n).cast(dec38) * col("total")).cast("double"))
            .as("gini"),
          col("total").cast("double").as("total_rev"))
      val byDecile = ordered
        .groupBy(expr(s"(position * 10) div ${n}L").cast("long")
          .as("decile"))
        .agg(Exact.lcountAll.as("n_customers"),
          sum("rev_cents").as("rev_cents"))
      val cum = Window.orderBy(col("decile").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      byDecile
        .crossJoin(broadcast(gini))
        .select(col("decile"), col("n_customers"), col("rev_cents"),
          (sum("rev_cents").over(cum).cast("double") / col("total_rev"))
            .as("cum_rev_share"),
          col("gini"))
    },
    Some(s"""WITH rev AS (
              SELECT o_custkey,
                CAST(SUM(${Exact.centsSql("o_totalprice")}) AS BIGINT)
                  AS rev_cents
              FROM orders GROUP BY 1
            ), o AS (
              SELECT o_custkey, rev_cents,
                CAST(ROW_NUMBER() OVER (ORDER BY rev_cents, o_custkey) - 1
                  AS BIGINT) AS position
              FROM rev
            ), g AS (
              SELECT
                SUM(CAST(position + 1 AS HUGEINT) * rev_cents) AS rank_dot,
                SUM(CAST(rev_cents AS HUGEINT)) AS total,
                COUNT(*) AS n
              FROM o
            ), dec AS (
              SELECT CAST((position * 10) // (SELECT n FROM g) AS BIGINT)
                  AS decile,
                CAST(COUNT(*) AS BIGINT) AS n_customers,
                CAST(SUM(rev_cents) AS BIGINT) AS rev_cents
              FROM o GROUP BY 1
            )
            SELECT d.decile, d.n_customers, d.rev_cents,
              CAST(SUM(d.rev_cents) OVER (ORDER BY d.decile) AS DOUBLE)
                / CAST(g.total AS DOUBLE) AS cum_rev_share,
              CAST(2 * g.rank_dot - (g.n + 1) * g.total AS DOUBLE)
                / CAST(g.n * g.total AS DOUBLE) AS gini
            FROM dec d CROSS JOIN g"""),
    "Lorenz deciles + exact integer Gini of customer revenue [concentration]")

  def all: Seq[(String, QueryDef)] = Seq(
    "q167_revenue_gini" -> q167)
}
