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
    // Derived oracle for the one wide float: rank_dot and n·total both
    // exceed 2^53 even at sf0.1, and DuckDB's HUGEINT→DOUBLE cast is
    // not correctly rounded up there (the q176 finding) — so the exact
    // integer evidence (decile, counts, cents, and the cumulative
    // share whose operands DO fit 2^53) joins bit-exactly and only the
    // gini division is admitted within 1e-12.
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
            ), ref AS (
              SELECT d.decile, d.n_customers, d.rev_cents,
                CAST(SUM(d.rev_cents) OVER (ORDER BY d.decile) AS DOUBLE)
                  / CAST(g.total AS DOUBLE) AS cum_rev_share,
                g.rank_dot, g.total, g.n
              FROM dec d CROSS JOIN g
            ), emitted AS (
              SELECT * FROM read_parquet(
                '${QueryDef.OutDirToken}/q167_revenue_gini/*.parquet')
            )
            SELECT e.decile, e.n_customers, e.rev_cents,
              e.cum_rev_share, e.gini
            FROM emitted e JOIN ref r ON e.decile = r.decile
              AND e.n_customers = r.n_customers
              AND e.rev_cents = r.rev_cents
              AND e.cum_rev_share = r.cum_rev_share
            WHERE abs(e.gini -
                CAST(2 * r.rank_dot - (r.n + 1) * r.total AS DOUBLE)
                  / CAST(r.n * r.total AS DOUBLE)) < 1e-12"""),
    "Lorenz deciles + exact integer Gini of customer revenue [concentration]")

  /** q176: Herfindahl–Hirschman index of customer-revenue concentration
    * within each nation — the market-concentration number a pricing /
    * antitrust review reads (1/n = perfectly even, 1 = one customer is
    * the market). HHI_g = Σᵢ(rᵢ/R_g)² = (Σrᵢ²)/R_g², so both the
    * numerator (sum of squared cents) and denominator (squared total)
    * are exact DECIMAL(38,0) integers folded distributively — the
    * final single division is the only float op.
    *
    * Scale: the fact join picks up the nation key (dim side broadcasts
    * at any realistic nation/customer table), then ONE (nation,
    * customer) fold and one |nations|-row fold. Nothing after the
    * per-customer exchange is corpus-sized.
    */
  private val q176 = QueryDef(
    (s, d) => {
      val dec38 = DecimalType(38, 0)
      val perCust = load(s, d, "orders")
        .join(load(s, d, "customer")
          .select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey"), col("o_custkey"))
        .agg(sum(Exact.cents(col("o_totalprice"))).as("r"))
      perCust.groupBy(col("c_nationkey"))
        .agg(Exact.lcountAll.as("n_customers"),
          sum("r").as("rev_cents"),
          sum(col("r").cast(dec38) * col("r").cast(dec38)).as("sq"))
        .select(col("c_nationkey"), col("n_customers"), col("rev_cents"),
          (col("sq").cast("double") /
            (col("rev_cents").cast(dec38) * col("rev_cents").cast(dec38))
              .cast("double")).as("hhi"))
    },
    // Derived oracle for the one float: DuckDB's HUGEINT→DOUBLE cast is
    // not correctly rounded above 2^53 (observed 1-ulp error on the
    // squared total at sf0.01), so the exact-integer evidence is joined
    // bit-exactly and the division is admitted within 1e-12.
    Some(s"""WITH pc AS (
              SELECT c.c_nationkey, o.o_custkey,
                CAST(SUM(${Exact.centsSql("o_totalprice")}) AS BIGINT) AS r
              FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
              GROUP BY 1, 2
            ), ref AS (
              SELECT c_nationkey,
                CAST(COUNT(*) AS BIGINT) AS n_customers,
                CAST(SUM(r) AS BIGINT) AS rev_cents,
                SUM(CAST(r AS HUGEINT) * r) AS sq,
                SUM(CAST(r AS HUGEINT)) AS tot
              FROM pc GROUP BY 1
            ), emitted AS (
              SELECT * FROM read_parquet(
                '${QueryDef.OutDirToken}/q176_nation_hhi/*.parquet')
            )
            SELECT e.c_nationkey, e.n_customers, e.rev_cents, e.hhi
            FROM emitted e JOIN ref r ON e.c_nationkey = r.c_nationkey
              AND e.n_customers = r.n_customers
              AND e.rev_cents = r.rev_cents
            WHERE abs(e.hhi - CAST(r.sq AS DOUBLE) /
                (CAST(r.tot AS DOUBLE) * CAST(r.tot AS DOUBLE))) < 1e-12"""),
    "per-nation HHI: exact sum-of-squares concentration, one division [concentration]")

  /** q177: ABC (Pareto) classification of parts by revenue — A carries
    * the first ≤80% of cumulative revenue, B to 95%, C the tail; the
    * inventory-policy table behind "20% of SKUs are 80% of revenue".
    *
    * Scale: the cumulative revenue share over the best-first part
    * order uses operators.PrefixSum's two-phase distributed scan —
    * |parts| is corpus-dimensioned, so a bare `Window.orderBy` (one
    * task owns every part at 100 TB) is exactly the trap this operator
    * family exists to avoid. Integer cents make the scan's two-phase
    * association bit-equal to the sequential fold, so the class
    * boundary every engine computes is the same row.
    */
  private val q177 = QueryDef(
    (s, d) => {
      val rev = load(s, d, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(sum(Exact.cents(col("l_extendedprice"))).as("r"))
      val cum = graft.operators.PrefixSum.runningSums(
        rev, Seq(col("r").desc, col("l_partkey").asc), Seq("r"))
      val total = rev.agg(sum("r").as("total"))
      cum.crossJoin(broadcast(total))
        .withColumn("cum_share",
          col("r_cum").cast("double") / col("total").cast("double"))
        .withColumn("abc_class",
          when(col("cum_share") <= 0.80, "A")
            .when(col("cum_share") <= 0.95, "B")
            .otherwise("C"))
        .groupBy(col("abc_class"))
        .agg(Exact.lcountAll.as("n_parts"),
          sum("r").as("rev_cents"),
          max("total").as("total"))
        .select(col("abc_class"), col("n_parts"), col("rev_cents"),
          (col("rev_cents").cast("double") / col("total").cast("double"))
            .as("rev_share"))
    },
    Some(s"""WITH rev AS (
              SELECT l_partkey,
                CAST(SUM(${Exact.centsSql("l_extendedprice")}) AS BIGINT)
                  AS r
              FROM lineitem GROUP BY 1
            ), c AS (
              SELECT l_partkey, r,
                CAST(SUM(r) OVER (ORDER BY r DESC, l_partkey) AS BIGINT)
                  AS r_cum,
                CAST(SUM(r) OVER () AS BIGINT) AS total
              FROM rev
            ), cls AS (
              SELECT *,
                CASE
                  WHEN CAST(r_cum AS DOUBLE) / CAST(total AS DOUBLE)
                    <= 0.80 THEN 'A'
                  WHEN CAST(r_cum AS DOUBLE) / CAST(total AS DOUBLE)
                    <= 0.95 THEN 'B'
                  ELSE 'C'
                END AS abc_class
              FROM c
            )
            SELECT abc_class,
              CAST(COUNT(*) AS BIGINT) AS n_parts,
              CAST(SUM(r) AS BIGINT) AS rev_cents,
              CAST(SUM(r) AS DOUBLE) / CAST(MAX(total) AS DOUBLE)
                AS rev_share
            FROM cls GROUP BY 1"""),
    "ABC Pareto classification: distributed prefix-sum cumulative shares [concentration]")

  def all: Seq[(String, QueryDef)] = Seq(
    "q167_revenue_gini" -> q167,
    "q176_nation_hhi" -> q176,
    "q177_abc_classes" -> q177)
}
