package graft.queries

import graft.QueryDef
import graft.common.Tables.load
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension operators: rebuild the effective-dated
  * (SCD Type-2) history of an attribute from an event-grain fact table
  * — the warehouse pattern for "what was this customer's tier ON that
  * date", and the temporal twin of the lakehouse MERGE family.
  */
object Scd {

  /** q139: SCD2 history of each customer's order priority. Consecutive
    * orders with the same priority collapse into one validity interval
    * (gaps-and-islands); each change opens a new version whose
    * `valid_to` is the next version's `valid_from` (half-open, NULL for
    * the current one).
    *
    * Scale: ONE hash exchange on the dimension key feeds all three
    * windows (lag to find change points, lead + last-row flag over the
    * collapsed change rows) — the change-row frame the second pass
    * sorts is |versions| per customer, already tiny. No self-join: the
    * naive interval build joins the fact table to itself per version.
    *
    * Exactness: keys, timestamps, strings, and a row_number — nothing
    * floating.
    */
  /** The SCD2 interval frame q139 emits, shared with the q171 lookup. */
  private[graft] def history(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val byCust = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    val changes = load(s, d, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("o_orderpriority"))
      .withColumn("prev_priority", lag(col("o_orderpriority"), 1).over(byCust))
      .filter(col("prev_priority").isNull ||
        col("prev_priority") =!= col("o_orderpriority"))
    val byVersion = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    changes
      .withColumn("version", row_number().over(byVersion))
      .withColumn("valid_to", lead(col("o_orderdate"), 1).over(byVersion))
      .select(col("o_custkey"), col("version").cast("long").as("version"),
        col("o_orderpriority"), col("o_orderdate").as("valid_from"),
        col("valid_to"), col("valid_to").isNull.as("is_current"))
  }

  private val q139 = QueryDef(
    (s, d) => history(s, d),
    Some("""WITH seq AS (
              SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority,
                LAG(o_orderpriority) OVER (PARTITION BY o_custkey
                  ORDER BY o_orderdate ASC, o_orderkey ASC) AS prev_priority
              FROM orders
            ), changes AS (
              SELECT * FROM seq
              WHERE prev_priority IS NULL
                 OR prev_priority <> o_orderpriority
            )
            SELECT o_custkey,
              CAST(ROW_NUMBER() OVER w AS BIGINT) AS version,
              o_orderpriority,
              o_orderdate AS valid_from,
              LEAD(o_orderdate) OVER w AS valid_to,
              LEAD(o_orderdate) OVER w IS NULL AS is_current
            FROM changes
            WINDOW w AS (PARTITION BY o_custkey
              ORDER BY o_orderdate ASC, o_orderkey ASC)"""),
    "SCD2 interval build: gaps-and-islands, one dimension-key exchange [scd]")

  /** q171: point-in-time (effective-dated) dimension lookup — every
    * order joined to the SCD2 priority version in force on its order
    * date, aggregated to per-version service stats. The warehouse
    * question "which dimension version served this fact" — and the PIT
    * join every leakage-free feature store needs.
    *
    * Semantics: versions tile [first_order_date, ∞) per customer with
    * half-open [valid_from, valid_to) intervals, so every order of a
    * known customer matches EXACTLY one version (same-date priority
    * flips produce empty intervals that match nothing — the later
    * version wins the day, the standard SCD2 day-grain convention).
    * `n_matching` counts facts whose own priority equals the version's
    * — the PIT self-consistency audit (mid-interval orders inherit the
    * version some EARLIER order opened, so this genuinely exercises
    * interval reconstruction, and same-day flips make it < n_orders).
    *
    * Scale: the interval build is q139's one dimension-key exchange;
    * the lookup is an equi-join ON THE SAME KEY (the interval predicate
    * rides along as a join filter, never a cross/inequality join), and
    * the per-version aggregate reuses that partitioning. Versions per
    * customer are bounded by priority changes, so no key explodes.
    */
  private val q171 = QueryDef(
    (s, d) => {
      val hist = history(s, d)
      val facts = load(s, d, "orders")
        .select(col("o_custkey").as("f_custkey"), col("o_orderdate"),
          col("o_orderpriority").as("fact_priority"))
      facts.join(hist,
        col("f_custkey") === col("o_custkey") &&
          col("valid_from") <= col("o_orderdate") &&
          (col("valid_to").isNull || col("o_orderdate") < col("valid_to")))
        .groupBy(col("o_custkey"), col("version"),
          col("o_orderpriority").as("active_priority"))
        .agg(count(lit(1)).cast("long").as("n_orders"),
          sum(when(col("fact_priority") === col("o_orderpriority"), 1L)
            .otherwise(0L)).as("n_matching"))
    },
    Some("""WITH seq AS (
              SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority,
                LAG(o_orderpriority) OVER (PARTITION BY o_custkey
                  ORDER BY o_orderdate ASC, o_orderkey ASC) AS prev_priority
              FROM orders
            ), changes AS (
              SELECT * FROM seq
              WHERE prev_priority IS NULL
                 OR prev_priority <> o_orderpriority
            ), hist AS (
              SELECT o_custkey,
                CAST(ROW_NUMBER() OVER w AS BIGINT) AS version,
                o_orderpriority,
                o_orderdate AS valid_from,
                LEAD(o_orderdate) OVER w AS valid_to
              FROM changes
              WINDOW w AS (PARTITION BY o_custkey
                ORDER BY o_orderdate ASC, o_orderkey ASC)
            )
            SELECT h.o_custkey, h.version,
              h.o_orderpriority AS active_priority,
              CAST(COUNT(*) AS BIGINT) AS n_orders,
              CAST(SUM(CASE WHEN f.o_orderpriority = h.o_orderpriority
                THEN 1 ELSE 0 END) AS BIGINT) AS n_matching
            FROM orders f JOIN hist h
              ON f.o_custkey = h.o_custkey
             AND h.valid_from <= f.o_orderdate
             AND (h.valid_to IS NULL OR f.o_orderdate < h.valid_to)
            GROUP BY 1, 2, 3"""),
    "point-in-time SCD2 lookup: same-key join with interval filter, per-version audit [scd]")

  /** q182: dimension-change transition matrix — which priority follows
    * which across q139's SCD2 versions, with row-normalized
    * probabilities: the "where do URGENT customers drift" Markov view
    * of the dimension's churn. Counts are exact longs off the version
    * frame (already |versions|-sized); p is the one single division,
    * row-normalized over a ≤|priorities|² cell frame.
    *
    * Scale: rides q139's one dimension-key exchange; the lead window
    * runs over ≤|versions| rows per customer and the matrix fold + its
    * row-total window touch only the 25-cell frame.
    */
  private val q182 = QueryDef(
    (s, d) => {
      val byVer = Window.partitionBy(col("o_custkey"))
        .orderBy(col("version").asc)
      val cells = history(s, d)
        .withColumn("to_priority",
          lead(col("o_orderpriority"), 1).over(byVer))
        .filter(col("to_priority").isNotNull)
        .groupBy(col("o_orderpriority").as("from_priority"),
          col("to_priority"))
        .agg(count(lit(1)).cast("long").as("n_transitions"))
      val byFrom = Window.partitionBy(col("from_priority"))
      cells.withColumn("p_transition",
        col("n_transitions").cast("double") /
          sum("n_transitions").over(byFrom).cast("double"))
    },
    Some("""WITH seq AS (
              SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority,
                LAG(o_orderpriority) OVER (PARTITION BY o_custkey
                  ORDER BY o_orderdate ASC, o_orderkey ASC) AS prev_priority
              FROM orders
            ), changes AS (
              SELECT * FROM seq
              WHERE prev_priority IS NULL
                 OR prev_priority <> o_orderpriority
            ), hist AS (
              SELECT o_custkey, o_orderpriority,
                CAST(ROW_NUMBER() OVER w AS BIGINT) AS version,
                LEAD(o_orderpriority) OVER w AS to_priority
              FROM changes
              WINDOW w AS (PARTITION BY o_custkey
                ORDER BY o_orderdate ASC, o_orderkey ASC)
            ), cells AS (
              SELECT o_orderpriority AS from_priority, to_priority,
                CAST(COUNT(*) AS BIGINT) AS n_transitions
              FROM hist WHERE to_priority IS NOT NULL
              GROUP BY 1, 2
            )
            SELECT from_priority, to_priority, n_transitions,
              CAST(n_transitions AS DOUBLE) /
                CAST(SUM(n_transitions) OVER (PARTITION BY from_priority)
                  AS DOUBLE) AS p_transition
            FROM cells"""),
    "SCD2 transition matrix: version-change Markov cells, row-normalized [scd]")

  def all: Seq[(String, QueryDef)] = Seq(
    "q139_scd2_history" -> q139,
    "q171_scd2_pit" -> q171,
    "q182_priority_transitions" -> q182)
}
