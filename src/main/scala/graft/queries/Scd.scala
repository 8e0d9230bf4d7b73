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
  private val q139 = QueryDef(
    (s, d) => {
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

  def all: Seq[(String, QueryDef)] = Seq(
    "q139_scd2_history" -> q139)
}
