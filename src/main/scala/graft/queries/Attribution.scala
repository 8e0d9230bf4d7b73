package graft.queries

import graft.QueryDef
import graft.common.Tables.load
import graft.operators.TemporalJoins
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Conversion attribution over the events table — the batch twin of
  * `streaming.EventStream.attributeConversions`: every purchase is
  * attributed to the LAST same-user view in the preceding hour
  * (last-touch), purchases with no view in window surface with null
  * view columns rather than disappearing (q89's convention — the
  * unattributed revenue is the interesting row).
  *
  * Scale: the candidate pairs come from
  * [[TemporalJoins.directedWindowJoin]] — (user, hour-bucket) keyed,
  * |V| + 2|P| shuffle rows, never an inequality join — and last-touch
  * is one purchase-keyed window over the bounded candidate set.
  * StreamJoinSpec pins pair-level parity with the streaming join on
  * the same staged data.
  */
object Attribution {

  private[graft] val WindowSeconds = 3600L

  private[graft] def lastTouch(s: SparkSession, d: String): DataFrame = {
    val e = load(s, d, "events")
    val views = e.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"),
        col("ts").as("view_ts"))
    val buys = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"), col("value"))
    val pairs = TemporalJoins.directedWindowJoin(
      views, buys, "user_id", "view_ts", "purchase_ts", WindowSeconds)
    val w = Window.partitionBy(col("purchase_id"))
      .orderBy(col("view_ts").desc, col("view_id").desc)
    val last = pairs.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("purchase_id"), col("view_id"), col("view_ts"))
    buys.join(last, Seq("purchase_id"), "left")
      .select(col("purchase_id"), col("user_id"), col("purchase_ts"),
        col("value"), col("view_id"), col("view_ts"))
  }

  private val q97 = QueryDef(
    (s, d) => lastTouch(s, d),
    Some(s"""WITH v AS (
              SELECT event_id AS view_id, user_id, ts AS view_ts
              FROM events WHERE event_type = 'view'
            ), p AS (
              SELECT event_id AS purchase_id, user_id,
                ts AS purchase_ts, value
              FROM events WHERE event_type = 'purchase'
            ), pairs AS (
              SELECT p.purchase_id, v.view_id, v.view_ts
              FROM p JOIN v ON v.user_id = p.user_id
                AND epoch_us(p.purchase_ts) - epoch_us(v.view_ts)
                    BETWEEN 0 AND ${WindowSeconds * 1000000L}
            ), last AS (
              SELECT purchase_id, view_id, view_ts
              FROM (SELECT *, ROW_NUMBER() OVER (
                      PARTITION BY purchase_id
                      ORDER BY view_ts DESC, view_id DESC) AS rn
                    FROM pairs)
              WHERE rn = 1
            )
            SELECT p.purchase_id, p.user_id, p.purchase_ts, p.value,
              l.view_id, l.view_ts
            FROM p LEFT JOIN last l USING (purchase_id)"""),
    "last-touch conversion attribution (1h window) [events,temporal-join]")

  /** q215: position-based (U-shaped) multi-touch attribution — the
    * fractional-credit generalization of q97's winner-takes-all: every
    * same-user view in the hour before a purchase gets a share of the
    * purchase value. Standard U-shape weights: a single touch takes
    * 100%, two touches split 50/50, three-plus give first and last
    * 40% each and divide the remaining 20% over the middles.
    *
    * Exactness: weights are integer parts-per-million. Middles get
    * `200000 div (n−2)` ppm each; the division remainder is assigned
    * to the LAST touch (deterministic, documented), so per-purchase
    * ppm sums to exactly 1,000,000 and credit is conserved: credit is
    * emitted as `cents × ppm` (an exact integer in 10⁻⁶-cent units)
    * whose per-purchase sum is exactly `1000000 × cents`.
    *
    * Scale: candidate pairs come from the same
    * [[TemporalJoins.directedWindowJoin]] as q97 — (user, hour-bucket)
    * keyed, never an inequality join — and both window passes
    * (position, touch count) share one purchase-keyed sort over the
    * bounded per-purchase candidate set. No second shuffle: rank and
    * count use the same window partitioning.
    */
  private val q215 = QueryDef(
    (s, d) => {
      val e = load(s, d, "events")
      val views = e.filter(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("user_id"),
          col("ts").as("view_ts"))
      val buys = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("ts").as("purchase_ts"),
          graft.common.Exact.cents(col("value")).as("cents"))
      val pairs = TemporalJoins.directedWindowJoin(
        views, buys, "user_id", "view_ts", "purchase_ts", WindowSeconds)
      val byBuy = Window.partitionBy(col("purchase_id"))
        .orderBy(col("view_ts").asc, col("view_id").asc)
      val all = Window.partitionBy(col("purchase_id"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      pairs
        .withColumn("rn", row_number().over(byBuy).cast("long"))
        .withColumn("n_touches", count(lit(1)).over(all).cast("long"))
        .withColumn("ppm",
          when(col("n_touches") === 1L, lit(1000000L))
            .when(col("n_touches") === 2L, lit(500000L))
            .when(col("rn") === 1L, lit(400000L))
            .when(col("rn") === col("n_touches"),
              lit(400000L) + (lit(200000L) -
                (col("n_touches") - 2L) *
                  expr("200000L div (n_touches - 2L)")))
            .otherwise(expr("200000L div (n_touches - 2L)")))
        .select(col("purchase_id"), col("view_id"), col("rn"),
          col("n_touches"), col("ppm"),
          (col("cents") * col("ppm")).as("credit_ppm_cents"))
    },
    Some(s"""WITH v AS (
              SELECT event_id AS view_id, user_id, ts AS view_ts
              FROM events WHERE event_type = 'view'
            ), p AS (
              SELECT event_id AS purchase_id, user_id, ts AS purchase_ts,
                ${graft.common.Exact.centsSql("value")} AS cents
              FROM events WHERE event_type = 'purchase'
            ), pairs AS (
              SELECT p.purchase_id, v.view_id, v.view_ts, p.cents
              FROM p JOIN v ON v.user_id = p.user_id
                AND epoch_us(p.purchase_ts) - epoch_us(v.view_ts)
                    BETWEEN 0 AND ${WindowSeconds * 1000000L}
            ), ranked AS (
              SELECT purchase_id, view_id, cents,
                CAST(ROW_NUMBER() OVER (PARTITION BY purchase_id
                  ORDER BY view_ts ASC, view_id ASC) AS BIGINT) AS rn,
                CAST(COUNT(*) OVER (PARTITION BY purchase_id) AS BIGINT)
                  AS n_touches
              FROM pairs
            )
            SELECT purchase_id, view_id, rn, n_touches,
              CASE WHEN n_touches = 1 THEN 1000000
                   WHEN n_touches = 2 THEN 500000
                   WHEN rn = 1 THEN 400000
                   WHEN rn = n_touches THEN 400000 + (200000 -
                     (n_touches - 2) * (200000 // (n_touches - 2)))
                   ELSE 200000 // (n_touches - 2) END AS ppm,
              cents * (CASE WHEN n_touches = 1 THEN 1000000
                   WHEN n_touches = 2 THEN 500000
                   WHEN rn = 1 THEN 400000
                   WHEN rn = n_touches THEN 400000 + (200000 -
                     (n_touches - 2) * (200000 // (n_touches - 2)))
                   ELSE 200000 // (n_touches - 2) END)
                AS credit_ppm_cents
            FROM ranked"""),
    "U-shaped multi-touch attribution: integer ppm credit, conserved " +
      "per purchase [events,temporal-join]")

  def all: Seq[(String, QueryDef)] = Seq(
    "q97_conversion_attribution" -> q97,
    "q215_ushape_attribution" -> q215)
}
