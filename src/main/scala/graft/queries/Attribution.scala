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

  def all: Seq[(String, QueryDef)] = Seq(
    "q97_conversion_attribution" -> q97)
}
