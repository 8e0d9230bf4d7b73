package graft.queries

import graft.QueryDef
import graft.common.Tables.load
import graft.operators.TemporalJoins
import org.apache.spark.sql.functions._

/** Temporal join queries over the events table: backward as-of join and
  * bucketed range join — operators Spark lacks as built-ins, composed
  * scalably (see graft.operators.TemporalJoins for the plans).
  */
object Temporal {

  /** As-of: for every 'error' event, the latest 'click' of the same user
    * at or before it. Oracle is a LATERAL top-1 (explicit, deterministic
    * tie-break) — the same semantics DuckDB's ASOF JOIN provides.
    */
  private val q52 = QueryDef(
    (s, d) => {
      val events = load(s, d, "events")
      val errors = events.filter(col("event_type") === "error")
        .select("event_id", "user_id", "ts")
      val clicks = events.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"))
      TemporalJoins.asofBackward(
        errors, clicks, key = "user_id", leftTs = "ts", rightTs = "ts",
        payload = Seq("ts" -> "click_ts", "event_id" -> "click_event_id"),
        tieBreak = "event_id")
    },
    Some("""SELECT e.event_id, e.user_id, e.ts, c.click_ts,
              c.click_event_id
            FROM (SELECT event_id, user_id, ts FROM events
                  WHERE event_type = 'error') e
            LEFT JOIN LATERAL (
              SELECT ts AS click_ts, event_id AS click_event_id
              FROM events c
              WHERE c.event_type = 'click'
                AND c.user_id = e.user_id AND c.ts <= e.ts
              ORDER BY c.ts DESC, c.event_id DESC LIMIT 1
            ) c ON true"""),
    "backward as-of join via union + last_value window [asof-join]")

  /** Range join: neighbors within +-5 minutes (any user), via epoch
    * bucketing — never an inequality join.
    */
  private val q53 = QueryDef(
    (s, d) =>
      TemporalJoins.rangeJoinCount(
        load(s, d, "events"), tsCol = "ts", idCol = "event_id",
        rangeSeconds = 300)
        .select(col("_lid").as("event_id"),
          col("n_neighbors").cast("long").as("n_neighbors")),
    Some("""SELECT a.event_id, CAST(COUNT(*) AS BIGINT) AS n_neighbors
            FROM events a JOIN events b
              ON b.ts BETWEEN a.ts - INTERVAL 300 SECOND
                          AND a.ts + INTERVAL 300 SECOND
             AND a.event_id <> b.event_id
            GROUP BY 1"""),
    "bucketed range join: +-5min neighbor counts [range-join]")

  def all: Seq[(String, QueryDef)] = Seq(
    "q52_asof_join" -> q52,
    "q53_range_join" -> q53)
}
