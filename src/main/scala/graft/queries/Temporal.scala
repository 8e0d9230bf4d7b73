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

  /** Interval-overlap join: concurrent-session pairs among the first 20
    * users (q42's sessions are the intervals; the user cap keeps the
    * oracle's inequality join tractable — the Spark side's bucketed
    * plan needs no such cap). Overlap arithmetic is whole seconds
    * (unix_timestamp ↔ date_diff'second' both truncate), so the values
    * are exact integers.
    */
  private val q82 = QueryDef(
    (s, d) => {
      val sess = Events.sessions(s, d).filter(col("user_id") < 20)
        .select(
          struct(col("user_id"), col("session_seq")).as("id"),
          unix_timestamp(col("session_start")).as("st"),
          unix_timestamp(col("session_end")).as("en"))
      TemporalJoins.selfIntervalOverlap(sess, bucketSeconds = 3600L)
        .select(
          col("id1.user_id").as("u1"),
          col("id1.session_seq").as("s1"),
          col("id2.user_id").as("u2"),
          col("id2.session_seq").as("s2"),
          col("overlap_seconds"))
    },
    Some("""WITH marked AS (
              SELECT user_id, event_id, ts,
                CASE WHEN LAG(ts) OVER w IS NULL
                       OR date_diff('second', LAG(ts) OVER w, ts) > 1800
                     THEN 1 ELSE 0 END AS new_session
              FROM events
              WHERE user_id < 20
              WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
            ), numbered AS (
              SELECT *, SUM(new_session) OVER (PARTITION BY user_id
                ORDER BY ts ASC, event_id ASC
                ROWS UNBOUNDED PRECEDING) AS session_seq
              FROM marked
            ), sess AS (
              SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
                date_diff('second', TIMESTAMP '1970-01-01', MIN(ts)) AS st,
                date_diff('second', TIMESTAMP '1970-01-01', MAX(ts)) AS en
              FROM numbered GROUP BY 1, 2
            )
            SELECT a.user_id AS u1, a.session_seq AS s1,
              b.user_id AS u2, b.session_seq AS s2,
              CAST(least(a.en, b.en) - greatest(a.st, b.st) AS BIGINT)
                AS overlap_seconds
            FROM sess a JOIN sess b
              ON (a.user_id < b.user_id OR
                  (a.user_id = b.user_id AND a.session_seq < b.session_seq))
             AND a.st <= b.en AND b.st <= a.en"""),
    "interval-overlap join: concurrent session pairs [interval-join]")

  def all: Seq[(String, QueryDef)] = Seq(
    "q52_asof_join" -> q52,
    "q53_range_join" -> q53,
    "q82_interval_overlap" -> q82)
}
