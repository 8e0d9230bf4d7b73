package graft.queries

import graft.QueryDef
import graft.common.Exact._
import graft.common.Tables.load
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics over the `events` table, batch-first (the
  * reference is batch-only — SURVEY.md §2.9); the same logical windows are
  * exposed as a Structured Streaming job in graft.streaming.
  */
object Events {

  /** Tumbling 1-hour windows per event_type: the canonical streaming agg
    * shape run as batch. Map-side partial agg collapses events before the
    * one shuffle on (window, event_type).
    */
  private val q41 = QueryDef(
    (s, d) =>
      load(s, d, "events")
        .groupBy(
          window(col("ts"), "1 hour")("start").as("hour_start"),
          col("event_type"))
        .agg(lcountAll.as("n_events"),
          dsum(col("value")).as("sum_value"),
          countDistinct(col("user_id")).cast("long").as("n_users")),
    Some("""SELECT date_trunc('hour', ts) AS hour_start, event_type,
              CAST(COUNT(*) AS BIGINT) AS n_events,
              CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
              CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
            FROM events GROUP BY 1, 2"""),
    "tumbling 1h window agg per event_type [streaming-as-batch]")

  /** Gap-based sessionization (30-min inactivity) via lag + running sum —
    * the batch equivalent of flatMapGroupsWithState sessions. Two window
    * functions over the same (user_id, ts) partitioning → single shuffle.
    */
  private val q42 = QueryDef(
    (s, d) => {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      load(s, d, "events")
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
            unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 1800,
            1L).otherwise(0L))
        .withColumn("session_seq", sum(col("new_session")).over(byUser))
        .groupBy(col("user_id"), col("session_seq"))
        .agg(
          min(col("ts")).as("session_start"),
          max(col("ts")).as("session_end"),
          lcountAll.as("n_events"),
          dsum(col("value")).as("sum_value"))
    },
    Some("""WITH marked AS (
              SELECT user_id, event_id, ts, value,
                CASE WHEN LAG(ts) OVER w IS NULL
                       OR date_diff('second', LAG(ts) OVER w, ts) > 1800
                     THEN 1 ELSE 0 END AS new_session
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
            ), sessions AS (
              SELECT *, SUM(new_session) OVER (PARTITION BY user_id
                ORDER BY ts ASC, event_id ASC
                ROWS UNBOUNDED PRECEDING) AS session_seq
              FROM marked
            )
            SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
              MIN(ts) AS session_start, MAX(ts) AS session_end,
              CAST(COUNT(*) AS BIGINT) AS n_events,
              CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
            FROM sessions GROUP BY 1, 2"""),
    "gap-based sessionization via lag + running sum [streaming-as-batch,W3]")

  def all: Seq[(String, QueryDef)] = Seq(
    "q41_events_hourly" -> q41,
    "q42_events_sessions" -> q42)
}
