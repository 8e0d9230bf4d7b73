package graft.queries

import graft.QueryDef
import graft.common.Tables.load
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization operators over the events stream:
  * gap-filled daily panels with last-observation-carried-forward, and
  * calendar resampling to OHLC bars — the transforms that turn an
  * irregular event log into the fixed-grid panel a forecasting /
  * feature pipeline consumes.
  */
object TimeSeries {

  /** Panel date range (the generator's event span). A production run
    * derives these from the corpus watermark; literals keep the oracle
    * self-contained.
    */
  private val DayFrom = "2024-01-01"
  private val DayTo = "2024-01-30"

  /** q144: gap-filled daily panel with LOCF. Every (user, day) cell of
    * the calendar spine gets the day's event count and the day-close
    * value (last event's cents, ties broken by event_id) carried
    * forward across gap days — NULL until a user's first observation,
    * never fabricated.
    *
    * Scale: the corpus pays ONE (user, day) aggregate; the spine is
    * |users|·|days| tiny rows built by an in-plan sequence explode
    * (never a driver loop), left-joined on the same user-keyed
    * partitioning; LOCF is a per-user running `last(ignoreNulls)` over
    * ≤|days| rows per user — bounded frame, no corpus re-sort.
    *
    * Exactness: cents are ⌊100·v⌉ integers; the day-close pick is a
    * deterministic rank; dates are calendar arithmetic.
    */
  private val q144 = QueryDef(
    (s, d) => {
      val ev = load(s, d, "events").select(
        col("user_id"), col("ts"), col("event_id"),
        to_date(col("ts")).as("day"),
        graft.common.Exact.cents(col("value")).as("cents"))
      val byDay = Window.partitionBy(col("user_id"), col("day"))
        .orderBy(col("ts").desc, col("event_id").desc)
      val daily = ev
        .withColumn("rn", row_number().over(byDay))
        .groupBy(col("user_id"), col("day"))
        .agg(count(lit(1)).as("n_events"),
          max(when(col("rn") === 1, col("cents"))).as("day_close"))
      val spine = load(s, d, "events").select(col("user_id")).distinct()
        .select(col("user_id"),
          explode(sequence(
            to_date(lit(DayFrom)), to_date(lit(DayTo)))).as("day"))
      val locf = Window.partitionBy(col("user_id")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spine.join(daily, Seq("user_id", "day"), "left")
        .select(col("user_id"), col("day"),
          coalesce(col("n_events"), lit(0L)).as("n_events"),
          last(col("day_close"), ignoreNulls = true).over(locf)
            .as("filled_cents"))
    },
    Some(s"""WITH ranked AS (
              SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
                ${graft.common.Exact.centsSql("value")} AS cents,
                ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('day', ts)
                  ORDER BY ts DESC, event_id DESC) AS rn
              FROM events
            ), daily AS (
              SELECT user_id, day, CAST(count(*) AS BIGINT) AS n_events,
                MAX(CASE WHEN rn = 1 THEN cents END) AS day_close
              FROM ranked GROUP BY 1, 2
            ), spine AS (
              SELECT u.user_id, CAST(g.gs AS DATE) AS day
              FROM (SELECT DISTINCT user_id FROM events) u,
                (SELECT unnest(generate_series(DATE '$DayFrom',
                  DATE '$DayTo', INTERVAL 1 DAY)) AS gs) g
            )
            SELECT s.user_id, s.day,
              coalesce(d.n_events, 0) AS n_events,
              last_value(d.day_close IGNORE NULLS) OVER (
                PARTITION BY s.user_id ORDER BY s.day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS filled_cents
            FROM spine s LEFT JOIN daily d
              ON s.user_id = d.user_id AND s.day = d.day"""),
    "gap-filled daily panel with LOCF: one corpus agg, in-plan spine [timeseries]")

  /** q145: weekly OHLC resampling per event type — open/close by
    * deterministic (ts, event_id) rank, high/low/volume exact. The
    * calendar-bar transform every metrics store and forecasting
    * feature pipeline runs; date_trunc('week') is Monday-start in both
    * engines.
    *
    * Scale: one window pass (both rank directions share the
    * (type, week) exchange) + one map-side-combined aggregate; output
    * is |types|·|weeks| rows.
    */
  private val q145 = QueryDef(
    (s, d) => {
      val ev = load(s, d, "events").select(
        col("event_type"), col("ts"), col("event_id"),
        // both engines truncate to Monday; DuckDB's date_trunc('week')
        // is DATE-typed while Spark's is TIMESTAMP — cast to the DATE
        // common type
        date_trunc("week", col("ts")).cast("date").as("week"),
        graft.common.Exact.cents(col("value")).as("cents"))
      val byWeek = Window.partitionBy(col("event_type"), col("week"))
      ev
        .withColumn("rn_a", row_number().over(
          byWeek.orderBy(col("ts").asc, col("event_id").asc)))
        .withColumn("rn_d", row_number().over(
          byWeek.orderBy(col("ts").desc, col("event_id").desc)))
        .groupBy(col("event_type"), col("week"))
        .agg(
          count(lit(1)).as("n_events"),
          max(when(col("rn_a") === 1, col("cents"))).as("open_cents"),
          max(col("cents")).as("high_cents"),
          min(col("cents")).as("low_cents"),
          max(when(col("rn_d") === 1, col("cents"))).as("close_cents"),
          sum(col("cents")).as("volume_cents"))
    },
    Some(s"""WITH ev AS (
              SELECT event_type, ts, event_id,
                CAST(date_trunc('week', ts) AS DATE) AS week,
                ${graft.common.Exact.centsSql("value")} AS cents
              FROM events
            ), ranked AS (
              SELECT *,
                ROW_NUMBER() OVER (PARTITION BY event_type, week
                  ORDER BY ts ASC, event_id ASC) AS rn_a,
                ROW_NUMBER() OVER (PARTITION BY event_type, week
                  ORDER BY ts DESC, event_id DESC) AS rn_d
              FROM ev
            )
            SELECT event_type, week,
              CAST(count(*) AS BIGINT) AS n_events,
              MAX(CASE WHEN rn_a = 1 THEN cents END) AS open_cents,
              MAX(cents) AS high_cents,
              MIN(cents) AS low_cents,
              MAX(CASE WHEN rn_d = 1 THEN cents END) AS close_cents,
              CAST(SUM(cents) AS BIGINT) AS volume_cents
            FROM ranked GROUP BY 1, 2"""),
    "weekly OHLC bars: shared rank exchange, exact cents [timeseries]")

  def all: Seq[(String, QueryDef)] = Seq(
    "q144_locf_panel" -> q144,
    "q145_ohlc_resample" -> q145)
}
