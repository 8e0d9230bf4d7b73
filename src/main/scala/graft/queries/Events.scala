package graft.queries

import graft.QueryDef
import graft.common.Exact._
import graft.common.Tables.load
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics over the `events` table, batch-first (the
  * reference is batch-only — SURVEY.md §2.9): windows, sessions, ordered
  * funnel, retention cohorts, JSON props, rolling RANGE frames, streaks,
  * and date-spine gap filling; the windowed/sessionized shapes are also
  * exposed as Structured Streaming jobs in graft.streaming.
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
  /** q42's session frame (also the interval source for the overlap
    * join q82).
    */
  /** Events with their 30-min-gap session id attached (the pre-fold
    * frame behind q42's sessions; q183's co-occurrence rides it too).
    */
  private[graft] def sessionTagged(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    load(s, d, "events")
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 1800,
          1L).otherwise(0L))
      .withColumn("session_seq", sum(col("new_session")).over(byUser))
  }

  private[graft] def sessions(s: SparkSession, d: String): DataFrame = {
    sessionTagged(s, d)
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        lcountAll.as("n_events"),
        dsum(col("value")).as("sum_value"))
  }

  private val q42 = QueryDef(
    (s, d) => sessions(s, d),
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

  /** Ordered conversion funnel view → click → purchase: a user counts
    * at stage n only if the stage-n event happens AT OR AFTER their
    * first stage-(n-1) event. ONE scan, ONE shuffle: the chained stage
    * times are unbounded-frame window minima over the same user
    * partitioning (t2's predicate references t1, so they are separate
    * Window nodes, but identical partitioning means one exchange and no
    * sort — min needs no frame ordering); the per-user collapse reuses
    * that partitioning, and the final summary is a tiny global agg. The
    * naive formulation — one filtered aggregate per stage joined back —
    * reads the events table once PER STAGE, which at 100 TB is three
    * extra corpus scans for no information the windows don't already
    * have.
    */
  private val q73 = QueryDef(
    (s, d) => {
      val byUser = Window.partitionBy(col("user_id"))
      val staged = load(s, d, "events")
        .select(col("user_id"), col("ts"), col("event_type"))
        .withColumn("t1",
          min(when(col("event_type") === "view", col("ts"))).over(byUser))
        .withColumn("t2",
          min(when(col("event_type") === "click" && col("ts") >= col("t1"),
            col("ts"))).over(byUser))
        .withColumn("t3",
          min(when(col("event_type") === "purchase" && col("ts") >= col("t2"),
            col("ts"))).over(byUser))
        .groupBy("user_id")
        .agg(max("t1").as("t1"), max("t2").as("t2"), max("t3").as("t3"))
      staged.agg(
        count(lit(1)).as("n_users"),
        count(col("t1")).as("n_view"),
        count(col("t2")).as("n_view_click"),
        count(col("t3")).as("n_full_funnel"))
        .select(col("n_users"), col("n_view"), col("n_view_click"),
          col("n_full_funnel"),
          (col("n_full_funnel").cast("double") / col("n_view"))
            .as("view_to_purchase_rate"))
    },
    Some("""WITH v AS (
              SELECT user_id, min(ts) AS t1 FROM events
              WHERE event_type = 'view' GROUP BY 1
            ), c AS (
              SELECT e.user_id, min(ts) AS t2 FROM events e
              JOIN v USING (user_id)
              WHERE event_type = 'click' AND ts >= t1 GROUP BY 1
            ), p AS (
              SELECT e.user_id, min(ts) AS t3 FROM events e
              JOIN c USING (user_id)
              WHERE event_type = 'purchase' AND ts >= t2 GROUP BY 1
            )
            SELECT
              CAST((SELECT count(DISTINCT user_id) FROM events) AS BIGINT) AS n_users,
              CAST((SELECT count(*) FROM v) AS BIGINT) AS n_view,
              CAST((SELECT count(*) FROM c) AS BIGINT) AS n_view_click,
              CAST((SELECT count(*) FROM p) AS BIGINT) AS n_full_funnel,
              CAST((SELECT count(*) FROM p) AS DOUBLE) /
                (SELECT count(*) FROM v) AS view_to_purchase_rate"""),
    "ordered conversion funnel view->click->purchase [events]")

  /** Retention cohorts: users grouped by first-activity date, activity
    * counted in whole-week offsets from that date. Two aggregations
    * (first-seen per user; distinct actives per cohort-offset cell) and
    * one user-keyed join — the standard cohort-triangle input. Exact
    * distinct counts keyed by (cohort_day, offset) shuffle only the
    * already-deduplicated (user, day) pairs.
    */
  /** q74's (cohort, week) active-user counts; q188 normalizes them. */
  private def cohortWeekCounts(s: SparkSession, d: String): DataFrame = {
    val e = load(s, d, "events")
      .select(col("user_id"), to_date(col("ts")).as("day"))
    val cohort = e.groupBy("user_id").agg(min("day").as("cohort_day"))
    e.join(cohort, "user_id")
      .select(col("user_id"), col("cohort_day"),
        floor(datediff(col("day"), col("cohort_day")) / 7)
          .cast("int").as("offset_weeks"))
      .distinct()
      .groupBy("cohort_day", "offset_weeks")
      .agg(count(lit(1)).as("n_active_users"))
  }

  private val q74 = QueryDef(
    (s, d) => cohortWeekCounts(s, d),
    Some("""WITH e AS (
              SELECT user_id, CAST(ts AS DATE) AS day FROM events
            ), cohort AS (
              SELECT user_id, min(day) AS cohort_day FROM e GROUP BY 1
            )
            SELECT cohort_day, CAST(offset_weeks AS INTEGER) AS offset_weeks,
              CAST(count(*) AS BIGINT) AS n_active_users
            FROM (SELECT DISTINCT e.user_id, cohort_day,
                    (day - cohort_day) // 7 AS offset_weeks
                  FROM e JOIN cohort USING (user_id))
            GROUP BY 1, 2"""),
    "retention cohorts by first-activity date x week offset [events]")

  /** Semi-structured extraction: pull a typed field out of the JSON
    * `props` column and aggregate it per event_type. `get_json_object`
    * evaluates inside codegen with no schema declaration — the right
    * tool for plucking a few fields at scan time (a wide extraction
    * would declare a `from_json` schema once instead). Sums stay in
    * longs (exact), the mean is one double division at the end.
    */
  private val q75 = QueryDef(
    (s, d) =>
      load(s, d, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(lcountAll.as("n_events"),
          sum(when(col("k").isNull, 1L).otherwise(0L)).cast("long")
            .as("n_null_k"),
          min("k").as("min_k"), max("k").as("max_k"),
          sum("k").as("sum_k"))
        .withColumn("avg_k",
          col("sum_k").cast("double") / (col("n_events") - col("n_null_k"))),
    Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
              CAST(sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_k,
              CAST(min(k) AS BIGINT) AS min_k,
              CAST(max(k) AS BIGINT) AS max_k,
              CAST(sum(k) AS BIGINT) AS sum_k,
              CAST(CAST(sum(k) AS DOUBLE) /
                (count(*) - sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END))
                AS DOUBLE) AS avg_k
            FROM (SELECT event_type,
                    CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
                  FROM events)
            GROUP BY 1"""),
    "JSON field extraction + typed aggregation [events,semi-structured]")

  /** Rolling 7-day window per user — the RANGE-frame window family
    * (every prior window op uses row frames or unbounded frames). The
    * frame is keyed on integer days-since-epoch so `rangeBetween(-6, 0)`
    * means "this day and the 6 calendar days before it", holes included.
    * The rolled value stays DECIMAL through the frame sum (exact →
    * order/topology/engine-independent; a double rolling sum would
    * diverge in the low bits whenever the two engines associate the
    * frame differently) and is cast to double once at the end. Daily
    * pre-aggregation collapses events to user-day rows BEFORE the
    * window, and both the aggregate and the window shuffle on user_id —
    * Catalyst reuses one exchange.
    */
  private val q76 = QueryDef(
    (s, d) => {
      val daily = load(s, d, "events")
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 4)))
          .as("dv"))
      val frame = Window.partitionBy(col("user_id"))
        .orderBy(datediff(col("day"), to_date(lit("1970-01-01"))))
        .rangeBetween(-6, 0)
      daily
        .withColumn("rs", sum(col("dv")).over(frame))
        .withColumn("rn", count(lit(1)).over(frame))
        .select(col("user_id"), col("day"),
          col("dv").cast("double").as("day_value"),
          col("rs").cast("double").as("roll_sum_7d"),
          col("rn").cast("long").as("roll_days"),
          (col("rs").cast("double") / col("rn")).as("roll_avg_7d"))
    },
    Some("""WITH daily AS (
              SELECT user_id, CAST(ts AS DATE) AS day,
                SUM(CAST(value AS DECIMAL(18,4))) AS dv
              FROM events GROUP BY 1, 2
            ), r AS (
              SELECT user_id, day, dv,
                SUM(dv) OVER (PARTITION BY user_id
                  ORDER BY day - DATE '1970-01-01'
                  RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS rs,
                COUNT(*) OVER (PARTITION BY user_id
                  ORDER BY day - DATE '1970-01-01'
                  RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS rn
              FROM daily
            )
            SELECT user_id, day, CAST(dv AS DOUBLE) AS day_value,
              CAST(rs AS DOUBLE) AS roll_sum_7d,
              CAST(rn AS BIGINT) AS roll_days,
              CAST(CAST(rs AS DOUBLE) / rn AS DOUBLE) AS roll_avg_7d
            FROM r"""),
    "rolling 7-day RANGE-frame window per user [events,W]")

  /** Longest consecutive-active-day streak per user — the classic
    * gaps-and-islands shape: distinct active days minus their per-user
    * row_number leaves a constant per consecutive run, so one window +
    * two keyed aggregations find every island without self-joins or
    * recursion. All-integer arithmetic end to end.
    */
  private val q78 = QueryDef(
    (s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("day_num"))
      load(s, d, "events")
        .select(col("user_id"),
          datediff(to_date(col("ts")), to_date(lit("1970-01-01")))
            .as("day_num"))
        .distinct()
        .withColumn("island", col("day_num") - row_number().over(w))
        .groupBy("user_id", "island")
        .agg(count(lit(1)).as("len"))
        .groupBy("user_id")
        .agg(max("len").cast("int").as("longest_streak_days"),
          sum("len").cast("long").as("n_active_days"),
          count(lit(1)).cast("long").as("n_streaks"))
    },
    Some("""WITH d AS (
              SELECT DISTINCT user_id,
                CAST(ts AS DATE) - DATE '1970-01-01' AS day_num
              FROM events
            ), i AS (
              SELECT user_id, day_num,
                day_num - ROW_NUMBER() OVER (PARTITION BY user_id
                  ORDER BY day_num) AS island
              FROM d
            ), s AS (
              SELECT user_id, island, count(*) AS len
              FROM i GROUP BY 1, 2
            )
            SELECT user_id,
              CAST(max(len) AS INTEGER) AS longest_streak_days,
              CAST(sum(len) AS BIGINT) AS n_active_days,
              CAST(count(*) AS BIGINT) AS n_streaks
            FROM s GROUP BY 1"""),
    "gaps-and-islands: longest active-day streak per user [events,W]")

  /** Date-spine gap filling: materialize every calendar day in each
    * user's [first, last] activity span and left-join the daily counts,
    * so downstream time-series ops (q76's rolling frames, forecasting
    * exports) see an explicit zero row instead of a hole. `sequence` +
    * explode generates the spine from the bounds row — per-user fan-out
    * is the span length, never corpus-sized — and the daily counts
    * arrive pre-aggregated on the same user key.
    */
  private val q80 = QueryDef(
    (s, d) => {
      val e = load(s, d, "events")
        .select(col("user_id"), to_date(col("ts")).as("day"))
      val spine = e.groupBy("user_id")
        .agg(min("day").as("lo"), max("day").as("hi"))
        .select(col("user_id"),
          explode(sequence(col("lo"), col("hi"))).as("day"))
      val daily = e.groupBy("user_id", "day")
        .agg(count(lit(1)).as("n"))
      spine.join(daily, Seq("user_id", "day"), "left")
        .select(col("user_id"), col("day"),
          coalesce(col("n"), lit(0L)).as("n_events"),
          col("n").isNull.as("is_gap"))
    },
    Some("""WITH e AS (
              SELECT user_id, CAST(ts AS DATE) AS day FROM events
            ), bounds AS (
              SELECT user_id, min(day) AS lo, max(day) AS hi
              FROM e GROUP BY 1
            ), spine AS (
              SELECT user_id,
                CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE)
                  AS day
              FROM bounds
            ), daily AS (
              SELECT user_id, day, count(*) AS n FROM e GROUP BY 1, 2
            )
            SELECT spine.user_id, spine.day,
              CAST(coalesce(daily.n, 0) AS BIGINT) AS n_events,
              daily.n IS NULL AS is_gap
            FROM spine LEFT JOIN daily
              ON spine.user_id = daily.user_id AND spine.day = daily.day"""),
    "date-spine gap filling per user activity span [events,time-series]")

  /** q127: SLIDING 1-hour windows every 15 minutes — q41's tumbling agg
    * with overlap, the other canonical streaming-agg shape run as batch
    * (a metric that must refresh 4× per horizon). Spark's window()
    * expands each event into windowDuration/slide = 4 rows BEFORE the
    * aggregate; the fan-out is a fixed small constant and the partial
    * aggregate collapses it map-side, so the one exchange still carries
    * ~|windows|·|types| combined rows, not 4× the events.
    *
    * Oracle: both engines floor the epoch-microsecond clock to the
    * 15-minute grid with integer arithmetic (Spark's window() is
    * epoch-aligned), so window boundaries match exactly; sums use the
    * exact-decimal discipline.
    */
  private val q127 = QueryDef(
    (s, d) =>
      load(s, d, "events")
        .groupBy(
          window(col("ts"), "1 hour", "15 minutes")("start")
            .as("window_start"),
          col("event_type"))
        .agg(lcountAll.as("n_events"),
          dsum(col("value")).as("sum_value"),
          countDistinct(col("user_id")).cast("long").as("n_users")),
    Some("""WITH slides AS (
              SELECT make_timestamp(
                  (epoch_us(ts) // 900000000 - i) * 900000000)
                  AS window_start,
                event_type, user_id, value
              FROM events CROSS JOIN (SELECT unnest(range(4)) AS i) g
            )
            SELECT window_start, event_type,
              CAST(COUNT(*) AS BIGINT) AS n_events,
              CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
                AS sum_value,
              CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
            FROM slides GROUP BY 1, 2"""),
    "sliding 1h/15min window agg: fixed 4x expand, map-side collapse [streaming-as-batch]")

  /** q184: browse-abandonment rate per day — of the sessions that
    * VIEWED something, how many never purchased before the session
    * ended, grouped by session-start day. The conversion-leak KPI a
    * merchandising dashboard leads with.
    *
    * Scale: rides q42's one user-keyed session build; the per-session
    * flag fold collapses to |sessions| rows on the SAME key, and the
    * day fold is calendar-bounded. All integers + one division;
    * zero-view days emit NULL rate via an exact integer guard.
    */
  private val q184 = QueryDef(
    (s, d) => {
      val perSession = sessionTagged(s, d)
        .groupBy(col("user_id"), col("session_seq"))
        .agg(to_date(min(col("ts"))).as("day"),
          max(when(col("event_type") === "view", 1L).otherwise(0L))
            .as("viewed"),
          max(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("purchased"))
      perSession.groupBy(col("day"))
        .agg(lcountAll.as("n_sessions"),
          sum("viewed").as("n_viewing"),
          sum(col("viewed") * col("purchased")).as("n_converted"))
        .withColumn("abandonment_rate",
          when(col("n_viewing") === 0L, lit(null).cast("double"))
            .otherwise((col("n_viewing") - col("n_converted"))
              .cast("double") / col("n_viewing").cast("double")))
    },
    Some("""WITH marked AS (
              SELECT user_id, event_id, ts, event_type,
                CASE WHEN LAG(ts) OVER w IS NULL
                       OR date_diff('second', LAG(ts) OVER w, ts) > 1800
                     THEN 1 ELSE 0 END AS new_session
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
            ), tagged AS (
              SELECT *, SUM(new_session) OVER (PARTITION BY user_id
                ORDER BY ts ASC, event_id ASC
                ROWS UNBOUNDED PRECEDING) AS session_seq
              FROM marked
            ), sess AS (
              SELECT user_id, session_seq,
                CAST(MIN(ts) AS DATE) AS day,
                MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                  AS viewed,
                MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS purchased
              FROM tagged GROUP BY 1, 2
            )
            SELECT day,
              CAST(COUNT(*) AS BIGINT) AS n_sessions,
              CAST(SUM(viewed) AS BIGINT) AS n_viewing,
              CAST(SUM(viewed * purchased) AS BIGINT) AS n_converted,
              CASE WHEN SUM(viewed) = 0 THEN NULL
                ELSE CAST(SUM(viewed) - SUM(viewed * purchased) AS DOUBLE)
                  / CAST(SUM(viewed) AS DOUBLE) END AS abandonment_rate
            FROM sess GROUP BY 1"""),
    "browse abandonment per day: session flags on the q42 build, one division [behavior]")

  /** q188: the retention curve — q74's cohort counts normalized to each
    * cohort's week-0 size (the ratio every retention chart plots) with
    * the below-half-life flag as an INTEGER comparison (2·n < n₀, so
    * the flag can't flip on a float boundary). Rides q74's build; the
    * normalization windows run per cohort over ≤ weeks-of-history rows.
    */
  private val q188 = QueryDef(
    (s, d) => {
      val byCohort = Window.partitionBy(col("cohort_day"))
      cohortWeekCounts(s, d)
        .withColumn("n_week0",
          max(when(col("offset_weeks") === 0, col("n_active_users")))
            .over(byCohort))
        .select(col("cohort_day"), col("offset_weeks"),
          col("n_active_users"), col("n_week0"),
          (col("n_active_users").cast("double") /
            col("n_week0").cast("double")).as("retention_rate"),
          (col("n_active_users") * 2L < col("n_week0")).as("below_half"))
    },
    Some("""WITH e AS (
              SELECT user_id, CAST(ts AS DATE) AS day FROM events
            ), cohort AS (
              SELECT user_id, min(day) AS cohort_day FROM e GROUP BY 1
            ), cw AS (
              SELECT cohort_day, CAST(offset_weeks AS INTEGER)
                  AS offset_weeks,
                CAST(count(*) AS BIGINT) AS n_active_users
              FROM (SELECT DISTINCT e.user_id, cohort_day,
                      (day - cohort_day) // 7 AS offset_weeks
                    FROM e JOIN cohort USING (user_id))
              GROUP BY 1, 2
            )
            SELECT cohort_day, offset_weeks, n_active_users,
              CAST(MAX(CASE WHEN offset_weeks = 0 THEN n_active_users END)
                OVER (PARTITION BY cohort_day) AS BIGINT) AS n_week0,
              CAST(n_active_users AS DOUBLE) /
                CAST(MAX(CASE WHEN offset_weeks = 0 THEN n_active_users END)
                  OVER (PARTITION BY cohort_day) AS DOUBLE)
                AS retention_rate,
              n_active_users * 2 <
                MAX(CASE WHEN offset_weeks = 0 THEN n_active_users END)
                  OVER (PARTITION BY cohort_day) AS below_half
            FROM cw"""),
    "retention curve: cohort counts normalized to week-0, integer half-life flag [behavior]")

  /** q193: deadline-windowed funnel (the `windowFunnel` analog) —
    * q73's ordered view→click→purchase, but each step must land within
    * its DEADLINE: click within 1 hour of the first view, purchase
    * within 24 hours of that click. The deadline form is what growth
    * teams actually ship ("converted in-session / same-day"), and its
    * semantics differ from q73's unbounded chain — a purchase next
    * week no longer counts. Per-step average latencies ride along.
    *
    * Scale: identical plan to q73 — ONE scan, ONE user exchange; the
    * chained deadline minima are unbounded-frame window minima over
    * the same user partitioning (min needs no frame sort), the
    * per-user collapse reuses the partitioning, and the summary is a
    * 1-row fold. Latencies are exact integer second sums divided once.
    */
  private val q193 = QueryDef(
    (s, d) => {
      val byUser = Window.partitionBy(col("user_id"))
      val staged = load(s, d, "events")
        .select(col("user_id"), col("ts"), col("event_type"))
        .withColumn("t1",
          min(when(col("event_type") === "view", col("ts"))).over(byUser))
        .withColumn("t2",
          min(when(col("event_type") === "click" && col("ts") >= col("t1") &&
            col("ts") <= col("t1") + expr("INTERVAL 1 HOUR"), col("ts")))
            .over(byUser))
        .withColumn("t3",
          min(when(col("event_type") === "purchase" &&
            col("ts") >= col("t2") &&
            col("ts") <= col("t2") + expr("INTERVAL 24 HOURS"), col("ts")))
            .over(byUser))
        .groupBy("user_id")
        .agg(max("t1").as("t1"), max("t2").as("t2"), max("t3").as("t3"))
      staged.agg(
        count(lit(1)).as("n_users"),
        count(col("t1")).as("n_view"),
        count(col("t2")).as("n_click_1h"),
        count(col("t3")).as("n_purchase_24h"),
        sum(unix_timestamp(col("t2")) - unix_timestamp(col("t1")))
          .as("click_lat_sum"),
        sum(unix_timestamp(col("t3")) - unix_timestamp(col("t2")))
          .as("purchase_lat_sum"))
        .select(col("n_users"), col("n_view"), col("n_click_1h"),
          col("n_purchase_24h"),
          (col("n_click_1h").cast("double") / col("n_view").cast("double"))
            .as("click_rate_1h"),
          (col("n_purchase_24h").cast("double") /
            col("n_click_1h").cast("double")).as("purchase_rate_24h"),
          (col("click_lat_sum").cast("double") /
            col("n_click_1h").cast("double")).as("avg_click_sec"),
          (col("purchase_lat_sum").cast("double") /
            col("n_purchase_24h").cast("double")).as("avg_purchase_sec"))
    },
    Some("""WITH v AS (
              SELECT user_id, min(ts) AS t1 FROM events
              WHERE event_type = 'view' GROUP BY 1
            ), c AS (
              SELECT e.user_id, min(ts) AS t2 FROM events e
              JOIN v USING (user_id)
              WHERE event_type = 'click' AND ts >= t1
                AND ts <= t1 + INTERVAL 1 HOUR
              GROUP BY 1
            ), p AS (
              SELECT e.user_id, min(ts) AS t3 FROM events e
              JOIN c USING (user_id)
              WHERE event_type = 'purchase' AND ts >= t2
                AND ts <= t2 + INTERVAL 24 HOURS
              GROUP BY 1
            ), agg AS (
              SELECT
                CAST((SELECT count(DISTINCT user_id) FROM events) AS BIGINT)
                  AS n_users,
                CAST((SELECT count(*) FROM v) AS BIGINT) AS n_view,
                CAST((SELECT count(*) FROM c) AS BIGINT) AS n_click_1h,
                CAST((SELECT count(*) FROM p) AS BIGINT) AS n_purchase_24h,
                CAST((SELECT SUM(date_diff('second', v.t1, c.t2))
                  FROM c JOIN v USING (user_id)) AS BIGINT)
                  AS click_lat_sum,
                CAST((SELECT SUM(date_diff('second', c.t2, p.t3))
                  FROM p JOIN c USING (user_id)) AS BIGINT)
                  AS purchase_lat_sum
            )
            SELECT n_users, n_view, n_click_1h, n_purchase_24h,
              CAST(n_click_1h AS DOUBLE) / CAST(n_view AS DOUBLE)
                AS click_rate_1h,
              CAST(n_purchase_24h AS DOUBLE) / CAST(n_click_1h AS DOUBLE)
                AS purchase_rate_24h,
              CAST(click_lat_sum AS DOUBLE) / CAST(n_click_1h AS DOUBLE)
                AS avg_click_sec,
              CAST(purchase_lat_sum AS DOUBLE) /
                CAST(n_purchase_24h AS DOUBLE) AS avg_purchase_sec
            FROM agg"""),
    "deadline-windowed funnel: per-step time limits + exact latencies [events]")

  /** Bot screen thresholds: a session is machine-like when it has at
    * least [[BotMinEvents]] events AND its average inter-event gap is
    * under 2 s — both checks kept as integer comparisons
    * (duration < 2·(n−1)) so the flag is bit-identical cross-engine.
    */
  private val BotMinEvents = 20L

  /** q206: behavioral bot screen over the session frame — per user,
    * how many of their sessions look machine-generated (high event
    * count at sub-human inter-event cadence) and what share of their
    * event volume those sessions carry. The abuse/automation filter a
    * clickstream corpus runs BEFORE the data feeds ranking or
    * training — bot traffic is the classic silent poisoner of
    * engagement features and behavioral-embedding corpora (q204's
    * pairs, q117's transitions).
    *
    * Scale: rides q42's session fold — ONE user_id exchange builds
    * sessions (lag + running sum, streaming window state), the flag is
    * per-row map work over the session frame, and the user rollup
    * reuses the SAME user partitioning, so no second data-sized
    * exchange exists. Emits every user (zero bot sessions included):
    * the screen's consumer joins it as a feature, and absence-vs-zero
    * ambiguity is exactly what a quality gate must not have.
    *
    * Exactness: counts are i64; the one division is of identical
    * longs (IEEE-exact both engines).
    */
  private val q206 = QueryDef(
    (s, d) => {
      val flagged = sessions(s, d)
        .withColumn("dur_s",
          unix_timestamp(col("session_end")) -
            unix_timestamp(col("session_start")))
        .withColumn("is_bot",
          col("n_events") >= BotMinEvents &&
            col("dur_s") < (col("n_events") - 1L) * 2L)
      flagged.groupBy(col("user_id"))
        .agg(
          lcountAll.as("n_sessions"),
          sum(when(col("is_bot"), 1L).otherwise(0L)).as("n_bot_sessions"),
          sum(col("n_events")).as("n_events_total"),
          sum(when(col("is_bot"), col("n_events")).otherwise(0L))
            .as("n_events_bot"))
        .withColumn("bot_event_share",
          col("n_events_bot").cast("double") /
            col("n_events_total").cast("double"))
    },
    Some(s"""WITH marked AS (
              SELECT user_id, event_id, ts,
                CASE WHEN LAG(ts) OVER w IS NULL
                       OR date_diff('second', LAG(ts) OVER w, ts) > 1800
                     THEN 1 ELSE 0 END AS new_session
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
            ), sess AS (
              SELECT *, SUM(new_session) OVER (PARTITION BY user_id
                ORDER BY ts ASC, event_id ASC
                ROWS UNBOUNDED PRECEDING) AS session_seq
              FROM marked
            ), per_sess AS (
              SELECT user_id, session_seq,
                MIN(ts) AS s0, MAX(ts) AS s1,
                CAST(COUNT(*) AS BIGINT) AS n_events
              FROM sess GROUP BY 1, 2
            ), flagged AS (
              SELECT user_id, n_events,
                CASE WHEN n_events >= $BotMinEvents
                       AND date_diff('second', s0, s1) < (n_events - 1) * 2
                     THEN 1 ELSE 0 END AS is_bot
              FROM per_sess
            )
            SELECT user_id,
              CAST(COUNT(*) AS BIGINT) AS n_sessions,
              CAST(SUM(is_bot) AS BIGINT) AS n_bot_sessions,
              CAST(SUM(n_events) AS BIGINT) AS n_events_total,
              CAST(SUM(CASE WHEN is_bot = 1 THEN n_events ELSE 0 END)
                AS BIGINT) AS n_events_bot,
              CAST(SUM(CASE WHEN is_bot = 1 THEN n_events ELSE 0 END)
                  AS DOUBLE) / CAST(SUM(n_events) AS DOUBLE)
                AS bot_event_share
            FROM flagged GROUP BY 1"""),
    "session bot screen: cadence flag on the q42 fold, one user exchange [events]")

  def all: Seq[(String, QueryDef)] = Seq(
    "q41_events_hourly" -> q41,
    "q127_sliding_window" -> q127,
    "q193_windowed_funnel" -> q193,
    "q42_events_sessions" -> q42,
    "q73_event_funnel" -> q73,
    "q74_retention_cohorts" -> q74,
    "q75_json_props" -> q75,
    "q76_rolling_window" -> q76,
    "q78_event_streaks" -> q78,
    "q80_date_spine" -> q80,
    "q184_browse_abandonment" -> q184,
    "q188_retention_curve" -> q188,
    "q206_bot_sessions" -> q206)
}
