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

  /** q165: EWMA smoothing of the daily event volume (α = 0.3,
    * zero-initialized): s_d = α·Σ_{i≤d} (1−α)^{d−i}·x_i — the
    * exponential smoother every monitoring dashboard draws. Computed
    * via the scaled-sum form s_d = α·(1−α)^d · Σ_{i≤d} (1−α)^{−i}·x_i
    * so the cumulative step is a plain running sum (the per-row weight
    * never references the frame's end). Exponent range is calendar-
    * bounded (≤ spine days), so the scaled terms stay well inside
    * double range.
    *
    * Scale: one corpus pass into per-day counts; the spine join and
    * the running sum act on the calendar-bounded frame.
    *
    * Exactness: day counts are exact integers; the float tail (pow +
    * an ordered float sum) is the one non-reproducible piece, so the
    * derived oracle re-joins the exact integer evidence and admits
    * `ewma` within 1e-6 (q110 tolerance contract, loosened for the
    * pow-scaled summation's wider dynamic range).
    */
  private val Alpha = 0.3

  private val q165 = QueryDef(
    (s, d) => {
      val daily = load(s, d, "events")
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
      val spine = s.range(1).select(explode(sequence(
        to_date(lit(DayFrom)), to_date(lit(DayTo)))).as("day"))
      val grid = spine.join(daily, Seq("day"), "left")
        .select(col("day"), coalesce(col("n"), lit(0L)).as("n_events"),
          (datediff(col("day"), to_date(lit(DayFrom))) + 1).cast("long")
            .as("day_idx"))
      val w = Window.orderBy(col("day").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid
        .withColumn("scaled",
          col("n_events").cast("double") *
            pow(lit(1.0 - Alpha), -col("day_idx").cast("double")))
        .withColumn("ewma",
          lit(Alpha) * pow(lit(1.0 - Alpha), col("day_idx").cast("double")) *
            sum(col("scaled")).over(w))
        .select(col("day"), col("n_events"), col("ewma"))
    },
    Some(s"""WITH daily AS (
              SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1
            ), spine AS (
              SELECT CAST(g.gs AS DATE) AS day FROM
                (SELECT unnest(generate_series(DATE '$DayFrom',
                  DATE '$DayTo', INTERVAL 1 DAY)) AS gs) g
            ), grid AS (
              SELECT s.day, COALESCE(d.n, 0) AS n_events,
                CAST(date_diff('day', DATE '$DayFrom', s.day) + 1
                  AS BIGINT) AS day_idx
              FROM spine s LEFT JOIN daily d ON s.day = d.day
            ), ref AS (
              SELECT day, n_events,
                $Alpha * power(${1.0 - Alpha}, CAST(day_idx AS DOUBLE)) *
                  SUM(CAST(n_events AS DOUBLE) *
                    power(${1.0 - Alpha}, -CAST(day_idx AS DOUBLE)))
                  OVER (ORDER BY day ASC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS ewma
              FROM grid
            ), emitted AS (
              SELECT * FROM read_parquet(
                '${graft.QueryDef.OutDirToken}/q165_ewma_daily/*.parquet')
            )
            SELECT e.day, e.n_events, e.ewma
            FROM emitted e JOIN ref r
              ON e.day = r.day AND e.n_events = r.n_events
            WHERE abs(e.ewma - r.ewma) < 1e-6"""),
    "EWMA daily smoother: scaled running sum, tolerance oracle [time-series]")

  /** q169: STL-lite seasonal decomposition of daily order revenue —
    * trend = 7-day centered moving average (full windows only),
    * seasonal = day-of-week mean of the detrended series, residual =
    * observed − trend − seasonal. The classical additive decomposition
    * a demand-forecasting pipeline runs before modeling, kept exact:
    * the trend window sums integers over a RANGE frame keyed on the
    * epoch-day index (so calendar gaps shrink the window and the
    * full-window filter drops the edge days, instead of rows-frames
    * silently spanning gaps), and the detrended series is folded at
    * the ×7 integer scale (7·rev − Σ₇rev) so the day-of-week means are
    * integer sums with ONE final division.
    *
    * Scale: the corpus pays one day-keyed aggregate; everything after
    * runs on the daily frame, which is calendar-bounded (~2.4k rows
    * per 7 years regardless of data size) — the global-ordered trend
    * window is explicitly safe for the same reason. The 7-row seasonal
    * frame broadcasts back.
    *
    * Exactness: day-of-week is epoch-day mod 7 (engine-agnostic, no
    * locale); trend/seasonal/residual are fixed IEEE sequences over
    * integer-exact operands — direct hash-compared oracle, no
    * tolerance.
    */
  private val q169 = QueryDef(
    (s, d) => {
      val daily = load(s, d, "orders")
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(sum(graft.common.Exact.cents(col("o_totalprice")))
          .as("rev_cents"))
        .withColumn("day_idx",
          datediff(col("day"), lit("1970-01-01").cast("date"))
            .cast("long"))
        .withColumn("dow", (col("day_idx") % 7).cast("long"))
      val w = Window.orderBy(col("day_idx")).rangeBetween(-3, 3)
      val withTrend = daily
        .withColumn("trend7_cents", sum("rev_cents").over(w))
        .withColumn("n7", count(lit(1)).over(w))
        .filter(col("n7") === 7)
        .withColumn("d7", lit(7L) * col("rev_cents") - col("trend7_cents"))
      val seasonal = withTrend.groupBy(col("dow"))
        .agg(sum("d7").as("s_num"),
          count(lit(1)).cast("long").as("s_cnt"))
        .select(col("dow"),
          (col("s_num").cast("double") /
            (lit(7.0) * col("s_cnt").cast("double"))).as("seasonal"))
      withTrend
        .join(broadcast(seasonal), Seq("dow"))
        .select(col("day"), col("dow"), col("rev_cents"),
          col("trend7_cents"),
          (col("trend7_cents").cast("double") / 7.0).as("trend"),
          col("seasonal"),
          (col("rev_cents").cast("double") -
            col("trend7_cents").cast("double") / 7.0 - col("seasonal"))
            .as("residual"))
    },
    Some(s"""WITH daily AS (
              SELECT CAST(o_orderdate AS DATE) AS day,
                CAST(SUM(${graft.common.Exact.centsSql("o_totalprice")})
                  AS BIGINT) AS rev_cents
              FROM orders GROUP BY 1
            ), idx AS (
              SELECT day, rev_cents,
                CAST(date_diff('day', DATE '1970-01-01', day) AS BIGINT)
                  AS day_idx,
                CAST(date_diff('day', DATE '1970-01-01', day) % 7
                  AS BIGINT) AS dow
              FROM daily
            ), tr AS (
              SELECT day, dow, rev_cents,
                CAST(SUM(rev_cents) OVER w AS BIGINT) AS trend7_cents,
                COUNT(*) OVER w AS n7
              FROM idx
              WINDOW w AS (ORDER BY day_idx
                RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING)
            ), full7 AS (
              SELECT day, dow, rev_cents, trend7_cents,
                7 * rev_cents - trend7_cents AS d7
              FROM tr WHERE n7 = 7
            ), seas AS (
              SELECT dow,
                CAST(SUM(d7) AS BIGINT) AS s_num,
                CAST(COUNT(*) AS BIGINT) AS s_cnt
              FROM full7 GROUP BY 1
            )
            SELECT f.day, f.dow, f.rev_cents, f.trend7_cents,
              CAST(f.trend7_cents AS DOUBLE) / 7.0 AS trend,
              CAST(s.s_num AS DOUBLE) / (7.0 * CAST(s.s_cnt AS DOUBLE))
                AS seasonal,
              CAST(f.rev_cents AS DOUBLE)
                - CAST(f.trend7_cents AS DOUBLE) / 7.0
                - CAST(s.s_num AS DOUBLE) / (7.0 * CAST(s.s_cnt AS DOUBLE))
                AS residual
            FROM full7 f JOIN seas s ON f.dow = s.dow"""),
    "STL-lite seasonal decomposition: integer trend/seasonal folds, exact residual [time-series]")

  /** q179: rolling 30-observation Pearson correlation between daily
    * revenue and daily order count — "is growth price- or volume-
    * driven this month": the co-movement monitor over the trailing
    * window. Window moments (Σx, Σy, Σxy, Σx², Σy², all five from ONE
    * frame — q143's discipline, windowed) are DECIMAL(38,0) sums —
    * squared daily cents overflow i64 at fleet scale — so every
    * emitted integer is exact; r is a fixed IEEE chain over them with
    * the zero-variance case emitted as NULL via an exact integer
    * guard (never a float ==0 test).
    *
    * Rows frame (last 30 OBSERVED days, trading-days style), full
    * windows only; the window runs on the calendar-bounded day frame
    * (q169's safety argument). Oracle is derived for `corr30` only:
    * DuckDB's HUGEINT→DOUBLE cast is not correctly rounded above 2^53
    * (the q176 finding), so the moment evidence joins bit-exactly and
    * the float chain is admitted within 1e-9.
    */
  private val q179 = QueryDef(
    (s, d) => {
      val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
      val daily = load(s, d, "orders")
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(sum(graft.common.Exact.cents(col("o_totalprice"))).as("x"),
          graft.common.Exact.lcountAll.as("y"))
      val w = Window.orderBy(col("day").asc).rowsBetween(-29, 0)
      val m = daily
        .withColumn("n30", count(lit(1)).over(w))
        .withColumn("sx", sum(col("x").cast(dec38)).over(w))
        .withColumn("sy", sum(col("y").cast(dec38)).over(w))
        .withColumn("sxy",
          sum(col("x").cast(dec38) * col("y").cast(dec38)).over(w))
        .withColumn("sxx",
          sum(col("x").cast(dec38) * col("x").cast(dec38)).over(w))
        .withColumn("syy",
          sum(col("y").cast(dec38) * col("y").cast(dec38)).over(w))
        .filter(col("n30") === 30)
        .withColumn("varx",
          lit(30).cast(dec38) * col("sxx") - col("sx") * col("sx"))
        .withColumn("vary",
          lit(30).cast(dec38) * col("syy") - col("sy") * col("sy"))
      m.select(col("day"), col("x").as("rev_cents"),
        col("y").as("n_orders"),
        when(col("varx") === lit(0).cast(dec38) ||
          col("vary") === lit(0).cast(dec38), lit(null).cast("double"))
          .otherwise(
            (lit(30).cast(dec38) * col("sxy") - col("sx") * col("sy"))
              .cast("double") /
              (sqrt(col("varx").cast("double")) *
                sqrt(col("vary").cast("double")))).as("corr30"))
    },
    Some(s"""WITH daily AS (
              SELECT CAST(o_orderdate AS DATE) AS day,
                CAST(SUM(${graft.common.Exact.centsSql("o_totalprice")})
                  AS BIGINT) AS x,
                CAST(COUNT(*) AS BIGINT) AS y
              FROM orders GROUP BY 1
            ), m AS (
              SELECT day, x, y,
                COUNT(*) OVER w AS n30,
                SUM(CAST(x AS HUGEINT)) OVER w AS sx,
                SUM(CAST(y AS HUGEINT)) OVER w AS sy,
                SUM(CAST(x AS HUGEINT) * y) OVER w AS sxy,
                SUM(CAST(x AS HUGEINT) * x) OVER w AS sxx,
                SUM(CAST(y AS HUGEINT) * y) OVER w AS syy
              FROM daily
              WINDOW w AS (ORDER BY day
                ROWS BETWEEN 29 PRECEDING AND CURRENT ROW)
            ), ref AS (
              SELECT day, x, y,
                30 * sxx - sx * sx AS varx,
                30 * syy - sy * sy AS vary,
                30 * sxy - sx * sy AS cov
              FROM m WHERE n30 = 30
            ), emitted AS (
              SELECT * FROM read_parquet(
                '${QueryDef.OutDirToken}/q179_rolling_corr/*.parquet')
            )
            SELECT e.day, e.rev_cents, e.n_orders, e.corr30
            FROM emitted e JOIN ref r ON e.day = r.day
              AND e.rev_cents = r.x AND e.n_orders = r.y
            WHERE (e.corr30 IS NULL AND (r.varx = 0 OR r.vary = 0))
               OR abs(e.corr30 - CAST(r.cov AS DOUBLE) /
                    (sqrt(CAST(r.varx AS DOUBLE)) *
                     sqrt(CAST(r.vary AS DOUBLE)))) < 1e-9"""),
    "rolling 30-day revenue/volume correlation: windowed DECIMAL moments, tolerance oracle [time-series]")

  /** q189: seasonal-naive forecast backtest — every demand forecast is
    * judged against ŷ(t) = y(t−7), the same-weekday-last-week
    * baseline, so the engine ships the baseline itself: per-day actual
    * vs naive with integer absolute error and percentage error, plus
    * the corpus MAE as a window marginal (the q185 trick — the summary
    * is the detail frame's own marginal, no second pass).
    *
    * Scale: one corpus fold to the calendar-bounded day frame; the
    * t−7 lookup is a day-frame self-join keyed on the epoch-day index
    * (an explicit calendar join — a 7-ROW lag would silently misread
    * gapped series). Errors are exact integers; the two rates are
    * single divisions.
    */
  private val q189 = QueryDef(
    (s, d) => {
      val daily = load(s, d, "orders")
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(sum(graft.common.Exact.cents(col("o_totalprice")))
          .as("rev_cents"))
        .withColumn("day_idx",
          datediff(col("day"), lit("1970-01-01").cast("date"))
            .cast("long"))
      val lastWeek = daily.select(
        (col("day_idx") + 7L).as("day_idx"),
        col("rev_cents").as("naive_cents"))
      val wAll = Window.partitionBy()
      daily.join(lastWeek, Seq("day_idx"))
        .withColumn("abs_err_cents",
          abs(col("rev_cents") - col("naive_cents")))
        .select(col("day"), col("rev_cents"), col("naive_cents"),
          col("abs_err_cents"),
          (col("abs_err_cents").cast("double") /
            col("rev_cents").cast("double")).as("ape"),
          (sum("abs_err_cents").over(wAll).cast("double") /
            count(lit(1)).over(wAll).cast("double")).as("mae_cents"))
    },
    Some(s"""WITH daily AS (
              SELECT CAST(o_orderdate AS DATE) AS day,
                CAST(SUM(${graft.common.Exact.centsSql("o_totalprice")})
                  AS BIGINT) AS rev_cents,
                CAST(date_diff('day', DATE '1970-01-01',
                  CAST(o_orderdate AS DATE)) AS BIGINT) AS day_idx
              FROM orders GROUP BY 1, 3
            ), j AS (
              SELECT a.day, a.rev_cents, b.rev_cents AS naive_cents,
                abs(a.rev_cents - b.rev_cents) AS abs_err_cents
              FROM daily a JOIN daily b ON a.day_idx = b.day_idx + 7
            )
            SELECT day, rev_cents, naive_cents,
              CAST(abs_err_cents AS BIGINT) AS abs_err_cents,
              CAST(abs_err_cents AS DOUBLE) / CAST(rev_cents AS DOUBLE)
                AS ape,
              CAST(SUM(abs_err_cents) OVER () AS DOUBLE) /
                CAST(COUNT(*) OVER () AS DOUBLE) AS mae_cents
            FROM j"""),
    "seasonal-naive backtest: calendar t-7 join, integer errors, marginal MAE [time-series]")

  /** q209: CUSUM changepoint scan over daily order revenue — for each
    * day i, S_i = n·prefix_i − i·total (the cumulative deviation from
    * the all-period mean, cleared of division by scaling through n),
    * peaking at the most likely level-shift location; the monitoring
    * primitive behind "did revenue structurally move, and when".
    *
    * Scale: the corpus pays ONE day-keyed fold (map-side combined to
    * |days| rows, then localCheckpoint — three consumers of the fold
    * must not become three corpus scans); everything after rides
    * calendar-bounded frames (the q203 precedent for an unpartitioned
    * window), including the peak scan as two stacked full-frame
    * window passes. Integer bounds: n·prefix ≤ |days|·total_cents —
    * i64-safe to ~10¹⁴ cents of corpus revenue per ~3.6k-day history;
    * past that the scaled terms switch to DECIMAL(38,0) (the q142
    * discipline).
    *
    * Exactness: pure i64 (cents, indexes, scaled deviations); the
    * peak flag is an exact integer argmax with earliest-day tiebreak.
    */
  private val q209 = QueryDef(
    (s, d) => {
      val daily = load(s, d, "orders")
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(sum(graft.common.Exact.cents(col("o_totalprice")))
          .as("day_cents"))
        .localCheckpoint()
      val stats = daily.agg(
        graft.common.Exact.lcountAll.as("n_days"),
        sum(col("day_cents")).as("total_cents"))
      val w = Window.orderBy(col("day").asc)
      val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val full = w.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      daily.crossJoin(broadcast(stats))
        .withColumn("day_idx", row_number().over(w).cast("long"))
        .withColumn("prefix_cents", sum(col("day_cents")).over(cum))
        .withColumn("s_scaled",
          col("n_days") * col("prefix_cents") -
            col("day_idx") * col("total_cents"))
        .withColumn("mxabs", max(abs(col("s_scaled"))).over(full))
        .withColumn("peak_day",
          min(when(abs(col("s_scaled")) === col("mxabs"), col("day")))
            .over(full))
        .select(col("day"), col("day_cents"), col("day_idx"),
          col("prefix_cents"), col("s_scaled"),
          (abs(col("s_scaled")) === col("mxabs") &&
            col("day") === col("peak_day")).as("is_peak"))
    },
    Some(s"""WITH daily AS (
              SELECT CAST(o_orderdate AS DATE) AS day,
                CAST(SUM(${graft.common.Exact.centsSql("o_totalprice")})
                  AS BIGINT) AS day_cents
              FROM orders GROUP BY 1
            ), st AS (
              SELECT CAST(count(*) AS BIGINT) AS n_days,
                CAST(SUM(day_cents) AS BIGINT) AS total_cents
              FROM daily
            ), c AS (
              SELECT day, day_cents,
                CAST(ROW_NUMBER() OVER (ORDER BY day ASC) AS BIGINT)
                  AS day_idx,
                CAST(SUM(day_cents) OVER (ORDER BY day ASC
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS prefix_cents,
                n_days, total_cents
              FROM daily, st
            ), sc AS (
              SELECT day, day_cents, day_idx, prefix_cents,
                n_days * prefix_cents - day_idx * total_cents AS s_scaled
              FROM c
            ), m AS (
              SELECT MAX(ABS(s_scaled)) AS mxabs FROM sc
            ), p AS (
              SELECT MIN(day) AS peak_day FROM sc, m
              WHERE ABS(s_scaled) = mxabs
            )
            SELECT day, day_cents, day_idx, prefix_cents,
              CAST(s_scaled AS BIGINT) AS s_scaled,
              (ABS(s_scaled) = m.mxabs AND day = p.peak_day) AS is_peak
            FROM sc, m, p"""),
    "CUSUM changepoint: scaled integer deviations, exact argmax flag [time-series]")

  /** Maximum autocorrelation lag (days) q216 reports. */
  private val MaxLag = 7

  /** q216: exact autocorrelation function of daily revenue at lags
    * 1..$MaxLag days — the seasonality readout behind q169's fixed
    * day-of-week decomposition and q189's lag-7 naive forecast: the
    * ACF says WHICH lag carries the signal instead of assuming 7.
    *
    * The series is the zero-filled calendar spine (a missing day is a
    * real 0-revenue observation, q144's convention), so lags are
    * calendar days, not row offsets. The estimator is the standard
    * fixed-mean ACF r_ℓ = Σ(x_t−x̄)(x_{t+ℓ}−x̄) / Σ(x_t−x̄)², cleared
    * of the rational mean by n²: with S = Σx,
    *   num_ℓ·n² = n²·Σ x_t·x_{t+ℓ} − n·S·(Σhead + Σtail) + (n−ℓ)·S²
    *   den·n²   = n²·Σx² − n·S²
    * — all integers, so both engines agree bitwise; r_ℓ is one double
    * division at the edge. Accumulators are 128-bit (DECIMAL(38,0) /
    * HUGEINT): exact while n²·Σx² < 10³⁸, i.e. daily totals to ~10¹⁴
    * cents on a ~10-year spine; past that, rescale the unit (q214's
    * discipline). The n²-scaled evidence is EMITTED as canonical
    * decimal STRINGs (the q89 surface rule — driver hashing handles
    * STRING, not DECIMAL, and these moments genuinely exceed i64).
    *
    * Scale: the corpus pays ONE date-keyed fold (map-side combined);
    * the spine, the lag self-join (|days|·$MaxLag rows), and the
    * scalar attach all run on the calendar-bounded daily frame —
    * checkpointed once so the fold isn't re-derived per lag.
    */
  private val q216 = QueryDef(
    (s, d) => {
      val daily = load(s, d, "orders")
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(sum(graft.common.Exact.cents(col("o_totalprice")))
          .as("day_cents"))
        .localCheckpoint()
      val bounds = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      val spine = bounds
        .select(explode(sequence(col("d0"), col("d1"))).as("day"))
        .join(daily, Seq("day"), "left")
        .select(col("day"), coalesce(col("day_cents"), lit(0L)).as("x"))
        .localCheckpoint()
      val stats = spine.agg(
        graft.common.Exact.lcountAll.as("n_days"),
        sum(col("x")).as("s_total"),
        sum(col("x").cast("decimal(38,0)") * col("x")).as("sx2"))
      val lagged = spine
        .withColumn("lag", explode(sequence(lit(1L), lit(MaxLag.toLong))))
      val pairs = lagged.as("a").join(spine.as("b"),
          col("b.day") === date_add(col("a.day"), col("lag").cast("int")))
        .select(col("lag"), col("a.x").as("xa"), col("b.x").as("xb"))
      val nD = col("n_days").cast("decimal(38,0)")
      val sT = col("s_total").cast("decimal(38,0)")
      pairs.groupBy(col("lag"))
        .agg(graft.common.Exact.lcountAll.as("n_pairs"),
          sum(col("xa").cast("decimal(38,0)") * col("xb")).as("cross_sum"),
          sum(col("xa")).as("head_sum"),
          sum(col("xb")).as("tail_sum"))
        .crossJoin(broadcast(stats))
        .select(col("lag"), col("n_pairs"),
          (nD * nD * col("cross_sum") -
            nD * sT * (col("head_sum") + col("tail_sum")).cast("decimal(38,0)") +
            col("n_pairs").cast("decimal(38,0)") * sT * sT)
            .cast("decimal(38,0)").as("num_scaled"),
          (nD * nD * col("sx2") - nD * sT * sT)
            .cast("decimal(38,0)").as("den_scaled"))
        .select(col("lag"), col("n_pairs"),
          col("num_scaled").cast("string").as("num_scaled"),
          col("den_scaled").cast("string").as("den_scaled"),
          when(col("den_scaled") === lit(0).cast("decimal(38,0)"), lit(null))
            .otherwise(col("num_scaled").cast("double") /
              col("den_scaled").cast("double")).as("acf"))
    },
    Some(s"""WITH daily AS (
              SELECT CAST(o_orderdate AS DATE) AS day,
                CAST(SUM(${graft.common.Exact.centsSql("o_totalprice")})
                  AS BIGINT) AS day_cents
              FROM orders GROUP BY 1
            ), b AS (
              SELECT MIN(day) AS d0, MAX(day) AS d1 FROM daily
            ), spine AS (
              SELECT CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
              FROM b
            ), x AS (
              SELECT s.day, COALESCE(day_cents, 0) AS x
              FROM spine s LEFT JOIN daily ON s.day = daily.day
            ), st AS (
              SELECT CAST(COUNT(*) AS HUGEINT) AS n_days,
                CAST(SUM(x) AS HUGEINT) AS s_total,
                SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sx2
              FROM x
            ), lags AS (
              SELECT CAST(l AS BIGINT) AS lag
              FROM generate_series(1, $MaxLag) t(l)
            ), pairs AS (
              SELECT l.lag, a.x AS xa, b2.x AS xb
              FROM x a CROSS JOIN lags l
              JOIN x b2 ON date_diff('day', a.day, b2.day) = l.lag
            ), g AS (
              SELECT lag, CAST(COUNT(*) AS BIGINT) AS n_pairs,
                SUM(CAST(xa AS HUGEINT) * CAST(xb AS HUGEINT)) AS cross_sum,
                CAST(SUM(xa) AS HUGEINT) AS head_sum,
                CAST(SUM(xb) AS HUGEINT) AS tail_sum
              FROM pairs GROUP BY 1
            ), sc AS (
              SELECT lag, n_pairs,
                n_days * n_days * cross_sum
                  - n_days * s_total * (head_sum + tail_sum)
                  + CAST(n_pairs AS HUGEINT) * s_total * s_total
                  AS num_scaled,
                n_days * n_days * sx2 - n_days * s_total * s_total
                  AS den_scaled
              FROM g, st
            )
            SELECT lag, n_pairs,
              CAST(num_scaled AS VARCHAR) AS num_scaled,
              CAST(den_scaled AS VARCHAR) AS den_scaled,
              CASE WHEN den_scaled = 0 THEN NULL
                ELSE CAST(num_scaled AS DOUBLE) / CAST(den_scaled AS DOUBLE)
              END AS acf
            FROM sc"""),
    "exact daily-revenue ACF at lags 1..7: n2-scaled integer moments " +
      "on the calendar spine [time-series]")

  /** q220: Mann-Kendall trend test on daily revenue — the
    * distribution-free "is there a monotone trend" companion to
    * q209's CUSUM (which finds WHERE the level shifted) and q216's
    * ACF (which finds periodicity): S = Σ_{i<j} sign(x_j − x_i) over
    * all ordered day pairs, with the tie-corrected variance
    * 18·Var(S) = n(n−1)(2n+5) − Σ_t t(t−1)(2t+5) (t = tie-group
    * sizes) and the continuity-corrected z.
    *
    * Exactness: S, the tie correction, and 18·Var(S) are pure
    * integers (hash-exact); z needs one sqrt over integer-derived
    * doubles, which IEEE round-trips bitwise on both engines (q218 /
    * q143 discipline). Continuity correction: z = (S−1)/σ for S>0,
    * (S+1)/σ for S<0, 0 for S=0 — integer branches, shared σ.
    *
    * Scale: the corpus pays ONE date-keyed fold (shared shape with
    * q209/q216); the O(|days|²) pair self-join (~3M rows on a 10-year
    * spine) and the tie census run entirely on the checkpointed
    * CALENDAR-BOUNDED daily frame — at 100 TB the pair count is
    * unchanged because the calendar is.
    */
  private val q220 = QueryDef(
    (s, d) => {
      val daily = load(s, d, "orders")
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(sum(graft.common.Exact.cents(col("o_totalprice")))
          .as("x"))
        .localCheckpoint()
      val sStat = daily.as("a").join(daily.as("b"),
          col("a.day") < col("b.day"))
        .agg(sum(signum(
          (col("b.x") - col("a.x")).cast("double")).cast("long"))
          .as("s_stat"))
      val ties = daily.groupBy(col("x"))
        .agg(graft.common.Exact.lcountAll.as("t"))
        .agg(sum(col("t") * (col("t") - 1L) * (lit(2L) * col("t") + 5L))
          .as("tie_term"))
      val base = daily.agg(graft.common.Exact.lcountAll.as("n_days"))
      sStat.crossJoin(broadcast(base)).crossJoin(broadcast(ties))
        .withColumn("var18",
          col("n_days") * (col("n_days") - 1L) *
            (lit(2L) * col("n_days") + 5L) - col("tie_term"))
        .select(col("n_days"), col("s_stat"), col("var18"),
          when(col("s_stat") > 0L,
            (col("s_stat") - 1L).cast("double") /
              sqrt(col("var18").cast("double") / lit(18.0)))
          .when(col("s_stat") < 0L,
            (col("s_stat") + 1L).cast("double") /
              sqrt(col("var18").cast("double") / lit(18.0)))
          .otherwise(lit(0.0)).as("z"))
    },
    Some(s"""WITH daily AS (
              SELECT CAST(o_orderdate AS DATE) AS day,
                CAST(SUM(${graft.common.Exact.centsSql("o_totalprice")})
                  AS BIGINT) AS x
              FROM orders GROUP BY 1
            ), sgn AS (
              SELECT CAST(SUM(sign(b.x - a.x)) AS BIGINT) AS s_stat
              FROM daily a JOIN daily b ON a.day < b.day
            ), ties AS (
              SELECT CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT)
                AS tie_term
              FROM (SELECT x, CAST(count(*) AS BIGINT) AS t
                    FROM daily GROUP BY 1)
            ), base AS (
              SELECT CAST(count(*) AS BIGINT) AS n_days FROM daily
            ), v AS (
              SELECT n_days, s_stat,
                n_days * (n_days - 1) * (2 * n_days + 5) - tie_term
                  AS var18
              FROM sgn, ties, base
            )
            SELECT n_days, s_stat, CAST(var18 AS BIGINT) AS var18,
              CASE WHEN s_stat > 0 THEN
                  CAST(s_stat - 1 AS DOUBLE)
                    / sqrt(CAST(var18 AS DOUBLE) / 18.0)
                WHEN s_stat < 0 THEN
                  CAST(s_stat + 1 AS DOUBLE)
                    / sqrt(CAST(var18 AS DOUBLE) / 18.0)
                ELSE 0.0 END AS z
            FROM v"""),
    "Mann-Kendall monotone-trend test: integer S + tie-corrected " +
      "variance on the calendar-bounded frame [time-series]")

  /** Spine-size cap for q221's driver-side median path: at 4096 days
    * (an 11-year daily spine) the slope multiset is C(4096,2) ≈ 8.4M
    * doubles = 67 MB — comfortably a bounded driver array; one step
    * past it the distributed globalOrder path takes over.
    */
  private[graft] val SenDriverSpineCap = 4096L

  /** Exact Theil-Sen (n_pairs, sen_slope) of a (day DATE, x BIGINT)
    * frame — the two-path selection shape q221's scaladoc documents:
    * spine ≤ cap collects and computes the exact median on the driver;
    * larger spines run the pair join cluster-side with a
    * range-partitioned global order instead of a one-partition rank
    * window. Package-visible so TimeSeriesSpec can pin the two paths'
    * equality by forcing the cap.
    */
  private[graft] def senSlope(s: org.apache.spark.sql.SparkSession,
      daily: org.apache.spark.sql.DataFrame,
      driverSpineCap: Long): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    // bounded collect: the calendar spine — one corpus fold, collected
    // once (a 300-year daily spine is 110k tiny rows); the path choice
    // below is about the O(spine²) slope ARRAY, not this collect
    val rows = daily
      .select(datediff(col("day"), lit("1970-01-01").cast("date"))
        .as("d"), col("x"))
      .collect()
    val nDays = rows.length.toLong
    val nPairs = nDays * (nDays - 1) / 2
    if (nPairs == 0L) {
      s.range(0).select(col("id").as("n_pairs"), lit(0.0).as("sen_slope"))
    } else if (nDays <= driverSpineCap) {
      // the O(spine²) slope array + positional median run in primitive
      // doubles on the driver — the q253/q227 bounded-driver-compute
      // class
      val ds = rows.map(_.getInt(0))
      val xs = rows.map(_.getLong(1))
      val slopes = new Array[Double](nPairs.toInt)
      var p = 0
      var i = 0
      while (i < ds.length) {
        var j = 0
        while (j < ds.length) {
          // identical IEEE expression to the distributed path/oracle:
          // (later x - earlier x) / (later day - earlier day)
          if (ds(j) > ds(i)) {
            slopes(p) = (xs(j) - xs(i)).toDouble / (ds(j) - ds(i)).toDouble
            p += 1
          }
          j += 1
        }
        i += 1
      }
      java.util.Arrays.sort(slopes)
      val v1 = slopes(((nPairs + 1) / 2).toInt - 1)
      val v2 = slopes(((nPairs + 2) / 2).toInt - 1)
      Seq((nPairs, (v1 + v2) / 2.0)).toDF("n_pairs", "sen_slope")
    } else {
      val dd = daily.localCheckpoint()
      val slopes = dd.as("a").join(dd.as("b"),
          col("a.day") < col("b.day"))
        .select(((col("b.x") - col("a.x")).cast("double") /
          datediff(col("b.day"), col("a.day")).cast("double"))
          .as("slope"))
      // ties among equal slope doubles permute only equal values, so
      // the positional pick is well-defined without a tiebreaker
      Curation.globalOrder(slopes, Seq(col("slope")))
        .filter(col("position") === (nPairs + 1) / 2 - 1 ||
          col("position") === (nPairs + 2) / 2 - 1)
        .groupBy(lit(nPairs).as("n_pairs"))
        .agg(((min(when(col("position") === (nPairs + 1) / 2 - 1,
            col("slope"))) +
          min(when(col("position") === (nPairs + 2) / 2 - 1,
            col("slope")))) / lit(2.0)).as("sen_slope"))
    }
  }

  /** q221: Theil–Sen slope of daily revenue — the robust trend
    * MAGNITUDE companion to q220's Mann-Kendall trend TEST (q220 says
    * "is there a monotone trend", this says "how many cents/day"): the
    * median of all pairwise slopes (x_j − x_i)/(day_j − day_i) over
    * ordered day pairs, immune to outlier days that wreck an OLS fit.
    *
    * Exactness: each slope is ONE IEEE division of integer-derived
    * doubles (exact cents difference / exact day difference), so both
    * engines materialize the identical double multiset; the median is
    * positional selection over that multiset (rank arithmetic is
    * integer `div`; equal doubles make tie order irrelevant) and the
    * even-n midpoint is one fixed (a+b)/2 chain — hash-exact, no
    * tolerance contract.
    *
    * Scale: the corpus pays ONE date-keyed fold to the CALENDAR-
    * BOUNDED daily frame (2.4k rows on the 10-year test spine,
    * invariant to corpus size) — everything after is spine-sized, not
    * corpus-sized. Round 13 profiled the old rendering (distributed
    * O(days²) pair join + Exchange SinglePartition rank window over
    * the ~3M-slope frame) at 2.6-3.1 s, ~90% of it the one-partition
    * sort plus scheduler/shuffle overhead moving a frame that fits in
    * one array — the exact q253 situation ("the distributed rendering
    * measured 3.4 s of pure scheduler overhead"). So, like q253's
    * dim²-bounded gram and q227's spine-array fold, the daily frame
    * COLLECTS (≤ [[SenDriverSpineCap]] rows — bounded by the
    * calendar, documented driver-collect class) and the O(spine²)
    * slope multiset + exact positional median compute in a primitive
    * double array on the driver: ~8.4M slopes / 67 MB at the 4096-day
    * cap, Arrays.sort + two picks, milliseconds against the old plan's
    * seconds. Each slope is the same ONE IEEE division both the old
    * plan and the oracle evaluate, and java.util.Arrays.sort(double[])
    * is a total order on the same multiset, so the selected values are
    * bit-identical. Past the cap (a >11-year spine) the DISTRIBUTED
    * path takes over: the pair join runs cluster-side and the median
    * positions come from [[Curation.globalOrder]] (range-repartitioned
    * sort + per-partition offsets — no one-partition window at any
    * size; ties across duplicate slope doubles permute only EQUAL
    * values, so positional selection is unaffected). Both paths are
    * exact; TimeSeriesSpec pins their equality on the test corpus.
    */
  private val q221 = QueryDef(
    (s, d) => {
      val daily = load(s, d, "orders")
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(sum(graft.common.Exact.cents(col("o_totalprice")))
          .as("x"))
      senSlope(s, daily, SenDriverSpineCap)
    },
    Some(s"""WITH daily AS (
              SELECT CAST(o_orderdate AS DATE) AS day,
                CAST(SUM(${graft.common.Exact.centsSql("o_totalprice")})
                  AS BIGINT) AS x
              FROM orders GROUP BY 1
            ), slopes AS (
              SELECT CAST(b.x - a.x AS DOUBLE)
                  / CAST(date_diff('day', a.day, b.day) AS DOUBLE)
                  AS slope
              FROM daily a JOIN daily b ON a.day < b.day
            ), r AS (
              SELECT slope,
                ROW_NUMBER() OVER (ORDER BY slope) AS rn,
                CAST(COUNT(*) OVER () AS BIGINT) AS n_pairs
              FROM slopes
            )
            SELECT n_pairs,
              (MIN(CASE WHEN rn = (n_pairs + 1) // 2 THEN slope END)
               + MIN(CASE WHEN rn = (n_pairs + 2) // 2 THEN slope END))
                / 2.0 AS sen_slope
            FROM r
            WHERE rn IN ((n_pairs + 1) // 2, (n_pairs + 2) // 2)
            GROUP BY 1"""),
    "Theil-Sen robust trend slope: median pairwise slope on the " +
      "calendar-bounded frame [time-series]")

  /** Trend-smoothing factor of q227's Holt recursion (β; the level
    * factor reuses q165's [[Alpha]]).
    */
  private val HoltBeta = 0.1

  /** q227: Holt's linear (double-exponential) smoothing of the daily
    * event volume with a one-step-ahead forecast backtest — the
    * trend-aware upgrade of q165's EWMA (EWMA assumes a level; Holt
    * carries level l and trend b: l_t = α·x_t + (1−α)(l_{t−1}+b_{t−1}),
    * b_t = β(l_t−l_{t−1}) + (1−β)b_{t−1}, forecast f_t = l_{t−1}+b_{t−1}),
    * initialized l_1 = x_1, b_1 = 0. Unlike EWMA there is NO
    * prefix-sum closed form (the level/trend recursions are coupled),
    * so this is computed as an ORDERED ARRAY FOLD: the calendar-bounded
    * daily series collects into one array row (sorted by day index) and
    * a single `aggregate` higher-order function runs the recursion,
    * emitting (level, trend, forecast) per day, exploded back to rows.
    *
    * Scale: the corpus pays one day-keyed count fold; the collected
    * array is the CALENDAR-BOUNDED spine (30 rows here, ~2.4k on a
    * 7-year spine — invariant to corpus size), so the single-row fold
    * is bounded work by the q164/q165 spine argument.
    *
    * Exactness: day counts are exact integers; the recursion is a
    * fixed sequence of IEEE +,−,× over them, evaluated in the SAME
    * order by the fold here and the oracle's recursive CTE (each op is
    * correctly rounded and neither engine fuses across operators), so
    * the whole cascade — and the abs forecast errors — compare
    * hash-exact with no tolerance contract.
    */
  private val q227 = QueryDef(
    (s, d) => {
      val daily = load(s, d, "events")
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
      val spine = s.range(1).select(explode(sequence(
        to_date(lit(DayFrom)), to_date(lit(DayTo)))).as("day"))
      val grid = spine.join(daily, Seq("day"), "left")
        .select(col("day"), coalesce(col("n"), lit(0L)).as("n_events"),
          (datediff(col("day"), to_date(lit(DayFrom))) + 1).cast("int")
            .as("day_idx"))
      def x(v: org.apache.spark.sql.Column) = v.getField("n_events").cast("double")
      def lNew(a: org.apache.spark.sql.Column, v: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
        when(v.getField("day_idx") === 1, x(v))
          .otherwise(lit(Alpha) * x(v) +
            lit(1.0 - Alpha) * (a.getField("l") + a.getField("b")))
      def bNew(a: org.apache.spark.sql.Column, v: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
        when(v.getField("day_idx") === 1, lit(0.0))
          .otherwise(lit(HoltBeta) * (lNew(a, v) - a.getField("l")) +
            lit(1.0 - HoltBeta) * a.getField("b"))
      def fc(a: org.apache.spark.sql.Column, v: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
        when(v.getField("day_idx") === 1, lit(null).cast("double"))
          .otherwise(a.getField("l") + a.getField("b"))
      val zero = struct(lit(0.0).as("l"), lit(0.0).as("b"),
        expr("cast(array() as array<struct<" +
          "day:date,n_events:bigint,level:double,trend:double," +
          "forecast:double>>)").as("out"))
      val folded = aggregate(
        col("xs"), zero,
        (a, v) => struct(
          lNew(a, v).as("l"), bNew(a, v).as("b"),
          concat(a.getField("out"), array(struct(
            v.getField("day").as("day"),
            v.getField("n_events").as("n_events"),
            lNew(a, v).as("level"), bNew(a, v).as("trend"),
            fc(a, v).as("forecast")))).as("out")),
        a => a.getField("out"))
      grid
        .agg(sort_array(collect_list(
          struct(col("day_idx"), col("day"), col("n_events")))).as("xs"))
        .select(explode(folded).as("r"))
        .select(col("r.day").as("day"), col("r.n_events").as("n_events"),
          col("r.level").as("level"), col("r.trend").as("trend"),
          col("r.forecast").as("forecast"),
          abs(col("r.n_events").cast("double") - col("r.forecast"))
            .as("abs_err"))
    },
    Some(s"""WITH RECURSIVE daily AS (
              SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                CAST(count(*) AS BIGINT) AS n
              FROM events GROUP BY 1
            ), spine AS (
              SELECT CAST(g.gs AS DATE) AS day FROM
                (SELECT unnest(generate_series(DATE '$DayFrom',
                  DATE '$DayTo', INTERVAL 1 DAY)) AS gs) g
            ), grid AS (
              SELECT s.day, COALESCE(d.n, 0) AS n_events,
                CAST(date_diff('day', DATE '$DayFrom', s.day) + 1
                  AS INTEGER) AS day_idx
              FROM spine s LEFT JOIN daily d ON s.day = d.day
            ), rec AS (
              SELECT day_idx, CAST(n_events AS DOUBLE) AS l,
                CAST(0.0 AS DOUBLE) AS b
              FROM grid WHERE day_idx = 1
              UNION ALL
              SELECT g.day_idx,
                CAST($Alpha AS DOUBLE) * CAST(g.n_events AS DOUBLE)
                  + CAST(${1.0 - Alpha} AS DOUBLE) * (r.l + r.b),
                CAST($HoltBeta AS DOUBLE) *
                  ((CAST($Alpha AS DOUBLE) * CAST(g.n_events AS DOUBLE)
                    + CAST(${1.0 - Alpha} AS DOUBLE) * (r.l + r.b)) - r.l)
                  + CAST(${1.0 - HoltBeta} AS DOUBLE) * r.b
              FROM rec r JOIN grid g ON g.day_idx = r.day_idx + 1
            )
            SELECT g.day, g.n_events, r.l AS level, r.b AS trend,
              p.l + p.b AS forecast,
              abs(CAST(g.n_events AS DOUBLE) - (p.l + p.b)) AS abs_err
            FROM grid g
            JOIN rec r ON r.day_idx = g.day_idx
            LEFT JOIN rec p ON p.day_idx = g.day_idx - 1"""),
    "Holt double-exponential smoothing + one-step backtest: ordered " +
      "array fold on the calendar-bounded spine [time-series]")

  /** q231: Kendall's tau-b between daily order count and daily revenue
    * — completing the correlation family (q143 Pearson measures linear
    * association, q214 Spearman monotone-by-ranks, tau-b monotone by
    * CONCORDANT PAIRS with explicit tie correction — the estimator of
    * choice when tied days are common, and the pairwise machinery is
    * q220's Mann-Kendall applied to two observed series instead of
    * series-vs-time). Reports the full integer pair census (concordant,
    * discordant, x-ties, y-ties) beside the coefficient, so the reader
    * can audit the denominator.
    *
    * Scale: one date-keyed corpus fold, then the O(|days|²) pair join
    * runs on the checkpointed CALENDAR-BOUNDED daily frame (q220's
    * argument — pair count invariant to corpus size).
    *
    * Exactness: every census count is an exact integer; tau-b is
    * S / sqrt((n0−n1)·(n0−n2)) — two subtractions, one product, one
    * sqrt, one division over integer-derived doubles, the identical
    * IEEE chain in both engines (q218's sqrt rule) → hash-exact.
    */
  private val q231 = QueryDef(
    (s, d) => {
      val daily = load(s, d, "orders")
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(graft.common.Exact.lcountAll.as("nx"),
          sum(graft.common.Exact.cents(col("o_totalprice"))).as("y"))
        .localCheckpoint()
      val census = daily.as("a").join(daily.as("b"),
          col("a.day") < col("b.day"))
        .select(
          (signum((col("b.nx") - col("a.nx")).cast("double")) *
            signum((col("b.y") - col("a.y")).cast("double")))
            .cast("long").as("sg"),
          (col("a.nx") === col("b.nx")).cast("long").as("tx"),
          (col("a.y") === col("b.y")).cast("long").as("ty"))
        .agg(graft.common.Exact.lcountAll.as("n_pairs"),
          sum(when(col("sg") === 1L, 1L).otherwise(0L)).as("n_concordant"),
          sum(when(col("sg") === -1L, 1L).otherwise(0L)).as("n_discordant"),
          sum(col("tx")).as("ties_x"), sum(col("ty")).as("ties_y"))
      val base = daily.agg(graft.common.Exact.lcountAll.as("n_days"))
      census.crossJoin(broadcast(base))
        .withColumn("s_stat", col("n_concordant") - col("n_discordant"))
        .select(col("n_days"), col("n_pairs"), col("n_concordant"),
          col("n_discordant"), col("ties_x"), col("ties_y"),
          col("s_stat"),
          (col("s_stat").cast("double") /
            sqrt((col("n_pairs") - col("ties_x")).cast("double") *
              (col("n_pairs") - col("ties_y")).cast("double")))
            .as("tau_b"))
    },
    Some(s"""WITH daily AS (
              SELECT CAST(o_orderdate AS DATE) AS day,
                CAST(count(*) AS BIGINT) AS nx,
                CAST(SUM(${graft.common.Exact.centsSql("o_totalprice")})
                  AS BIGINT) AS y
              FROM orders GROUP BY 1
            ), pairs AS (
              SELECT CAST(sign(b.nx - a.nx) * sign(b.y - a.y) AS BIGINT)
                  AS sg,
                CAST(a.nx = b.nx AS BIGINT) AS tx,
                CAST(a.y = b.y AS BIGINT) AS ty
              FROM daily a JOIN daily b ON a.day < b.day
            ), census AS (
              SELECT CAST(count(*) AS BIGINT) AS n_pairs,
                CAST(SUM(CASE WHEN sg = 1 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_concordant,
                CAST(SUM(CASE WHEN sg = -1 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_discordant,
                CAST(SUM(tx) AS BIGINT) AS ties_x,
                CAST(SUM(ty) AS BIGINT) AS ties_y
              FROM pairs
            ), base AS (
              SELECT CAST(count(*) AS BIGINT) AS n_days FROM daily
            )
            SELECT n_days, n_pairs, n_concordant, n_discordant,
              ties_x, ties_y,
              n_concordant - n_discordant AS s_stat,
              CAST(n_concordant - n_discordant AS DOUBLE) /
                sqrt(CAST(n_pairs - ties_x AS DOUBLE)
                     * CAST(n_pairs - ties_y AS DOUBLE)) AS tau_b
            FROM census, base"""),
    "Kendall tau-b with integer pair census: bounded pair join, " +
      "hash-exact [time-series]")

  /** Lag range (±days) of q232's cross-correlation scan. */
  private val CcfMaxLag = 7

  /** q232: exact cross-correlation function between daily BOOKED
    * revenue (orders) and daily SHIPPED quantity (lineitem) at lags
    * −$CcfMaxLag..+$CcfMaxLag — q216's ACF generalized to TWO series
    * from TWO fact tables: the lead-lag readout ("orders booked today
    * move shipments how many days later?") a supply-chain planner reads
    * before fitting any transfer model. Positive lag correlates today's
    * bookings with shipments ℓ days LATER.
    *
    * Both series live on the JOINT zero-filled calendar spine (q144's
    * convention), with full-series means/variances (the standard CCF
    * estimator): r_ℓ = [n²·Σx_t y_{t+ℓ} − n·S_x·T_y(ℓ) − n·S_y·T_x(ℓ)
    * + n_ℓ·S_x·S_y] / (n · √(n·Σx²−S_x²) · √(n·Σy²−S_y²)) — the
    * numerator cleared of rational means by n² exactly as q216 does.
    *
    * Scale: each corpus pays ONE date-keyed fold; the spine, the ±lag
    * join (|days|·(2·$CcfMaxLag+1) rows), and the scalar attach run on
    * the checkpointed calendar-bounded frame. Accumulators are
    * DECIMAL(38,0) — exact to the q216-documented bound — and the
    * integer evidence is EMITTED as canonical decimal STRINGs (the
    * q89 surface rule; these n²-scaled moments exceed i64).
    *
    * Exactness: num/A/B are exact integers joined bit-exact by the
    * derived oracle. The terminal chain num / (n·√A·√B) is pinned-
    * association IEEE, but once the integer operands exceed 2^53 the
    * 128-bit→double CONVERSION itself diverges by 1 ulp between
    * engines (the JVM's decimal→double is correctly rounded; the
    * oracle engine's hugeint→double composes upper·2⁶⁴+lower in
    * doubles — double rounding), observed at sf0.1 as a 3.5e-18 ccf
    * difference. ccf therefore carries a 1e-12 derived-oracle
    * contract; every integer column still compares hash-exact.
    */
  private val q232 = QueryDef(
    (s, d) => {
      val dx = load(s, d, "orders")
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(sum(graft.common.Exact.cents(col("o_totalprice"))).as("v"))
      val dy = load(s, d, "lineitem")
        .groupBy(to_date(col("l_shipdate")).as("day"))
        .agg(sum(col("l_quantity").cast("long")).as("v"))
      val bounds = dx.select(col("day"))
        .union(dy.select(col("day")))
        .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      val spine = bounds
        .select(explode(sequence(col("d0"), col("d1"))).as("day"))
        .join(dx.withColumnRenamed("v", "xv"), Seq("day"), "left")
        .join(dy.withColumnRenamed("v", "yv"), Seq("day"), "left")
        .select(col("day"), coalesce(col("xv"), lit(0L)).as("x"),
          coalesce(col("yv"), lit(0L)).as("y"))
        .localCheckpoint()
      val stats = spine.agg(
        graft.common.Exact.lcountAll.as("n_days"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x").cast("decimal(38,0)") * col("x")).as("sxx"),
        sum(col("y").cast("decimal(38,0)") * col("y")).as("syy"))
      val lagged = spine.withColumn("lag",
        explode(sequence(lit(-CcfMaxLag.toLong), lit(CcfMaxLag.toLong))))
      val pairs = lagged.as("a").join(spine.as("b"),
          col("b.day") === date_add(col("a.day"), col("lag").cast("int")))
        .select(col("lag"), col("a.x").as("xa"), col("b.y").as("yb"))
      val nD = col("n_days").cast("decimal(38,0)")
      val sX = col("sx").cast("decimal(38,0)")
      val sY = col("sy").cast("decimal(38,0)")
      pairs.groupBy(col("lag"))
        .agg(graft.common.Exact.lcountAll.as("n_pairs"),
          sum(col("xa").cast("decimal(38,0)") * col("yb")).as("sxy"),
          sum(col("xa")).as("head_x"), sum(col("yb")).as("tail_y"))
        .crossJoin(broadcast(stats))
        .select(col("lag"), col("n_pairs"),
          (nD * nD * col("sxy") -
            nD * sX * col("tail_y").cast("decimal(38,0)") -
            nD * sY * col("head_x").cast("decimal(38,0)") +
            col("n_pairs").cast("decimal(38,0)") * sX * sY)
            .cast("decimal(38,0)").as("num_scaled"),
          (nD * col("sxx") - sX * sX).cast("decimal(38,0)").as("var_x"),
          (nD * col("syy") - sY * sY).cast("decimal(38,0)").as("var_y"),
          col("n_days"))
        .select(col("lag"), col("n_pairs"),
          col("num_scaled").cast("string").as("num_scaled"),
          col("var_x").cast("string").as("var_x"),
          col("var_y").cast("string").as("var_y"),
          when(col("var_x") === lit(0).cast("decimal(38,0)") ||
              col("var_y") === lit(0).cast("decimal(38,0)"), lit(null))
            .otherwise(col("num_scaled").cast("double") /
              (col("n_days").cast("double") *
                sqrt(col("var_x").cast("double")) *
                sqrt(col("var_y").cast("double")))).as("ccf"))
    },
    Some(s"""WITH dx AS (
              SELECT CAST(o_orderdate AS DATE) AS day,
                CAST(SUM(${graft.common.Exact.centsSql("o_totalprice")})
                  AS BIGINT) AS v
              FROM orders GROUP BY 1
            ), dy AS (
              SELECT CAST(l_shipdate AS DATE) AS day,
                CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS v
              FROM lineitem GROUP BY 1
            ), b AS (
              SELECT MIN(day) AS d0, MAX(day) AS d1 FROM
                (SELECT day FROM dx UNION ALL SELECT day FROM dy)
            ), spine AS (
              SELECT CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
              FROM b
            ), xy AS (
              SELECT s.day, COALESCE(dx.v, 0) AS x, COALESCE(dy.v, 0) AS y
              FROM spine s LEFT JOIN dx ON s.day = dx.day
              LEFT JOIN dy ON s.day = dy.day
            ), st AS (
              SELECT CAST(count(*) AS BIGINT) AS n_days,
                CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
                CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
                CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
              FROM xy
            ), lags AS (
              SELECT unnest(generate_series(-$CcfMaxLag, $CcfMaxLag, 1))
                AS lag
            ), pr AS (
              SELECT l.lag, a.x AS xa, b2.y AS yb
              FROM xy a CROSS JOIN lags l
              JOIN xy b2 ON b2.day = a.day + CAST(l.lag AS INTEGER)
            ), agg AS (
              SELECT lag, CAST(count(*) AS BIGINT) AS n_pairs,
                CAST(SUM(CAST(xa AS HUGEINT) * yb) AS HUGEINT) AS sxy,
                CAST(SUM(xa) AS BIGINT) AS head_x,
                CAST(SUM(yb) AS BIGINT) AS tail_y
              FROM pr GROUP BY 1
            ), ref AS (
              SELECT CAST(a.lag AS BIGINT) AS lag, a.n_pairs,
                CAST(st.n_days AS HUGEINT) * st.n_days * a.sxy
                  - CAST(st.n_days AS HUGEINT) * st.sx * a.tail_y
                  - CAST(st.n_days AS HUGEINT) * st.sy * a.head_x
                  + CAST(a.n_pairs AS HUGEINT) * st.sx * st.sy
                  AS num_scaled,
                CAST(st.n_days AS HUGEINT) * st.sxx
                  - CAST(st.sx AS HUGEINT) * st.sx AS var_x,
                CAST(st.n_days AS HUGEINT) * st.syy
                  - CAST(st.sy AS HUGEINT) * st.sy AS var_y,
                CAST(st.n_days AS DOUBLE) AS nd
              FROM agg a, st
            ), emitted AS (
              SELECT * FROM read_parquet(
                '${graft.QueryDef.OutDirToken}/q232_ship_ccf/*.parquet')
            )
            SELECT e.lag, e.n_pairs, e.num_scaled, e.var_x, e.var_y,
              e.ccf
            FROM emitted e JOIN ref r ON e.lag = r.lag
              AND e.n_pairs = r.n_pairs
              AND e.num_scaled = CAST(r.num_scaled AS VARCHAR)
              AND e.var_x = CAST(r.var_x AS VARCHAR)
              AND e.var_y = CAST(r.var_y AS VARCHAR)
            WHERE (e.ccf IS NULL AND (r.var_x = 0 OR r.var_y = 0))
               OR abs(e.ccf - CAST(r.num_scaled AS DOUBLE)
                    / (r.nd * sqrt(CAST(r.var_x AS DOUBLE))
                       * sqrt(CAST(r.var_y AS DOUBLE)))) < 1e-12"""),
    "two-table cross-correlation at ±7-day lags: bit-exact integer " +
      "moments, 1e-12 derived-oracle ccf [time-series]")

  /** q245's window half-width (±7 days) and the outlier gate: a point
    * is flagged when |x − med| > 3·1.4826·MAD, compared as INTEGERS
    * (|x−med|·10000 > 44478·MAD) so the decision is engine-exact —
    * 1.4826 is the Gaussian-consistency constant that makes MAD a σ
    * estimate.
    */
  private val HampelHalf = 7
  private val HampelGateNum = 44478L // ⌊3·1.4826·10000⌉

  /** q245: Hampel filter over the daily-revenue series — the rolling
    * median/MAD outlier detector (Pearson's robust sibling of the
    * q102/q187 z-score screens: a single spike inflates a rolling
    * MEAN AND its σ, masking itself; the median/MAD version doesn't
    * break until half the window is bad). Flags days whose revenue
    * sits more than 3 robust-σ from the ±7-day rolling median.
    *
    * Scale: the corpus folds once to the daily frame (calendar-
    * bounded, corpus-invariant). The rolling windows are EQUI-joins:
    * each day explodes into its 15 (offset → center) claims and the
    * join runs on the center date — a hash join on a bounded frame,
    * never a non-equi BNLJ and never a per-row window sort. Medians
    * of ≤15-value lists are local array picks. A second identical
    * pass computes the MAD around each center's median.
    *
    * Exactness: revenue is integer cents; both medians are LOWER
    * medians (element (n+1) div 2 of the sorted window — an actual
    * data value, no interpolation arithmetic), and the flag compares
    * scaled integers — every emitted cell is engine-exact, no doubles
    * anywhere.
    */
  private lazy val q245 = QueryDef(
    (s, d) => {
      // the daily fold has FIVE consumers downstream (both window
      // joins read `claims` twice, plus the final join) — materialize
      // the calendar-bounded frames once or each replays the corpus
      // aggregation (the q244/q249 cut)
      val daily = load(s, d, "orders")
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(sum(graft.common.Exact.cents(col("o_totalprice")))
          .as("r_cents"))
        .localCheckpoint()
      val offsets = sequence(lit(-HampelHalf), lit(HampelHalf))
      val claims = daily
        .select(col("day"), col("r_cents"), explode(offsets).as("off"))
        .select(date_add(col("day"), col("off")).as("center"),
          col("r_cents").as("v"))
        .localCheckpoint()
      val med = claims.groupBy(col("center"))
        .agg(sort_array(collect_list(col("v"))).as("vs"),
          count(lit(1)).as("nw"))
        .select(col("center"),
          element_at(col("vs"), ((col("nw") + 1) / 2).cast("int"))
            .as("med_cents"),
          col("nw"))
      val devClaims = claims.join(med, "center")
        .select(col("center"), abs(col("v") - col("med_cents")).as("dv"))
      val mad = devClaims.groupBy(col("center"))
        .agg(sort_array(collect_list(col("dv"))).as("dvs"),
          count(lit(1)).as("nw2"))
        .select(col("center"),
          element_at(col("dvs"), ((col("nw2") + 1) / 2).cast("int"))
            .as("mad_cents"))
      daily.join(med.select(col("center").as("day"), col("med_cents"),
          col("nw").as("n_window")), "day")
        .join(mad.select(col("center").as("day"), col("mad_cents")), "day")
        .select(col("day"), col("r_cents"), col("n_window"),
          col("med_cents"), col("mad_cents"),
          (abs(col("r_cents") - col("med_cents")) * lit(10000L) >
            lit(HampelGateNum) * col("mad_cents")).as("is_outlier"))
    },
    Some(s"""WITH daily AS (
              SELECT CAST(o_orderdate AS DATE) AS day,
                CAST(SUM(${graft.common.Exact.centsSql("o_totalprice")})
                  AS BIGINT) AS r_cents
              FROM orders GROUP BY 1
            ), claims AS (
              SELECT CAST(day + CAST(o.off AS INTEGER) AS DATE) AS center,
                r_cents AS v
              FROM daily CROSS JOIN (
                SELECT unnest(generate_series(-$HampelHalf, $HampelHalf, 1))
                  AS off) o
            ), med AS (
              SELECT center,
                list_sort(list(v))[CAST((count(*) + 1) // 2 AS INTEGER)]
                  AS med_cents,
                CAST(count(*) AS BIGINT) AS nw
              FROM claims GROUP BY 1
            ), dev AS (
              SELECT c.center, abs(c.v - m.med_cents) AS dv
              FROM claims c JOIN med m USING (center)
            ), mad AS (
              SELECT center,
                list_sort(list(dv))[CAST((count(*) + 1) // 2 AS INTEGER)]
                  AS mad_cents
              FROM dev GROUP BY 1
            )
            SELECT d.day, d.r_cents, m.nw AS n_window,
              m.med_cents, a.mad_cents,
              abs(d.r_cents - m.med_cents) * 10000
                > $HampelGateNum * a.mad_cents AS is_outlier
            FROM daily d
            JOIN med m ON d.day = m.center
            JOIN mad a ON d.day = a.center"""),
    "Hampel filter on daily revenue: rolling lower median/MAD via " +
      "exploded equi-joins, integer outlier gate [time-series]")

  /** q255: binary-segmentation changepoint — the single split of the
    * daily-revenue series that minimizes total within-segment variance
    * (the first recursion step of the standard binseg detector; the
    * least-squares complement of q164/q209's CUSUM threshold alarms,
    * which need a known baseline — binseg FINDS the level shift).
    *
    * Exactness: the argmin never touches a float. Minimizing
    * SSE_l + SSE_r ⟺ maximizing M(t) = S_l²/n_l + S_r²/n_r (ΣΣx² is
    * split-invariant), so "b beats a" is the q249 integer
    * cross-product tournament: num = S_l²·n_r + S_r²·n_l,
    * den = n_l·n_r, b beats a ⟺ num_b·den_a > num_a·den_b, ties to
    * the earlier date. Daily values quantize to exact integer DOLLARS
    * (cents div 100) so Σx² fits i64 on the calendar-bounded frame
    * (days ≤ ~2.4k forever; dollar squares Σ ≈ 10¹⁷ at sf1, and the
    * 100 TB deployment moves the prefix columns to DECIMAL — same
    * plan). Segment means and the SSE reduction are terminal fixed
    * doubles over the integer evidence.
    *
    * Scale: one date fold (calendar-bounded), cumulative (n, S, S²)
    * via `PrefixSum.runningSums` — no one-task rank window — and the
    * ≤2.4k²-pair argmin runs on the checkpointed candidate frame
    * (BroadcastLint cap entry: the frame is calendar-bounded).
    */
  private lazy val q255 = QueryDef(
    (s, d) => {
      val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
      // the daily fold feeds the prefix sum AND the totals fold —
      // materialize the calendar-bounded frame once (the q249 cut)
      val daily = load(s, d, "orders")
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg((sum(graft.common.Exact.cents(col("o_totalprice")))
          .cast("long")).as("rc"))
        .select(col("day"), expr("rc div 100L").as("v"))
        .withColumn("one", lit(1L))
        .withColumn("v2", col("v") * col("v"))
        .localCheckpoint()
      val cum = graft.operators.PrefixSum.runningSums(
        daily, Seq(col("day")), Seq("one", "v", "v2"))
      val tot = daily.agg(sum(col("one")).as("m"), sum(col("v")).as("s"),
        sum(col("v2")).as("s2"))
      val cand = cum.crossJoin(broadcast(tot))
        .filter(col("one_cum") < col("m"))
        .select(col("day").as("t"),
          col("one_cum").as("n_l"), col("v_cum").as("s_l"),
          col("v2_cum").as("s2_l"),
          (col("m") - col("one_cum")).as("n_r"),
          (col("s") - col("v_cum")).as("s_r"),
          (col("s2") - col("v2_cum")).as("s2_r"),
          col("m"), col("s"), col("s2"))
        .withColumn("m_num",
          col("s_l").cast(dec38) * col("s_l").cast(dec38) *
            col("n_r").cast(dec38) +
            col("s_r").cast(dec38) * col("s_r").cast(dec38) *
              col("n_l").cast(dec38))
        .withColumn("m_den", col("n_l").cast(dec38) * col("n_r").cast(dec38))
        .localCheckpoint()
      val best = cand.as("a").join(broadcast(cand.as("b")),
        col("b.m_num") * col("a.m_den") > col("a.m_num") * col("b.m_den") ||
          (col("b.m_num") * col("a.m_den") ===
            col("a.m_num") * col("b.m_den") && col("b.t") < col("a.t")),
        "left_anti")
      val sseL = col("s2_l").cast("double") -
        col("s_l").cast("double") * col("s_l").cast("double") /
          col("n_l").cast("double")
      val sseR = col("s2_r").cast("double") -
        col("s_r").cast("double") * col("s_r").cast("double") /
          col("n_r").cast("double")
      val sseT = col("s2").cast("double") -
        col("s").cast("double") * col("s").cast("double") /
          col("m").cast("double")
      best.select(col("t").as("split_day"),
        col("n_l"), col("n_r"), col("s_l"), col("s_r"),
        (col("s_l").cast("double") / col("n_l").cast("double"))
          .as("mean_left"),
        (col("s_r").cast("double") / col("n_r").cast("double"))
          .as("mean_right"),
        (sseT - (sseL + sseR)).as("sse_reduction"))
    },
    Some(s"""WITH daily AS (
              SELECT CAST(o_orderdate AS DATE) AS day,
                CAST(SUM(${graft.common.Exact.centsSql("o_totalprice")})
                  AS BIGINT) // 100 AS v
              FROM orders GROUP BY 1
            ), cum AS (
              SELECT day AS t,
                CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS n_l,
                CAST(SUM(v) OVER (ORDER BY day) AS BIGINT) AS s_l,
                CAST(SUM(v * v) OVER (ORDER BY day) AS BIGINT) AS s2_l
              FROM daily
            ), tot AS (
              SELECT CAST(count(*) AS BIGINT) AS m,
                CAST(SUM(v) AS BIGINT) AS s,
                CAST(SUM(v * v) AS BIGINT) AS s2
              FROM daily
            ), cand AS (
              SELECT t, n_l, s_l, s2_l,
                m - n_l AS n_r, s - s_l AS s_r, s2 - s2_l AS s2_r,
                m, s, s2,
                CAST(s_l AS HUGEINT) * s_l * (m - n_l)
                  + CAST(s - s_l AS HUGEINT) * (s - s_l) * n_l AS m_num,
                CAST(n_l AS HUGEINT) * (m - n_l) AS m_den
              FROM cum, tot WHERE n_l < m
            ), best AS (
              SELECT * FROM cand a WHERE NOT EXISTS (
                SELECT 1 FROM cand b
                WHERE b.m_num * a.m_den > a.m_num * b.m_den
                  OR (b.m_num * a.m_den = a.m_num * b.m_den
                      AND b.t < a.t))
            )
            SELECT t AS split_day, n_l, n_r, s_l, s_r,
              CAST(s_l AS DOUBLE) / CAST(n_l AS DOUBLE) AS mean_left,
              CAST(s_r AS DOUBLE) / CAST(n_r AS DOUBLE) AS mean_right,
              (CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                  / CAST(m AS DOUBLE))
                - ((CAST(s2_l AS DOUBLE)
                    - CAST(s_l AS DOUBLE) * CAST(s_l AS DOUBLE)
                      / CAST(n_l AS DOUBLE))
                  + (CAST(s2_r AS DOUBLE)
                    - CAST(s_r AS DOUBLE) * CAST(s_r AS DOUBLE)
                      / CAST(n_r AS DOUBLE))) AS sse_reduction
            FROM best"""),
    "binary-segmentation changepoint on daily revenue: prefix-sum " +
      "moments, integer cross-product argmin, exact dollar units " +
      "[time-series]")

  /** q272: MASE (mean absolute scaled error, Hyndman-Koehler) for
    * q227's Holt backtest — the SCALE-FREE forecast-quality number the
    * raw abs_err column can't give: errors divide by the in-sample
    * naive-1 MAE, so "MASE < 1 beats the naive forecast" reads the
    * same across series of any magnitude, and forecasts for different
    * metrics become comparable on one dashboard.
    *
    * Exactness: the naive MAE numerator Σ|yₜ − yₜ₋₁| is an exact
    * integer (daily event counts); the Holt MAE folds q227's ≤30
    * emitted abs_err doubles in pinned day order (under the streaming-
    * fold threshold PLANS.md records); MASE is one terminal division —
    * so the derived oracle (reading q227's emitted rows, the q256
    * cross-read pattern) compares every column exactly.
    *
    * Scale: q227's calendar-bounded frame is the only input.
    */
  private val q272 = QueryDef(
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
      val f = q227.fn(s, d)
        .select(col("day"), col("n_events"), col("abs_err"))
      val byDay = w.orderBy(col("day").asc)
      val run = byDay.rowsBetween(w.unboundedPreceding, w.currentRow)
      f
        .withColumn("naive_err",
          abs(col("n_events") - lag(col("n_events"), 1).over(byDay)))
        .withColumn("holt_run",
          sum(coalesce(col("abs_err"), lit(0.0))).over(run))
        .withColumn("naive_run",
          sum(col("naive_err")).over(run))
        .withColumn("n_fc",
          sum(when(col("abs_err").isNotNull, 1L).otherwise(0L)).over(run))
        .withColumn("n_nv",
          sum(when(col("naive_err").isNotNull, 1L).otherwise(0L))
            .over(run))
        .withColumn("last", row_number().over(w.orderBy(col("day").desc)))
        .filter(col("last") === 1)
        .select(col("n_fc").as("n_forecasts"),
          (col("holt_run") / col("n_fc").cast("double")).as("mae_holt"),
          (col("naive_run").cast("double") / col("n_nv").cast("double"))
            .as("mae_naive"),
          when(col("naive_run") > 0L,
            (col("holt_run") / col("n_fc").cast("double")) /
              (col("naive_run").cast("double") /
                col("n_nv").cast("double"))).as("mase"))
    },
    Some(s"""WITH f AS (
              SELECT day, n_events, abs_err FROM read_parquet(
                '${graft.QueryDef.OutDirToken}/q227_holt_forecast/*.parquet')
            ), e AS (
              SELECT day, abs_err,
                abs(n_events - lag(n_events, 1) OVER (ORDER BY day ASC))
                  AS naive_err
              FROM f
            ), folded AS (
              SELECT
                SUM(COALESCE(abs_err, 0.0)) OVER wr AS holt_run,
                SUM(naive_err) OVER wr AS naive_run,
                SUM(CASE WHEN abs_err IS NOT NULL THEN 1 ELSE 0 END)
                  OVER wr AS n_fc,
                SUM(CASE WHEN naive_err IS NOT NULL THEN 1 ELSE 0 END)
                  OVER wr AS n_nv,
                ROW_NUMBER() OVER (ORDER BY day DESC) AS last
              FROM e
              WINDOW wr AS (ORDER BY day ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            )
            SELECT CAST(n_fc AS BIGINT) AS n_forecasts,
              holt_run / CAST(n_fc AS DOUBLE) AS mae_holt,
              CAST(naive_run AS DOUBLE) / CAST(n_nv AS DOUBLE)
                AS mae_naive,
              CASE WHEN naive_run > 0 THEN
                (holt_run / CAST(n_fc AS DOUBLE))
                  / (CAST(naive_run AS DOUBLE) / CAST(n_nv AS DOUBLE))
                END AS mase
            FROM folded WHERE last = 1"""),
    "MASE for the Holt backtest: exact naive-1 scaling, pinned-order " +
      "error folds, exact derived oracle [stats,time-series]")

  def all: Seq[(String, QueryDef)] = Seq(
    "q144_locf_panel" -> q144,
    "q145_ohlc_resample" -> q145,
    "q245_hampel_filter" -> q245,
    "q255_binseg_changepoint" -> q255,
    "q165_ewma_daily" -> q165,
    "q169_seasonal_decomp" -> q169,
    "q179_rolling_corr" -> q179,
    "q189_seasonal_naive" -> q189,
    "q209_cusum_changepoint" -> q209,
    "q216_revenue_acf" -> q216,
    "q220_mann_kendall" -> q220,
    "q221_theil_sen" -> q221,
    "q227_holt_forecast" -> q227,
    "q272_mase" -> q272,
    "q231_kendall_tau" -> q231,
    "q232_ship_ccf" -> q232)
}
