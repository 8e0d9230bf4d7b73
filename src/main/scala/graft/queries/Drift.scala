package graft.queries

import graft.QueryDef
import graft.common.Exact._
import graft.common.Tables.load
import org.apache.spark.sql.functions._

/** Distribution-drift monitors — the checks a feature platform runs
  * before letting a training snapshot or a scoring batch ship:
  * population-stability (PSI) between two time slices, and a χ²
  * independence screen over a dimensional contingency table.
  *
  * Both reduce the corpus to exact integer bin counts in one map-side-
  * combined aggregate; every emitted double after that is either a
  * fixed IEEE chain on those integers (bit-identical cross-engine) or,
  * for the one `ln` in PSI, tolerance-checked by a derived oracle.
  */
object Drift {

  private val Mid = "2024-01-16 00:00:00"

  /** $50 value buckets, top-coded at bin 9 — a fixed, data-independent
    * binning so the bin of a row never depends on any other row (a
    * quantile binning would make the PSI itself drift with partitioning
    * and re-sampling).
    */
  private val BinW = 5000L
  private val NBins = 10

  /** q155: PSI between the first and second half of the event stream,
    * per event type over value bins. Laplace-smoothed shares
    * (c+1)/(tot+B) keep empty bins finite — the standard monitoring
    * form. Emits the full type×bin grid (absent bins as zeros) so the
    * row set is deterministic.
    *
    * Scale: ONE (type, bin)-keyed count aggregate over the stream
    * (map-side combined), per-type totals folded from the 50-row bin
    * frame, and a 50-row spine join — nothing after the first exchange
    * is stream-sized.
    *
    * Exactness: counts and totals are exact integers; pa/pb are single
    * divisions (bit-identical); `psi_term`'s ln is the one non-
    * correctly-rounded primitive, so the oracle re-derives it from the
    * exact-joined integer evidence and admits rows within 1e-9 (the
    * q110 tolerance contract).
    */
  private val q155 = QueryDef(
    (s, d) => {
      val ev = load(s, d, "events").select(
        col("event_type"),
        // centsSql is valid in BOTH dialects — one quantizer source
        least(expr(s"${centsSql("value")} div $BinW"),
          lit(NBins - 1L)).as("bin"),
        (col("ts") < lit(Mid).cast("timestamp")).as("is_a"))
      val counts = ev.groupBy(col("event_type"), col("bin"))
        .agg(sum(when(col("is_a"), 1L).otherwise(0L)).as("n_a"),
          sum(when(col("is_a"), 0L).otherwise(1L)).as("n_b"))
      val spine = counts.select(col("event_type")).distinct()
        .crossJoin(s.range(NBins).toDF("bin"))
      val grid = spine.join(counts, Seq("event_type", "bin"), "left")
        .select(col("event_type"), col("bin"),
          coalesce(col("n_a"), lit(0L)).as("n_a"),
          coalesce(col("n_b"), lit(0L)).as("n_b"))
      val tots = grid.groupBy(col("event_type"))
        .agg(sum("n_a").as("tot_a"), sum("n_b").as("tot_b"))
      grid.join(tots, "event_type")
        .withColumn("pa", (col("n_a") + 1L).cast("double") /
          (col("tot_a") + NBins.toLong).cast("double"))
        .withColumn("pb", (col("n_b") + 1L).cast("double") /
          (col("tot_b") + NBins.toLong).cast("double"))
        .select(col("event_type"), col("bin"), col("n_a"), col("n_b"),
          col("tot_a"), col("tot_b"), col("pa"), col("pb"),
          ((col("pa") - col("pb")) * log(col("pa") / col("pb")))
            .as("psi_term"))
    },
    Some(s"""WITH ev AS (
              SELECT event_type,
                least(${centsSql("value")} // $BinW, ${NBins - 1})
                  AS bin,
                ts < TIMESTAMP '$Mid' AS is_a
              FROM events
            ), counts AS (
              SELECT event_type, bin,
                CAST(SUM(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_a,
                CAST(SUM(CASE WHEN is_a THEN 0 ELSE 1 END) AS BIGINT)
                  AS n_b
              FROM ev GROUP BY 1, 2
            ), spine AS (
              SELECT t.event_type, CAST(g.range AS BIGINT) AS bin
              FROM (SELECT DISTINCT event_type FROM counts) t,
                range(0, $NBins) g
            ), grid AS (
              SELECT s.event_type, s.bin,
                COALESCE(c.n_a, 0) AS n_a, COALESCE(c.n_b, 0) AS n_b
              FROM spine s LEFT JOIN counts c
                ON s.event_type = c.event_type AND s.bin = c.bin
            ), tots AS (
              SELECT event_type, CAST(SUM(n_a) AS BIGINT) AS tot_a,
                CAST(SUM(n_b) AS BIGINT) AS tot_b
              FROM grid GROUP BY 1
            ), ref AS (
              SELECT g.event_type, g.bin, g.n_a, g.n_b, t.tot_a, t.tot_b,
                CAST(g.n_a + 1 AS DOUBLE) / CAST(t.tot_a + $NBins AS DOUBLE)
                  AS pa,
                CAST(g.n_b + 1 AS DOUBLE) / CAST(t.tot_b + $NBins AS DOUBLE)
                  AS pb
              FROM grid g JOIN tots t ON g.event_type = t.event_type
            ), emitted AS (
              SELECT * FROM read_parquet(
                '${graft.QueryDef.OutDirToken}/q155_psi_drift/*.parquet')
            )
            SELECT e.event_type, e.bin, e.n_a, e.n_b, e.tot_a, e.tot_b,
              e.pa, e.pb, e.psi_term
            FROM emitted e JOIN ref r
              ON e.event_type = r.event_type AND e.bin = r.bin
              AND e.n_a = r.n_a AND e.n_b = r.n_b
              AND e.tot_a = r.tot_a AND e.tot_b = r.tot_b
              AND e.pa = r.pa AND e.pb = r.pb
            WHERE abs(e.psi_term - (r.pa - r.pb) * ln(r.pa / r.pb))
              < 1e-9"""),
    "PSI drift: one keyed count pass, smoothed shares, ln tolerance oracle [drift]")

  /** q156: χ² independence cells over the market-segment × order-
    * priority contingency table (does order urgency depend on customer
    * segment?). Emits per-cell observed / marginals / expected /
    * contribution; the summed statistic is left to the reader because a
    * cross-engine float SUM is order-dependent while every per-cell
    * value here is a fixed IEEE chain on exact integers — bit-identical
    * with no tolerance.
    *
    * Scale: the fact join is unhinted — `customer` is corpus-
    * proportional, so AQE broadcasts it only while it fits and
    * shuffle-joins beyond that; cells reduce in
    * one map-side-combined aggregate to |segments|·|priorities| rows,
    * and marginals fold from the cell frame (never a fact rescan).
    * Integer marginal products fit i64 to ~3·10⁹ rows per margin; the
    * DECIMAL(38,0) swap is the documented 100 TB escape hatch.
    */
  private val q156 = QueryDef(
    (s, d) => {
      val base = load(s, d, "orders").join(
        load(s, d, "customer"),
        col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("segment"),
          col("o_orderpriority").as("priority"))
      val cells = base.groupBy(col("segment"), col("priority"))
        .agg(lcountAll.as("obs"))
      val rowT = cells.groupBy(col("segment"))
        .agg(sum("obs").as("row_tot"))
      val colT = cells.groupBy(col("priority"))
        .agg(sum("obs").as("col_tot"))
      val n = cells.agg(sum("obs").as("n_rows"))
      cells.join(rowT, "segment").join(colT, "priority")
        .crossJoin(broadcast(n))
        .withColumn("expected",
          (col("row_tot") * col("col_tot")).cast("double") /
            col("n_rows").cast("double"))
        .withColumn("chi_term",
          (col("obs").cast("double") - col("expected")) *
            (col("obs").cast("double") - col("expected")) /
            col("expected"))
        .select(col("segment"), col("priority"), col("obs"),
          col("row_tot"), col("col_tot"), col("n_rows"),
          col("expected"), col("chi_term"))
    },
    Some("""WITH base AS (
              SELECT c.c_mktsegment AS segment,
                o.o_orderpriority AS priority
              FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            ), cells AS (
              SELECT segment, priority, CAST(count(*) AS BIGINT) AS obs
              FROM base GROUP BY 1, 2
            ), rt AS (
              SELECT segment, CAST(SUM(obs) AS BIGINT) AS row_tot
              FROM cells GROUP BY 1
            ), ct AS (
              SELECT priority, CAST(SUM(obs) AS BIGINT) AS col_tot
              FROM cells GROUP BY 1
            ), n AS (SELECT CAST(SUM(obs) AS BIGINT) AS n_rows FROM cells)
            SELECT cells.segment, cells.priority, obs, row_tot, col_tot,
              n_rows,
              CAST(row_tot * col_tot AS DOUBLE) / CAST(n_rows AS DOUBLE)
                AS expected,
              (CAST(obs AS DOUBLE) -
                 CAST(row_tot * col_tot AS DOUBLE) / CAST(n_rows AS DOUBLE)) *
              (CAST(obs AS DOUBLE) -
                 CAST(row_tot * col_tot AS DOUBLE) / CAST(n_rows AS DOUBLE)) /
              (CAST(row_tot * col_tot AS DOUBLE) / CAST(n_rows AS DOUBLE))
                AS chi_term
            FROM cells
            JOIN rt ON cells.segment = rt.segment
            JOIN ct ON cells.priority = ct.priority
            CROSS JOIN n"""),
    "chi-square cells: broadcast dim join, exact marginals, fixed IEEE chain [drift]")

  /** q164: CUSUM change-point screen over the daily event volume —
    * the classic "did the level shift, and when" monitor. Per calendar
    * day: the count, the centered cumulative sum
    * C_d = Σ_{i≤d} x_i − d·x̄, and a peak flag at the |C| maximum (the
    * most likely change point). A fixed calendar spine (absent days as
    * zeros) keeps the row set deterministic.
    *
    * Scale: corpus → per-day counts in one map-side-combined
    * aggregate; the spine join, cumulative window, and argmax all run
    * on the calendar-bounded frame (the q159 bounded-window argument).
    *
    * Exactness: counts and cumulative sums are integers; x̄ is one
    * division and each C_d one multiply-subtract — fixed IEEE chains.
    * The peak flag's double-equality is safe because both engines
    * compute identical doubles (the q154 arg-max idiom).
    */
  private val DayFrom = "2024-01-01"
  private val DayTo = "2024-01-30"

  private val q164 = QueryDef(
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val daily = load(s, d, "events")
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
      val spine = s.range(1).select(explode(sequence(
        to_date(lit(DayFrom)), to_date(lit(DayTo)))).as("day"))
      val grid = spine.join(daily, Seq("day"), "left")
        .select(col("day"), coalesce(col("n"), lit(0L)).as("n_events"),
          (datediff(col("day"), to_date(lit(DayFrom))) + 1).cast("long")
            .as("day_idx"))
      val tot = grid.agg(sum("n_events").as("total"),
        lcountAll.as("n_days"))
      val cumW = Window.orderBy(col("day").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cusum = grid.crossJoin(broadcast(tot))
        .withColumn("cum", sum("n_events").over(cumW))
        .withColumn("cusum",
          col("cum").cast("double") - col("day_idx").cast("double") *
            (col("total").cast("double") / col("n_days").cast("double")))
      val peak = cusum.agg(max(abs(col("cusum"))).as("peak"))
      cusum.crossJoin(broadcast(peak))
        .select(col("day"), col("n_events"), col("cum"), col("cusum"),
          (abs(col("cusum")) === col("peak")).as("is_peak"))
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
            ), tot AS (
              SELECT CAST(SUM(n_events) AS BIGINT) AS total,
                CAST(count(*) AS BIGINT) AS n_days
              FROM grid
            ), c AS (
              SELECT day, n_events,
                CAST(SUM(n_events) OVER (ORDER BY day ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum,
                CAST(SUM(n_events) OVER (ORDER BY day ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS DOUBLE) - CAST(day_idx AS DOUBLE) *
                  (CAST(total AS DOUBLE) / CAST(n_days AS DOUBLE))
                  AS cusum
              FROM grid, tot
            ), p AS (SELECT MAX(abs(cusum)) AS peak FROM c)
            SELECT day, n_events, cum, cusum,
              abs(cusum) = p.peak AS is_peak
            FROM c, p"""),
    "CUSUM change-point screen: integer cumulative sums, exact peak flag [drift]")

  /** q173: weight-of-evidence / information value over score quintiles
    * — the supervised twin of q155's PSI (same ln-of-share-ratio
    * algebra, but the two populations are the LABEL classes inside one
    * sample, not two time slices): the credit-scoring screen for "how
    * much does this feature separate converters". Score = pre-Mid
    * spend cents, label = post-Mid purchase (the q151/q152 leakage-free
    * framing); bins are population quintiles over the scalable global
    * order (position·5 div n — never NTILE); shares are Laplace-
    * smoothed (c+1)/(tot+B), q155's convention, so empty classes stay
    * finite. IV = Σ iv_term (left per-bin for auditability).
    *
    * Scale: one user-keyed corpus fold, a range-partitioned rank over
    * the |users| frame, a 5-row bin fold, and a 1-row total broadcast.
    * Exactness: counts exact longs, shares single divisions; the ln is
    * tolerance-checked by the derived oracle from exact-joined shares.
    */
  private val q173 = QueryDef(
    (s, d) => {
      val perUser = load(s, d, "events")
        .groupBy(col("user_id"))
        .agg(
          sum(when(col("ts") < lit(Mid).cast("timestamp"),
            cents(col("value"))).otherwise(0L)).as("score"),
          max(when(col("ts") >= lit(Mid).cast("timestamp") &&
            col("event_type") === "purchase", 1L).otherwise(0L))
            .as("label"))
      val n = perUser.count()
      val binned = Curation.globalOrder(
        perUser, Seq(col("score").asc, col("user_id").asc))
        .withColumn("bin", expr(s"(position * 5) div ${n}L").cast("long"))
      val byBin = binned.groupBy(col("bin"))
        .agg(lcountAll.as("n_users"), sum("label").as("n_pos"))
        .withColumn("n_neg", col("n_users") - col("n_pos"))
      val tots = byBin.agg(sum("n_pos").as("tot_pos"),
        sum("n_neg").as("tot_neg"))
      byBin.crossJoin(broadcast(tots))
        .withColumn("pos_share", (col("n_pos") + 1L).cast("double") /
          (col("tot_pos") + 5L).cast("double"))
        .withColumn("neg_share", (col("n_neg") + 1L).cast("double") /
          (col("tot_neg") + 5L).cast("double"))
        .select(col("bin"), col("n_users"), col("n_pos"), col("n_neg"),
          col("pos_share"), col("neg_share"),
          log(col("pos_share") / col("neg_share")).as("woe"),
          ((col("pos_share") - col("neg_share")) *
            log(col("pos_share") / col("neg_share"))).as("iv_term"))
    },
    Some(s"""WITH pu AS (
              SELECT user_id,
                CAST(SUM(CASE WHEN ts < TIMESTAMP '$Mid'
                  THEN ${centsSql("value")} ELSE 0 END) AS BIGINT)
                  AS score,
                CAST(MAX(CASE WHEN ts >= TIMESTAMP '$Mid'
                  AND event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS label
              FROM events GROUP BY 1
            ), o AS (
              SELECT score, user_id, label,
                ROW_NUMBER() OVER (ORDER BY score, user_id) - 1
                  AS position,
                COUNT(*) OVER () AS n
              FROM pu
            ), b AS (
              SELECT CAST((position * 5) // n AS BIGINT) AS bin,
                CAST(COUNT(*) AS BIGINT) AS n_users,
                CAST(SUM(label) AS BIGINT) AS n_pos
              FROM o GROUP BY 1
            ), t AS (
              SELECT SUM(n_pos) AS tot_pos,
                SUM(n_users - n_pos) AS tot_neg
              FROM b
            ), r AS (
              SELECT b.bin, b.n_users, b.n_pos,
                b.n_users - b.n_pos AS n_neg,
                CAST(b.n_pos + 1 AS DOUBLE) /
                  CAST(t.tot_pos + 5 AS DOUBLE) AS pos_share,
                CAST(b.n_users - b.n_pos + 1 AS DOUBLE) /
                  CAST(t.tot_neg + 5 AS DOUBLE) AS neg_share
              FROM b CROSS JOIN t
            ), emitted AS (
              SELECT * FROM read_parquet(
                '${QueryDef.OutDirToken}/q173_woe_iv/*.parquet')
            )
            SELECT e.bin, e.n_users, e.n_pos, e.n_neg, e.pos_share,
              e.neg_share, e.woe, e.iv_term
            FROM emitted e JOIN r ON e.bin = r.bin
              AND e.n_users = r.n_users AND e.n_pos = r.n_pos
              AND e.n_neg = r.n_neg AND e.pos_share = r.pos_share
              AND e.neg_share = r.neg_share
            WHERE abs(e.woe - ln(r.pos_share / r.neg_share)) < 1e-9
              AND abs(e.iv_term - (r.pos_share - r.neg_share) *
                ln(r.pos_share / r.neg_share)) < 1e-9"""),
    "weight-of-evidence / IV over score quintiles: supervised PSI twin, ln tolerance oracle [drift]")

  def all: Seq[(String, QueryDef)] = Seq(
    "q155_psi_drift" -> q155,
    "q156_chisq_cells" -> q156,
    "q164_cusum_changepoint" -> q164,
    "q173_woe_iv" -> q173)
}
