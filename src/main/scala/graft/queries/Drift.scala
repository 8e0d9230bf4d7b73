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
  /** The (segment × priority) χ² cell frame shared by q156 (per-cell
    * emission) and q267 (the Cramér's V fold): exact integer marginals
    * from one fold, per-cell expected/term as fixed IEEE chains.
    */
  private def chisqCells(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val base = load(s, d, "orders").join(
      load(s, d, "customer"),
      col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("segment"),
        col("o_orderpriority").as("priority"))
    val cells = base.groupBy(col("segment"), col("priority"))
      .agg(lcountAll.as("obs"))
    // marginals as windows over the ≤|segments|·|priorities| aggregate
    // frame (bounded by the category vocabularies, never the corpus) —
    // the former groupBy+join-back marginals re-ran the corpus
    // join+aggregation once per marginal (measured: 11 AQE jobs, 4
    // corpus passes; guide §2.4 "share one exchange")
    import org.apache.spark.sql.expressions.Window
    cells
      .withColumn("row_tot",
        sum("obs").over(Window.partitionBy(col("segment"))))
      .withColumn("col_tot",
        sum("obs").over(Window.partitionBy(col("priority"))))
      .withColumn("n_rows", sum("obs").over(Window.partitionBy()))
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
  }

  private val q156 = QueryDef(
    (s, d) => chisqCells(s, d),
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

  /** q267: Cramér's V — the EFFECT SIZE companion to q156's χ²
    * screen on the same (market segment × order priority) table. χ²
    * grows with n, so at corpus scale every association is
    * "significant"; V = √(χ²/(n·min(r−1, c−1))) ∈ [0, 1] is the
    * n-invariant strength number a drift dashboard actually
    * thresholds on.
    *
    * Exactness: the cell terms are q156's fixed IEEE chains over exact
    * integer marginals; the ONE cross-cell float fold runs as a
    * cumulative window in the PINNED (segment, priority) order — the
    * q254 fixed-order float-fold discipline — so χ² and V are
    * bit-identical cross-engine. r, c, n are exact integers.
    *
    * Scale: q156's shape (one keyed fold to ≤25 cells, broadcast
    * marginals); the ordered fold and the scalar attach run on the
    * domain-bounded cell frame.
    */
  private val q267 = QueryDef(
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      // two consumers (the ordered fold, the dims aggregate) — the
      // ≤25-row cell frame materializes once instead of re-running the
      // corpus fold per branch
      val cells = chisqCells(s, d).localCheckpoint()
      val wRun = Window.orderBy(col("segment"), col("priority"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val chi2 = cells
        .withColumn("chi2_run", sum(col("chi_term")).over(wRun))
        .withColumn("rn", row_number().over(
          Window.orderBy(col("segment").desc, col("priority").desc)))
        .filter(col("rn") === 1)
        .select(col("chi2_run").as("chi2"))
      val dims = cells.agg(
        max(col("n_rows")).as("n"),
        count_distinct(col("segment")).as("r"),
        count_distinct(col("priority")).as("c"))
      dims.crossJoin(broadcast(chi2))
        .select(col("n"), col("r"), col("c"), col("chi2"),
          ((col("r") - 1L) * (col("c") - 1L)).as("dof"),
          sqrt(col("chi2") /
            (col("n").cast("double") *
              least(col("r") - 1L, col("c") - 1L).cast("double")))
            .as("cramers_v"))
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
            ), n AS (SELECT CAST(SUM(obs) AS BIGINT) AS n_rows FROM cells),
            terms AS (
              SELECT cells.segment, cells.priority, n_rows,
                (CAST(obs AS DOUBLE) -
                   CAST(row_tot * col_tot AS DOUBLE) / CAST(n_rows AS DOUBLE)) *
                (CAST(obs AS DOUBLE) -
                   CAST(row_tot * col_tot AS DOUBLE) / CAST(n_rows AS DOUBLE)) /
                (CAST(row_tot * col_tot AS DOUBLE) / CAST(n_rows AS DOUBLE))
                  AS chi_term
              FROM cells
              JOIN rt ON cells.segment = rt.segment
              JOIN ct ON cells.priority = ct.priority
              CROSS JOIN n
            ), folded AS (
              SELECT
                SUM(chi_term) OVER (ORDER BY segment, priority
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS chi2,
                ROW_NUMBER() OVER (ORDER BY segment DESC, priority DESC)
                  AS rn
              FROM terms
            ), dims AS (
              SELECT CAST(MAX(n_rows) AS BIGINT) AS n,
                CAST(count(DISTINCT segment) AS BIGINT) AS r,
                CAST(count(DISTINCT priority) AS BIGINT) AS c
              FROM terms
            )
            SELECT n, r, c, chi2,
              (r - 1) * (c - 1) AS dof,
              sqrt(chi2 / (CAST(n AS DOUBLE) *
                CAST(least(r - 1, c - 1) AS DOUBLE))) AS cramers_v
            FROM dims, (SELECT chi2 FROM folded WHERE rn = 1)"""),
    "Cramér's V association strength for segment × priority: pinned-" +
      "order chi-square fold, n-invariant effect size [stats,drift]")

  /** q266's two ship-year slices. */
  private val WyA = 1996
  private val WyB = 1997

  /** q266: exact 1-D Wasserstein-1 (earth-mover) distance between two
    * quantity distributions — "how far did the ship-1996 quantity mix
    * move by 1997, in QUANTITY UNITS?" The metric drift readout PSI
    * (q155) and KS (q154) cannot give: PSI is bin-relative and
    * unitless, KS is the sup of the CDF gap; W1 = ∫|F_A − F_B| is the
    * actual mass-transport cost, comparable across features and
    * thresholds. On a discrete domain it is the exact sum
    * Σ_v |F_A(v) − F_B(v)|·Δv over the merged value grid.
    *
    * Exactness: quantities live on a ≤50-value integer domain, so both
    * CDFs are integer cumulative counts over one tiny histogram; the
    * numerator Σ|cumA·n_B − cumB·n_A|·Δv is an exact BIGINT (common
    * denominator n_A·n_B), and W1 is ONE terminal division. i64/2^53
    * envelope: num ≤ 50·n_A·n_B — sound to ~10⁷ rows per slice for
    * exact doubles and ~10⁹ for i64; past that the q252 decimal-
    * evidence discipline applies (num as canonical string), and a
    * continuous-valued variant swaps the 50-bin histogram for the
    * cents-domain histogram walked by the q177 prefix-sum scan.
    *
    * Scale: ONE map-side-combined fold to the ≤50-row histogram; the
    * cumulative windows and the final fold run on that domain-bounded
    * frame. The corpus is scanned once.
    */
  private val q266 = QueryDef(
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val li = load(s, d, "lineitem")
        .filter(year(col("l_shipdate")).isin(WyA, WyB))
        .select(col("l_quantity").cast("long").as("q"),
          year(col("l_shipdate")).as("y"))
      val hist = li.groupBy(col("q")).agg(
        sum(when(col("y") === WyA, 1L).otherwise(0L)).as("ca"),
        sum(when(col("y") === WyB, 1L).otherwise(0L)).as("cb"))
      val wq = Window.orderBy(col("q"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val walked = hist
        .withColumn("cuma", sum(col("ca")).over(wq))
        .withColumn("cumb", sum(col("cb")).over(wq))
        .withColumn("dv",
          coalesce(lead(col("q"), 1).over(Window.orderBy(col("q"))) -
            col("q"), lit(0L)))
      val tot = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      walked
        .withColumn("na", sum(col("ca")).over(tot))
        .withColumn("nb", sum(col("cb")).over(tot))
        .agg(
          max(col("na")).as("n_a"), max(col("nb")).as("n_b"),
          sum(abs(col("cuma") * col("nb") - col("cumb") * col("na")) *
            col("dv")).as("w1_num"))
        .select(col("n_a"), col("n_b"), col("w1_num"),
          (col("w1_num").cast("double") /
            (col("n_a").cast("double") * col("n_b").cast("double")))
            .as("w1"))
    },
    Some(s"""WITH li AS (
              SELECT CAST(l_quantity AS BIGINT) AS q,
                year(l_shipdate) AS y
              FROM lineitem WHERE year(l_shipdate) IN ($WyA, $WyB)
            ), hist AS (
              SELECT q,
                CAST(SUM(CASE WHEN y = $WyA THEN 1 ELSE 0 END) AS BIGINT)
                  AS ca,
                CAST(SUM(CASE WHEN y = $WyB THEN 1 ELSE 0 END) AS BIGINT)
                  AS cb
              FROM li GROUP BY 1
            ), walked AS (
              SELECT q, ca, cb,
                SUM(ca) OVER (ORDER BY q) AS cuma,
                SUM(cb) OVER (ORDER BY q) AS cumb,
                COALESCE(lead(q, 1) OVER (ORDER BY q) - q, 0) AS dv,
                SUM(ca) OVER () AS n_a, SUM(cb) OVER () AS n_b
              FROM hist
            )
            SELECT CAST(MAX(n_a) AS BIGINT) AS n_a,
              CAST(MAX(n_b) AS BIGINT) AS n_b,
              CAST(SUM(abs(cuma * n_b - cumb * n_a) * dv) AS BIGINT)
                AS w1_num,
              CAST(SUM(abs(cuma * n_b - cumb * n_a) * dv) AS DOUBLE) /
                (CAST(MAX(n_a) AS DOUBLE) * CAST(MAX(n_b) AS DOUBLE))
                AS w1
            FROM walked"""),
    "exact Wasserstein-1 quantity-distribution drift between ship " +
      "years: integer CDF gap walk on the value histogram [stats,drift]")

  def all: Seq[(String, QueryDef)] = Seq(
    "q266_wasserstein_drift" -> q266,
    "q267_cramers_v" -> q267,
    "q155_psi_drift" -> q155,
    "q156_chisq_cells" -> q156,
    "q164_cusum_changepoint" -> q164,
    "q173_woe_iv" -> q173)
}
