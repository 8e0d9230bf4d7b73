package graft.queries

import graft.QueryDef
import graft.common.Exact._
import graft.common.Tables.load
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-evaluation operators that work at fact-table scale with EXACT
  * arithmetic: the decile gains table and Mann-Whitney AUC. Both rank
  * the full population with the range-partitioned global order (no
  * one-partition window) and reduce to integer rank sums — so the two
  * metrics every model review meeting starts with are bitwise-
  * reproducible and oracle-checkable.
  */
object MlEval {

  /** Label/score temporal split: score accumulates strictly before the
    * cut, the label (did the user purchase?) strictly after — the
    * standard leakage-free propensity-eval framing.
    */
  private val Cut = "2024-01-24 00:00:00"

  /** Per-user (score, label): score = pre-cut spend in cents, label =
    * any post-cut purchase. One user-keyed, map-side-combined
    * aggregate.
    */
  private def perUser(s: SparkSession, d: String): DataFrame =
    load(s, d, "events")
      .groupBy(col("user_id"))
      .agg(
        sum(when(col("ts") < lit(Cut).cast("timestamp"),
          cents(col("value"))).otherwise(0L)).as("score"),
        max(when(col("ts") >= lit(Cut).cast("timestamp") &&
          col("event_type") === "purchase", 1L).otherwise(0L)).as("label"))

  private val PerUserSql =
    s"""SELECT user_id,
         CAST(SUM(CASE WHEN ts < TIMESTAMP '$Cut'
           THEN ${graft.common.Exact.centsSql("value")} ELSE 0 END)
           AS BIGINT) AS score,
         CAST(MAX(CASE WHEN ts >= TIMESTAMP '$Cut'
           AND event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
           AS label
       FROM events GROUP BY user_id"""

  /** q151: decile gains table — users ranked best-score-first into 10
    * contiguous deciles (position·10 div n over the scalable global
    * order), each with its user count, positives, positive rate, and
    * the cumulative capture rate (share of ALL positives found by this
    * depth). The table behind every "top 20% of scores captures 55% of
    * converters" sentence.
    *
    * Scale: globalOrder's range partition + per-partition offsets (no
    * one-partition ROW_NUMBER); the decile aggregate and the 10-row
    * cumulative window are tiny.
    */
  private val q151 = QueryDef(
    (s, d) => {
      val pu = perUser(s, d)
      val n = pu.count()
      val ordered = Curation.globalOrder(
        pu, Seq(col("score").desc, col("user_id").asc))
      val byDecile = ordered
        .groupBy(expr(s"(position * 10) div ${n}L").cast("long")
          .as("decile"))
        .agg(lcountAll.as("n_users"), sum("label").as("n_pos"))
      val cum = Window.orderBy(col("decile").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val total = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      byDecile.select(col("decile"), col("n_users"), col("n_pos"),
        (col("n_pos").cast("double") / col("n_users").cast("double"))
          .as("pos_rate"),
        (sum("n_pos").over(cum).cast("double") /
          sum("n_pos").over(total).cast("double")).as("cum_capture"))
    },
    Some(s"""WITH pu AS ($PerUserSql),
            o AS (
              SELECT label,
                ROW_NUMBER() OVER (ORDER BY score DESC, user_id ASC) - 1
                  AS position,
                COUNT(*) OVER () AS n
              FROM pu
            ), dec AS (
              SELECT CAST((position * 10) // n AS BIGINT) AS decile,
                CAST(count(*) AS BIGINT) AS n_users,
                CAST(SUM(label) AS BIGINT) AS n_pos
              FROM o GROUP BY 1
            )
            SELECT decile, n_users, n_pos,
              CAST(n_pos AS DOUBLE) / CAST(n_users AS DOUBLE) AS pos_rate,
              CAST(SUM(n_pos) OVER (ORDER BY decile ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) /
                CAST(SUM(n_pos) OVER () AS DOUBLE) AS cum_capture
            FROM dec"""),
    "decile gains table: scalable global rank, exact capture rates [ml-eval]")

  /** q152: exact Mann-Whitney AUC — rank every user ascending by
    * (score, user_id), AUC = (Σ ranks₊ − P(P+1)/2) / (P·N). Rank sums
    * are exact integers off the same scalable global order, so the
    * headline ranking metric is bit-stable at any corpus size (the
    * usual sampled/binned AUC approximations become unnecessary).
    * Tie policy: total order by (score, user_id) — a deterministic
    * variant of the tie-averaged statistic, identical in both engines;
    * the tie-averaged refinement is a rank-window swap away.
    */
  private val q152 = QueryDef(
    (s, d) => {
      val ordered = Curation.globalOrder(
        perUser(s, d), Seq(col("score").asc, col("user_id").asc))
      ordered.agg(
        lcountAll.as("n_users"),
        sum("label").as("n_pos"),
        sum(when(col("label") === 1L, col("position") + 1L).otherwise(0L))
          .as("pos_rank_sum"))
        .select(col("n_users"), col("n_pos"),
          (col("n_users") - col("n_pos")).as("n_neg"),
          col("pos_rank_sum"),
          // P(P+1) div 2: INTEGER division (Spark's `/` on longs is a
          // double divide) to mirror the oracle's `//` exactly
          ((col("pos_rank_sum") -
            expr("n_pos * (n_pos + 1) div 2")).cast("double") /
            (col("n_pos") * (col("n_users") - col("n_pos")))
              .cast("double")).as("auc"))
    },
    Some(s"""WITH pu AS ($PerUserSql),
            o AS (
              SELECT label,
                ROW_NUMBER() OVER (ORDER BY score ASC, user_id ASC)
                  AS rank
              FROM pu
            )
            SELECT CAST(count(*) AS BIGINT) AS n_users,
              CAST(SUM(label) AS BIGINT) AS n_pos,
              CAST(count(*) - SUM(label) AS BIGINT) AS n_neg,
              CAST(SUM(CASE WHEN label = 1 THEN rank ELSE 0 END)
                AS BIGINT) AS pos_rank_sum,
              CAST(SUM(CASE WHEN label = 1 THEN rank ELSE 0 END)
                - SUM(label) * (SUM(label) + 1) // 2 AS DOUBLE) /
                CAST(SUM(label) * (count(*) - SUM(label)) AS DOUBLE)
                AS auc
            FROM o"""),
    "exact Mann-Whitney AUC: integer rank sums over the global order [ml-eval]")

  /** q154: exact Kolmogorov–Smirnov separation — max over score
    * thresholds of |F₊(t) − F₋(t)|, the third of the three standard
    * ranking-model readouts (gains q151, AUC q152). Emits the statistic
    * plus its arg-max threshold (smallest score attaining it — a
    * deterministic tie policy both engines share).
    *
    * Scale: the cumulative distributions come from
    * [[graft.operators.PrefixSum.runningSums]] — a range-partitioned
    * two-phase scan, NOT a one-partition `Window.orderBy` (distinct
    * score values are unbounded at corpus scale). Driver state is one
    * partial per partition.
    *
    * Exactness: cumulative counts are exact integers (associative
    * two-phase addition, partition-count independent); each diff is a
    * fixed ÷,−,abs IEEE chain; MAX over exact doubles is
    * order-independent; the double-equality arg-max filter is safe
    * because both engines compute bit-identical diffs.
    */
  private val q154 = QueryDef(
    (s, d) => {
      val pu = perUser(s, d)
      // materialized once: the prefix-sum operator's two passes, the
      // totals, and the max/arg-max all read this value-domain
      // histogram — without the cut each replayed the corpus scan (r16)
      val byScore = pu.groupBy(col("score"))
        .agg(sum("label").as("pos"),
          (lcountAll - sum("label")).cast("long").as("neg"))
        .localCheckpoint()
      val cum = graft.operators.PrefixSum.runningSums(
        byScore, Seq(col("score").asc), Seq("pos", "neg"))
      // identical integers to the former corpus-level fold: summing the
      // per-score long counts regroups exact integer addition
      val tot = byScore.agg(sum("pos").as("p"), sum("neg").as("nn"))
      val diffed = cum.crossJoin(broadcast(tot))
        .withColumn("diff",
          abs(col("pos_cum").cast("double") / col("p").cast("double") -
            col("neg_cum").cast("double") / col("nn").cast("double")))
      // max + smallest-score-at-max in ONE aggregate: lexicographic
      // struct max picks max diff then max(-score) = min score among
      // exact double ties — the same (max, then min-score) policy the
      // former self-crossJoin + equality filter computed in two passes
      diffed
        .agg(max("p").as("n_pos"), max("nn").as("n_neg"),
          max(struct(col("diff"), (-col("score")).as("ns"))).as("m"))
        .select(col("n_pos"), col("n_neg"),
          col("m.diff").as("ks"), (-col("m.ns")).as("ks_score"))
    },
    Some(s"""WITH pu AS ($PerUserSql),
            t AS (
              SELECT score, CAST(SUM(label) AS BIGINT) AS pos,
                CAST(count(*) - SUM(label) AS BIGINT) AS neg
              FROM pu GROUP BY 1
            ), tot AS (
              SELECT CAST(SUM(label) AS BIGINT) AS p,
                CAST(count(*) - SUM(label) AS BIGINT) AS nn
              FROM pu
            ), c AS (
              SELECT score,
                SUM(pos) OVER (ORDER BY score ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cp,
                SUM(neg) OVER (ORDER BY score ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cn
              FROM t
            ), d AS (
              SELECT score,
                abs(CAST(cp AS DOUBLE) / CAST(p AS DOUBLE) -
                    CAST(cn AS DOUBLE) / CAST(nn AS DOUBLE)) AS diff,
                p, nn
              FROM c, tot
            ), k AS (SELECT MAX(diff) AS ks FROM d)
            SELECT CAST(MAX(p) AS BIGINT) AS n_pos,
              CAST(MAX(nn) AS BIGINT) AS n_neg,
              CAST(MAX(k.ks) AS DOUBLE) AS ks,
              CAST(MIN(score) AS BIGINT) AS ks_score
            FROM d, k WHERE d.diff = k.ks"""),
    "exact KS separation: two-phase prefix-sum CDFs, arg-max threshold [ml-eval]")

  /** Half-saturation constant of q191's probability link: spend of
    * $100 (10000 cents) maps to p = 0.5.
    */
  private val CalK = 10000L

  /** q191: calibration table + binned Brier decomposition. q151 ranks
    * users; this audits whether the score's implied PROBABILITY means
    * what it says. The link p = s/(s+K) (hyperbolic saturation, exact
    * rational) turns spend cents into [0,1) without a transcendental,
    * so the BIN assignment is pure integer arithmetic — bin =
    * (10·s) div (s+K) — and cannot flip on float noise in either
    * engine. Each bin row carries its user/positive counts, observed
    * rate, the bin's midpoint prediction, the calibration gap, and its
    * reliability/resolution terms of the binned Brier decomposition
    * (uncertainty = ȳ(1−ȳ) rides along); the three SUMS are left to
    * the reader per the q156 rule — a cross-engine float sum is
    * order-dependent, every per-bin term here is a fixed IEEE chain on
    * exact integers.
    *
    * Scale: ONE user-keyed corpus fold (perUser), one ≤10-row bin
    * aggregate; N and ȳ are integer window marginals over the bin
    * frame itself (q185's own-marginal trick — no second scan).
    */
  private val q191 = QueryDef(
    (s, d) => {
      val bins = perUser(s, d)
        .select(expr(
          s"(10 * greatest(score, 0L)) div (greatest(score, 0L) + $CalK)")
          .cast("long").as("bin"), col("label"))
        .groupBy(col("bin"))
        .agg(lcountAll.as("n_users"), sum("label").as("n_pos"))
      val all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      val withM = bins
        .withColumn("n_total", sum("n_users").over(all))
        .withColumn("pos_total", sum("n_pos").over(all))
      val obs = col("n_pos").cast("double") / col("n_users").cast("double")
      val pred = (lit(2L) * col("bin") + lit(1L)).cast("double") / lit(20.0)
      val ybar = col("pos_total").cast("double") / col("n_total").cast("double")
      val w = col("n_users").cast("double") / col("n_total").cast("double")
      withM.select(col("bin"), col("n_users"), col("n_pos"),
        obs.as("obs_rate"), pred.as("pred_mid"),
        (obs - pred).as("gap"),
        (w * (obs - pred) * (obs - pred)).as("rel_term"),
        (w * (obs - ybar) * (obs - ybar)).as("res_term"),
        (ybar * (lit(1.0) - ybar)).as("uncertainty"))
    },
    Some(s"""WITH pu AS ($PerUserSql),
            b AS (
              SELECT CAST((10 * greatest(score, 0))
                  // (greatest(score, 0) + $CalK) AS BIGINT) AS bin,
                CAST(count(*) AS BIGINT) AS n_users,
                CAST(SUM(label) AS BIGINT) AS n_pos
              FROM pu GROUP BY 1
            ), m AS (
              SELECT bin, n_users, n_pos,
                CAST(SUM(n_users) OVER () AS BIGINT) AS n_total,
                CAST(SUM(n_pos) OVER () AS BIGINT) AS pos_total
              FROM b
            ), t AS (
              SELECT bin, n_users, n_pos,
                CAST(n_pos AS DOUBLE) / CAST(n_users AS DOUBLE) AS obs_rate,
                CAST(2 * bin + 1 AS DOUBLE) / 20.0 AS pred_mid,
                CAST(pos_total AS DOUBLE) / CAST(n_total AS DOUBLE) AS ybar,
                CAST(n_users AS DOUBLE) / CAST(n_total AS DOUBLE) AS w
              FROM m
            )
            SELECT bin, n_users, n_pos, obs_rate, pred_mid,
              obs_rate - pred_mid AS gap,
              w * (obs_rate - pred_mid) * (obs_rate - pred_mid) AS rel_term,
              w * (obs_rate - ybar) * (obs_rate - ybar) AS res_term,
              ybar * (1.0 - ybar) AS uncertainty
            FROM t"""),
    "calibration bins + binned Brier decomposition terms [ml-eval]")

  /** q234: isotonic-regression calibration of the q191 score bins —
    * the model-free monotone calibrator (PAVA) every scoring pipeline
    * reaches for when q191's table shows non-monotone bin rates: the
    * isotonic fit is the closest nondecreasing sequence to the
    * observed rates under bin weights. Computed by the CLOSED FORM
    * iso(t) = max_{i≤t} min_{j≥t} rate(i..j) (the max-min of weighted
    * interval means — equivalent to pool-adjacent-violators but
    * expressible as bounded joins instead of a sequential pooling
    * loop, which no engine-portable fold could replay cascading
    * merges of).
    *
    * Bins are the ASCENDING-score deciles off q151's scalable global
    * order (position·10 div n — never NTILE, never a one-task global
    * sort), not q191's saturating spend link: on this corpus the link
    * collapses every user into its top bin, which would make the fit a
    * 1-point no-op; deciles are populated by construction, so the
    * isotonic pooling has violations to repair.
    *
    * Scale: ONE user-keyed corpus fold, one range-partitioned rank,
    * then everything runs on the 10-row bin frame; the interval grid
    * (≤55 rows) and the t-expansion (≤220 rows) are bin-domain-bounded
    * joins, broadcast-hinted: unhinted, the planner degrades the
    * non-equi joins to CartesianProduct (the checkpointed frames are
    * LogicalRDDs whose stats it will not trust for a broadcast), and
    * the lint cannot structurally prove a LogicalRDD bounded — so
    * q234 carries a named documented-cap justification there (the
    * hinted frames are the 10-row decile grid and its <=55-row
    * interval expansion, fixed by the literal decile count).
    *
    * Exactness: interval counts are exact integers from prefix sums;
    * each interval mean is ONE double division (identical in both
    * engines), and min/max selection over identical double multisets
    * is order-free → hash-exact, no tolerance contract.
    */
  private val q234 = QueryDef(
    (s, d) => {
      val byBin = Window.orderBy(col("bin").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // ONE corpus fold: the per-user frame materializes here and both
      // the decile-denominator count and the global rank read the
      // checkpointed blocks — the uncheckpointed form paid the fold
      // twice (once for count(), once inside globalOrder)
      val pu = perUser(s, d).localCheckpoint()
      val n = pu.count()
      val bins = Curation.globalOrder(
          pu, Seq(col("score").asc, col("user_id").asc))
        .groupBy(expr(s"(position * 10) div ${n}L").cast("long")
          .as("bin"))
        .agg(lcountAll.as("n_users"), sum("label").as("n_pos"))
        .withColumn("cum_n", sum(col("n_users")).over(byBin))
        .withColumn("cum_p", sum(col("n_pos")).over(byBin))
        .localCheckpoint()
      val lo = bins.select(col("bin").as("i"),
        (col("cum_n") - col("n_users")).as("pre_n"),
        (col("cum_p") - col("n_pos")).as("pre_p"))
      val hi = bins.select(col("bin").as("j"),
        col("cum_n").as("hi_n"), col("cum_p").as("hi_p"))
      val intervals = lo.join(broadcast(hi), col("i") <= col("j"))
        .select(col("i"), col("j"),
          ((col("hi_p") - col("pre_p")).cast("double") /
            (col("hi_n") - col("pre_n")).cast("double")).as("int_rate"))
      val iso = intervals
        .join(broadcast(bins.select(col("bin").as("t"))),
          col("i") <= col("t") && col("t") <= col("j"))
        .groupBy(col("t"), col("i"))
        .agg(min(col("int_rate")).as("min_j"))
        .groupBy(col("t"))
        .agg(max(col("min_j")).as("iso_rate"))
      bins.join(broadcast(iso), col("bin") === col("t"))
        .select(col("bin"), col("n_users"), col("n_pos"),
          (col("n_pos").cast("double") / col("n_users").cast("double"))
            .as("obs_rate"),
          col("iso_rate"),
          (col("iso_rate") =!=
            (col("n_pos").cast("double") / col("n_users").cast("double")))
            .as("pooled"))
    },
    Some(s"""WITH pu AS ($PerUserSql),
            o AS (
              SELECT label,
                ROW_NUMBER() OVER (ORDER BY score ASC, user_id ASC) - 1
                  AS position,
                COUNT(*) OVER () AS n
              FROM pu
            ), b AS (
              SELECT CAST((position * 10) // n AS BIGINT) AS bin,
                CAST(count(*) AS BIGINT) AS n_users,
                CAST(SUM(label) AS BIGINT) AS n_pos
              FROM o GROUP BY 1
            ), c AS (
              SELECT bin, n_users, n_pos,
                CAST(SUM(n_users) OVER (ORDER BY bin
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum_n,
                CAST(SUM(n_pos) OVER (ORDER BY bin
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum_p
              FROM b
            ), iv AS (
              SELECT lo.bin AS i, hi.bin AS j,
                CAST(hi.cum_p - (lo.cum_p - lo.n_pos) AS DOUBLE)
                  / CAST(hi.cum_n - (lo.cum_n - lo.n_users) AS DOUBLE)
                  AS int_rate
              FROM c lo JOIN c hi ON lo.bin <= hi.bin
            ), iso AS (
              SELECT t, MAX(min_j) AS iso_rate FROM (
                SELECT tb.bin AS t, iv.i, MIN(iv.int_rate) AS min_j
                FROM iv JOIN c tb ON iv.i <= tb.bin AND tb.bin <= iv.j
                GROUP BY 1, 2
              ) GROUP BY 1
            )
            SELECT c.bin, c.n_users, c.n_pos,
              CAST(c.n_pos AS DOUBLE) / CAST(c.n_users AS DOUBLE)
                AS obs_rate,
              iso.iso_rate,
              iso.iso_rate <>
                (CAST(c.n_pos AS DOUBLE) / CAST(c.n_users AS DOUBLE))
                AS pooled
            FROM c JOIN iso ON c.bin = iso.t"""),
    "isotonic (PAVA) calibration by bounded max-min interval means: " +
      "hash-exact [ml-eval]")

  /** q249's temporal feature/label split (pre-period activity predicts
    * post-period conversion) and the conversion gate in exact cents.
    */
  private val StumpMid = "2024-01-16 00:00:00"
  private val StumpConvCents = 10000L

  /** q249: histogram-based decision-stump induction — find the single
    * best threshold split "x ≤ t" of pre-period activity predicting
    * post-period high-value conversion, by exact weighted Gini. This
    * is THE distributed-training split-finding kernel: XGBoost/
    * LightGBM's per-feature histogram pass is exactly this shape
    * (fold the corpus to per-bin (count, positives), scan cumulative
    * sums, argmin impurity), and one stump is boosting round zero.
    *
    * Scale: one user-keyed fold (map-side combined) builds the
    * feature/label frame; one fold to the x-histogram (domain-bounded:
    * distinct per-user event counts, corpus-invariant); cumulative
    * (n, positives) ride `PrefixSum.runningSums` — never a one-task
    * rank window. The argmin runs on the bounded candidate frame.
    *
    * Exactness: the split decision NEVER touches a float. Minimizing
    * weighted Gini ⟺ maximizing M(t) = A_l/n_l + A_r/n_r with
    * A = pos² + neg², so "b beats a" is the integer cross-product
    * num_b·den_a > num_a·den_b (num = A_l·n_r + A_r·n_l,
    * den = n_l·n_r) — DECIMAL(38,0)/HUGEINT products ~N⁵, exact to
    * N ≈ 3·10⁷ users; past that the same plan compares per-decile
    * bins (the XGBoost approx-split convention; documented, not
    * silent). The winner is the unique row no rival beats (ties break
    * to the smaller t); Gini values are terminal fixed doubles.
    */
  private val q249 = QueryDef(
    (s, d) => {
      val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
      val perUser = load(s, d, "events")
        .groupBy(col("user_id"))
        .agg(
          sum(when(col("ts") < lit(StumpMid).cast("timestamp"), 1L)
            .otherwise(0L)).as("x"),
          max(when(col("ts") >= lit(StumpMid).cast("timestamp") &&
            col("event_type") === "purchase" &&
            cents(col("value")) >= StumpConvCents, 1L).otherwise(0L))
            .as("y"))
      // the histogram feeds the prefix sum AND the totals fold —
      // materialize the domain-bounded frame once, or the totals
      // branch replays the two corpus aggregations
      val hist = perUser.groupBy(col("x"))
        .agg(lcountAll.as("n_x"), sum(col("y")).as("pos_x"))
        .localCheckpoint()
      val cum = graft.operators.PrefixSum.runningSums(
        hist, Seq(col("x")), Seq("n_x", "pos_x"))
      val tot = hist.agg(sum(col("n_x")).as("n_tot"),
        sum(col("pos_x")).as("pos_tot"))
      val cand = cum.crossJoin(broadcast(tot))
        .filter(col("n_x_cum") < col("n_tot"))
        .select(col("x").as("t"),
          col("n_x_cum").as("n_l"), col("pos_x_cum").as("pos_l"),
          (col("n_tot") - col("n_x_cum")).as("n_r"),
          (col("pos_tot") - col("pos_x_cum")).as("pos_r"),
          col("n_tot"), col("pos_tot"))
        .withColumn("a_l",
          col("pos_l").cast(dec38) * col("pos_l").cast(dec38) +
            (col("n_l") - col("pos_l")).cast(dec38) *
            (col("n_l") - col("pos_l")).cast(dec38))
        .withColumn("a_r",
          col("pos_r").cast(dec38) * col("pos_r").cast(dec38) +
            (col("n_r") - col("pos_r")).cast(dec38) *
            (col("n_r") - col("pos_r")).cast(dec38))
        .withColumn("m_num",
          col("a_l") * col("n_r").cast(dec38) +
            col("a_r") * col("n_l").cast(dec38))
        .withColumn("m_den",
          col("n_l").cast(dec38) * col("n_r").cast(dec38))
        .localCheckpoint()
      val best = cand.as("a").join(broadcast(cand.as("b")),
          col("b.m_num") * col("a.m_den") > col("a.m_num") * col("b.m_den") ||
            (col("b.m_num") * col("a.m_den") ===
              col("a.m_num") * col("b.m_den") && col("b.t") < col("a.t")),
          "left_anti")
      val gl = lit(1.0) -
        (col("pos_l").cast("double") / col("n_l").cast("double")) *
          (col("pos_l").cast("double") / col("n_l").cast("double")) -
        ((col("n_l") - col("pos_l")).cast("double") /
          col("n_l").cast("double")) *
          ((col("n_l") - col("pos_l")).cast("double") /
            col("n_l").cast("double"))
      val gr = lit(1.0) -
        (col("pos_r").cast("double") / col("n_r").cast("double")) *
          (col("pos_r").cast("double") / col("n_r").cast("double")) -
        ((col("n_r") - col("pos_r")).cast("double") /
          col("n_r").cast("double")) *
          ((col("n_r") - col("pos_r")).cast("double") /
            col("n_r").cast("double"))
      best.select(col("t").as("split_x"),
        col("n_l"), col("pos_l"), col("n_r"), col("pos_r"),
        gl.as("gini_left"), gr.as("gini_right"),
        ((col("n_l").cast("double") * gl + col("n_r").cast("double") * gr) /
          col("n_tot").cast("double")).as("weighted_gini"))
    },
    Some(s"""WITH pu AS (
              SELECT user_id,
                CAST(SUM(CASE WHEN ts < TIMESTAMP '$StumpMid'
                  THEN 1 ELSE 0 END) AS BIGINT) AS x,
                CAST(MAX(CASE WHEN ts >= TIMESTAMP '$StumpMid'
                  AND event_type = 'purchase'
                  AND ${centsSql("value")} >= $StumpConvCents
                  THEN 1 ELSE 0 END) AS BIGINT) AS y
              FROM events GROUP BY 1
            ), h AS (
              SELECT x, CAST(count(*) AS BIGINT) AS n_x,
                CAST(SUM(y) AS BIGINT) AS pos_x
              FROM pu GROUP BY 1
            ), c AS (
              SELECT x, n_x, pos_x,
                CAST(SUM(n_x) OVER (ORDER BY x) AS BIGINT) AS n_l,
                CAST(SUM(pos_x) OVER (ORDER BY x) AS BIGINT) AS pos_l
              FROM h
            ), tot AS (
              SELECT CAST(SUM(n_x) AS BIGINT) AS n_tot,
                CAST(SUM(pos_x) AS BIGINT) AS pos_tot
              FROM h
            ), cand AS (
              SELECT x AS t, n_l, pos_l,
                n_tot - n_l AS n_r, pos_tot - pos_l AS pos_r,
                n_tot, pos_tot,
                CAST(pos_l AS HUGEINT) * pos_l
                  + CAST(n_l - pos_l AS HUGEINT) * (n_l - pos_l) AS a_l,
                CAST(pos_tot - pos_l AS HUGEINT) * (pos_tot - pos_l)
                  + CAST((n_tot - n_l) - (pos_tot - pos_l) AS HUGEINT)
                    * ((n_tot - n_l) - (pos_tot - pos_l)) AS a_r
              FROM c, tot WHERE n_l < n_tot
            ), m AS (
              SELECT *, a_l * (n_tot - n_l) + a_r * n_l AS m_num,
                CAST(n_l AS HUGEINT) * (n_tot - n_l) AS m_den
              FROM cand
            ), best AS (
              SELECT * FROM m a WHERE NOT EXISTS (
                SELECT 1 FROM m b
                WHERE b.m_num * a.m_den > a.m_num * b.m_den
                  OR (b.m_num * a.m_den = a.m_num * b.m_den
                      AND b.t < a.t))
            )
            SELECT t AS split_x, n_l, pos_l, n_r, pos_r,
              1.0 - (CAST(pos_l AS DOUBLE) / CAST(n_l AS DOUBLE))
                  * (CAST(pos_l AS DOUBLE) / CAST(n_l AS DOUBLE))
                - (CAST(n_l - pos_l AS DOUBLE) / CAST(n_l AS DOUBLE))
                  * (CAST(n_l - pos_l AS DOUBLE) / CAST(n_l AS DOUBLE))
                AS gini_left,
              1.0 - (CAST(pos_r AS DOUBLE) / CAST(n_r AS DOUBLE))
                  * (CAST(pos_r AS DOUBLE) / CAST(n_r AS DOUBLE))
                - (CAST(n_r - pos_r AS DOUBLE) / CAST(n_r AS DOUBLE))
                  * (CAST(n_r - pos_r AS DOUBLE) / CAST(n_r AS DOUBLE))
                AS gini_right,
              (CAST(n_l AS DOUBLE) * (1.0
                  - (CAST(pos_l AS DOUBLE) / CAST(n_l AS DOUBLE))
                    * (CAST(pos_l AS DOUBLE) / CAST(n_l AS DOUBLE))
                  - (CAST(n_l - pos_l AS DOUBLE) / CAST(n_l AS DOUBLE))
                    * (CAST(n_l - pos_l AS DOUBLE) / CAST(n_l AS DOUBLE)))
                + CAST(n_r AS DOUBLE) * (1.0
                  - (CAST(pos_r AS DOUBLE) / CAST(n_r AS DOUBLE))
                    * (CAST(pos_r AS DOUBLE) / CAST(n_r AS DOUBLE))
                  - (CAST(n_r - pos_r AS DOUBLE) / CAST(n_r AS DOUBLE))
                    * (CAST(n_r - pos_r AS DOUBLE) / CAST(n_r AS DOUBLE))))
                / CAST(n_tot AS DOUBLE) AS weighted_gini
            FROM best"""),
    "decision-stump split finding by exact weighted Gini: histogram " +
      "fold + prefix sums, integer cross-product argmin [ml-eval]")

  def all: Seq[(String, QueryDef)] = Seq(
    "q151_gains_table" -> q151,
    "q152_exact_auc" -> q152,
    "q154_ks_statistic" -> q154,
    "q191_calibration_bins" -> q191,
    "q234_isotonic_calibration" -> q234,
    "q249_stump_split" -> q249)
}
