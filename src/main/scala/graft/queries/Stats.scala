package graft.queries

import graft.QueryDef
import graft.common.Tables.load
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Exact-arithmetic statistics operators: experiment readouts (CUPED
  * variance reduction) and a correlation matrix. The repo-wide float
  * discipline, applied to second moments: every cross-row sum is an
  * integer (cents / quantized units) or an exact DECIMAL, and doubles
  * appear only in a fixed final expression sequence — so covariance and
  * correlation, normally the canonical partial-order-dependent
  * quantities, are bitwise-reproducible on any cluster topology AND
  * hash-comparable against the DuckDB oracle.
  */
object Stats {

  /** Experiment split date: pre-period covariate before it, outcome
    * after. Events span 2024-01; the midpoint makes both periods
    * populous.
    */
  private val Mid = "2024-01-16 00:00:00"
  private val ArmSeed = 777L

  /** q142: CUPED-adjusted A/B readout. Users hash-assign to two arms
    * (the seeded portable hash — reproducible, growth-stable). Per
    * user: x = pre-period event count (the covariate), y = post-period
    * spend in cents. θ = cov(x,y)/var(x) from POOLED exact integer
    * moments (n·Σxy − Σx·Σy over n·Σx² − (Σx)²); each arm's adjusted
    * mean is ȳ_a − θ·(x̄_a − x̄). CUPED with a pre-period covariate is
    * how experiment platforms cut readout variance ~50% without
    * touching assignment.
    *
    * Scale: one user-keyed aggregate (map-side combined) builds the
    * per-user frame; the pooled moment fold and the per-arm fold are
    * two tiny aggregates over it, and the 1-row moment frame broadcasts
    * back onto the 2-row arm frame. Nothing after the first exchange is
    * corpus-sized.
    *
    * Exactness: cents quantize as ⌊100·v⌉ per event (portable); all
    * moments are i64 (bounds: |users|·x̄·ȳ ≈ 10^14 at sf0.1; the
    * 10^9-user deployment switches the three moment sums to
    * DECIMAL(38,0), same plan). θ and the means are a FIXED sequence of
    * IEEE ops written identically in both engines.
    */
  private val q142 = QueryDef(
    (s, d) => {
      val perUser = load(s, d, "events")
        .groupBy(col("user_id"))
        .agg(
          sum(when(col("ts") < lit(Mid).cast("timestamp"), 1L).otherwise(0L))
            .as("x"),
          sum(when(col("ts") >= lit(Mid).cast("timestamp"),
            graft.common.Exact.cents(col("value"))).otherwise(0L))
            .as("y"))
        .withColumn("arm",
          when(Curation.shuffleKeyWith(col("user_id"), ArmSeed) % 2L === 0L,
            "control").otherwise("treatment"))
      val moments = perUser.agg(
        count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"))
      val arms = perUser.groupBy(col("arm"))
        .agg(count(lit(1)).as("n_users"),
          sum("x").as("sum_x"), sum("y").as("sum_y"))
      arms.crossJoin(broadcast(moments))
        .withColumn("theta",
          (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
            (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
        .withColumn("mean_x", col("sum_x").cast("double") /
          col("n_users").cast("double"))
        .withColumn("mean_y_cents", col("sum_y").cast("double") /
          col("n_users").cast("double"))
        .withColumn("adjusted_mean_cents",
          col("mean_y_cents") - col("theta") *
            (col("mean_x") - col("sx").cast("double") / col("n").cast("double")))
        .select(col("arm"), col("n_users"), col("sum_x"), col("sum_y"),
          col("theta"), col("mean_y_cents"), col("adjusted_mean_cents"))
    },
    Some {
      val arm = s"CASE WHEN (${Curation.shuffleKeySqlWith("user_id", ArmSeed)}) % 2 = 0 " +
        "THEN 'control' ELSE 'treatment' END"
      s"""WITH pu AS (
            SELECT user_id,
              CAST(SUM(CASE WHEN ts < TIMESTAMP '$Mid' THEN 1 ELSE 0 END)
                AS BIGINT) AS x,
              CAST(SUM(CASE WHEN ts >= TIMESTAMP '$Mid'
                THEN ${graft.common.Exact.centsSql("value")}
                ELSE 0 END) AS BIGINT) AS y,
              $arm AS arm
            FROM events GROUP BY user_id
          ), m AS (
            SELECT CAST(count(*) AS BIGINT) AS n,
              CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
              CAST(SUM(x * x) AS BIGINT) AS sxx,
              CAST(SUM(x * y) AS BIGINT) AS sxy
            FROM pu
          ), a AS (
            SELECT arm, CAST(count(*) AS BIGINT) AS n_users,
              CAST(SUM(x) AS BIGINT) AS sum_x,
              CAST(SUM(y) AS BIGINT) AS sum_y
            FROM pu GROUP BY 1
          )
          SELECT arm, n_users, sum_x, sum_y,
            CAST(m.n * m.sxy - m.sx * m.sy AS DOUBLE) /
              CAST(m.n * m.sxx - m.sx * m.sx AS DOUBLE) AS theta,
            CAST(sum_y AS DOUBLE) / CAST(n_users AS DOUBLE)
              AS mean_y_cents,
            CAST(sum_y AS DOUBLE) / CAST(n_users AS DOUBLE) -
              (CAST(m.n * m.sxy - m.sx * m.sy AS DOUBLE) /
               CAST(m.n * m.sxx - m.sx * m.sx AS DOUBLE)) *
              (CAST(sum_x AS DOUBLE) / CAST(n_users AS DOUBLE) -
               CAST(m.sx AS DOUBLE) / CAST(m.n AS DOUBLE))
              AS adjusted_mean_cents
          FROM a, m"""
    },
    "CUPED experiment readout: exact integer moments, broadcast θ [stats]")

  /** q143: exact Pearson correlation matrix over lineitem numeric
    * columns. corr = (n·Σxy − Σx·Σy) / (√(n·Σx²−(Σx)²)·√(n·Σy²−(Σy)²))
    * with every Σ an exact DECIMAL(38,0) of integer-quantized values —
    * the second moments of a 100 TB fact table without a single
    * order-dependent double sum (Σ(price_cents)² overflows i64 at this
    * scale already; DECIMAL(38,0) holds to ~10^38, i.e. ~10^24 rows).
    *
    * Scale: ONE global aggregate computes all 9 moments in a single
    * pass (no per-pair rescan); the matrix assembles from the 1-row
    * moment frame. Partial aggregation is exact-decimal, so any merge
    * order yields the same bits.
    *
    * Float parity: numerator/denominator terms cast DECIMAL→DOUBLE
    * (correctly rounded in both engines), then a fixed √·√·÷ sequence.
    */
  private val q143 = QueryDef(
    (s, d) => {
      val dec = DecimalType(38, 0)
      val li = load(s, d, "lineitem").select(
        col("l_quantity").cast("long").as("q"),
        graft.common.Exact.cents(col("l_extendedprice")).as("p"),
        graft.common.Exact.cents(col("l_discount")).as("disc"))
      val m = li.agg(
        count(lit(1)).cast(dec).as("n"),
        sum(col("q").cast(dec)).as("sq"),
        sum(col("p").cast(dec)).as("sp"),
        sum(col("disc").cast(dec)).as("sd"),
        sum((col("q") * col("q")).cast(dec)).as("sqq"),
        sum((col("p").cast(dec) * col("p").cast(dec))).as("spp"),
        sum((col("disc").cast(dec) * col("disc").cast(dec))).as("sdd"),
        sum((col("q").cast(dec) * col("p").cast(dec))).as("sqp"),
        sum((col("q").cast(dec) * col("disc").cast(dec))).as("sqd"),
        sum((col("p").cast(dec) * col("disc").cast(dec))).as("spd"))
      def corr(sx: String, sy: String, sxx: String, syy: String,
          sxy: String) =
        (col("n") * col(sxy) - col(sx) * col(sy)).cast("double") /
          (sqrt((col("n") * col(sxx) - col(sx) * col(sx)).cast("double")) *
            sqrt((col("n") * col(syy) - col(sy) * col(sy)).cast("double")))
      m.select(
        col("n").cast("long").as("n_rows"),
        corr("sq", "sp", "sqq", "spp", "sqp").as("corr_qty_price"),
        corr("sq", "sd", "sqq", "sdd", "sqd").as("corr_qty_discount"),
        corr("sp", "sd", "spp", "sdd", "spd").as("corr_price_discount"))
    },
    Some(s"""WITH li AS (
              SELECT CAST(l_quantity AS BIGINT) AS q,
                ${graft.common.Exact.centsSql("l_extendedprice")} AS p,
                ${graft.common.Exact.centsSql("l_discount")} AS disc
              FROM lineitem
            ), m AS (
              SELECT CAST(count(*) AS HUGEINT) AS n,
                CAST(SUM(q) AS HUGEINT) AS sq,
                CAST(SUM(p) AS HUGEINT) AS sp,
                CAST(SUM(disc) AS HUGEINT) AS sd,
                SUM(CAST(q AS HUGEINT) * q) AS sqq,
                SUM(CAST(p AS HUGEINT) * p) AS spp,
                SUM(CAST(disc AS HUGEINT) * disc) AS sdd,
                SUM(CAST(q AS HUGEINT) * p) AS sqp,
                SUM(CAST(q AS HUGEINT) * disc) AS sqd,
                SUM(CAST(p AS HUGEINT) * disc) AS spd
              FROM li
            )
            SELECT CAST(n AS BIGINT) AS n_rows,
              CAST(n * sqp - sq * sp AS DOUBLE) /
                (sqrt(CAST(n * sqq - sq * sq AS DOUBLE)) *
                 sqrt(CAST(n * spp - sp * sp AS DOUBLE)))
                AS corr_qty_price,
              CAST(n * sqd - sq * sd AS DOUBLE) /
                (sqrt(CAST(n * sqq - sq * sq AS DOUBLE)) *
                 sqrt(CAST(n * sdd - sd * sd AS DOUBLE)))
                AS corr_qty_discount,
              CAST(n * spd - sp * sd AS DOUBLE) /
                (sqrt(CAST(n * spp - sp * sp AS DOUBLE)) *
                 sqrt(CAST(n * sdd - sd * sd AS DOUBLE)))
                AS corr_price_discount
            FROM m"""),
    "exact Pearson matrix: one-pass DECIMAL moments, fixed IEEE tail [stats]")

  /** q160: two-proportion z-test on conversion — the yes/no twin of
    * q142's CUPED means readout. Users hash-assign to the same two
    * seeded arms; converted = any post-period HIGH-VALUE purchase
    * (≥ $100 — the plain any-purchase flag saturates to 100% on a
    * dense event stream and the test degenerates). One row: per-arm
    * exact counts, rates, and the pooled z statistic, NULL when the
    * pooled rate is 0 or 1 (zero variance — emitting 0/0 would throw
    * under ANSI semantics rather than convey "no information").
    *
    * Scale: one user-keyed aggregate (map-side combined) then a 2-row
    * fold; the final frame is a single row assembled from exact i64
    * counts.
    *
    * Exactness: counts are integers; every double is a FIXED sequence
    * of correctly-rounded IEEE ops (÷, −, ×, √) written identically in
    * both engines — bit-identical with no tolerance.
    */
  private val ConvCents = 10000L // $100, compared in exact cents

  private val q160 = QueryDef(
    (s, d) => {
      val perUser = load(s, d, "events")
        .groupBy(col("user_id"))
        .agg(max(when(col("ts") >= lit(Mid).cast("timestamp") &&
          col("event_type") === "purchase" &&
          graft.common.Exact.cents(col("value")) >= ConvCents,
          1L).otherwise(0L)).as("conv"))
        .withColumn("arm",
          when(Curation.shuffleKeyWith(col("user_id"), ArmSeed) % 2L === 0L,
            0L).otherwise(1L))
      val arms = perUser.groupBy(col("arm"))
        .agg(count(lit(1)).as("n"), sum("conv").as("x"))
      val wide = arms.agg(
        sum(when(col("arm") === 0L, col("n"))).as("n1"),
        sum(when(col("arm") === 0L, col("x"))).as("x1"),
        sum(when(col("arm") === 1L, col("n"))).as("n2"),
        sum(when(col("arm") === 1L, col("x"))).as("x2"))
      wide.select(col("n1"), col("x1"), col("n2"), col("x2"),
        (col("x1").cast("double") / col("n1").cast("double")).as("p1"),
        (col("x2").cast("double") / col("n2").cast("double")).as("p2"),
        when(col("x1") + col("x2") === 0L ||
          col("x1") + col("x2") === col("n1") + col("n2"),
          lit(null).cast("double"))
          .otherwise(
            (col("x1").cast("double") / col("n1").cast("double") -
              col("x2").cast("double") / col("n2").cast("double")) /
              sqrt((col("x1") + col("x2")).cast("double") /
                (col("n1") + col("n2")).cast("double") *
                (lit(1.0) - (col("x1") + col("x2")).cast("double") /
                  (col("n1") + col("n2")).cast("double")) *
                (lit(1.0) / col("n1").cast("double") +
                  lit(1.0) / col("n2").cast("double")))).as("z"))
    },
    Some {
      val arm = s"CASE WHEN (${Curation.shuffleKeySqlWith("user_id", ArmSeed)}) % 2 = 0 " +
        "THEN 0 ELSE 1 END"
      s"""WITH pu AS (
            SELECT user_id,
              CAST(MAX(CASE WHEN ts >= TIMESTAMP '$Mid'
                AND event_type = 'purchase'
                AND ${graft.common.Exact.centsSql("value")} >= $ConvCents
                THEN 1 ELSE 0 END) AS BIGINT)
                AS conv,
              $arm AS arm
            FROM events GROUP BY user_id
          ), a AS (
            SELECT arm, CAST(count(*) AS BIGINT) AS n,
              CAST(SUM(conv) AS BIGINT) AS x
            FROM pu GROUP BY 1
          ), w AS (
            SELECT
              CAST(SUM(CASE WHEN arm = 0 THEN n END) AS BIGINT) AS n1,
              CAST(SUM(CASE WHEN arm = 0 THEN x END) AS BIGINT) AS x1,
              CAST(SUM(CASE WHEN arm = 1 THEN n END) AS BIGINT) AS n2,
              CAST(SUM(CASE WHEN arm = 1 THEN x END) AS BIGINT) AS x2
            FROM a
          )
          SELECT n1, x1, n2, x2,
            CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS p1,
            CAST(x2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS p2,
            CASE WHEN x1 + x2 = 0 OR x1 + x2 = n1 + n2 THEN NULL
            ELSE
              (CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE) -
               CAST(x2 AS DOUBLE) / CAST(n2 AS DOUBLE)) /
              sqrt(CAST(x1 + x2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE) *
                (1.0 - CAST(x1 + x2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE)) *
                (1.0 / CAST(n1 AS DOUBLE) + 1.0 / CAST(n2 AS DOUBLE)))
            END AS z
          FROM w"""
    },
    "two-proportion z-test: seeded arms, exact counts, fixed IEEE chain [stats]")

  /** q163: grouped simple linear regression (OLS slope + intercept) —
    * price-on-quantity per return flag, the per-segment trend readout.
    * q142's pooled-moment θ generalized to per-group regressions:
    * β_g = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²), α_g = (Σy − βΣx)/n, r²_g from
    * the same moments.
    *
    * Scale: ONE map-side-combined grouped aggregate computes all five
    * moments per group in a single corpus pass (no per-group rescan);
    * the β/α/r² assembly runs on the |groups| frame. Moments are
    * DECIMAL(38,0) like q143 — Σ(cents²) overflows i64 on a fact table.
    *
    * Exactness: moments exact; β, α, r² are fixed IEEE chains on
    * DECIMAL→DOUBLE casts, identical in both engines. Degenerate
    * groups (constant x or constant y → zero variance) emit NULL via
    * guards on the EXACT integer denominators — a float division by
    * zero here would surface engine-dependent NaN/Inf behavior.
    */
  private val q163 = QueryDef(
    (s, d) => {
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      val li = load(s, d, "lineitem").select(
        col("l_returnflag").as("grp"),
        col("l_quantity").cast("long").as("x"),
        graft.common.Exact.cents(col("l_extendedprice")).as("y"))
      val m = li.groupBy(col("grp")).agg(
        count(lit(1)).cast(dec).as("n"),
        sum(col("x").cast(dec)).as("sx"),
        sum(col("y").cast(dec)).as("sy"),
        sum((col("x") * col("x")).cast(dec)).as("sxx"),
        sum((col("y").cast(dec) * col("y").cast(dec))).as("syy"),
        sum((col("x").cast(dec) * col("y").cast(dec))).as("sxy"))
      val denxInt = col("n") * col("sxx") - col("sx") * col("sx")
      val denyInt = col("n") * col("syy") - col("sy") * col("sy")
      val num = (col("n") * col("sxy") - col("sx") * col("sy"))
        .cast("double")
      val denx = denxInt.cast("double")
      val deny = denyInt.cast("double")
      val nullD = lit(null).cast("double")
      m.select(col("grp"), col("n").cast("long").as("n_rows"),
        when(denxInt === 0, nullD).otherwise(num / denx).as("slope"),
        when(denxInt === 0, nullD).otherwise(
          (col("sy").cast("double") - (num / denx) *
            col("sx").cast("double")) / col("n").cast("double"))
          .as("intercept"),
        when(denxInt === 0 || denyInt === 0, nullD)
          .otherwise(num / denx * (num / deny)).as("r2"))
    },
    Some(s"""WITH li AS (
              SELECT l_returnflag AS grp,
                CAST(l_quantity AS BIGINT) AS x,
                ${graft.common.Exact.centsSql("l_extendedprice")} AS y
              FROM lineitem
            ), m AS (
              SELECT grp, CAST(count(*) AS HUGEINT) AS n,
                CAST(SUM(x) AS HUGEINT) AS sx,
                CAST(SUM(y) AS HUGEINT) AS sy,
                SUM(CAST(x AS HUGEINT) * x) AS sxx,
                SUM(CAST(y AS HUGEINT) * y) AS syy,
                SUM(CAST(x AS HUGEINT) * y) AS sxy
              FROM li GROUP BY 1
            )
            SELECT grp, CAST(n AS BIGINT) AS n_rows,
              CASE WHEN n * sxx - sx * sx = 0 THEN NULL ELSE
                CAST(n * sxy - sx * sy AS DOUBLE) /
                  CAST(n * sxx - sx * sx AS DOUBLE) END AS slope,
              CASE WHEN n * sxx - sx * sx = 0 THEN NULL ELSE
                (CAST(sy AS DOUBLE) -
                  CAST(n * sxy - sx * sy AS DOUBLE) /
                    CAST(n * sxx - sx * sx AS DOUBLE) *
                  CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) END AS intercept,
              CASE WHEN n * sxx - sx * sx = 0
                     OR n * syy - sy * sy = 0 THEN NULL ELSE
                CAST(n * sxy - sx * sy AS DOUBLE) /
                  CAST(n * sxx - sx * sx AS DOUBLE) *
                  (CAST(n * sxy - sx * sy AS DOUBLE) /
                   CAST(n * syy - sy * sy AS DOUBLE)) END AS r2
            FROM m"""),
    "grouped OLS: one-pass DECIMAL moments, per-group slope/intercept/r2 [stats]")

  /** q168: mutual information between two categorical features
    * (customer nation × market segment) — the feature-selection /
    * redundancy screen: MI = Σ_cells p(x,y)·ln(p(x,y)/(p(x)p(y))).
    * Emits one row per observed cell with its joint count, both
    * marginals, the grand total, and the cell's MI term; the corpus MI
    * is the sum of `mi_term` (left to the reader so every cell stays
    * individually auditable).
    *
    * Scale: ONE customer-keyed aggregate pays the corpus scan; the
    * joint frame is |X|·|Y| cells (bounded by the cross-cardinality,
    * not the row count), so the three marginal windows run over a
    * dimension-sized frame — the same contract as q155's bin frame.
    *
    * Exactness: counts are exact longs (window sums over the joint
    * frame, no corpus re-scan); `mi_term` is a fixed IEEE sequence
    * whose one transcendental (`ln`) is tolerance-checked by the
    * derived oracle, with the ratio's numerator/denominator built from
    * integer products so the ln argument itself is bit-identical.
    */
  private val q168 = QueryDef(
    (s, d) => {
      val joint = load(s, d, "customer")
        .groupBy(col("c_nationkey"), col("c_mktsegment"))
        .agg(count(lit(1)).cast("long").as("n_xy"))
      val wx = Window.partitionBy(col("c_nationkey"))
      val wy = Window.partitionBy(col("c_mktsegment"))
      val wAll = Window.partitionBy()
      joint.select(col("c_nationkey"), col("c_mktsegment"), col("n_xy"),
        sum("n_xy").over(wx).as("n_x"),
        sum("n_xy").over(wy).as("n_y"),
        sum("n_xy").over(wAll).as("n_tot"))
        .withColumn("mi_term",
          (col("n_xy").cast("double") / col("n_tot").cast("double")) *
            log((col("n_xy") * col("n_tot")).cast("double") /
              (col("n_x") * col("n_y")).cast("double")))
    },
    Some(s"""WITH joint AS (
              SELECT c_nationkey, c_mktsegment,
                CAST(count(*) AS BIGINT) AS n_xy
              FROM customer GROUP BY 1, 2
            ), r AS (
              SELECT c_nationkey, c_mktsegment, n_xy,
                CAST(SUM(n_xy) OVER (PARTITION BY c_nationkey) AS BIGINT)
                  AS n_x,
                CAST(SUM(n_xy) OVER (PARTITION BY c_mktsegment) AS BIGINT)
                  AS n_y,
                CAST(SUM(n_xy) OVER () AS BIGINT) AS n_tot
              FROM joint
            ), emitted AS (
              SELECT * FROM read_parquet(
                '${QueryDef.OutDirToken}/q168_categorical_mi/*.parquet')
            )
            SELECT e.c_nationkey, e.c_mktsegment, e.n_xy, e.n_x, e.n_y,
              e.n_tot, e.mi_term
            FROM emitted e JOIN r
              ON e.c_nationkey = r.c_nationkey
              AND e.c_mktsegment = r.c_mktsegment
              AND e.n_xy = r.n_xy AND e.n_x = r.n_x AND e.n_y = r.n_y
              AND e.n_tot = r.n_tot
            WHERE abs(e.mi_term -
              (CAST(r.n_xy AS DOUBLE) / CAST(r.n_tot AS DOUBLE)) *
                ln(CAST(r.n_xy * r.n_tot AS DOUBLE) /
                   CAST(r.n_x * r.n_y AS DOUBLE))) < 1e-12"""),
    "categorical mutual information: joint counts + marginal windows, ln tolerance oracle [stats]")

  /** Exposure window of q202's observational design, in days from the
    * corpus start; activity strata cap. */
  private val IpwExposureDays = 7
  private val IpwStrataCap = 4

  /** q202: stratified / inverse-propensity-weighted uplift readout —
    * the OBSERVATIONAL counterpart to q142's randomized CUPED. Users
    * are "treated" if they clicked during the first exposure week;
    * outcome is any later purchase; confounding by activity is
    * adjusted by stratifying on the week-1 event count (bucketed by
    * fives and capped, so strata are bounded and populated). Within a stratum the propensity is the exact
    * rational n_t/n, and the per-stratum uplift rate_t − rate_c IS the
    * IPW contribution for that cell — the output keeps the per-stratum
    * rows (with their integer evidence) rather than folding a corpus-
    * wide float sum, per the q156 leave-the-sum-to-the-reader rule.
    *
    * Scale: the window boundary is a 1-row broadcast; ONE user-keyed
    * aggregate (map-side combined) builds exposure, treatment and
    * outcome per user in the same pass; the stratum fold collapses to
    * ≤[[IpwStrataCap]]+1 rows (`least(n div 5, cap)` yields strata
    * 0..cap inclusive). Nothing after the first exchange is
    * corpus-sized.
    *
    * Exactness: all evidence is integer counts; rates are single
    * long/long divisions and the uplift one subtraction (fixed IEEE
    * chain, direct oracle). Degenerate cells (no treated or no control
    * users) emit NULL via the q163 integer guard.
    */
  private val q202 = QueryDef(
    (s, d) => {
      val ev = load(s, d, "events")
      val ref = ev.agg(
        date_add(min(col("ts")).cast("date"), IpwExposureDays)
          .cast("timestamp").as("w1_end"))
      val users = ev.crossJoin(broadcast(ref))
        .groupBy(col("user_id"))
        .agg(
          sum(when(col("ts") < col("w1_end"), 1L).otherwise(0L)).as("n_w1"),
          max(when(col("ts") < col("w1_end") &&
            col("event_type") === "click", 1L).otherwise(0L)).as("treated"),
          max(when(col("ts") >= col("w1_end") &&
            col("event_type") === "purchase", 1L).otherwise(0L))
            .as("purchased"))
        .filter(col("n_w1") > 0L)
        .withColumn("stratum",
          least(expr("n_w1 div 5"), lit(IpwStrataCap.toLong)))
      users.groupBy(col("stratum"))
        .agg(
          graft.common.Exact.lcountAll.as("n_users"),
          sum(col("treated")).as("n_treated"),
          sum(lit(1L) - col("treated")).as("n_control"),
          sum(col("treated") * col("purchased")).as("y_treated"),
          sum((lit(1L) - col("treated")) * col("purchased")).as("y_control"))
        .withColumn("rate_treated",
          when(col("n_treated") === 0L, lit(null))
            .otherwise(col("y_treated").cast("double") /
              col("n_treated").cast("double")))
        .withColumn("rate_control",
          when(col("n_control") === 0L, lit(null))
            .otherwise(col("y_control").cast("double") /
              col("n_control").cast("double")))
        .withColumn("uplift", col("rate_treated") - col("rate_control"))
    },
    Some(s"""WITH ref AS (
              SELECT CAST(CAST(min(ts) AS DATE) + $IpwExposureDays
                AS TIMESTAMP) AS w1_end
              FROM events
            ), users AS (
              SELECT user_id,
                SUM(CASE WHEN ts < w1_end THEN 1 ELSE 0 END) AS n_w1,
                MAX(CASE WHEN ts < w1_end AND event_type = 'click'
                  THEN 1 ELSE 0 END) AS treated,
                MAX(CASE WHEN ts >= w1_end AND event_type = 'purchase'
                  THEN 1 ELSE 0 END) AS purchased
              FROM events, ref GROUP BY 1
            ), strat AS (
              SELECT LEAST(n_w1 // 5, $IpwStrataCap) AS stratum, treated,
                purchased
              FROM users WHERE n_w1 > 0
            )
            SELECT CAST(stratum AS BIGINT) AS stratum,
              CAST(count(*) AS BIGINT) AS n_users,
              CAST(SUM(treated) AS BIGINT) AS n_treated,
              CAST(SUM(1 - treated) AS BIGINT) AS n_control,
              CAST(SUM(treated * purchased) AS BIGINT) AS y_treated,
              CAST(SUM((1 - treated) * purchased) AS BIGINT) AS y_control,
              CASE WHEN SUM(treated) = 0 THEN NULL
                ELSE CAST(SUM(treated * purchased) AS DOUBLE) /
                  CAST(SUM(treated) AS DOUBLE) END AS rate_treated,
              CASE WHEN SUM(1 - treated) = 0 THEN NULL
                ELSE CAST(SUM((1 - treated) * purchased) AS DOUBLE) /
                  CAST(SUM(1 - treated) AS DOUBLE) END AS rate_control,
              (CASE WHEN SUM(treated) = 0 THEN NULL
                ELSE CAST(SUM(treated * purchased) AS DOUBLE) /
                  CAST(SUM(treated) AS DOUBLE) END) -
              (CASE WHEN SUM(1 - treated) = 0 THEN NULL
                ELSE CAST(SUM((1 - treated) * purchased) AS DOUBLE) /
                  CAST(SUM(1 - treated) AS DOUBLE) END) AS uplift
            FROM strat GROUP BY 1"""),
    "stratified IPW uplift: exposure-week treatment, integer evidence, guarded rates [stats]")

  /** q214: exact Spearman rank correlation between a customer's
    * account balance and their lifetime spend — the monotone-
    * association readout q143's Pearson misses (Pearson sees only
    * LINEAR association; a feature screen over heavy-tailed monetary
    * columns wants the rank statistic).
    *
    * Ranks come from TWO scalable global orders (q100/q152's
    * `Curation.globalOrder`: range-repartition + per-partition offset
    * assignment — no one-partition window anywhere), each made total
    * by the custkey tiebreak: q152's deterministic-variant tie policy,
    * identical in both engines. Because each rank column is then a
    * permutation of 0..n−1, Spearman reduces EXACTLY to
    * 1 − 6·Σd²/(n·(n²−1)) — integer evidence end to end, one double
    * division at the very edge.
    *
    * Overflow: Σd² and n·(n²−1) reach ~n³ — past BIGINT at n ≳ 2M
    * with d ~ n. Both sides accumulate in 128-bit integers (Spark
    * DECIMAL(38,0), DuckDB HUGEINT), exact to n ~ 10¹². The final
    * rho is nearest-double of those exact integers on both engines,
    * so parity is bitwise. The Σd² evidence is EMITTED as a canonical
    * decimal STRING (the q89 surface rule: the driver's hash
    * canonicalization handles STRING, not DECIMAL, and BIGINT cannot
    * hold a genuinely 128-bit moment).
    *
    * Scale: one orders fold (map-side combined), an inner key join
    * with customer, two globalOrder passes over the joined |customers|
    * frame, one scalar aggregate. Customers with no orders are
    * excluded by the inner join (spend undefined, documented).
    */
  private val q214 = QueryDef(
    (s, d) => {
      val spend = load(s, d, "orders")
        .groupBy(col("o_custkey").as("c_custkey"))
        .agg(sum(graft.common.Exact.cents(col("o_totalprice")))
          .as("spend_cents"))
      // materialized once: both rank passes re-ran the orders fold +
      // customer join without the cut (r16; guide §2.4)
      val both = load(s, d, "customer")
        .select(col("c_custkey"),
          graft.common.Exact.cents(col("c_acctbal")).as("bal_cents"))
        .join(spend, "c_custkey")
        .localCheckpoint()
      val rx = Curation.globalOrder(both,
          Seq(col("bal_cents").asc, col("c_custkey").asc))
        .select(col("c_custkey"), col("position").as("rank_bal"))
      val ry = Curation.globalOrder(both,
          Seq(col("spend_cents").asc, col("c_custkey").asc))
        .select(col("c_custkey"), col("position").as("rank_spend"))
      rx.join(ry, "c_custkey")
        .agg(graft.common.Exact.lcountAll.as("n"),
          sum(((col("rank_bal") - col("rank_spend")).cast("decimal(38,0)") *
            (col("rank_bal") - col("rank_spend")).cast("decimal(38,0)"))
            .cast("decimal(38,0)")).as("d2_sum"))
        .select(col("n"), col("d2_sum").cast("string").as("d2_sum"),
          (lit(1.0) - (lit(6.0) * col("d2_sum").cast("double")) /
            (col("n").cast("decimal(38,0)") *
              (col("n").cast("decimal(38,0)") *
                col("n").cast("decimal(38,0)") - 1))
              .cast("double")).as("rho"))
    },
    Some(s"""WITH spend AS (
              SELECT o_custkey AS c_custkey,
                CAST(SUM(${graft.common.Exact.centsSql("o_totalprice")})
                  AS BIGINT) AS spend_cents
              FROM orders GROUP BY 1
            ), both_m AS (
              SELECT c.c_custkey,
                ${graft.common.Exact.centsSql("c_acctbal")} AS bal_cents,
                s.spend_cents
              FROM customer c JOIN spend s USING (c_custkey)
            ), ranked AS (
              SELECT c_custkey,
                ROW_NUMBER() OVER (ORDER BY bal_cents ASC, c_custkey ASC)
                  - 1 AS rank_bal,
                ROW_NUMBER() OVER (ORDER BY spend_cents ASC, c_custkey ASC)
                  - 1 AS rank_spend
              FROM both_m
            )
            SELECT CAST(count(*) AS BIGINT) AS n,
              CAST(SUM(CAST(rank_bal - rank_spend AS HUGEINT)
                * CAST(rank_bal - rank_spend AS HUGEINT))
                AS VARCHAR) AS d2_sum,
              1.0 - (6.0 * CAST(SUM(CAST(rank_bal - rank_spend AS HUGEINT)
                  * CAST(rank_bal - rank_spend AS HUGEINT)) AS DOUBLE)) /
                CAST(CAST(count(*) AS HUGEINT)
                  * (CAST(count(*) AS HUGEINT) * CAST(count(*) AS HUGEINT)
                    - 1) AS DOUBLE) AS rho
            FROM ranked"""),
    "exact Spearman rho: two scalable global rank passes, 128-bit " +
      "integer moments [stats]")

  /** q217's temporal split boundary and target coverage percent. */
  private val ConformalSplit = "1999-01-01"
  private val ConformalPct = 90L

  /** q217: split-conformal prediction-interval coverage audit (Vovk's
    * split/inductive conformal, the distribution-free finite-sample
    * guarantee): a point model fit on the calibration era predicts
    * order value; the conformal radius q̂ is the ⌈(n+1)·$ConformalPct%⌉
    * smallest absolute residual on calibration; the audit reports,
    * per order priority, what fraction of FUTURE orders the interval
    * pred ± q̂ actually covers — the marginal-coverage promise checked
    * segment by segment (conditional coverage is where conformal
    * breaks, which is exactly what this table surfaces).
    *
    * Determinism: the split is temporal (q201's never-random
    * discipline) at $ConformalSplit; the "model" is the calibration
    * per-priority floor-mean in integer cents (5-value bounded
    * domain); residuals, q̂, and the rank k are exact integers —
    * k = ⌈(n+1)·pct/100⌉ clamped to n, computed as
    * ((n+1)·pct + 99) div 100 on both engines.
    *
    * Scale: the q̂ rank-select rides `Curation.globalOrder` (range
    * repartition + per-partition offsets — never a one-partition
    * window); n_cal and q̂ attach as 1-row broadcasts; the model frame
    * is bounded-domain (≤5 rows). One pass over calibration for the
    * model, one ordered pass for q̂, one pass over test for coverage.
    */
  private val q217 = QueryDef(
    (s, d) => {
      val o = load(s, d, "orders").select(
        col("o_orderkey"), col("o_orderpriority"),
        graft.common.Exact.cents(col("o_totalprice")).as("cents"),
        (col("o_orderdate") < lit(ConformalSplit).cast("timestamp"))
          .as("is_cal"))
      val cal = o.filter(col("is_cal"))
      // model (≤5 rows) and scores (one narrow row per calibration
      // order) each have multiple consumers below — materialized once,
      // or nCal/globalOrder/the coverage pass would each re-run the
      // calibration scan (measured: 9 AQE jobs, 5 orders passes; r16)
      val model = cal.groupBy(col("o_orderpriority"))
        .agg(sum(col("cents")).as("sum_c"),
          graft.common.Exact.lcountAll.as("n_c"))
        .select(col("o_orderpriority"),
          expr("sum_c div n_c").as("pred"))
        .localCheckpoint()
      val scores = cal.join(broadcast(model), "o_orderpriority")
        .select(col("o_orderkey"),
          abs(col("cents") - col("pred")).as("score"))
        .localCheckpoint()
      val nCal = scores.agg(graft.common.Exact.lcountAll.as("n_cal"))
      val qhat = Curation.globalOrder(scores,
          Seq(col("score").asc, col("o_orderkey").asc))
        .crossJoin(broadcast(nCal))
        .withColumn("k_rank",
          least(expr(s"((n_cal + 1L) * $ConformalPct + 99L) div 100L"),
            col("n_cal")))
        .filter(col("position") === col("k_rank") - 1L)
        // scalar-agg fold of the single matching row: makes the 1-row
        // bound SYNTACTIC so the broadcast lint can prove it
        .agg(max(col("score")).as("qhat_cents"),
          max(col("n_cal")).as("n_cal"), max(col("k_rank")).as("k_rank"))
      o.filter(!col("is_cal"))
        .join(broadcast(model), "o_orderpriority")
        .crossJoin(broadcast(qhat))
        .groupBy(col("o_orderpriority"), col("qhat_cents"),
          col("n_cal"), col("k_rank"))
        .agg(graft.common.Exact.lcountAll.as("n_test"),
          sum(when(abs(col("cents") - col("pred")) <= col("qhat_cents"),
            1L).otherwise(0L)).cast("long").as("n_covered"))
        .select(col("o_orderpriority"), col("n_test"), col("n_covered"),
          (col("n_covered").cast("double") / col("n_test").cast("double"))
            .as("coverage"),
          col("qhat_cents"), col("n_cal"), col("k_rank"))
    },
    Some(s"""WITH o AS (
              SELECT o_orderkey, o_orderpriority,
                ${graft.common.Exact.centsSql("o_totalprice")} AS cents,
                (o_orderdate < TIMESTAMP '$ConformalSplit') AS is_cal
              FROM orders
            ), model AS (
              SELECT o_orderpriority,
                CAST(SUM(cents) // COUNT(*) AS BIGINT) AS pred
              FROM o WHERE is_cal GROUP BY 1
            ), scores AS (
              SELECT o.o_orderkey, ABS(cents - pred) AS score
              FROM o JOIN model USING (o_orderpriority) WHERE is_cal
            ), nc AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n_cal FROM scores
            ), kk AS (
              SELECT n_cal,
                LEAST(((n_cal + 1) * $ConformalPct + 99) // 100, n_cal)
                  AS k_rank
              FROM nc
            ), ranked AS (
              SELECT score, ROW_NUMBER() OVER (
                ORDER BY score ASC, o_orderkey ASC) AS rn
              FROM scores
            ), q AS (
              SELECT CAST(score AS BIGINT) AS qhat_cents, n_cal,
                CAST(k_rank AS BIGINT) AS k_rank
              FROM ranked, kk WHERE rn = k_rank
            )
            SELECT o_orderpriority,
              CAST(COUNT(*) AS BIGINT) AS n_test,
              CAST(SUM(CASE WHEN ABS(cents - pred) <= qhat_cents
                THEN 1 ELSE 0 END) AS BIGINT) AS n_covered,
              CAST(SUM(CASE WHEN ABS(cents - pred) <= qhat_cents
                THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS coverage,
              qhat_cents, n_cal, k_rank
            FROM o JOIN model USING (o_orderpriority)
            CROSS JOIN q
            WHERE NOT is_cal
            GROUP BY 1, 5, 6, 7"""),
    "split-conformal coverage audit: temporal split, exact integer " +
      "radius via scalable rank-select [stats]")

  /** q218's z for the Wilson bound: 1.96 (95% two-sided). */
  private val WilsonZ = 1.96

  /** q218: rank brands by the Wilson-score LOWER bound of their
    * return rate — the "how not to sort by average rating" fix: a
    * brand with 2 returns out of 3 lineitems must not outrank one
    * with 300 of 1000, so the sort key is the uncertainty-penalized
    * lower confidence bound, not the raw rate.
    *
    * Exactness: the evidence (n, returns) is integer and hash-exact.
    * The bound itself needs sqrt; both engines compute the SAME
    * expression tree over the same integer evidence in IEEE-754
    * doubles (+, −, ×, ÷, sqrt are all correctly rounded), so the
    * doubles compare bitwise — the q143/q160 discipline, no tolerance
    * contract needed. The final rank is re-derived from the emitted
    * bound with brand as tiebreak (total order).
    *
    * Scale: one fact-side fold to |brands| rows (25-value bounded
    * domain) behind the lineitem→part key join — the part side is
    * deliberately UNHINTED (corpus-proportional dimension; q149
    * rule). The ranking window runs on the bounded brand frame.
    */
  private val q218 = QueryDef(
    (s, d) => {
      val z = lit(WilsonZ)
      val ev = load(s, d, "lineitem")
        .select(col("l_partkey"), col("l_returnflag"))
        .join(load(s, d, "part").select(col("p_partkey"), col("p_brand")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(graft.common.Exact.lcountAll.as("n"),
          sum(when(col("l_returnflag") === "R", 1L).otherwise(0L))
            .cast("long").as("returns"))
      val p = col("returns").cast("double") / col("n").cast("double")
      val nD = col("n").cast("double")
      val lower = (p + z * z / (lit(2.0) * nD) -
        z * sqrt((p * (lit(1.0) - p) + z * z / (lit(4.0) * nD)) / nD)) /
        (lit(1.0) + z * z / nD)
      ev.withColumn("wilson_lower", lower)
        .withColumn("rnk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("wilson_lower").desc, col("p_brand").asc))
          .cast("long"))
        .select(col("p_brand"), col("n"), col("returns"),
          p.as("rate"), col("wilson_lower"), col("rnk"))
    },
    Some(s"""WITH ev AS (
              SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
                CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                  AS BIGINT) AS returns
              FROM lineitem JOIN part ON l_partkey = p_partkey
              GROUP BY 1
            ), calc AS (
              SELECT p_brand, n, returns,
                CAST(returns AS DOUBLE) / CAST(n AS DOUBLE) AS rate,
                (CAST(returns AS DOUBLE) / CAST(n AS DOUBLE)
                  + $WilsonZ * $WilsonZ / (2.0 * CAST(n AS DOUBLE))
                  - $WilsonZ * sqrt(
                      (CAST(returns AS DOUBLE) / CAST(n AS DOUBLE)
                        * (1.0 - CAST(returns AS DOUBLE) / CAST(n AS DOUBLE))
                        + $WilsonZ * $WilsonZ / (4.0 * CAST(n AS DOUBLE)))
                      / CAST(n AS DOUBLE)))
                / (1.0 + $WilsonZ * $WilsonZ / CAST(n AS DOUBLE))
                  AS wilson_lower
              FROM ev
            )
            SELECT p_brand, n, returns, rate, wilson_lower,
              CAST(ROW_NUMBER() OVER (
                ORDER BY wilson_lower DESC, p_brand ASC) AS BIGINT) AS rnk
            FROM calc"""),
    "Wilson lower-bound brand ranking: integer evidence, IEEE-exact " +
      "bound, re-derived rank [stats,ranking]")

  /** q236: grouped TWO-regressor OLS — price on (quantity, discount)
    * per return flag, closing the gap between q163's single-regressor
    * fit and "real" multi-feature regression: the 2×2 normal equations
    * solve in closed form by Cramer's rule over centered second
    * moments, so no iterative solver and no per-group rescan. Per
    * group: both slopes, the intercept, and R².
    *
    * Scale: ONE map-side-combined grouped aggregate computes all nine
    * raw moments in a single corpus pass; the Cramer assembly runs on
    * the |groups| frame. Raw moments fold in DECIMAL(38,0) (the q163
    * bound); the CENTERED products (n·s11−sx1², the determinant) are
    * assembled in DOUBLE — at 100 TB the determinant of decimal-exact
    * centered sums exceeds 10³⁸, so the float assembly is the honest
    * path and the contract below prices it in.
    *
    * Exactness: the nine moments are exact integers the oracle
    * re-derives bit-identically; betas/intercept/R² are float chains
    * whose operand CONVERSIONS can diverge by 1 ulp once moments pass
    * 2^53 (the q232 hugeint→double finding), so the derived oracle
    * joins (grp, n_rows) and admits each coefficient within a 1e-9
    * relative tolerance. Degenerate groups (singular normal matrix,
    * exact-zero determinant test on doubles both engines share) emit
    * NULL — and the oracle ADMITS them with a matching NULL branch per
    * coefficient rather than dropping the row, so a corpus containing
    * a singular group still verifies.
    */
  private val q236 = QueryDef(
    (s, d) => {
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      val li = load(s, d, "lineitem").select(
        col("l_returnflag").as("grp"),
        col("l_quantity").cast("long").as("x1"),
        graft.common.Exact.cents(col("l_discount")).as("x2"),
        graft.common.Exact.cents(col("l_extendedprice")).as("y"))
      val m = li.groupBy(col("grp")).agg(
        count(lit(1)).cast(dec).as("n"),
        sum(col("x1").cast(dec)).as("sx1"),
        sum(col("x2").cast(dec)).as("sx2"),
        sum(col("y").cast(dec)).as("sy"),
        sum((col("x1") * col("x1")).cast(dec)).as("s11"),
        sum((col("x2").cast(dec) * col("x2").cast(dec))).as("s22"),
        sum((col("x1").cast(dec) * col("x2").cast(dec))).as("s12"),
        sum((col("x1").cast(dec) * col("y").cast(dec))).as("s1y"),
        sum((col("x2").cast(dec) * col("y").cast(dec))).as("s2y"),
        sum((col("y").cast(dec) * col("y").cast(dec))).as("syy"))
      def d2(c: org.apache.spark.sql.Column) = c.cast("double")
      val nD = d2(col("n"))
      val cS11 = nD * d2(col("s11")) - d2(col("sx1")) * d2(col("sx1"))
      val cS22 = nD * d2(col("s22")) - d2(col("sx2")) * d2(col("sx2"))
      val cS12 = nD * d2(col("s12")) - d2(col("sx1")) * d2(col("sx2"))
      val cS1y = nD * d2(col("s1y")) - d2(col("sx1")) * d2(col("sy"))
      val cS2y = nD * d2(col("s2y")) - d2(col("sx2")) * d2(col("sy"))
      val cSyy = nD * d2(col("syy")) - d2(col("sy")) * d2(col("sy"))
      val det = cS11 * cS22 - cS12 * cS12
      val b1 = (cS1y * cS22 - cS2y * cS12) / det
      val b2 = (cS2y * cS11 - cS1y * cS12) / det
      val nullD = lit(null).cast("double")
      m.select(col("grp"), col("n").cast("long").as("n_rows"),
        when(det === 0.0, nullD).otherwise(b1).as("beta_qty"),
        when(det === 0.0, nullD).otherwise(b2).as("beta_disc"),
        when(det === 0.0, nullD).otherwise(
          (d2(col("sy")) - b1 * d2(col("sx1")) - b2 * d2(col("sx2"))) / nD)
          .as("intercept"),
        when(det === 0.0 || cSyy === 0.0, nullD)
          .otherwise((b1 * cS1y + b2 * cS2y) / cSyy).as("r2"))
    },
    Some(s"""WITH li AS (
              SELECT l_returnflag AS grp,
                CAST(l_quantity AS BIGINT) AS x1,
                ${graft.common.Exact.centsSql("l_discount")} AS x2,
                ${graft.common.Exact.centsSql("l_extendedprice")} AS y
              FROM lineitem
            ), m AS (
              SELECT grp, CAST(count(*) AS DOUBLE) AS n,
                CAST(count(*) AS BIGINT) AS n_rows,
                CAST(CAST(SUM(x1) AS HUGEINT) AS DOUBLE) AS sx1,
                CAST(CAST(SUM(x2) AS HUGEINT) AS DOUBLE) AS sx2,
                CAST(CAST(SUM(y) AS HUGEINT) AS DOUBLE) AS sy,
                CAST(SUM(CAST(x1 AS HUGEINT) * x1) AS DOUBLE) AS s11,
                CAST(SUM(CAST(x2 AS HUGEINT) * x2) AS DOUBLE) AS s22,
                CAST(SUM(CAST(x1 AS HUGEINT) * x2) AS DOUBLE) AS s12,
                CAST(SUM(CAST(x1 AS HUGEINT) * y) AS DOUBLE) AS s1y,
                CAST(SUM(CAST(x2 AS HUGEINT) * y) AS DOUBLE) AS s2y,
                CAST(SUM(CAST(y AS HUGEINT) * y) AS DOUBLE) AS syy
              FROM li GROUP BY 1
            ), c AS (
              SELECT grp, n_rows,
                n * s11 - sx1 * sx1 AS cs11,
                n * s22 - sx2 * sx2 AS cs22,
                n * s12 - sx1 * sx2 AS cs12,
                n * s1y - sx1 * sy AS cs1y,
                n * s2y - sx2 * sy AS cs2y,
                n * syy - sy * sy AS csyy,
                n, sx1, sx2, sy
              FROM m
            ), ref AS (
              -- degenerate groups are ADMITTED, not dropped: the engine
              -- emits them with NULL coefficients (singular normal
              -- matrix, or zero total variance for R2), so the oracle
              -- must carry them through with the same NULL contract or
              -- a corpus containing one diverges on row count even
              -- though both engines behaved correctly
              SELECT grp, n_rows,
                cs11 * cs22 - cs12 * cs12 AS det, csyy,
                CASE WHEN cs11 * cs22 - cs12 * cs12 <> 0 THEN
                  (cs1y * cs22 - cs2y * cs12)
                    / (cs11 * cs22 - cs12 * cs12) END AS beta_qty,
                CASE WHEN cs11 * cs22 - cs12 * cs12 <> 0 THEN
                  (cs2y * cs11 - cs1y * cs12)
                    / (cs11 * cs22 - cs12 * cs12) END AS beta_disc,
                CASE WHEN cs11 * cs22 - cs12 * cs12 <> 0 THEN
                  (sy - ((cs1y * cs22 - cs2y * cs12)
                          / (cs11 * cs22 - cs12 * cs12)) * sx1
                      - ((cs2y * cs11 - cs1y * cs12)
                          / (cs11 * cs22 - cs12 * cs12)) * sx2) / n
                  END AS intercept,
                CASE WHEN cs11 * cs22 - cs12 * cs12 <> 0 AND csyy <> 0 THEN
                  (((cs1y * cs22 - cs2y * cs12)
                     / (cs11 * cs22 - cs12 * cs12)) * cs1y
                   + ((cs2y * cs11 - cs1y * cs12)
                      / (cs11 * cs22 - cs12 * cs12)) * cs2y) / csyy
                  END AS r2
              FROM c
            ), emitted AS (
              SELECT * FROM read_parquet(
                '${graft.QueryDef.OutDirToken}/q236_multi_ols/*.parquet')
            )
            SELECT e.grp, e.n_rows, e.beta_qty, e.beta_disc,
              e.intercept, e.r2
            FROM emitted e JOIN ref r ON e.grp = r.grp
              AND e.n_rows = r.n_rows
            WHERE ((e.beta_qty IS NULL AND r.det = 0)
                OR abs(e.beta_qty - r.beta_qty)
                    < 1e-9 * greatest(abs(r.beta_qty), 1.0))
              AND ((e.beta_disc IS NULL AND r.det = 0)
                OR abs(e.beta_disc - r.beta_disc)
                    < 1e-9 * greatest(abs(r.beta_disc), 1.0))
              AND ((e.intercept IS NULL AND r.det = 0)
                OR abs(e.intercept - r.intercept)
                    < 1e-9 * greatest(abs(r.intercept), 1.0))
              AND ((e.r2 IS NULL AND (r.det = 0 OR r.csyy = 0))
                OR abs(e.r2 - r.r2) < 1e-9)"""),
    "grouped two-regressor OLS by Cramer closed form: exact moments, " +
      "relative-tolerance coefficients [stats]")

  /** The five TPC-H order priorities, pinned in canonical order. q243
    * pivots its per-group rank sums into ONE wide row through this
    * list so the cross-group double summation inside H has ONE fixed
    * association order — a plain SUM over a 5-row frame would make H
    * partial-order-dependent and break the bitwise oracle contract.
    */
  private val Priorities =
    Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")

  /** q243: Kruskal-Wallis H test — "do the five order priorities draw
    * their order values from the same distribution?" The rank-based
    * one-way ANOVA: the omnibus sibling of q214's Spearman (two rank
    * columns) and q154's KS (two samples), covering the k-sample case
    * a curation dashboard needs before pairwise drill-downs.
    *
    * Ranks are MIDRANKS (average rank over ties), computed without any
    * per-row rank window: the corpus folds to a (priority, cents)
    * histogram, the histogram folds to a per-value frame, and the
    * global cumulative count comes from `PrefixSum.runningSums`
    * (range-repartition scan — never a one-partition window). The
    * midrank of value v is cum_lt(v) + (t_v+1)/2; kept doubled
    * (2·midrank = 2·cum_lt + t_v + 1) so every per-group rank sum is
    * an INTEGER. The heavy shuffles all end at domain-bounded frames:
    * distinct order-total cents are price-bounded (~10⁷ values),
    * corpus-invariant.
    *
    * Exactness: rank sums accumulate in DECIMAL(38,0) (2·R_g ≤ 2N²,
    * 128-bit-safe to n ~ 10¹⁸) and EMIT as canonical strings (the
    * q214 surface rule); the tie term Σ(t³−t) ≤ N³ likewise. H is then
    * a FIXED double expression — the five group contributions combine
    * in the pinned [[Priorities]] order on both engines, so even the
    * cross-group float sum is bit-identical, and the tie-corrected
    * H' = H / (1 − ΣT/(N³−N)) inherits that.
    */
  private val q243 = QueryDef(
    (s, d) => {
      // the histogram feeds BOTH the per-value frame and the per-group
      // fold — materialize it once (domain-bounded rows) or each
      // consumer replays the corpus groupBy
      val gh = load(s, d, "orders")
        .select(col("o_orderpriority").as("grp"),
          graft.common.Exact.cents(col("o_totalprice")).as("v"))
        .groupBy(col("grp"), col("v"))
        .agg(graft.common.Exact.lcountAll.as("c"))
        .localCheckpoint()
      val vh = gh.groupBy(col("v")).agg(sum(col("c")).as("t"))
      // two consumers (per-group fold + tie term) — materialize or each
      // replays the two-phase prefix sum including its collect job (r16)
      val cum = graft.operators.PrefixSum.runningSums(
        vh, Seq(col("v")), Seq("t"))
        .localCheckpoint()
      val perGrp = gh.join(cum, "v")
        .groupBy(col("grp"))
        .agg(sum(col("c")).as("n_g"),
          sum(col("c").cast(DecimalType(38, 0)) *
            (lit(2L) * (col("t_cum") - col("t")) + col("t") + lit(1L))
              .cast(DecimalType(38, 0))).as("two_r"))
      val ties = cum.agg(
        sum(col("t")).as("n_total"),
        sum(col("t").cast(DecimalType(38, 0)) *
          col("t").cast(DecimalType(38, 0)) *
          col("t").cast(DecimalType(38, 0)) -
          col("t").cast(DecimalType(38, 0))).as("tie_term"))
      // pivot the 5 groups into one row in the PINNED priority order
      val pivotCols = Priorities.zipWithIndex.map { case (p, i) =>
        sum(when(col("grp") === p, col("n_g"))).as(s"n_${i + 1}")
      } ++ Priorities.zipWithIndex.map { case (p, i) =>
        sum(when(col("grp") === p, col("two_r"))).as(s"tr_${i + 1}")
      }
      val wide = perGrp.agg(pivotCols.head, pivotCols.tail: _*)
      val contrib = (1 to 5).map { i =>
        // n_g · r̄_g² = (2R_g)² / (4·n_g), associated left-to-right
        (col(s"tr_$i").cast("double") * col(s"tr_$i").cast("double")) /
          (lit(4.0) * col(s"n_$i").cast("double"))
      }.reduceLeft(_ + _)
      wide.crossJoin(broadcast(ties))
        .withColumn("nd", col("n_total").cast("double"))
        .withColumn("h",
          lit(12.0) / (col("nd") * (col("nd") + lit(1.0))) * contrib -
            lit(3.0) * (col("nd") + lit(1.0)))
        .withColumn("tie_frac",
          col("tie_term").cast("double") /
            (col("n_total").cast(DecimalType(38, 0)) *
              col("n_total").cast(DecimalType(38, 0)) *
              col("n_total").cast(DecimalType(38, 0)) -
              col("n_total").cast(DecimalType(38, 0))).cast("double"))
        .select(
          (Seq(col("n_total"),
            col("tie_term").cast("string").as("tie_term"),
            col("h"),
            (col("h") / (lit(1.0) - col("tie_frac"))).as("h_tie_corrected")) ++
            (1 to 5).map(i => col(s"n_$i")) ++
            (1 to 5).map(i => col(s"tr_$i").cast("string").as(s"tr_$i"))): _*)
    },
    Some {
      val pivotN = Priorities.zipWithIndex.map { case (p, i) =>
        s"CAST(SUM(CASE WHEN grp = '$p' THEN n_g END) AS BIGINT) AS n_${i + 1}"
      }.mkString(", ")
      val pivotTr = Priorities.zipWithIndex.map { case (p, i) =>
        s"SUM(CASE WHEN grp = '$p' THEN two_r END) AS tr_${i + 1}"
      }.mkString(", ")
      val contribSql = (1 to 5).map { i =>
        s"(CAST(tr_$i AS DOUBLE) * CAST(tr_$i AS DOUBLE)) / (4.0 * CAST(n_$i AS DOUBLE))"
      }.reduceLeft((a, b) => s"($a + $b)")
      s"""WITH g AS (
            SELECT o_orderpriority AS grp,
              ${graft.common.Exact.centsSql("o_totalprice")} AS v
            FROM orders
          ), gh AS (
            SELECT grp, v, CAST(count(*) AS BIGINT) AS c
            FROM g GROUP BY 1, 2
          ), vh AS (
            SELECT v, CAST(SUM(c) AS BIGINT) AS t FROM gh GROUP BY 1
          ), cum AS (
            SELECT v, t,
              CAST(SUM(t) OVER (ORDER BY v) AS BIGINT) AS t_cum
            FROM vh
          ), pg AS (
            SELECT grp, CAST(SUM(c) AS BIGINT) AS n_g,
              SUM(CAST(c AS HUGEINT) *
                (2 * (t_cum - t) + t + 1)) AS two_r
            FROM gh JOIN cum USING (v) GROUP BY 1
          ), ties AS (
            SELECT CAST(SUM(t) AS BIGINT) AS n_total,
              SUM(CAST(t AS HUGEINT) * t * t - t) AS tie_term
            FROM cum
          ), wide AS (
            SELECT $pivotN, $pivotTr FROM pg
          )
          SELECT n_total, CAST(tie_term AS VARCHAR) AS tie_term,
            12.0 / (CAST(n_total AS DOUBLE) * (CAST(n_total AS DOUBLE) + 1.0))
              * $contribSql
              - 3.0 * (CAST(n_total AS DOUBLE) + 1.0) AS h,
            (12.0 / (CAST(n_total AS DOUBLE) * (CAST(n_total AS DOUBLE) + 1.0))
              * $contribSql
              - 3.0 * (CAST(n_total AS DOUBLE) + 1.0))
              / (1.0 - CAST(tie_term AS DOUBLE) /
                  CAST(CAST(n_total AS HUGEINT) * n_total * n_total
                    - n_total AS DOUBLE)) AS h_tie_corrected,
            ${(1 to 5).map(i => s"n_$i").mkString(", ")},
            ${(1 to 5).map(i => s"CAST(tr_$i AS VARCHAR) AS tr_$i").mkString(", ")}
          FROM wide, ties"""
    },
    "Kruskal-Wallis H across order priorities: scalable midranks via " +
      "histogram prefix sums, 128-bit rank sums, pinned-order H [stats]")

  /** The $150k high-value order line shared by the q244/q252/q254
    * test family — ONE constant so the three tests can never silently
    * gate on different values.
    */
  private val HighValueCents = 15000000L

  /** q244's BH step-up level (α = 5/100). */
  private val BhAlphaNum = 5L

  /** q244: Benjamini-Hochberg FDR over a per-nation family of
    * two-proportion tests — the multiple-comparisons layer q160 needs
    * the moment the dashboard fans one test out into 25: without it,
    * 25 tests at α=0.05 expect ~1.25 false "significant nations" per
    * refresh. Each nation's high-value order rate tests against the
    * REST of the corpus (the standard one-vs-rest screen); BH then
    * finds k* = max{i : p(i) ≤ i·α/m} and rejects the k* smallest
    * p-values, controlling the expected false-discovery fraction at α
    * (BH 1995 — valid here since one-vs-rest z's are positively
    * regression dependent).
    *
    * Scale: one orders×customer key join folds to 25 nation rows
    * map-side; the corpus totals attach as a 1-row broadcast; the BH
    * rank/threshold windows run on the 25-row frame (nation count is
    * DOMAIN-bounded — 25 today, ~200 ever). Nothing after the first
    * fold is corpus-sized.
    *
    * Determinism: the BH ORDER comes from the exact-integer z² ordering
    * key od = (x_g·n_r − x_r·n_g)²·N / (n_g·n_r·X·(N−X)) — cast-to-
    * double of exact i64/128 integers through ×/÷ only (correctly-
    * rounded IEEE, so the order is bit-identical cross-engine; no erf
    * in the sort key, and exact count ties break by nation). p itself
    * needs erfc (Abramowitz-Stegun 7.1.26 — max abs error 1.5e-7,
    * fine for a 0.002-granular threshold), whose exp() is NOT
    * guaranteed identical across libms, so the oracle is the q232
    * derived pattern: integer evidence joins exactly, p/z/od compare
    * at 1e-9, and the reject decision must match the oracle's own
    * recomputation outside a ±1e-9 threshold grace band.
    */
  private val q244 = QueryDef(
    (s, d) => {
      val perNation = load(s, d, "orders")
        .join(load(s, d, "customer")
          .select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey"))
        .agg(graft.common.Exact.lcountAll.as("n_g"),
          sum(when(graft.common.Exact.cents(col("o_totalprice")) >=
            HighValueCents, 1L).otherwise(0L)).as("x_g"))
        .join(broadcast(load(s, d, "nation")
          .select(col("n_nationkey"), col("n_name"))),
          col("c_nationkey") === col("n_nationkey"))
        // the 25-row frame feeds the totals fold AND the per-nation
        // tests — materialize once, or both replay the orders×customer
        // join
        .localCheckpoint()
      val tot = perNation.agg(sum(col("n_g")).as("n_tot"),
        sum(col("x_g")).as("x_tot"), graft.common.Exact.lcountAll.as("m"))
      val base = perNation.crossJoin(broadcast(tot))
        .withColumn("n_r", col("n_tot") - col("n_g"))
        .withColumn("x_r", col("x_tot") - col("x_g"))
        // z² as a fixed double expression over exact integers (×,÷ only);
        // the cross terms reach ~N² — 128-bit like q252's, then the
        // deterministic cast to double
        .withColumn("od",
          (col("x_g").cast(DecimalType(38, 0)) *
            col("n_r").cast(DecimalType(38, 0)) -
            col("x_r").cast(DecimalType(38, 0)) *
            col("n_g").cast(DecimalType(38, 0))).cast("double") *
            (col("x_g").cast(DecimalType(38, 0)) *
              col("n_r").cast(DecimalType(38, 0)) -
              col("x_r").cast(DecimalType(38, 0)) *
              col("n_g").cast(DecimalType(38, 0))).cast("double") *
            col("n_tot").cast("double") /
            (col("n_g").cast("double") * col("n_r").cast("double") *
              col("x_tot").cast("double") *
              (col("n_tot") - col("x_tot")).cast("double")))
        .withColumn("z",
          (col("x_g").cast("double") / col("n_g").cast("double") -
            col("x_r").cast("double") / col("n_r").cast("double")) /
            sqrt(col("x_tot").cast("double") / col("n_tot").cast("double") *
              (lit(1.0) - col("x_tot").cast("double") /
                col("n_tot").cast("double")) *
              (lit(1.0) / col("n_g").cast("double") +
                lit(1.0) / col("n_r").cast("double"))))
      // two-sided p via A&S 7.1.26 erfc on |z|/√2
      val az = abs(col("z")) / sqrt(lit(2.0))
      val t = lit(1.0) / (lit(1.0) + lit(0.3275911) * az)
      val poly = t * (lit(0.254829592) +
        t * (lit(-0.284496736) +
          t * (lit(1.421413741) +
            t * (lit(-1.453152027) + t * lit(1.061405429)))))
      val withP = base.withColumn("p", poly * exp(-az * az))
      val ranked = withP.withColumn("rk",
        row_number().over(Window.orderBy(col("od").desc, col("n_name"))))
        .withColumn("bh_level",
          col("rk").cast("double") * lit(BhAlphaNum.toDouble) /
            (col("m").cast("double") * lit(100.0)))
      val kstar = ranked.agg(
        max(when(col("p") <= col("bh_level"), col("rk"))).as("k_star"))
      ranked.crossJoin(broadcast(kstar))
        .select(col("n_name").as("nation"), col("n_g"), col("x_g"),
          col("od"), col("z"), col("p"), col("rk").cast("long").as("rk"),
          col("bh_level"),
          (col("k_star").isNotNull && col("rk") <= col("k_star"))
            .as("rejected"))
    },
    Some(s"""WITH pn AS (
              SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_g,
                CAST(SUM(CASE WHEN
                  ${graft.common.Exact.centsSql("o_totalprice")}
                    >= $HighValueCents THEN 1 ELSE 0 END) AS BIGINT) AS x_g
              FROM orders JOIN customer ON o_custkey = c_custkey
              GROUP BY 1
            ), named AS (
              SELECT n.n_name, pn.n_g, pn.x_g
              FROM pn JOIN nation n ON pn.c_nationkey = n.n_nationkey
            ), tot AS (
              SELECT CAST(SUM(n_g) AS BIGINT) AS n_tot,
                CAST(SUM(x_g) AS BIGINT) AS x_tot,
                CAST(count(*) AS BIGINT) AS m
              FROM named
            ), base AS (
              SELECT n_name, n_g, x_g, n_tot, x_tot, m,
                n_tot - n_g AS n_r, x_tot - x_g AS x_r,
                CAST(CAST(x_g AS HUGEINT) * (n_tot - n_g)
                    - CAST(x_tot - x_g AS HUGEINT) * n_g AS DOUBLE) *
                  CAST(CAST(x_g AS HUGEINT) * (n_tot - n_g)
                    - CAST(x_tot - x_g AS HUGEINT) * n_g AS DOUBLE) *
                  CAST(n_tot AS DOUBLE) /
                  (CAST(n_g AS DOUBLE) * CAST(n_tot - n_g AS DOUBLE) *
                    CAST(x_tot AS DOUBLE) * CAST(n_tot - x_tot AS DOUBLE))
                  AS od,
                (CAST(x_g AS DOUBLE) / CAST(n_g AS DOUBLE)
                  - CAST(x_tot - x_g AS DOUBLE) / CAST(n_tot - n_g AS DOUBLE))
                  / sqrt(CAST(x_tot AS DOUBLE) / CAST(n_tot AS DOUBLE)
                    * (1.0 - CAST(x_tot AS DOUBLE) / CAST(n_tot AS DOUBLE))
                    * (1.0 / CAST(n_g AS DOUBLE)
                      + 1.0 / CAST(n_tot - n_g AS DOUBLE))) AS z
              FROM named, tot
            ), withp AS (
              SELECT *,
                (1.0 / (1.0 + 0.3275911 * (abs(z) / sqrt(2.0)))) * (0.254829592
                  + (1.0 / (1.0 + 0.3275911 * (abs(z) / sqrt(2.0)))) * (-0.284496736
                  + (1.0 / (1.0 + 0.3275911 * (abs(z) / sqrt(2.0)))) * (1.421413741
                  + (1.0 / (1.0 + 0.3275911 * (abs(z) / sqrt(2.0)))) * (-1.453152027
                  + (1.0 / (1.0 + 0.3275911 * (abs(z) / sqrt(2.0)))) * 1.061405429))))
                  * exp(-(abs(z) / sqrt(2.0)) * (abs(z) / sqrt(2.0))) AS p
              FROM base
            ), ranked AS (
              SELECT *,
                CAST(ROW_NUMBER() OVER (ORDER BY od DESC, n_name)
                  AS BIGINT) AS rk,
                CAST(ROW_NUMBER() OVER (ORDER BY od DESC, n_name) AS DOUBLE)
                  * ${BhAlphaNum.toDouble} / (CAST(m AS DOUBLE) * 100.0)
                  AS bh_level
              FROM withp
            ), ks AS (
              SELECT MAX(CASE WHEN p <= bh_level THEN rk END) AS k_star
              FROM ranked
            ), ref AS (
              SELECT r.n_name AS nation, r.n_g, r.x_g, r.od, r.z, r.p,
                r.rk, r.bh_level,
                (ks.k_star IS NOT NULL AND r.rk <= ks.k_star) AS rejected
              FROM ranked r, ks
            ), fam AS (
              -- k* is FAMILY-global: any nation whose p straddles its
              -- own bh_level within libm exp() jitter can shift k* and
              -- flip `rejected` on rows whose own margin is large, so
              -- the reject-grace must be family-wide, not per-row
              SELECT MAX(CASE WHEN abs(p - bh_level) < 1e-9
                THEN 1 ELSE 0 END) AS unstable
              FROM ranked
            ), emitted AS (
              SELECT * FROM read_parquet(
                '${graft.QueryDef.OutDirToken}/q244_bh_fdr/*.parquet')
            )
            SELECT e.nation, e.n_g, e.x_g, e.od, e.z, e.p, e.rk,
              e.bh_level, e.rejected
            FROM emitted e JOIN ref r ON e.nation = r.nation
              AND e.n_g = r.n_g AND e.x_g = r.x_g AND e.rk = r.rk
            CROSS JOIN fam
            WHERE abs(e.od - r.od) <= 1e-9 * greatest(abs(r.od), 1.0)
              AND abs(e.z - r.z) <= 1e-9 * greatest(abs(r.z), 1.0)
              AND abs(e.p - r.p) <= 1e-9
              AND abs(e.bh_level - r.bh_level) <= 1e-12
              AND (e.rejected = r.rejected
                OR fam.unstable = 1)"""),
    "Benjamini-Hochberg FDR over per-nation two-proportion tests: " +
      "exact-integer BH order, A&S erfc p-values, derived oracle [stats]")


  /** q252: Cochran-Armitage trend test — "does the high-value-order
    * RATE rise or fall monotonically across the five priority levels?"
    * The ordered-alternative complement of q156's chi-square (which
    * spends its power on ANY deviation) and q243's Kruskal-Wallis
    * (unordered k-sample): when the alternative is a dose-response
    * trend, CA concentrates all power on it. Scores w = 1..5 come from
    * the priority prefix digit (the natural ordering the column
    * encodes).
    *
    * Statistic (standard, no continuity correction):
    * z² = N·(N·Σwx − X·Σwn)² / (X·(N−X)·(N·Σw²n − (Σwn)²)), signed z
    * by the numerator. Every moment is an integer fold over the 5-row
    * priority frame; cross terms reach ~5N² (past i64 at a 10¹⁰-order
    * corpus), so both engines accumulate them 128-bit and EMIT
    * canonical strings; z²/z are terminal fixed double expressions.
    * NULL when the variance is zero (all orders high-value or none, or
    * a single populated level).
    *
    * Scale: one orders fold to (priority, n, x) — map-side combined;
    * the moment fold and the scalar attach run on ≤5 rows.
    */
  private val q252 = QueryDef(
    (s, d) => {
      val dec38 = DecimalType(38, 0)
      val perGrp = load(s, d, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(graft.common.Exact.lcountAll.as("n_g"),
          sum(when(graft.common.Exact.cents(col("o_totalprice")) >=
            HighValueCents, 1L).otherwise(0L)).as("x_g"))
        .withColumn("w",
          substring(col("o_orderpriority"), 1, 1).cast("long"))
        // the 5-row frame feeds the moment fold AND the emit join —
        // materialize once (the q244 cut)
        .localCheckpoint()
      val m = perGrp.agg(
        sum(col("n_g")).as("n_tot"), sum(col("x_g")).as("x_tot"),
        sum(col("w") * col("x_g")).as("swx"),
        sum(col("w") * col("n_g")).as("swn"),
        sum(col("w") * col("w") * col("n_g")).as("sw2n"))
      val scal = m.select(col("n_tot"), col("x_tot"),
        (col("n_tot").cast(dec38) * col("swx").cast(dec38) -
          col("x_tot").cast(dec38) * col("swn").cast(dec38)).as("num"),
        (col("x_tot").cast(dec38) *
          (col("n_tot") - col("x_tot")).cast(dec38) *
          (col("n_tot").cast(dec38) * col("sw2n").cast(dec38) -
            col("swn").cast(dec38) * col("swn").cast(dec38))).as("den"))
        .withColumn("k1", lit(1))
      perGrp.withColumn("k1", lit(1)).join(scal, "k1")
        .select(col("o_orderpriority"), col("w"), col("n_g"), col("x_g"),
          col("n_tot"), col("x_tot"),
          col("num").cast("string").as("trend_num"),
          col("den").cast("string").as("var_den"),
          when(col("den") === lit(0).cast(DecimalType(38, 0)),
            lit(null).cast("double"))
            .otherwise(col("n_tot").cast("double") *
              col("num").cast("double") * col("num").cast("double") /
              col("den").cast("double")).as("z2"),
          when(col("den") === lit(0).cast(DecimalType(38, 0)),
            lit(null).cast("double"))
            .otherwise(signum(col("num").cast("double")) *
              sqrt(col("n_tot").cast("double") *
                col("num").cast("double") * col("num").cast("double") /
                col("den").cast("double"))).as("z"))
    },
    Some(s"""WITH pg AS (
              SELECT o_orderpriority,
                CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS w,
                CAST(count(*) AS BIGINT) AS n_g,
                CAST(SUM(CASE WHEN
                  ${graft.common.Exact.centsSql("o_totalprice")}
                    >= $HighValueCents THEN 1 ELSE 0 END) AS BIGINT) AS x_g
              FROM orders GROUP BY 1
            ), m AS (
              SELECT CAST(SUM(n_g) AS BIGINT) AS n_tot,
                CAST(SUM(x_g) AS BIGINT) AS x_tot,
                CAST(SUM(w * x_g) AS BIGINT) AS swx,
                CAST(SUM(w * n_g) AS BIGINT) AS swn,
                CAST(SUM(w * w * n_g) AS BIGINT) AS sw2n
              FROM pg
            ), scal AS (
              SELECT n_tot, x_tot,
                CAST(n_tot AS HUGEINT) * swx
                  - CAST(x_tot AS HUGEINT) * swn AS num,
                CAST(x_tot AS HUGEINT) * (n_tot - x_tot) *
                  (CAST(n_tot AS HUGEINT) * sw2n
                    - CAST(swn AS HUGEINT) * swn) AS den
              FROM m
            )
            SELECT pg.o_orderpriority, pg.w, pg.n_g, pg.x_g,
              s.n_tot, s.x_tot,
              CAST(s.num AS VARCHAR) AS trend_num,
              CAST(s.den AS VARCHAR) AS var_den,
              CASE WHEN s.den = 0 THEN NULL
                ELSE CAST(s.n_tot AS DOUBLE) * CAST(s.num AS DOUBLE)
                  * CAST(s.num AS DOUBLE) / CAST(s.den AS DOUBLE)
                END AS z2,
              CASE WHEN s.den = 0 THEN NULL
                ELSE sign(CAST(s.num AS DOUBLE))
                  * sqrt(CAST(s.n_tot AS DOUBLE) * CAST(s.num AS DOUBLE)
                    * CAST(s.num AS DOUBLE) / CAST(s.den AS DOUBLE))
                END AS z
            FROM pg, scal s"""),
    "Cochran-Armitage trend test across ordered priorities: exact " +
      "integer moments, 128-bit cross terms, signed z [stats]")


  /** q254: Mantel-Haenszel pooled odds ratio — "does URGENT priority
    * associate with high-value orders, CONTROLLING for nation?" The
    * stratified-confounding answer q160/q244's marginal tests can't
    * give (a nation that is both priority-heavy and price-heavy
    * induces a spurious marginal association — Simpson's classic).
    * OR_MH = Σᵢ(aᵢdᵢ/nᵢ) / Σᵢ(bᵢcᵢ/nᵢ) over the per-nation 2×2 tables.
    *
    * Scale: one orders×customer key join folds map-side to 25 stratum
    * rows (checkpointed for its consumers); everything after is
    * arithmetic on the domain-bounded frame.
    *
    * Exactness: the 2×2 cells are integers. The cross-stratum sums of
    * aᵢdᵢ/nᵢ are DOUBLES — a plain SUM would be partial-order-
    * dependent, so both engines fold them in the PINNED nation-name
    * order via an ordered cumulative window (the q110/q239 fixed-order
    * float-fold discipline) and read the last row; the quotient is
    * then bit-identical. Per-stratum ORs ride along as evidence, NULL
    * where a zero cell makes them undefined (MH itself tolerates zero
    * cells — that is its point).
    */
  private val q254 = QueryDef(
    (s, d) => {
      val strata = load(s, d, "orders")
        .join(load(s, d, "customer")
          .select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(load(s, d, "nation")
          .select(col("n_nationkey"), col("n_name"))),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"))
        .agg(
          sum(when(col("o_orderpriority") === "1-URGENT" &&
            graft.common.Exact.cents(col("o_totalprice")) >= HighValueCents,
            1L).otherwise(0L)).as("a"),
          sum(when(col("o_orderpriority") === "1-URGENT" &&
            graft.common.Exact.cents(col("o_totalprice")) < HighValueCents,
            1L).otherwise(0L)).as("b"),
          sum(when(col("o_orderpriority") =!= "1-URGENT" &&
            graft.common.Exact.cents(col("o_totalprice")) >= HighValueCents,
            1L).otherwise(0L)).as("c"),
          sum(when(col("o_orderpriority") =!= "1-URGENT" &&
            graft.common.Exact.cents(col("o_totalprice")) < HighValueCents,
            1L).otherwise(0L)).as("d"))
        .localCheckpoint()
      val byNation = Window.orderBy(col("nation"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val folded = strata
        .withColumn("n_i", col("a") + col("b") + col("c") + col("d"))
        .withColumn("num_term",
          col("a").cast("double") * col("d").cast("double") /
            col("n_i").cast("double"))
        .withColumn("den_term",
          col("b").cast("double") * col("c").cast("double") /
            col("n_i").cast("double"))
        .withColumn("cum_num", sum(col("num_term")).over(byNation))
        .withColumn("cum_den", sum(col("den_term")).over(byNation))
      val mRow = strata.agg(graft.common.Exact.lcountAll.as("m"))
      val mh = folded
        .withColumn("rn", row_number().over(Window.orderBy(col("nation"))))
        .crossJoin(broadcast(mRow))
        .filter(col("rn") === col("m"))
        .select(
          when(col("cum_den") === 0.0, lit(null).cast("double"))
            .otherwise(col("cum_num") / col("cum_den")).as("or_mh"))
      folded.select(col("nation"), col("a"), col("b"), col("c"),
          col("d"), col("n_i"),
          when(col("b") * col("c") === 0L, lit(null).cast("double"))
            .otherwise(col("a").cast("double") * col("d").cast("double") /
              (col("b").cast("double") * col("c").cast("double")))
            .as("or_stratum"))
        .crossJoin(broadcast(mh))
    },
    Some(s"""WITH st AS (
              SELECT n.n_name AS nation,
                CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
                  AND ${graft.common.Exact.centsSql("o_totalprice")}
                    >= $HighValueCents THEN 1 ELSE 0 END) AS BIGINT) AS a,
                CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
                  AND ${graft.common.Exact.centsSql("o_totalprice")}
                    < $HighValueCents THEN 1 ELSE 0 END) AS BIGINT) AS b,
                CAST(SUM(CASE WHEN o_orderpriority <> '1-URGENT'
                  AND ${graft.common.Exact.centsSql("o_totalprice")}
                    >= $HighValueCents THEN 1 ELSE 0 END) AS BIGINT) AS c,
                CAST(SUM(CASE WHEN o_orderpriority <> '1-URGENT'
                  AND ${graft.common.Exact.centsSql("o_totalprice")}
                    < $HighValueCents THEN 1 ELSE 0 END) AS BIGINT) AS d
              FROM orders
              JOIN customer ON o_custkey = c_custkey
              JOIN nation n ON c_nationkey = n_nationkey
              GROUP BY 1
            ), folded AS (
              SELECT *, a + b + c + d AS n_i,
                SUM(CAST(a AS DOUBLE) * CAST(d AS DOUBLE)
                  / CAST(a + b + c + d AS DOUBLE))
                  OVER (ORDER BY nation
                    ROWS UNBOUNDED PRECEDING) AS cum_num,
                SUM(CAST(b AS DOUBLE) * CAST(c AS DOUBLE)
                  / CAST(a + b + c + d AS DOUBLE))
                  OVER (ORDER BY nation
                    ROWS UNBOUNDED PRECEDING) AS cum_den,
                ROW_NUMBER() OVER (ORDER BY nation) AS rn,
                COUNT(*) OVER () AS m
              FROM st
            ), mh AS (
              SELECT CASE WHEN cum_den = 0 THEN NULL
                ELSE cum_num / cum_den END AS or_mh
              FROM folded WHERE rn = m
            )
            SELECT f.nation, f.a, f.b, f.c, f.d, f.n_i,
              CASE WHEN f.b * f.c = 0 THEN NULL
                ELSE CAST(f.a AS DOUBLE) * CAST(f.d AS DOUBLE)
                  / (CAST(f.b AS DOUBLE) * CAST(f.c AS DOUBLE)) END
                AS or_stratum,
              mh.or_mh
            FROM folded f, mh"""),
    "Mantel-Haenszel pooled odds ratio across nation strata: integer " +
      "2x2 cells, pinned-order float folds [stats]")

  /** q262: Welch's unequal-variance t-test — "do RETURNED lineitems
    * (l_returnflag = 'R') ship in different quantities than delivered
    * ones ('N')?" The two-sample mean comparison q160 gives for
    * proportions, here for a measured quantity, WITHOUT the equal-
    * variance assumption (the pooled-variance t is wrong whenever group
    * spreads differ — Welch is the default the major stats packages
    * moved to).
    *
    * Exactness: quantities are integral, so n, Σx, Σx² per group are
    * exact BIGINT from ONE map-side-combined fold (conditional sums —
    * no per-group frame, no fold-order dependence: every emitted double
    * is a fixed expression over the six scalars, bit-identical across
    * engines). t and the Welch–Satterthwaite df are terminal double
    * chains; NULL when either group is degenerate (n < 2) or both
    * variances vanish.
    *
    * Scale: one lineitem scan, one 1-row aggregate. i64 envelope:
    * n·Σx² ≤ 2500·n² — sound past 10⁹ rows per group; beyond that the
    * q252 decimal-evidence discipline applies.
    *
    * FMA hardening (round-15, closing the r14 advice): q265 in the
    * same batch MEASURED a 1-ulp DuckDB FMA divergence on fusible
    * multiply-subtract chains, and t_welch/df_welch carry exactly such
    * shapes — they passed exact compares at the tested scales only by
    * luck of the operand values. The oracle now applies q265's derived
    * band: counts/means/variances still compare EXACTLY (their only
    * subtraction is integer), and the two terminal ratios take a 1e-12
    * band (relative for df_welch, whose magnitude is ~n) — never a
    * loosening of the integer evidence columns.
    */
  private val q262 = QueryDef(
    (s, d) => {
      val q = col("l_quantity").cast("long")
      val isR = col("l_returnflag") === "R"
      val m = load(s, d, "lineitem")
        .filter(col("l_returnflag").isin("R", "N"))
        .agg(
          sum(when(isR, 1L).otherwise(0L)).as("n1"),
          sum(when(isR, q).otherwise(0L)).as("sx1"),
          sum(when(isR, q * q).otherwise(0L)).as("sxx1"),
          sum(when(!isR, 1L).otherwise(0L)).as("n2"),
          sum(when(!isR, q).otherwise(0L)).as("sx2"),
          sum(when(!isR, q * q).otherwise(0L)).as("sxx2"))
      def mean(i: Int) =
        col(s"sx$i").cast("double") / col(s"n$i").cast("double")
      def v(i: Int) =
        (col(s"n$i") * col(s"sxx$i") - col(s"sx$i") * col(s"sx$i"))
          .cast("double") /
          (col(s"n$i").cast("double") * (col(s"n$i") - 1L).cast("double"))
      def se(i: Int) = v(i) / col(s"n$i").cast("double")
      val seSum = se(1) + se(2)
      val ok = col("n1") >= 2L && col("n2") >= 2L
      m.select(
        col("n1"), col("n2"),
        mean(1).as("mean1"), mean(2).as("mean2"),
        when(ok, v(1)).as("var1"), when(ok, v(2)).as("var2"),
        when(ok && seSum > 0.0,
          (mean(1) - mean(2)) / sqrt(seSum)).as("t_welch"),
        when(ok && seSum > 0.0,
          (seSum * seSum) /
            (se(1) * se(1) / (col("n1") - 1L).cast("double") +
              se(2) * se(2) / (col("n2") - 1L).cast("double")))
          .as("df_welch"))
    },
    Some(s"""WITH m AS (
              SELECT
                CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n1,
                CAST(SUM(CASE WHEN l_returnflag = 'R'
                  THEN CAST(l_quantity AS BIGINT) ELSE 0 END)
                  AS BIGINT) AS sx1,
                CAST(SUM(CASE WHEN l_returnflag = 'R'
                  THEN CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS sxx1,
                CAST(SUM(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n2,
                CAST(SUM(CASE WHEN l_returnflag = 'N'
                  THEN CAST(l_quantity AS BIGINT) ELSE 0 END)
                  AS BIGINT) AS sx2,
                CAST(SUM(CASE WHEN l_returnflag = 'N'
                  THEN CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS sxx2
              FROM lineitem WHERE l_returnflag IN ('R', 'N')
            ), e AS (
              SELECT n1, n2,
                CAST(sx1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS mean1,
                CAST(sx2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS mean2,
                CAST(n1 * sxx1 - sx1 * sx1 AS DOUBLE)
                  / (CAST(n1 AS DOUBLE) * CAST(n1 - 1 AS DOUBLE)) AS v1,
                CAST(n2 * sxx2 - sx2 * sx2 AS DOUBLE)
                  / (CAST(n2 AS DOUBLE) * CAST(n2 - 1 AS DOUBLE)) AS v2
              FROM m
            ), ref AS (
            SELECT n1, n2, mean1, mean2,
              CASE WHEN n1 >= 2 AND n2 >= 2 THEN v1 END AS var1,
              CASE WHEN n1 >= 2 AND n2 >= 2 THEN v2 END AS var2,
              CASE WHEN n1 >= 2 AND n2 >= 2
                  AND v1 / CAST(n1 AS DOUBLE) + v2 / CAST(n2 AS DOUBLE) > 0
                THEN (mean1 - mean2)
                  / sqrt(v1 / CAST(n1 AS DOUBLE) + v2 / CAST(n2 AS DOUBLE))
                END AS t_welch,
              CASE WHEN n1 >= 2 AND n2 >= 2
                  AND v1 / CAST(n1 AS DOUBLE) + v2 / CAST(n2 AS DOUBLE) > 0
                THEN ((v1 / CAST(n1 AS DOUBLE) + v2 / CAST(n2 AS DOUBLE))
                    * (v1 / CAST(n1 AS DOUBLE) + v2 / CAST(n2 AS DOUBLE)))
                  / ((v1 / CAST(n1 AS DOUBLE)) * (v1 / CAST(n1 AS DOUBLE))
                      / CAST(n1 - 1 AS DOUBLE)
                    + (v2 / CAST(n2 AS DOUBLE)) * (v2 / CAST(n2 AS DOUBLE))
                      / CAST(n2 - 1 AS DOUBLE))
                END AS df_welch
            FROM e
            ), emitted AS (
              SELECT * FROM read_parquet(
                '${graft.QueryDef.OutDirToken}/q262_welch_t/*.parquet')
            )
            -- q265's derived band applied proactively (round-15, r14
            -- advice): the integer counts join EXACTLY, the single-
            -- division means/variances compare exactly (their only
            -- subtraction is INTEGER, FMA-immune), and ONLY the two
            -- terminal ratio chains — whose multiply-subtract shapes
            -- are exactly what DuckDB's FMA evaluated 1 ulp off in
            -- q265 — take a 1e-12 band, so a new scale or a DuckDB
            -- codegen change can never trip an exact compare here
            SELECT e.n1, e.n2, e.mean1, e.mean2, e.var1, e.var2,
              e.t_welch, e.df_welch
            FROM emitted e JOIN ref r
              ON e.n1 = r.n1 AND e.n2 = r.n2
              AND e.mean1 = r.mean1 AND e.mean2 = r.mean2
              AND COALESCE(e.var1, -1) = COALESCE(r.var1, -1)
              AND COALESCE(e.var2, -1) = COALESCE(r.var2, -1)
            WHERE abs(COALESCE(e.t_welch, 0) - COALESCE(r.t_welch, 0)) < 1e-12
              AND abs(COALESCE(e.df_welch, 0) - COALESCE(r.df_welch, 0))
                < 1e-12 * GREATEST(abs(COALESCE(r.df_welch, 0)), 1.0)"""),
    "Welch unequal-variance t-test on quantities, returned vs " +
      "delivered: exact integer moments, terminal doubles [stats]")

  /** Friedman treatment count (the 5 order priorities). */
  private val FriedmanK = 5L

  /** q264: Friedman rank test — "does revenue RANK differently across
    * the 5 order priorities, blocking by nation?" The non-parametric
    * repeated-measures ANOVA: each complete block (a nation with all 5
    * priority levels populated) ranks its 5 per-priority revenue
    * totals; the statistic asks whether the rank sums diverge from the
    * uniform n(k+1)/2. The blocked complement of q243's Kruskal-Wallis
    * (which pools all rows and would confound nation effects).
    *
    * Exactness: cell values are integer cents, so within-block ranking
    * is exact; ties take MIDRANKS carried as 2·midrank integers
    * (min-rank + tie-count — both order-independent), the q243
    * discipline. Rank sums and the centered square sum
    * S2 = Σⱼ(2Rⱼ − n(k+1))² are integers; the classic statistic
    * χ² = 12/(nk(k+1))·Σ(Rⱼ − n(k+1)/2)² = 3·S2/(nk(k+1)) is ONE
    * terminal division. (No tie correction — ties between integer-cent
    * totals are measure-zero and midranks keep the uncorrected form
    * exact; the contract is documented on both sides.)
    *
    * Scale: one orders×customer key join folds map-side to ≤125
    * (nation, priority) cells; every window after runs on that
    * domain-bounded frame.
    */
  private val q264 = QueryDef(
    (s, d) => {
      val k = FriedmanK
      val cells = load(s, d, "orders")
        .join(load(s, d, "customer")
          .select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey"), col("o_orderpriority"))
        .agg(sum(graft.common.Exact.cents(col("o_totalprice")))
          .as("cents"))
      val byNation = Window.partitionBy("c_nationkey")
      val complete = cells
        .withColumn("kk", count(lit(1)).over(byNation))
        .filter(col("kk") === k)
      val midrank2 =
        lit(2L) * rank().over(byNation.orderBy(col("cents"))) +
          (count(lit(1)).over(
            Window.partitionBy(col("c_nationkey"), col("cents"))) - 1L)
      val rsums = complete
        .withColumn("r2", midrank2)
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("r2")).as("r2_sum"),
          graft.common.Exact.lcountAll.as("n_blocks"))
        // 5-row frame feeds the scalar fold AND the emit join
        .localCheckpoint()
      val scal = rsums.agg(
        sum((col("r2_sum") - col("n_blocks") * (k + 1L)) *
          (col("r2_sum") - col("n_blocks") * (k + 1L))).as("s2"),
        max(col("n_blocks")).as("n"))
        .withColumn("k1", lit(1))
      rsums.withColumn("k1", lit(1)).join(broadcast(scal), "k1")
        .select(col("o_orderpriority"), col("r2_sum"), col("n_blocks"),
          (col("r2_sum").cast("double") /
            (lit(2.0) * col("n").cast("double"))).as("mean_rank"),
          when(col("n") > 0L,
            lit(3.0) * col("s2").cast("double") /
              (col("n").cast("double") * lit(k.toDouble) *
                lit((k + 1L).toDouble))).as("chi2_friedman"))
    },
    Some(s"""WITH cells AS (
              SELECT c.c_nationkey, o.o_orderpriority,
                CAST(SUM(${graft.common.Exact.centsSql("o_totalprice")})
                  AS BIGINT) AS cents
              FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
              GROUP BY 1, 2
            ), complete AS (
              SELECT * FROM (
                SELECT c_nationkey, o_orderpriority, cents,
                  count(*) OVER (PARTITION BY c_nationkey) AS kk
                FROM cells)
              WHERE kk = $FriedmanK
            ), ranked AS (
              SELECT o_orderpriority,
                2 * rank() OVER (PARTITION BY c_nationkey ORDER BY cents)
                  + (count(*) OVER (PARTITION BY c_nationkey, cents) - 1)
                  AS r2
              FROM complete
            ), rs AS (
              SELECT o_orderpriority,
                CAST(SUM(r2) AS BIGINT) AS r2_sum,
                CAST(count(*) AS BIGINT) AS n_blocks
              FROM ranked GROUP BY 1
            ), scal AS (
              SELECT CAST(SUM((r2_sum - n_blocks * ${FriedmanK + 1L}) *
                  (r2_sum - n_blocks * ${FriedmanK + 1L})) AS BIGINT)
                  AS s2,
                CAST(MAX(n_blocks) AS BIGINT) AS n
              FROM rs
            )
            SELECT rs.o_orderpriority, rs.r2_sum, rs.n_blocks,
              CAST(rs.r2_sum AS DOUBLE) / (2.0 * CAST(s.n AS DOUBLE))
                AS mean_rank,
              CASE WHEN s.n > 0 THEN
                3.0 * CAST(s.s2 AS DOUBLE) /
                  (CAST(s.n AS DOUBLE) * ${FriedmanK}.0
                    * ${FriedmanK + 1L}.0)
                END AS chi2_friedman
            FROM rs, scal s"""),
    "Friedman rank test across priorities, nation blocks: exact " +
      "integer midranks, one terminal division [stats]")

  /** q265: Brown-Forsythe variance-homogeneity test — "is quantity
    * SPREAD the same across the three return-flag populations?" The
    * robust Levene variant: one-way ANOVA on absolute deviations from
    * each group's MEDIAN (median-centering keeps the test valid under
    * skew, which mean-centered Levene is not). The diagnostic a reader
    * of q262's t-test needs next: Welch tolerates unequal variances,
    * but knowing WHETHER they differ is its own question.
    *
    * Exactness: quantities are small integers, so the group median
    * comes from a ≤50-bin value histogram via integer cumulative-count
    * selection (the q81/q247 discipline — no per-row rank window), kept
    * in 2·median units so even-count midpoints stay integral;
    * deviations z = |2q − med2| are integers, and F is invariant under
    * the common ×2 scaling (numerator and denominator both scale by 4).
    * The group moments (n, Σz, Σz²) land in ONE conditional-sum fold —
    * three groups is a closed domain, so every emitted double is a
    * fixed expression over nine scalars with NO fold-order dependence.
    * The one terminal F still takes a 1e-12 derived-oracle band:
    * DuckDB evaluates the zz − sz·z̄ multiply-subtract with a fused
    * multiply-add (no intermediate rounding of the product), which
    * can land 1 ulp off the JVM's strict chain — measured at sf0.1
    * with every integer identical (PLANS.md round-13 close).
    *
    * Scale: two lineitem scans (histogram; deviation fold against the
    * broadcast 3-row median frame) and arithmetic on one row. i64
    * envelope: Σz² ≤ 10⁴·n — sound past 10¹⁴ rows.
    */
  private val q265 = QueryDef(
    (s, d) => {
      // the group column keeps its real name so the broadcast lint can
      // see the 3-value return-flag enum bounds the hinted median frame
      val li = load(s, d, "lineitem")
        .select(col("l_returnflag"),
          col("l_quantity").cast("long").as("q"))
      val hist = li.groupBy(col("l_returnflag"), col("q"))
        .agg(graft.common.Exact.lcountAll.as("c"))
      val wcum = Window.partitionBy("l_returnflag").orderBy("q")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = hist
        .withColumn("cum", sum(col("c")).over(wcum))
        .withColumn("n",
          sum(col("c")).over(Window.partitionBy("l_returnflag")))
        .localCheckpoint() // feeds both median picks
      val lo = cum.filter(col("cum") * 2L >= col("n"))
        .groupBy("l_returnflag").agg(min(col("q")).as("lo"))
      val hi = cum.filter(col("cum") * 2L >= col("n") + 1L)
        .groupBy("l_returnflag").agg(min(col("q")).as("hi"))
      val med = lo.join(hi, "l_returnflag")
        .select(col("l_returnflag"), (col("lo") + col("hi")).as("med2"))
      val z = li.join(broadcast(med), "l_returnflag")
        .select(col("l_returnflag").as("g"), col("med2"),
          abs(col("q") * 2L - col("med2")).as("z2"))
      def grp(flag: String, suffix: String) = Seq(
        sum(when(col("g") === flag, 1L).otherwise(0L)).as(s"n_$suffix"),
        sum(when(col("g") === flag, col("z2")).otherwise(0L))
          .as(s"sz_$suffix"),
        sum(when(col("g") === flag, col("z2") * col("z2")).otherwise(0L))
          .as(s"zz_$suffix"),
        max(when(col("g") === flag, col("med2"))).as(s"med2_$suffix"))
      val aggs = grp("A", "a") ++ grp("N", "n") ++ grp("R", "r")
      val m = z.agg(aggs.head, aggs.tail: _*)
      def nD(x: String) = col(s"n_$x").cast("double")
      def zbar(x: String) = col(s"sz_$x").cast("double") / nD(x)
      val nTot = nD("a") + nD("n") + nD("r")
      val zbarAll =
        (col("sz_a") + col("sz_n") + col("sz_r")).cast("double") / nTot
      def numTerm(x: String) =
        nD(x) * (zbar(x) - zbarAll) * (zbar(x) - zbarAll)
      def denTerm(x: String) =
        col(s"zz_$x").cast("double") - col(s"sz_$x").cast("double") * zbar(x)
      val num = numTerm("a") + numTerm("n") + numTerm("r")
      val den = denTerm("a") + denTerm("n") + denTerm("r")
      val ok = col("n_a") >= 2L && col("n_n") >= 2L && col("n_r") >= 2L
      m.select(
        col("n_a"), col("n_n"), col("n_r"),
        col("med2_a"), col("med2_n"), col("med2_r"),
        col("sz_a"), col("sz_n"), col("sz_r"),
        col("zz_a"), col("zz_n"), col("zz_r"),
        when(ok && den > 0.0,
          ((nTot - 3.0) / 2.0) * num / den).as("f_bf"),
        when(ok && den > 0.0, nTot - 3.0).as("df2"))
    },
    Some {
      def grpSql(flag: String, x: String) =
        s"""CAST(SUM(CASE WHEN g = '$flag' THEN 1 ELSE 0 END) AS BIGINT)
              AS n_$x,
            CAST(SUM(CASE WHEN g = '$flag' THEN z2 ELSE 0 END) AS BIGINT)
              AS sz_$x,
            CAST(SUM(CASE WHEN g = '$flag' THEN z2 * z2 ELSE 0 END)
              AS BIGINT) AS zz_$x,
            MAX(CASE WHEN g = '$flag' THEN med2 END) AS med2_$x"""
      def zbarSql(x: String) = s"CAST(sz_$x AS DOUBLE) / CAST(n_$x AS DOUBLE)"
      val nTot = "(CAST(n_a AS DOUBLE) + CAST(n_n AS DOUBLE) + CAST(n_r AS DOUBLE))"
      val zbarAll = s"CAST(sz_a + sz_n + sz_r AS DOUBLE) / $nTot"
      def numT(x: String) =
        s"CAST(n_$x AS DOUBLE) * (${zbarSql(x)} - $zbarAll) * (${zbarSql(x)} - $zbarAll)"
      def denT(x: String) =
        s"(CAST(zz_$x AS DOUBLE) - CAST(sz_$x AS DOUBLE) * ${zbarSql(x)})"
      val num = s"(${numT("a")} + ${numT("n")} + ${numT("r")})"
      val den = s"(${denT("a")} + ${denT("n")} + ${denT("r")})"
      val ok = s"n_a >= 2 AND n_n >= 2 AND n_r >= 2 AND $den > 0"
      s"""WITH li AS (
            SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS q
            FROM lineitem
          ), hist AS (
            SELECT g, q, CAST(count(*) AS BIGINT) AS c
            FROM li GROUP BY 1, 2
          ), cum AS (
            SELECT g, q,
              SUM(c) OVER (PARTITION BY g ORDER BY q) AS cum,
              SUM(c) OVER (PARTITION BY g) AS n
            FROM hist
          ), med AS (
            SELECT lo.g, lo.lo + hi.hi AS med2
            FROM (SELECT g, MIN(q) AS lo FROM cum
                  WHERE cum * 2 >= n GROUP BY g) lo
            JOIN (SELECT g, MIN(q) AS hi FROM cum
                  WHERE cum * 2 >= n + 1 GROUP BY g) hi
            ON lo.g = hi.g
          ), z AS (
            SELECT li.g, med.med2, abs(li.q * 2 - med.med2) AS z2
            FROM li JOIN med ON li.g = med.g
          ), m AS (
            SELECT ${grpSql("A", "a")}, ${grpSql("N", "n")},
              ${grpSql("R", "r")}
            FROM z
          ), ref AS (
            SELECT n_a, n_n, n_r, med2_a, med2_n, med2_r,
              sz_a, sz_n, sz_r, zz_a, zz_n, zz_r,
              CASE WHEN $ok THEN
                (($nTot - 3.0) / 2.0) * $num / $den END AS f_bf,
              CASE WHEN $ok THEN $nTot - 3.0 END AS df2
            FROM m
          ), emitted AS (
            SELECT * FROM read_parquet(
              '${graft.QueryDef.OutDirToken}/q265_brown_forsythe/*.parquet')
          )
          -- every integer moment and both medians join EXACTLY; only
          -- f_bf takes a 1e-12 band: DuckDB evaluates the zz − sz·z̄
          -- multiply-subtract with a fused multiply-add (no
          -- intermediate rounding), which lands 1 ulp off the
          -- JVM/strict-IEEE chain at some scales (measured at sf0.1;
          -- PLANS.md round-13 close)
          SELECT e.n_a, e.n_n, e.n_r, e.med2_a, e.med2_n, e.med2_r,
            e.sz_a, e.sz_n, e.sz_r, e.zz_a, e.zz_n, e.zz_r,
            e.f_bf, e.df2
          FROM emitted e JOIN ref r
            ON e.n_a = r.n_a AND e.n_n = r.n_n AND e.n_r = r.n_r
            AND e.med2_a = r.med2_a AND e.med2_n = r.med2_n
            AND e.med2_r = r.med2_r
            AND e.sz_a = r.sz_a AND e.sz_n = r.sz_n AND e.sz_r = r.sz_r
            AND e.zz_a = r.zz_a AND e.zz_n = r.zz_n AND e.zz_r = r.zz_r
          WHERE abs(COALESCE(e.f_bf, 0) - COALESCE(r.f_bf, 0)) < 1e-12
            AND COALESCE(e.df2, -1) = COALESCE(r.df2, -1)"""
    },
    "Brown-Forsythe variance homogeneity across return flags: " +
      "histogram medians, integer deviation moments, terminal F [stats]")

  /** q269: Jonckheere-Terpstra ordered-alternative trend test — "do
    * quantities shift MONOTONICALLY with order priority?" The ordered
    * complement of the battery: q252's Cochran-Armitage needs a binary
    * outcome, q243's Kruskal-Wallis ignores the group ordering; JT
    * counts cross-group concordant pairs (x in a lower priority <
    * x in a higher one, ties at half weight) and gains power exactly
    * when the alternative is a monotone trend.
    *
    * Exactness: the pair census never enumerates pairs — per-(group,
    * value) histogram counts (the domain is 5 priorities × ≤50
    * quantities) give 2·JT = Σ_{g<h} Σ_v c_h(v)·(2·cum<_g(v) + c_g(v))
    * as an exact BIGINT on a dense ≤250-cell grid. The null moments
    * use the tie-corrected normal form (Lehmann): every Σ over groups
    * or tie-values folds per-term DOUBLE contributions in a PINNED
    * order (group digit / value — the q254 discipline; operands stay
    * under 2^53 to ~10¹⁵ rows per group), so mean, variance, and z are
    * bit-identical cross-engine. i64 envelope for 2JT: ≤ N², sound to
    * N ≈ 3·10⁹; beyond that the q252 decimal-evidence discipline
    * applies.
    *
    * Scale: one keyed lineitem×orders join folds map-side to the ≤250
    * histogram; the dense grid (values × 5 broadcast groups), the
    * cumulative windows, the 10-group-pair join, and both moment folds
    * all run on domain-bounded frames.
    */
  private val q269 = QueryDef(
    (s, d) => {
      val li = load(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_quantity").cast("long").as("q"))
        .join(load(s, d, "orders")
          .select(col("o_orderkey"),
            substring(col("o_orderpriority"), 1, 1).cast("long").as("w")),
          col("l_orderkey") === col("o_orderkey"))
      val hist = li.groupBy(col("w"), col("q"))
        .agg(graft.common.Exact.lcountAll.as("c"))
        .localCheckpoint() // grid, group moments, tie moments
      // dense grid so cum<_g is defined at every value in any group
      val grid = hist.select("q").distinct()
        .crossJoin(broadcast(hist.select("w").distinct()))
        .join(hist, Seq("w", "q"), "left")
        .withColumn("c", coalesce(col("c"), lit(0L)))
      val wcum = Window.partitionBy("w").orderBy("q")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val dense = grid
        .withColumn("cumlt", sum(col("c")).over(wcum) - col("c"))
        .localCheckpoint() // both sides of the pair join
      val jt2 = dense.as("g")
        .join(dense.as("h"), col("g.q") === col("h.q") &&
          col("g.w") < col("h.w"))
        .agg(sum(col("h.c") *
          (lit(2L) * col("g.cumlt") + col("g.c"))).as("jt2"))
      // pinned-order moment folds (contributions in double, operands
      // exact under 2^53)
      def foldScal(frame: org.apache.spark.sql.DataFrame, key: String,
          cnt: String): org.apache.spark.sql.DataFrame = {
        val x = col(cnt).cast("double")
        val run = Window.orderBy(col(key))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        frame
          .withColumn("n_run", sum(col(cnt)).over(run))
          .withColumn("sq_run", sum(col(cnt) * col(cnt)).over(run))
          .withColumn("s2_run",
            sum(x * (x - 1.0) * (x * 2.0 + 5.0)).over(run))
          .withColumn("s3_run", sum(x * (x - 1.0) * (x - 2.0)).over(run))
          .withColumn("sp_run", sum(x * (x - 1.0)).over(run))
          .withColumn("last",
            row_number().over(Window.orderBy(col(key).desc)))
          .filter(col("last") === 1)
          .select(col("n_run"), col("sq_run"), col("s2_run"),
            col("s3_run"), col("sp_run"))
      }
      val g = foldScal(hist.groupBy("w")
          .agg(sum(col("c")).as("ng")), "w", "ng")
        .toDF("n", "sum_ng2", "s2g", "s3g", "spg")
      val t = foldScal(hist.groupBy("q")
          .agg(sum(col("c")).as("tv")), "q", "tv")
        .toDF("n2", "sum_tv2", "s2t", "s3t", "spt")
      val nD = col("n").cast("double")
      val varJt =
        (nD * (nD - 1.0) * (nD * 2.0 + 5.0) - col("s2g") - col("s2t")) /
          72.0 +
          col("s3g") * col("s3t") /
            (nD * 36.0 * (nD - 1.0) * (nD - 2.0)) +
          col("spg") * col("spt") / (nD * 8.0 * (nD - 1.0))
      val meanJt = (nD * nD - col("sum_ng2").cast("double")) / 4.0
      jt2.crossJoin(broadcast(g)).crossJoin(broadcast(t))
        .select(col("n"), col("jt2"), col("sum_ng2"),
          meanJt.as("mean_jt"), varJt.as("var_jt"),
          when(varJt > 0.0,
            (col("jt2").cast("double") / 2.0 - meanJt) / sqrt(varJt))
            .as("z"))
    },
    Some("""WITH li AS (
              SELECT CAST(substring(o.o_orderpriority, 1, 1) AS BIGINT)
                  AS w,
                CAST(l.l_quantity AS BIGINT) AS q
              FROM lineitem l JOIN orders o
                ON l.l_orderkey = o.o_orderkey
            ), hist AS (
              SELECT w, q, CAST(count(*) AS BIGINT) AS c
              FROM li GROUP BY 1, 2
            ), grid AS (
              SELECT ws.w, qs.q, COALESCE(hist.c, 0) AS c
              FROM (SELECT DISTINCT q FROM hist) qs
              CROSS JOIN (SELECT DISTINCT w FROM hist) ws
              LEFT JOIN hist ON hist.w = ws.w AND hist.q = qs.q
            ), dense AS (
              SELECT w, q, c,
                SUM(c) OVER (PARTITION BY w ORDER BY q) - c AS cumlt
              FROM grid
            ), jt AS (
              SELECT CAST(SUM(h.c * (2 * g.cumlt + g.c)) AS BIGINT)
                AS jt2
              FROM dense g JOIN dense h
                ON g.q = h.q AND g.w < h.w
            ), gf AS (
              SELECT
                SUM(ng) OVER run AS n_run,
                SUM(ng * ng) OVER run AS sq_run,
                SUM(CAST(ng AS DOUBLE) * (CAST(ng AS DOUBLE) - 1.0)
                  * (2.0 * CAST(ng AS DOUBLE) + 5.0)) OVER run AS s2_run,
                SUM(CAST(ng AS DOUBLE) * (CAST(ng AS DOUBLE) - 1.0)
                  * (CAST(ng AS DOUBLE) - 2.0)) OVER run AS s3_run,
                SUM(CAST(ng AS DOUBLE) * (CAST(ng AS DOUBLE) - 1.0))
                  OVER run AS sp_run,
                ROW_NUMBER() OVER (ORDER BY w DESC) AS last
              FROM (SELECT w, CAST(SUM(c) AS BIGINT) AS ng
                    FROM hist GROUP BY 1)
              WINDOW run AS (ORDER BY w
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            ), g AS (
              SELECT CAST(n_run AS BIGINT) AS n,
                CAST(sq_run AS BIGINT) AS sum_ng2,
                s2_run AS s2g, s3_run AS s3g, sp_run AS spg
              FROM gf WHERE last = 1
            ), tf AS (
              SELECT
                SUM(CAST(tv AS DOUBLE) * (CAST(tv AS DOUBLE) - 1.0)
                  * (2.0 * CAST(tv AS DOUBLE) + 5.0)) OVER run AS s2_run,
                SUM(CAST(tv AS DOUBLE) * (CAST(tv AS DOUBLE) - 1.0)
                  * (CAST(tv AS DOUBLE) - 2.0)) OVER run AS s3_run,
                SUM(CAST(tv AS DOUBLE) * (CAST(tv AS DOUBLE) - 1.0))
                  OVER run AS sp_run,
                ROW_NUMBER() OVER (ORDER BY q DESC) AS last
              FROM (SELECT q, CAST(SUM(c) AS BIGINT) AS tv
                    FROM hist GROUP BY 1)
              WINDOW run AS (ORDER BY q
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            ), t AS (
              SELECT s2_run AS s2t, s3_run AS s3t, sp_run AS spt
              FROM tf WHERE last = 1
            )
            SELECT g.n, jt.jt2, g.sum_ng2,
              (CAST(g.n AS DOUBLE) * CAST(g.n AS DOUBLE)
                - CAST(g.sum_ng2 AS DOUBLE)) / 4.0 AS mean_jt,
              (CAST(g.n AS DOUBLE) * (CAST(g.n AS DOUBLE) - 1.0)
                  * (2.0 * CAST(g.n AS DOUBLE) + 5.0) - g.s2g - t.s2t)
                / 72.0
                + g.s3g * t.s3t / (36.0 * CAST(g.n AS DOUBLE)
                  * (CAST(g.n AS DOUBLE) - 1.0)
                  * (CAST(g.n AS DOUBLE) - 2.0))
                + g.spg * t.spt / (8.0 * CAST(g.n AS DOUBLE)
                  * (CAST(g.n AS DOUBLE) - 1.0)) AS var_jt,
              CASE WHEN
                (CAST(g.n AS DOUBLE) * (CAST(g.n AS DOUBLE) - 1.0)
                  * (2.0 * CAST(g.n AS DOUBLE) + 5.0) - g.s2g - t.s2t)
                / 72.0
                + g.s3g * t.s3t / (36.0 * CAST(g.n AS DOUBLE)
                  * (CAST(g.n AS DOUBLE) - 1.0)
                  * (CAST(g.n AS DOUBLE) - 2.0))
                + g.spg * t.spt / (8.0 * CAST(g.n AS DOUBLE)
                  * (CAST(g.n AS DOUBLE) - 1.0)) > 0
              THEN (CAST(jt.jt2 AS DOUBLE) / 2.0
                - (CAST(g.n AS DOUBLE) * CAST(g.n AS DOUBLE)
                  - CAST(g.sum_ng2 AS DOUBLE)) / 4.0)
                / sqrt(
                (CAST(g.n AS DOUBLE) * (CAST(g.n AS DOUBLE) - 1.0)
                  * (2.0 * CAST(g.n AS DOUBLE) + 5.0) - g.s2g - t.s2t)
                / 72.0
                + g.s3g * t.s3t / (36.0 * CAST(g.n AS DOUBLE)
                  * (CAST(g.n AS DOUBLE) - 1.0)
                  * (CAST(g.n AS DOUBLE) - 2.0))
                + g.spg * t.spt / (8.0 * CAST(g.n AS DOUBLE)
                  * (CAST(g.n AS DOUBLE) - 1.0)))
              END AS z
            FROM jt, g, t"""),
    "Jonckheere-Terpstra ordered trend on quantities across " +
      "priorities: histogram pair census, tie-corrected moments [stats]")

  def all: Seq[(String, QueryDef)] = Seq(
    "q142_cuped" -> q142,
    "q143_exact_corr" -> q143,
    "q160_two_proportion" -> q160,
    "q163_ols_by_group" -> q163,
    "q168_categorical_mi" -> q168,
    "q202_ipw_uplift" -> q202,
    "q214_spearman" -> q214,
    "q217_conformal_coverage" -> q217,
    "q218_wilson_ranking" -> q218,
    "q236_multi_ols" -> q236,
    "q243_kruskal_wallis" -> q243,
    "q244_bh_fdr" -> q244,
    "q252_ca_trend" -> q252,
    "q254_mh_odds_ratio" -> q254,
    "q262_welch_t" -> q262,
    "q264_friedman" -> q264,
    "q265_brown_forsythe" -> q265,
    "q269_jonckheere" -> q269)
}
