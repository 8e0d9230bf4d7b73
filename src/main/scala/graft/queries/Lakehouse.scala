package graft.queries

import graft.QueryDef
import graft.common.Tables.load
import graft.operators.ChangeFeed
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Lakehouse maintenance operators the reference gets from its Delta
  * layer and a plain-parquet engine must provide itself: row-level
  * change feeds between table states (Delta CDF; reference consumes it
  * implicitly through MERGE round-trips,
  * `orders_bronze_to_silver.py:184-196`) and incremental materialized-
  * view maintenance (the reference recomputes its gold aggregates per
  * run, `customer_features_daily.py`; at 100 TB a recompute per refresh
  * is the bottleneck, so the MV folds per-batch partial states instead).
  *
  * The registry queries derive both operators' inputs IN-PLAN from
  * deterministic splits of `orders`/`lineitem` so the driver can oracle-
  * check them; the table-layer wiring (manifest-diff change feeds via
  * `ParquetTable.changesBetween`, MV refresh via `ParquetTable.merge`)
  * is exercised by ChangeFeedSpec / IncrementalMvSpec on real versioned
  * tables.
  */
object Lakehouse {

  /** q105: row-level change feed between two snapshots of `orders`.
    * v1 drops keys ≡ 0 (mod 10); v2 drops keys ≡ 0 (mod 13) and bumps
    * the price of keys ≡ 0 (mod 7) — so the diff contains all three
    * change types with deterministic membership.
    *
    * Scale: ONE full-outer sort-merge join on the key, output bounded by
    * the true change count (unchanged rows are dropped null-safely).
    * Between table-layer versions the join never even sees untouched
    * data: `ParquetTable.changesBetween` feeds only the manifest
    * symmetric difference (immutable files present in both versions
    * cannot contribute changes), so a 0.1% merge diffs 0.1% of the
    * table. The in-plan form here exists for the oracle.
    */
  private val q105 = QueryDef(
    (s, d) => {
      val orders = load(s, d, "orders")
      val v1 = orders.filter(col("o_orderkey") % 10 =!= 0)
      val v2 = orders.filter(col("o_orderkey") % 13 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 7 === 0, col("o_totalprice") + 100.0)
            .otherwise(col("o_totalprice")))
      ChangeFeed.snapshotDiff(v1, v2,
        keys = Seq("o_orderkey"), compare = Seq("o_totalprice"))
    },
    Some("""WITH v1 AS (
              SELECT o_orderkey, o_totalprice FROM orders
              WHERE o_orderkey % 10 <> 0),
            v2 AS (
              SELECT o_orderkey,
                CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 100.0
                     ELSE o_totalprice END AS o_totalprice
              FROM orders WHERE o_orderkey % 13 <> 0),
            d AS (
              SELECT COALESCE(v1.o_orderkey, v2.o_orderkey) AS o_orderkey,
                v1.o_totalprice AS old_o_totalprice,
                v2.o_totalprice AS new_o_totalprice,
                CASE WHEN v1.o_orderkey IS NULL THEN 'insert'
                     WHEN v2.o_orderkey IS NULL THEN 'delete'
                     WHEN v1.o_totalprice IS DISTINCT FROM v2.o_totalprice
                       THEN 'update' END AS change_type
              FROM v1 FULL OUTER JOIN v2 ON v1.o_orderkey = v2.o_orderkey)
            SELECT * FROM d WHERE change_type IS NOT NULL"""),
    "snapshot change feed: keyed full-outer diff, insert/update/delete [lakehouse]")

  private val MvKeys = Seq("l_returnflag", "l_linestatus")

  /** The mergeable partial-aggregate state of one batch: algebraic
    * aggregates only (count/sum — each merges by addition), so refresh
    * never needs the raw history. avg is DERIVED from the state at read
    * time, never stored.
    *
    * The state is kept EXACT so the fold is associativity-safe: price is
    * summed in integer cents (double cents summed in any grouping order
    * would drift in the last ulp — a folded state must equal the one-shot
    * recompute BITWISE, not approximately), and quantity is
    * integer-valued, so its double sum is exact at any grouping.
    */
  private[graft] def mvPartial(batch: DataFrame): DataFrame =
    batch.groupBy(MvKeys.map(col): _*).agg(
      count(lit(1)).as("n_rows"),
      sum("l_quantity").as("sum_qty"),
      sum(round(col("l_extendedprice") * 100).cast("long"))
        .as("sum_price_cents"))

  /** Fold one batch's partial state into the standing MV state: union +
    * re-sum. O(|MV| + |batch groups|) per refresh — the raw table is
    * never re-read. IncrementalMvSpec runs the same fold through
    * `ParquetTable.merge` so only CHANGED groups rewrite.
    */
  private[graft] def mvMerge(state: DataFrame, partial: DataFrame): DataFrame =
    state.unionByName(partial)
      .groupBy(MvKeys.map(col): _*).agg(
        sum("n_rows").as("n_rows"),
        sum("sum_qty").as("sum_qty"),
        sum("sum_price_cents").as("sum_price_cents"))
      // a group whose rows were all retracted vanishes from the MV
      // (n_rows 0 with zeroed exact sums), matching a recompute that
      // never saw the group
      .filter(col("n_rows") =!= 0)

  /** The retraction of a partial state: every additive component
    * negated, so folding it in subtracts the rows the partial counted.
    * Exactness (integer cents / integer-valued quantities) is what
    * makes retraction LOSSLESS — add then retract restores the prior
    * state bitwise, which a float state cannot promise.
    */
  private[graft] def mvNegate(state: DataFrame): DataFrame =
    state.select(MvKeys.map(col) ++ Seq(
      (-col("n_rows")).as("n_rows"),
      (-col("sum_qty")).as("sum_qty"),
      (-col("sum_price_cents")).as("sum_price_cents")): _*)

  /** Columns of the MV's base rows a change feed must carry (as
    * `old_`/`new_` pairs) for CDC-driven refresh: group keys + measures.
    */
  private[graft] val MvInputCols =
    MvKeys ++ Seq("l_quantity", "l_extendedprice")

  /** CDC-driven incremental view maintenance: fold a
    * [[graft.operators.ChangeFeed.snapshotDiff]]-shaped change feed of
    * the BASE table into the standing MV state. Deleted and pre-update
    * rows contribute retractions (negated partials), inserted and
    * post-update rows contribute additions — so a group-key change in
    * an update moves the row's contribution between groups correctly.
    * Refresh cost is O(|changes| + |touched groups|): the base table is
    * never re-read, which is the point of pairing this with
    * `ParquetTable.changesBetween` (itself O(changed files)).
    */
  private[graft] def mvCdcRefresh(state: DataFrame,
      changes: DataFrame): DataFrame = {
    def side(prefix: String, types: Seq[String]) =
      changes.filter(col("change_type").isin(types: _*))
        .select(MvInputCols.map(c => col(s"$prefix$c").as(c)): _*)
    val retract = mvNegate(mvPartial(side("old_", Seq("delete", "update"))))
    val add = mvPartial(side("new_", Seq("insert", "update")))
    mvMerge(mvMerge(state, retract), add)
  }

  /** The user-facing read of the MV state: derived columns (avg) computed
    * from the algebraic state in one deterministic expression.
    */
  private[graft] def mvRead(state: DataFrame): DataFrame =
    state.select(col("l_returnflag"), col("l_linestatus"),
      col("n_rows"), col("sum_qty"), col("sum_price_cents"),
      (col("sum_qty") / col("n_rows")).as("avg_qty"))

  /** q106: incremental materialized view — the lineitem pricing summary
    * maintained by folding four deterministic batches' partial states
    * instead of recomputing from raw rows. The final state equals the
    * one-shot groupBy (the oracle is the PLAIN full recompute — no
    * derived contract needed), and IncrementalMvSpec pins that the fold
    * is invariant to batch count and arrival order.
    *
    * Scale: each batch's partial agg is map-side combined before its
    * (tiny: one row per touched group) state shuffles; the standing MV
    * is |groups| rows, so a refresh costs O(batch + |MV|) regardless of
    * table history — the property that makes a 100 TB gold table
    * maintainable per-ingest.
    */
  private val q106 = QueryDef(
    (s, d) => {
      val li = load(s, d, "lineitem")
      val batches = (0 until 4).map(i =>
        li.filter(pmod(col("l_orderkey"), lit(4)) === i))
      mvRead(batches.map(mvPartial).reduce(mvMerge))
    },
    Some("""SELECT l_returnflag, l_linestatus,
              CAST(count(*) AS BIGINT) AS n_rows,
              SUM(l_quantity) AS sum_qty,
              CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
                AS BIGINT) AS sum_price_cents,
              SUM(l_quantity) / count(*) AS avg_qty
            FROM lineitem GROUP BY 1, 2"""),
    "incremental MV: algebraic partial-state fold equals full recompute [lakehouse]")

  /** q190: incremental SECOND-moment MV — per-group mean AND variance
    * maintained by folding batch partial states, never re-reading
    * history. q106 proves count/sum fold; variance is the moment every
    * "is this metric drifting" dashboard needs, and it folds just as
    * algebraically: state = (n, Σx, Σx²) with x in integer cents and
    * Σx² in DECIMAL(38,0) (cents² overflows i64 on a fact table —
    * q143's discipline), so any batch arrival order yields the
    * BITWISE state of the one-shot recompute. Mean and sample variance
    * derive at read time from the exact integer evidence via the q163
    * guard pattern: variance = (n·Σx² − (Σx)²)/(n·(n−1)) as a single
    * division of exact decimals, NULL for n ≤ 1 groups on the exact
    * integer guard (no float division-by-zero semantics in play).
    *
    * Scale: each batch's partial is map-side combined before one
    * |touched groups|-row shuffle; the standing state is |groups|
    * rows. A refresh costs O(batch + |MV|) at any history length —
    * the same property that makes q106 maintainable per-ingest, now
    * for a dispersion metric.
    */
  private val q190 = QueryDef(
    (s, d) => {
      val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
      def partial(batch: DataFrame): DataFrame =
        batch.groupBy(col("l_returnflag"), col("l_linestatus")).agg(
          count(lit(1)).as("n_rows"),
          sum(graft.common.Exact.cents(col("l_extendedprice")))
            .as("sum_cents"),
          sum(graft.common.Exact.cents(col("l_extendedprice")).cast(dec38) *
            graft.common.Exact.cents(col("l_extendedprice")).cast(dec38))
            .as("sumsq_cents"))
      def merge(a: DataFrame, b: DataFrame): DataFrame =
        a.unionByName(b)
          .groupBy(col("l_returnflag"), col("l_linestatus")).agg(
            sum("n_rows").as("n_rows"),
            sum("sum_cents").as("sum_cents"),
            sum("sumsq_cents").as("sumsq_cents"))
      val li = load(s, d, "lineitem")
      val folded = (0 until 4)
        .map(i => partial(li.filter(pmod(col("l_orderkey"), lit(4)) === i)))
        .reduce(merge)
      val n = col("n_rows").cast(dec38)
      val varNum = n * col("sumsq_cents") -
        col("sum_cents").cast(dec38) * col("sum_cents").cast(dec38)
      folded.select(col("l_returnflag"), col("l_linestatus"),
        col("n_rows"), col("sum_cents"),
        (col("sum_cents").cast("double") / col("n_rows").cast("double"))
          .as("mean_cents"),
        when(col("n_rows") <= 1L, lit(null).cast("double"))
          .otherwise(varNum.cast("double") /
            (n * (n - lit(1).cast(dec38))).cast("double"))
          .as("var_cents"))
    },
    // Oracle = the one-shot recompute (the fold must equal it), via the
    // derived-evidence pattern: n·Σx² exceeds 2^53, where DuckDB's
    // HUGEINT→DOUBLE cast is not correctly rounded (the q176 finding),
    // so the integer evidence and the EXACT mean (sum_cents < 2^53 →
    // both engines' division is the same IEEE op) join bit-exactly and
    // only the variance division is admitted within tolerance.
    Some(s"""WITH m AS (
              SELECT l_returnflag, l_linestatus,
                CAST(count(*) AS BIGINT) AS n_rows,
                CAST(SUM(${graft.common.Exact.centsSql("l_extendedprice")})
                  AS BIGINT) AS sum_cents,
                SUM(CAST(${graft.common.Exact.centsSql("l_extendedprice")}
                  AS HUGEINT) *
                  ${graft.common.Exact.centsSql("l_extendedprice")})
                  AS sumsq_hi
              FROM lineitem GROUP BY 1, 2
            ), emitted AS (
              SELECT * FROM read_parquet(
                '${QueryDef.OutDirToken}/q190_incremental_stats_mv/*.parquet')
            )
            SELECT e.l_returnflag, e.l_linestatus, e.n_rows, e.sum_cents,
              e.mean_cents, e.var_cents
            FROM emitted e JOIN m
              ON e.l_returnflag = m.l_returnflag
              AND e.l_linestatus = m.l_linestatus
              AND e.n_rows = m.n_rows AND e.sum_cents = m.sum_cents
              AND e.mean_cents = CAST(m.sum_cents AS DOUBLE)
                / CAST(m.n_rows AS DOUBLE)
            WHERE (e.var_cents IS NULL AND m.n_rows <= 1) OR
              abs(e.var_cents -
                CAST(m.n_rows * m.sumsq_hi - CAST(m.sum_cents AS HUGEINT)
                    * m.sum_cents AS DOUBLE) /
                  CAST(CAST(m.n_rows AS HUGEINT) * (m.n_rows - 1)
                    AS DOUBLE))
                <= 1e-9 * abs(e.var_cents)"""),
    "incremental variance MV: mergeable (n, sum, sumsq) state, derived moments [lakehouse]")

  /** Histogram bucket width of q198's quantile state: $100 in cents.
    * The percentile answer is exact AT THIS GRANULARITY — the knob a
    * deployment turns for tighter answers at linearly more state.
    */
  private val QBucketCents = 10000L

  /** q198: mergeable QUANTILE state — per-group P50/P90/P99 maintained
    * incrementally from a fixed-width histogram whose counts fold by
    * addition (the t-digest role, with zero floats: a bucket count
    * vector is the simplest mergeable quantile sketch, and its error
    * contract — exact at bucket granularity — is DETERMINISTIC, which
    * a centroid digest can't promise cross-engine). Batches land as
    * (group, bucket, count) partials; refresh is a keyed re-sum; the
    * read derives each percentile as the first bucket whose running
    * count reaches ceil(q·n), all in integer arithmetic (ceil via
    * (q·n + 99) div 100), reported as the bucket's inclusive upper
    * bound in cents.
    *
    * Scale: partials map-side combine to |groups|·|buckets| rows per
    * batch; the standing state is the same size regardless of history;
    * the percentile scan is a window over each group's bucket rows
    * (bounded by the value range / bucket width, never the corpus).
    */
  /** One batch's histogram partial: (group, bucket, cnt) — the
    * mergeable quantile state (fold by addition). Shared by q198 and
    * the streaming twin (`streaming.QuantileStream`).
    */
  private[graft] def quantilePartial(batch: DataFrame): DataFrame =
    batch.groupBy(col("l_returnflag"),
      (graft.common.Exact.cents(col("l_extendedprice")) / QBucketCents)
        .cast("long").as("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Derive per-group P50/90/99 from folded histogram state — integer
    * arithmetic (ceil via (q·n + 99) div 100), reported as the bucket's
    * inclusive upper bound in cents.
    */
  private[graft] def quantileRead(hist: DataFrame): DataFrame = {
    val byGrp = org.apache.spark.sql.expressions.Window
      .partitionBy(col("l_returnflag"))
    val cumW = byGrp.orderBy(col("bucket").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val n = sum("cnt").over(byGrp)
    val withCum = hist
      .withColumn("cum", sum("cnt").over(cumW))
      .withColumn("n_rows", n)
    // `div` (not `/`): Spark long '/' is double division, whose
    // cast-to-long truncation only matches the oracle's integer `//`
    // while pct*n_rows+99 < 2^53; integer floor division matches at
    // any scale
    def kOf(pct: Int) = expr(s"($pct * n_rows + 99) div 100")
    def pAt(pct: Int) =
      min(when(col("cum") >= kOf(pct), col("bucket")))
    withCum.groupBy(col("l_returnflag"))
      .agg(max("n_rows").as("n_rows"),
        graft.common.Exact.lcountAll.as("n_buckets"),
        ((pAt(50) + 1L) * QBucketCents).as("p50_cents"),
        ((pAt(90) + 1L) * QBucketCents).as("p90_cents"),
        ((pAt(99) + 1L) * QBucketCents).as("p99_cents"))
  }

  private val q198 = QueryDef(
    (s, d) => {
      def merge(a: DataFrame, b: DataFrame): DataFrame =
        a.unionByName(b).groupBy(col("l_returnflag"), col("bucket"))
          .agg(sum("cnt").as("cnt"))
      val li = load(s, d, "lineitem")
      val hist = (0 until 4)
        .map(i => quantilePartial(
          li.filter(pmod(col("l_orderkey"), lit(4)) === i)))
        .reduce(merge)
      quantileRead(hist)
    },
    Some(s"""WITH h AS (
              SELECT l_returnflag,
                ${graft.common.Exact.centsSql("l_extendedprice")}
                  // $QBucketCents AS bucket,
                CAST(count(*) AS BIGINT) AS cnt
              FROM lineitem GROUP BY 1, 2
            ), c AS (
              SELECT l_returnflag, bucket, cnt,
                CAST(SUM(cnt) OVER (PARTITION BY l_returnflag
                  ORDER BY bucket ASC ROWS BETWEEN UNBOUNDED PRECEDING
                  AND CURRENT ROW) AS BIGINT) AS cum,
                CAST(SUM(cnt) OVER (PARTITION BY l_returnflag)
                  AS BIGINT) AS n_rows
              FROM h
            )
            SELECT l_returnflag,
              CAST(MAX(n_rows) AS BIGINT) AS n_rows,
              CAST(count(*) AS BIGINT) AS n_buckets,
              CAST((MIN(CASE WHEN cum >= (50 * n_rows + 99) // 100
                THEN bucket END) + 1) * $QBucketCents AS BIGINT)
                AS p50_cents,
              CAST((MIN(CASE WHEN cum >= (90 * n_rows + 99) // 100
                THEN bucket END) + 1) * $QBucketCents AS BIGINT)
                AS p90_cents,
              CAST((MIN(CASE WHEN cum >= (99 * n_rows + 99) // 100
                THEN bucket END) + 1) * $QBucketCents AS BIGINT)
                AS p99_cents
            FROM c GROUP BY 1"""),
    "mergeable quantile state: additive histogram, integer percentile derivation [lakehouse]")

  val all: Seq[(String, QueryDef)] = Seq(
    "q105_snapshot_diff" -> q105,
    "q106_incremental_mv" -> q106,
    "q190_incremental_stats_mv" -> q190,
    "q198_quantile_mv" -> q198)
}
