package graft.queries

import graft.QueryDef
import graft.common.Exact._
import graft.common.Tables.load
import org.apache.spark.sql.functions._

/** Data-profiling operators — the first thing a pipeline runs against an
  * unknown 100 TB input: per-column summary stats and value-distribution
  * histograms, each a single scan with partial aggregation.
  */
object Profiling {

  /** Column profile of lineitem numerics + keys: null/distinct/min/max
    * per column in ONE pass (no per-column jobs).
    */
  private val q57 = QueryDef(
    (s, d) =>
      load(s, d, "lineitem").agg(
        lcountAll.as("n_rows"),
        sum(when(col("l_quantity").isNull, 1L).otherwise(0L)).cast("long")
          .as("nulls_quantity"),
        countDistinct(col("l_orderkey")).cast("long").as("distinct_orderkey"),
        countDistinct(col("l_partkey")).cast("long").as("distinct_partkey"),
        countDistinct(col("l_returnflag")).cast("long").as("distinct_returnflag"),
        min(col("l_quantity")).cast("double").as("min_quantity"),
        max(col("l_quantity")).cast("double").as("max_quantity"),
        davg(col("l_quantity")).as("avg_quantity"),
        min(col("l_extendedprice")).cast("double").as("min_price"),
        max(col("l_extendedprice")).cast("double").as("max_price")),
    Some("""SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
              CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_quantity,
              CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS distinct_orderkey,
              CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS distinct_partkey,
              CAST(COUNT(DISTINCT l_returnflag) AS BIGINT) AS distinct_returnflag,
              CAST(MIN(l_quantity) AS DOUBLE) AS min_quantity,
              CAST(MAX(l_quantity) AS DOUBLE) AS max_quantity,
              CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_quantity) AS DOUBLE) AS avg_quantity,
              CAST(MIN(l_extendedprice) AS DOUBLE) AS min_price,
              CAST(MAX(l_extendedprice) AS DOUBLE) AS max_price
            FROM lineitem"""),
    "one-pass column profile: nulls/distincts/min/max/avg [profiling]")

  /** Equi-width histogram of order totals: 10 buckets over [0, 500k). */
  private val q58 = QueryDef(
    (s, d) =>
      load(s, d, "orders")
        .select(least(floor(col("o_totalprice") / 50000.0), lit(9))
          .cast("int").as("bucket"))
        .groupBy("bucket")
        .agg(lcountAll.as("n_orders"))
        .withColumn("bucket_lo", (col("bucket") * 50000.0).cast("double")),
    Some("""SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_orders,
              CAST(bucket * 50000.0 AS DOUBLE) AS bucket_lo
            FROM (SELECT CAST(least(floor(o_totalprice / 50000.0), 9) AS INTEGER) AS bucket
                  FROM orders)
            GROUP BY bucket"""),
    "equi-width histogram via floor-bucket groupBy [profiling]")

  /** Heavy-hitter detection (graft.operators.SkewJoin.heavyHitters on
    * the query surface): the top-20 hottest join keys with their share —
    * the input to the broadcast/salt/AQE decision.
    */
  private val q59b = QueryDef(
    (s, d) => {
      // single scan: the per-key counts feed BOTH the top-20 and the
      // share denominator (sum of counts == total rows); Catalyst reuses
      // the aggregation exchange for the two consumers, so lineitem is
      // read once — no separate count() job for the denominator
      val counts = load(s, d, "lineitem")
        .groupBy("l_suppkey").agg(count(lit(1)).as("n_rows"))
      val total = counts.agg(sum(col("n_rows")).as("_total"))
      counts.orderBy(col("n_rows").desc, col("l_suppkey").asc)
        .limit(20)
        .crossJoin(broadcast(total))
        .withColumn("share",
          col("n_rows").cast("double") / col("_total").cast("double"))
        .drop("_total")
    },
    Some("""SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS n_rows,
              CAST(CAST(COUNT(*) AS DOUBLE) /
                (SELECT COUNT(*) FROM lineitem) AS DOUBLE) AS share
            FROM lineitem GROUP BY 1
            ORDER BY n_rows DESC, l_suppkey ASC LIMIT 20"""),
    "heavy-hitter join keys with share [profiling,skew]")

  /** q124: the salted shuffle join (graft.operators.SkewJoin.saltedJoin)
    * as a first-class, oracle-checked query — revenue per order priority
    * through a lineitem⋈orders join executed with an 8-way salt spray.
    * q59b is the DETECTION half of the skew playbook; this is the
    * MITIGATION half, certified equivalent to the plain join by the
    * oracle (the salt must change the partitioning, never the result).
    *
    * Scale: the exact shape for a hot-key fact⋈dim join where the dim
    * side is too big to broadcast — the left's rows spray across
    * saltFactor sub-partitions of each key (bounding any one task at
    * ~1/saltFactor of the hottest key) and the right replicates
    * saltFactor×, a fixed small blowup. Aggregation after the join is
    * map-side combined to |priorities| rows. Exact-decimal revenue
    * (common.Exact discipline) keeps the sum independent of the salt's
    * repartitioning.
    */
  private val q124 = QueryDef(
    (s, d) => {
      val fact = load(s, d, "lineitem")
        .select(col("l_orderkey"), money(col("l_extendedprice")).as("px"),
          oneMinus(col("l_discount")).as("disc"))
      val dim = load(s, d, "orders")
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
      graft.operators.SkewJoin.saltedJoin(fact, dim, Seq("l_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(lcountAll.as("n_items"),
          sum(col("px") * col("disc")).cast("double").as("revenue"))
    },
    Some("""SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_items,
              CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))))
                AS DOUBLE) AS revenue
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY 1"""),
    "salted skew join certified against the plain join [profiling,skew]")

  // ---- generic profiles + drift (table-layer companion) ----

  /** One-pass generic per-column profile: (column, n_rows, n_nulls,
    * n_distinct, min_value, max_value) with min/max stringified so one
    * schema covers every column type. All aggregates run in a single
    * `agg` (the multiple exact distincts plan as one Expand pass —
    * fine for the handful of columns a drift check watches; a very wide
    * audit would swap in approx_count_distinct per column).
    */
  def columnProfiles(df: org.apache.spark.sql.DataFrame,
      cols: Seq[String]): org.apache.spark.sql.DataFrame = {
    require(cols.nonEmpty, "columnProfiles: no columns")
    val aggs = count(lit(1)).as("_n") +: cols.flatMap { c =>
      Seq(count(col(c)).as(s"_cnt_$c"),
        count_distinct(col(c)).as(s"_nd_$c"),
        min(col(c)).cast("string").as(s"_min_$c"),
        max(col(c)).cast("string").as(s"_max_$c"))
    }
    val entries = array(cols.map { c =>
      struct(lit(c).as("column"),
        col("_n").as("n_rows"),
        (col("_n") - col(s"_cnt_$c")).as("n_nulls"),
        col(s"_nd_$c").as("n_distinct"),
        col(s"_min_$c").as("min_value"),
        col(s"_max_$c").as("max_value"))
    }: _*)
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(entries).as("p")).select("p.*")
  }

  /** Profile drift between two snapshots of the same table (pair with
    * `ParquetTable.readVersion` for before/after): per watched column,
    * both profiles side by side plus the drift signals a monitor alerts
    * on — null-rate delta, distinct-count ratio, min/max movement. Two
    * single-pass profiles and a k-row join; nothing scales with table
    * width beyond the watched columns.
    */
  def profileDrift(before: org.apache.spark.sql.DataFrame,
      after: org.apache.spark.sql.DataFrame,
      cols: Seq[String]): org.apache.spark.sql.DataFrame = {
    val b = columnProfiles(before, cols).select(col("column"),
      col("n_rows").as("n_rows_before"), col("n_nulls").as("n_nulls_before"),
      col("n_distinct").as("n_distinct_before"),
      col("min_value").as("min_before"), col("max_value").as("max_before"))
    val a = columnProfiles(after, cols).select(col("column"),
      col("n_rows").as("n_rows_after"), col("n_nulls").as("n_nulls_after"),
      col("n_distinct").as("n_distinct_after"),
      col("min_value").as("min_after"), col("max_value").as("max_after"))
    val nullRate = (n: org.apache.spark.sql.Column,
        t: org.apache.spark.sql.Column) =>
      when(t > 0, n.cast("double") / t).otherwise(lit(0.0))
    b.join(a, "column")
      .withColumn("null_rate_delta",
        nullRate(col("n_nulls_after"), col("n_rows_after")) -
          nullRate(col("n_nulls_before"), col("n_rows_before")))
      .withColumn("distinct_ratio",
        when(col("n_distinct_before") > 0,
          col("n_distinct_after").cast("double") / col("n_distinct_before"))
          .otherwise(lit(Double.NaN)))
      .withColumn("min_changed", !(col("min_after") <=> col("min_before")))
      .withColumn("max_changed", !(col("max_after") <=> col("max_before")))
      .withColumn("drifted",
        abs(col("null_rate_delta")) > 0.01 ||
          col("distinct_ratio") < 0.5 || col("distinct_ratio") > 2.0 ||
          col("min_changed") || col("max_changed"))
  }

  /** q114: vocabulary drift between two corpus slices (doc_id parity
    * stands in for "yesterday's ingest vs today's") — per term, the
    * 2×2 chi-square contribution of its count split vs the overall
    * split, top 50 drifting terms. The monitoring query that catches a
    * source change (new boilerplate, template shift, language mix
    * drift) before it poisons a training mix.
    *
    * Determinism: counts are exact integers; expected values and χ²
    * are derived in ONE fixed expression order on both engines, so the
    * top-50 cut is stable (ties broken by term).
    *
    * Scale: one term-keyed aggregate with map-side combine (the
    * conditional sums fold per partition), a broadcast of the 2-row
    * totals, then TakeOrdered — the term cardinality shuffles once,
    * raw occurrences never do.
    */
  private val q114 = QueryDef(
    (s, d) => {
      import graft.functions.Text
      val occ = load(s, d, "documents")
        .select(pmod(col("doc_id"), lit(2)).as("half"),
          explode(Text.words(col("text"))).as("term"))
      val counts = occ.groupBy("term").agg(
        sum(when(col("half") === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("half") === 1, 1L).otherwise(0L)).as("n_b"))
      val tot = counts.agg(sum("n_a").as("t_a"), sum("n_b").as("t_b"))
      val eA = (col("n_a") + col("n_b")).cast("double") * col("t_a") /
        (col("t_a") + col("t_b"))
      val eB = (col("n_a") + col("n_b")).cast("double") * col("t_b") /
        (col("t_a") + col("t_b"))
      counts.crossJoin(broadcast(tot))
        .withColumn("chi2",
          (col("n_a") - eA) * (col("n_a") - eA) / eA +
            (col("n_b") - eB) * (col("n_b") - eB) / eB)
        .orderBy(col("chi2").desc, col("term").asc)
        .limit(50)
        .select("term", "n_a", "n_b", "chi2")
    },
    Some {
      val words =
        "string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')"
      s"""WITH occ AS (
            SELECT doc_id % 2 AS half, unnest($words) AS term
            FROM documents),
          c AS (
            SELECT term,
              CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
              CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
            FROM occ GROUP BY 1),
          t AS (
            SELECT CAST(SUM(n_a) AS BIGINT) AS t_a,
              CAST(SUM(n_b) AS BIGINT) AS t_b FROM c)
          SELECT term, n_a, n_b,
            (n_a - CAST(n_a + n_b AS DOUBLE) * t_a / (t_a + t_b)) *
              (n_a - CAST(n_a + n_b AS DOUBLE) * t_a / (t_a + t_b)) /
              (CAST(n_a + n_b AS DOUBLE) * t_a / (t_a + t_b)) +
            (n_b - CAST(n_a + n_b AS DOUBLE) * t_b / (t_a + t_b)) *
              (n_b - CAST(n_a + n_b AS DOUBLE) * t_b / (t_a + t_b)) /
              (CAST(n_b + n_a AS DOUBLE) * t_b / (t_a + t_b)) AS chi2
          FROM c CROSS JOIN t
          ORDER BY chi2 DESC, term LIMIT 50"""
    },
    "vocabulary drift: per-term chi-square split audit, top drifting terms [monitoring]")

  /** q158: join-key skew profile — the diagnostic a planner (or the
    * engineer sizing a salted join, q124) reads before shuffling on a
    * key: key cardinality, row total, max per-key count, exact
    * rank-based p50/p90/p99 of the per-key counts, and the Gini
    * concentration of rows over keys (0 = uniform, →1 = one hot key
    * owns the table).
    *
    * Scale: the fact table collapses to the key-count frame in one
    * map-side-combined aggregate; everything after runs on |keys| rows.
    * Rank positions come from the range-partitioned global order (no
    * one-partition window); the Gini rank-sum Σ(i+1)·cᵢ is a plain
    * aggregate over it. i64 bound: n_keys·n_rows ≤ 10¹⁸ holds to ~10⁹
    * keys × 10⁹ rows; past that the two sums move to DECIMAL(38,0).
    *
    * Exactness: every statistic is an integer except Gini — one
    * division of two exact i64 expressions, bit-identical cross-engine.
    */
  private val q158 = QueryDef(
    (s, d) => {
      val keyCounts = load(s, d, "orders")
        .groupBy(col("o_custkey")).agg(lcountAll.as("cnt"))
      val n = keyCounts.count()
      def idx(p: Long) = p * (n - 1) / 100
      val ord = Curation.globalOrder(
        keyCounts, Seq(col("cnt").asc, col("o_custkey").asc))
      val folded = ord.agg(
        lcountAll.as("n_keys"),
        sum("cnt").as("n_rows"),
        max("cnt").as("max_cnt"),
        sum((col("position") + 1L) * col("cnt")).as("rank_sum"),
        max(when(col("position") === idx(50L), col("cnt"))).as("p50_cnt"),
        max(when(col("position") === idx(90L), col("cnt"))).as("p90_cnt"),
        max(when(col("position") === idx(99L), col("cnt"))).as("p99_cnt"))
      folded.select(col("n_keys"), col("n_rows"), col("max_cnt"),
        col("p50_cnt"), col("p90_cnt"), col("p99_cnt"),
        ((lit(2L) * col("rank_sum") - (col("n_keys") + 1L) * col("n_rows"))
          .cast("double") /
          (col("n_keys") * col("n_rows")).cast("double")).as("gini"))
    },
    Some("""WITH kc AS (
              SELECT o_custkey, CAST(count(*) AS BIGINT) AS cnt
              FROM orders GROUP BY 1
            ), o AS (
              SELECT cnt,
                ROW_NUMBER() OVER (ORDER BY cnt ASC, o_custkey ASC) - 1
                  AS position
              FROM kc
            ), s AS (SELECT CAST(count(*) AS BIGINT) AS n FROM kc)
            SELECT CAST(MAX(n) AS BIGINT) AS n_keys,
              CAST(SUM(cnt) AS BIGINT) AS n_rows,
              CAST(MAX(cnt) AS BIGINT) AS max_cnt,
              CAST(MAX(CASE WHEN position = 50 * (n - 1) // 100
                THEN cnt END) AS BIGINT) AS p50_cnt,
              CAST(MAX(CASE WHEN position = 90 * (n - 1) // 100
                THEN cnt END) AS BIGINT) AS p90_cnt,
              CAST(MAX(CASE WHEN position = 99 * (n - 1) // 100
                THEN cnt END) AS BIGINT) AS p99_cnt,
              CAST(2 * SUM((position + 1) * cnt)
                  - (MAX(n) + 1) * SUM(cnt) AS DOUBLE) /
                CAST(MAX(n) * SUM(cnt) AS DOUBLE) AS gini
            FROM o, s"""),
    "join-key skew profile: exact rank percentiles + Gini over key counts [profiling]")

  def all: Seq[(String, QueryDef)] = Seq(
    "q57_column_profile" -> q57,
    "q58_histogram" -> q58,
    "q61_heavy_hitters" -> q59b,
    "q114_vocab_drift" -> q114,
    "q124_salted_join" -> q124,
    "q158_key_skew" -> q158)
}
