package graft.queries

import graft.QueryDef
import graft.common.Exact._
import graft.common.Tables.load
import org.apache.spark.sql.functions._

/** Schema/data audit operators: candidate-key discovery, cross-table
  * referential integrity, and digit-distribution (Benford) screening —
  * the profiling battery a lakehouse runs against a newly landed source
  * before trusting joins or amounts.
  */
object Audit {

  /** Candidate key combos to profile, per table. Bounded, declared —
    * full FD discovery is exponential; production profilers (and this
    * operator) test the combos the schema claims or the modeler asks
    * about.
    */
  private val KeyCombos: Seq[(String, Seq[String])] = Seq(
    "orders" -> Seq("o_orderkey"),
    "orders" -> Seq("o_custkey"),
    "orders" -> Seq("o_custkey", "o_orderdate"),
    "lineitem" -> Seq("l_orderkey"),
    "lineitem" -> Seq("l_orderkey", "l_linenumber"),
    "customer" -> Seq("c_custkey"))

  /** q148: candidate-key discovery — for each declared combo, the row
    * count, distinct-combo count, exact uniqueness ratio, and the key
    * verdict. The profile that catches "this 'key' silently went
    * non-unique after the last backfill".
    *
    * Scale: one count-distinct aggregate per combo over only the
    * combo's columns (column-pruned scans); each is a map-side-combined
    * exchange of the combo values; results union into a |combos|-row
    * frame. No full-column scans, no cross-combo shuffle sharing needed
    * at this cardinality.
    *
    * Exactness: counts and one double division.
    */
  private val q148 = QueryDef(
    (s, d) => {
      KeyCombos.map { case (table, cols) =>
        load(s, d, table)
          .agg(lcountAll.as("n_rows"),
            countDistinct(cols.head, cols.tail: _*).cast("long")
              .as("n_distinct"))
          .select(
            lit(table).as("table_name"),
            lit(cols.mkString(",")).as("key_cols"),
            col("n_rows"), col("n_distinct"),
            (col("n_distinct").cast("double") / col("n_rows").cast("double"))
              .as("uniqueness"),
            (col("n_distinct") === col("n_rows")).as("is_key"))
      }.reduce(_ unionByName _)
    },
    Some {
      val parts = KeyCombos.map { case (table, cols) =>
        val colList = cols.mkString(", ")
        s"""SELECT '$table' AS table_name,
              '${cols.mkString(",")}' AS key_cols,
              CAST(count(*) AS BIGINT) AS n_rows,
              CAST(count(DISTINCT ($colList)) AS BIGINT) AS n_distinct,
              CAST(count(DISTINCT ($colList)) AS DOUBLE) /
                CAST(count(*) AS DOUBLE) AS uniqueness,
              count(DISTINCT ($colList)) = count(*) AS is_key
            FROM $table"""
      }
      Some(parts.mkString("\nUNION ALL\n"))
    }.get,
    "candidate-key discovery: per-combo pruned count-distinct profile [audit]")

  /** Foreign-key edges of the star schema, child → parent. */
  private val FkEdges: Seq[(String, String, String, String)] = Seq(
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"))

  /** q149: referential-integrity audit — for every declared FK edge,
    * how many child rows exist, how many are orphans (no parent), and
    * how many distinct orphan keys. The cross-table DQ gate a landing
    * zone runs before exposing joins.
    *
    * Scale: each edge is one LEFT join from the pruned child key
    * column against the pruned parent key. The parent side is
    * deliberately NOT hinted: the first edge's parent (`orders`) is
    * fact-grain — its distinct key set grows with the corpus, and a
    * forced broadcast would OOM the driver at the 100 TB target. AQE
    * picks broadcast for the genuinely small parents (nation/region,
    * and the mid dims while they fit) from runtime sizes and falls
    * back to a shuffle join otherwise — which is cheap here because
    * both join inputs are single pruned key columns. Orphan counting
    * is a conditional aggregate on the join output. |edges| bounded
    * rows out.
    */
  private val q149 = QueryDef(
    (s, d) => {
      FkEdges.map { case (child, fk, parent, pk) =>
        val c = load(s, d, child).select(col(fk).as("fk"))
        val p = load(s, d, parent).select(col(pk).as("pk")).distinct()
        c.join(p, col("fk") === col("pk"), "left")
          .agg(lcountAll.as("n_child_rows"),
            sum(when(col("pk").isNull, 1L).otherwise(0L)).as("n_orphans"),
            countDistinct(when(col("pk").isNull, col("fk")))
              .cast("long").as("n_orphan_keys"))
          .select(lit(s"$child.$fk").as("fk_col"),
            lit(s"$parent.$pk").as("pk_col"),
            col("n_child_rows"), col("n_orphans"), col("n_orphan_keys"),
            (col("n_orphans") === 0L).as("intact"))
      }.reduce(_ unionByName _)
    },
    Some {
      val parts = FkEdges.map { case (child, fk, parent, pk) =>
        s"""SELECT '$child.$fk' AS fk_col, '$parent.$pk' AS pk_col,
              CAST(count(*) AS BIGINT) AS n_child_rows,
              CAST(SUM(CASE WHEN p.pk IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_orphans,
              CAST(count(DISTINCT CASE WHEN p.pk IS NULL THEN c.$fk END)
                AS BIGINT) AS n_orphan_keys,
              SUM(CASE WHEN p.pk IS NULL THEN 1 ELSE 0 END) = 0 AS intact
            FROM $child c LEFT JOIN
              (SELECT DISTINCT $pk AS pk FROM $parent) p
              ON c.$fk = p.pk"""
      }
      Some(parts.mkString("\nUNION ALL\n"))
    }.get,
    "referential-integrity audit: AQE-sized left joins, orphan counts [audit]")

  /** Benford first-digit expectations log10(1+1/d), spelled as full-
    * precision literals so both engines COMPARE against the identical
    * doubles (computing log10 in-engine would not be bit-portable).
    */
  private val Benford: Seq[(Int, String)] = Seq(
    1 -> "0.3010299956639812", 2 -> "0.17609125905568124",
    3 -> "0.12493873660829993", 4 -> "0.09691001300805642",
    5 -> "0.07918124604762482", 6 -> "0.06694678963061322",
    7 -> "0.05799194697768673", 8 -> "0.05115252244738129",
    9 -> "0.04575749056067514")

  /** q150: Benford first-significant-digit screening of order totals —
    * observed digit frequencies against the Benford expectation, with
    * per-digit absolute deviation. The classic fraud/corruption smell
    * test for money columns (synthetic uniform-ish totals will FAIL
    * Benford — the audit's output says so honestly; the operator is
    * the deliverable).
    *
    * Scale: first digit extracts as the leading character of the
    * integer cents rendering (no float log10) — a narrow map; one
    * 9-group aggregate; expectations join from an inline literal frame.
    *
    * Exactness: counts exact; frequency and deviation are single
    * IEEE ops against literal expectations.
    */
  private val q150 = QueryDef(
    (s, d) => {
      val digits = load(s, d, "orders")
        .filter(col("o_totalprice") > 0.0)
        .select(substring(cents(col("o_totalprice")).cast("string"), 1, 1)
          .cast("int").as("digit"))
        .groupBy(col("digit"))
        .agg(lcountAll.as("n"))
      val expected = Benford
        .map { case (dig, p) => (dig, p.toDouble) }
        .foldLeft(Option.empty[org.apache.spark.sql.DataFrame]) {
          case (acc, (dig, p)) =>
            val row = s.range(1).select(lit(dig).as("digit"),
              lit(p).as("expected_freq"))
            Some(acc.fold(row)(_ unionByName row))
        }.get
      val total = digits.agg(sum("n").as("n_total"))
      digits.join(broadcast(expected), "digit")
        .crossJoin(broadcast(total))
        .select(col("digit"), col("n"),
          (col("n").cast("double") / col("n_total").cast("double"))
            .as("observed_freq"),
          col("expected_freq"))
        .withColumn("abs_dev",
          abs(col("observed_freq") - col("expected_freq")))
    },
    Some {
      // DuckDB parses a bare decimal literal as DECIMAL and
      // CAST(decimal AS DOUBLE) rounds through the decimal domain —
      // one ulp off the correctly-rounded string→double parse Spark's
      // lit() does. Casting from a STRING literal makes DuckDB run the
      // same correctly-rounded parse.
      val expected = Benford
        .map { case (dig, p) =>
          s"SELECT $dig AS digit, CAST('$p' AS DOUBLE) AS expected_freq" }
        .mkString("\nUNION ALL\n")
      s"""WITH digits AS (
            SELECT CAST(substr(CAST(${centsSqlExpr} AS VARCHAR), 1, 1)
              AS INTEGER) AS digit
            FROM orders WHERE o_totalprice > 0.0
          ), counts AS (
            SELECT digit, CAST(count(*) AS BIGINT) AS n
            FROM digits GROUP BY 1
          ), t AS (SELECT CAST(SUM(n) AS BIGINT) AS n_total FROM counts),
          e AS ($expected)
          SELECT c.digit, c.n,
            CAST(c.n AS DOUBLE) / CAST(t.n_total AS DOUBLE)
              AS observed_freq,
            e.expected_freq,
            abs(CAST(c.n AS DOUBLE) / CAST(t.n_total AS DOUBLE)
              - e.expected_freq) AS abs_dev
          FROM counts c JOIN e ON c.digit = e.digit, t"""
    },
    "Benford first-digit screen: string digit extract, literal expectations [audit]")

  private def centsSqlExpr: String =
    graft.common.Exact.centsSql("o_totalprice")

  /** q183: duplicate-payment screen — pairs of purchase events by the
    * SAME user for the SAME whole-dollar amount within 24 hours: the
    * double-charge / replayed-webhook audit every payments pipeline
    * runs (dollar granularity + a day window is the standard
    * chargeback-review net; exact-cent + minutes catches only literal
    * replays). The join key is (user, dollars) EQUALITY — maximally
    * selective, so unlike a time-bucketed range join (q53) the
    * candidate set is only true amount collisions, and the temporal
    * predicate rides the hash join as a filter. Pair fan-out is
    * bounded by per-(user, amount, day) multiplicity — duplicate
    * clusters, not the corpus.
    *
    * Exactness: integer dollar keys via FLOOR division (cents −
    * pmod(cents, 100) is an exact multiple of 100, so the one double
    * division is exact and matches DuckDB's flooring `//` on negative
    * amounts — refunds/chargebacks — where a truncating `div` would
    * disagree), integer second deltas, ordered pair convention
    * (a.event_id < b.event_id) — nothing floating.
    */
  private val q183 = QueryDef(
    (s, d) => {
      val cts = cents(col("value"))
      val p = load(s, d, "events")
        .filter(col("event_type") === "purchase")
        .select(col("user_id"),
          ((cts - pmod(cts, lit(100L))) / 100L).cast("long")
            .as("amount_dollars"),
          col("event_id"), unix_timestamp(col("ts")).as("sec"))
      p.as("a").join(p.as("b"),
          col("a.user_id") === col("b.user_id") &&
            col("a.amount_dollars") === col("b.amount_dollars") &&
            col("a.event_id") < col("b.event_id"))
        .withColumn("dt_seconds",
          abs(col("b.sec") - col("a.sec")))
        .filter(col("dt_seconds") <= 86400L)
        .select(col("a.user_id").as("user_id"),
          col("a.amount_dollars").as("amount_dollars"),
          col("a.event_id").as("event_id_a"),
          col("b.event_id").as("event_id_b"),
          col("dt_seconds"))
    },
    Some(s"""WITH p AS (
              SELECT user_id,
                ${centsSql("value")} // 100 AS amount_dollars,
                event_id,
                date_diff('second', TIMESTAMP '1970-01-01', ts) AS sec
              FROM events WHERE event_type = 'purchase'
            )
            SELECT a.user_id, a.amount_dollars,
              a.event_id AS event_id_a, b.event_id AS event_id_b,
              CAST(abs(b.sec - a.sec) AS BIGINT) AS dt_seconds
            FROM p a JOIN p b
              ON a.user_id = b.user_id
             AND a.amount_dollars = b.amount_dollars
             AND a.event_id < b.event_id
            WHERE abs(b.sec - a.sec) <= 86400"""),
    "duplicate-payment screen: exact (user, dollars) collision pairs within 24 h [audit]")

  /** q185: single-sourcing risk profile — how many distinct suppliers
    * serve each part, folded to a sourcing-depth histogram with each
    * tier's part share and revenue exposure. The supply-chain audit
    * behind "12% of revenue rides single-sourced SKUs".
    *
    * Scale: one (part)-keyed fold computes supplier depth AND revenue
    * together, then a ≤|suppliers|-row histogram; the corpus totals
    * are window sums over the histogram frame ITSELF (they are its
    * own marginals), so the fact table is scanned exactly once — no
    * scalar-total branch to re-plan. Integers + single divisions.
    */
  private val q185 = QueryDef(
    (s, d) => {
      val perPart = load(s, d, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(countDistinct(col("l_suppkey")).cast("long")
          .as("n_suppliers"),
          sum(cents(col("l_extendedprice"))).as("rev_cents"))
      val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
      perPart.groupBy(col("n_suppliers"))
        .agg(lcountAll.as("n_parts"), sum("rev_cents").as("rev_cents"))
        .select(col("n_suppliers"), col("n_parts"), col("rev_cents"),
          (col("n_parts").cast("double") /
            sum("n_parts").over(wAll).cast("double")).as("part_share"),
          (col("rev_cents").cast("double") /
            sum("rev_cents").over(wAll).cast("double")).as("rev_share"))
    },
    Some(s"""WITH pp AS (
              SELECT l_partkey,
                CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers,
                CAST(SUM(${centsSql("l_extendedprice")}) AS BIGINT)
                  AS rev_cents
              FROM lineitem GROUP BY 1
            ), tot AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n_parts_total,
                CAST(SUM(rev_cents) AS BIGINT) AS rev_total
              FROM pp
            )
            SELECT n_suppliers,
              CAST(COUNT(*) AS BIGINT) AS n_parts,
              CAST(SUM(rev_cents) AS BIGINT) AS rev_cents,
              CAST(COUNT(*) AS DOUBLE) / CAST(t.n_parts_total AS DOUBLE)
                AS part_share,
              CAST(SUM(rev_cents) AS DOUBLE) / CAST(t.rev_total AS DOUBLE)
                AS rev_share
            FROM pp, tot t GROUP BY n_suppliers, t.n_parts_total,
              t.rev_total"""),
    "single-sourcing risk: supplier-depth histogram with revenue exposure [audit]")

  /** q186: price-realization audit per brand — realized line revenue
    * vs list (quantity × retail price): how often lines sell below
    * list, the net discount given, and the effective discount rate.
    * The pricing-leakage report a revenue-management review starts
    * from. ENTIRELY integer: both sides of every comparison are cents
    * (quantity is integral by generator contract, asserted exact by
    * the cast), so "below list" has no float-boundary ambiguity, and
    * the two emitted rates are single divisions of exact sums.
    *
    * Scale: the part side is pruned to three columns and joins
    * unhinted — `part` grows with the corpus, so the broadcast-vs-
    * shuffle call belongs to AQE's runtime sizes, not a hard-coded
    * hint; ONE brand-keyed fold after a narrow per-line compare.
    */
  private val q186 = QueryDef(
    (s, d) => {
      val li = load(s, d, "lineitem")
        .select(col("l_partkey"), cents(col("l_extendedprice")).as("ext"),
          col("l_quantity").cast("long").as("qty"))
      val p = load(s, d, "part")
        .select(col("p_partkey"), col("p_brand"),
          cents(col("p_retailprice")).as("retail"))
      li.join(p, col("l_partkey") === col("p_partkey"))
        .withColumn("list_cents", col("qty") * col("retail"))
        .groupBy(col("p_brand"))
        .agg(lcountAll.as("n_lines"),
          sum(when(col("ext") < col("list_cents"), 1L).otherwise(0L))
            .as("n_below_list"),
          sum(col("list_cents") - col("ext")).as("net_discount_cents"),
          sum(col("list_cents")).as("list_cents"))
        .select(col("p_brand"), col("n_lines"), col("n_below_list"),
          col("net_discount_cents"),
          (col("n_below_list").cast("double") /
            col("n_lines").cast("double")).as("below_share"),
          (col("net_discount_cents").cast("double") /
            col("list_cents").cast("double")).as("discount_rate"))
    },
    Some(s"""WITH j AS (
              SELECT p.p_brand,
                ${centsSql("l_extendedprice")} AS ext,
                CAST(l_quantity AS BIGINT)
                  * ${centsSql("p_retailprice")} AS list_cents
              FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            )
            SELECT p_brand,
              CAST(COUNT(*) AS BIGINT) AS n_lines,
              CAST(SUM(CASE WHEN ext < list_cents THEN 1 ELSE 0 END)
                AS BIGINT) AS n_below_list,
              CAST(SUM(list_cents - ext) AS BIGINT) AS net_discount_cents,
              CAST(SUM(CASE WHEN ext < list_cents THEN 1 ELSE 0 END)
                AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS below_share,
              CAST(SUM(list_cents - ext) AS DOUBLE) /
                CAST(SUM(list_cents) AS DOUBLE) AS discount_rate
            FROM j GROUP BY 1"""),
    "price-realization audit: integer list-vs-realized compare per brand [audit]")

  /** Late threshold for q187 (days from order to line ship). */
  private val LateDays = 90

  /** q187: late-shipment screen per supplier — each supplier's late
    * rate tested against the corpus rate with a one-sample z (the
    * per-group version of q160's two-proportion fold): the vendor
    * scorecard that flags chronically late suppliers with statistical
    * backing rather than a raw rate sort.
    *
    * Scale: ONE line→order join keyed on the fact join key (order dim
    * side of the join is the orders table — key-partitioned, no
    * broadcast assumption), one supplier fold, and the corpus baseline
    * is a window marginal over the |suppliers| frame — the q185 trick,
    * no second scan. z's chain is subtraction/multiply/divide/sqrt —
    * correctly-rounded IEEE ops over single-division rates, so the
    * oracle is direct, no tolerance; degenerate baselines (p₀ ∈
    * {0,1}) emit NULL via integer guards.
    */
  private val q187 = QueryDef(
    (s, d) => {
      val li = load(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      val o = load(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderdate"))
      val perSupp = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .withColumn("late",
          when(datediff(to_date(col("l_shipdate")),
            to_date(col("o_orderdate"))) > LateDays, 1L).otherwise(0L))
        .groupBy(col("l_suppkey"))
        .agg(lcountAll.as("n_lines"), sum("late").as("n_late"))
      val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
      val withTot = perSupp
        .withColumn("tot_lines", sum("n_lines").over(wAll))
        .withColumn("tot_late", sum("n_late").over(wAll))
      withTot.select(col("l_suppkey"), col("n_lines"), col("n_late"),
        (col("n_late").cast("double") / col("n_lines").cast("double"))
          .as("late_rate"),
        (col("tot_late").cast("double") / col("tot_lines").cast("double"))
          .as("base_rate"),
        when(col("tot_late") === 0L || col("tot_late") === col("tot_lines"),
          lit(null).cast("double"))
          .otherwise(
            ((col("n_late").cast("double") / col("n_lines").cast("double")) -
              (col("tot_late").cast("double") /
                col("tot_lines").cast("double"))) /
              sqrt((col("tot_late").cast("double") /
                col("tot_lines").cast("double")) *
                (lit(1.0) - col("tot_late").cast("double") /
                  col("tot_lines").cast("double")) /
                col("n_lines").cast("double"))).as("z"))
    },
    Some(s"""WITH j AS (
              SELECT l_suppkey,
                CASE WHEN date_diff('day', CAST(o_orderdate AS DATE),
                  CAST(l_shipdate AS DATE)) > $LateDays
                  THEN 1 ELSE 0 END AS late
              FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            ), ps AS (
              SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS n_lines,
                CAST(SUM(late) AS BIGINT) AS n_late
              FROM j GROUP BY 1
            ), t AS (
              SELECT *, CAST(SUM(n_lines) OVER () AS BIGINT) AS tot_lines,
                CAST(SUM(n_late) OVER () AS BIGINT) AS tot_late
              FROM ps
            )
            SELECT l_suppkey, n_lines, n_late,
              CAST(n_late AS DOUBLE) / CAST(n_lines AS DOUBLE) AS late_rate,
              CAST(tot_late AS DOUBLE) / CAST(tot_lines AS DOUBLE)
                AS base_rate,
              CASE WHEN tot_late = 0 OR tot_late = tot_lines THEN NULL
                ELSE (CAST(n_late AS DOUBLE) / CAST(n_lines AS DOUBLE)
                    - CAST(tot_late AS DOUBLE) / CAST(tot_lines AS DOUBLE))
                  / sqrt((CAST(tot_late AS DOUBLE)
                      / CAST(tot_lines AS DOUBLE))
                    * (1.0 - CAST(tot_late AS DOUBLE)
                      / CAST(tot_lines AS DOUBLE))
                    / CAST(n_lines AS DOUBLE)) END AS z
            FROM t"""),
    "late-shipment z-screen per supplier: one-sample test vs corpus baseline [audit]")

  /** q196: order-total reconciliation — does the recorded
    * `o_totalprice` equal the TPC-H invariant Σ extprice·(1−disc)·
    * (1+tax) over the order's lines? The cross-table consistency
    * audit a finance close runs; on THIS generator it fails for every
    * order (the synthetic totalprice is not derived from lines), which
    * is exactly what the audit exists to surface. All arithmetic stays
    * in SCALED integer units (cents·10⁻⁴: cents × (100−d) × (100+t)
    * with d,t the exact 2-decimal percents), so "exact match" and the
    * tolerance bands have no float-boundary ambiguity; orders with no
    * lines are counted as unreconcilable rather than silently matched.
    *
    * Scale: one orderkey-keyed fold of the pruned fact columns + a
    * LEFT join from orders (AQE-sized — both sides fact-grain, no
    * hint) + a 1-row summary fold. `sum_abs_scaled` is ~2·10¹⁶ at
    * sf0.1 and i64-safe to ~sf100; beyond that the corpus-wide sum
    * takes the documented DECIMAL(38,0) switch (per-order terms stay
    * comfortably in i64 at any scale).
    */
  private val q196 = QueryDef(
    (s, d) => {
      val li = load(s, d, "lineitem").groupBy(col("l_orderkey")).agg(
        sum(cents(col("l_extendedprice")) *
          (lit(100L) - round(col("l_discount") * 100).cast("long")) *
          (lit(100L) + round(col("l_tax") * 100).cast("long")))
          .as("recon_scaled"))
      val o = load(s, d, "orders")
        .select(col("o_orderkey"),
          (cents(col("o_totalprice")) * 10000L).as("total_scaled"))
      o.join(li, col("o_orderkey") === col("l_orderkey"), "left")
        .select(col("total_scaled"), col("recon_scaled"),
          when(col("recon_scaled").isNotNull,
            abs(col("recon_scaled") - col("total_scaled"))).as("adiff"))
        .agg(lcountAll.as("n_orders"),
          sum(when(col("recon_scaled").isNull, 1L).otherwise(0L))
            .as("n_no_lines"),
          sum(when(col("adiff") === 0L, 1L).otherwise(0L)).as("n_exact"),
          sum(when(col("adiff") <= 10000L, 1L).otherwise(0L))
            .as("n_within_cent"),
          sum(when(col("adiff") <= 1000000L, 1L).otherwise(0L))
            .as("n_within_dollar"),
          max(col("adiff")).as("max_abs_scaled"),
          sum(col("adiff")).as("sum_abs_scaled"))
        .select(col("n_orders"), col("n_no_lines"), col("n_exact"),
          col("n_within_cent"), col("n_within_dollar"),
          col("max_abs_scaled"), col("sum_abs_scaled"),
          (col("n_exact").cast("double") /
            (col("n_orders") - col("n_no_lines")).cast("double"))
            .as("exact_share"))
    },
    Some(s"""WITH li AS (
              SELECT l_orderkey,
                CAST(SUM(${centsSql("l_extendedprice")} *
                  (100 - CAST(round(l_discount * 100) AS BIGINT)) *
                  (100 + CAST(round(l_tax * 100) AS BIGINT))) AS BIGINT)
                  AS recon_scaled
              FROM lineitem GROUP BY 1
            ), j AS (
              SELECT ${centsSql("o_totalprice")} * 10000 AS total_scaled,
                li.recon_scaled,
                CASE WHEN li.recon_scaled IS NOT NULL THEN
                  abs(li.recon_scaled -
                    ${centsSql("o_totalprice")} * 10000) END AS adiff
              FROM orders o LEFT JOIN li ON o.o_orderkey = li.l_orderkey
            )
            SELECT CAST(count(*) AS BIGINT) AS n_orders,
              CAST(SUM(CASE WHEN recon_scaled IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_no_lines,
              CAST(SUM(CASE WHEN adiff = 0 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_exact,
              CAST(SUM(CASE WHEN adiff <= 10000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_within_cent,
              CAST(SUM(CASE WHEN adiff <= 1000000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_within_dollar,
              CAST(MAX(adiff) AS BIGINT) AS max_abs_scaled,
              CAST(SUM(adiff) AS BIGINT) AS sum_abs_scaled,
              CAST(SUM(CASE WHEN adiff = 0 THEN 1 ELSE 0 END) AS DOUBLE) /
                CAST(count(*) - SUM(CASE WHEN recon_scaled IS NULL
                  THEN 1 ELSE 0 END) AS DOUBLE) AS exact_share
            FROM j"""),
    "order-total reconciliation: scaled-integer invariant check + tolerance bands [audit]")

  /** Candidate functional dependencies for q199, (table, determinant,
    * dependent) — a deliberate mix of FDs the star schema implies
    * (nation→region; the TPC-H brand naming embeds the type family)
    * and ones it does not, so the audit demonstrates both verdicts.
    */
  private val FdCandidates: Seq[(String, String, String)] = Seq(
    ("nation", "n_nationkey", "n_regionkey"),
    ("part", "p_brand", "p_type"),
    ("customer", "c_nationkey", "c_mktsegment"),
    ("orders", "o_custkey", "o_orderpriority"),
    ("lineitem", "l_partkey", "l_suppkey"))

  /** q199: functional-dependency audit — for each candidate A→B, does
    * A determine B? Verdict from exact distinct counts: the FD holds
    * iff |distinct A| = |distinct (A,B)|; the violation surplus and
    * its rate quantify HOW broken a failed dependency is (the schema-
    * inference signal q148's key discovery doesn't cover: keys are
    * about rows, FDs are about column semantics).
    *
    * Scale: per candidate, one two-column pruned scan into two
    * distinct aggregates that share the (A,B) exchange (the pair
    * distinct collapses first; A-distinct folds FROM the pair frame,
    * never a second corpus scan). |candidates| bounded rows out.
    */
  private val q199 = QueryDef(
    (s, d) => {
      FdCandidates.map { case (table, det, dep) =>
        val pairs = load(s, d, table)
          .select(col(det).as("a"), col(dep).as("b")).distinct()
        pairs.agg(
          countDistinct(col("a")).cast("long").as("n_det"),
          lcountAll.as("n_pairs"))
          .select(lit(table).as("table_name"),
            lit(det).as("determinant"), lit(dep).as("dependent"),
            col("n_det"), col("n_pairs"),
            (col("n_det") === col("n_pairs")).as("fd_holds"),
            (col("n_pairs") - col("n_det")).as("n_violating_pairs"),
            ((col("n_pairs") - col("n_det")).cast("double") /
              col("n_det").cast("double")).as("violation_rate"))
      }.reduce(_ unionByName _)
    },
    Some {
      val parts = FdCandidates.map { case (table, det, dep) =>
        s"""SELECT '$table' AS table_name, '$det' AS determinant,
              '$dep' AS dependent,
              CAST(count(DISTINCT $det) AS BIGINT) AS n_det,
              CAST(count(DISTINCT ($det, $dep)) AS BIGINT) AS n_pairs,
              count(DISTINCT $det) = count(DISTINCT ($det, $dep))
                AS fd_holds,
              CAST(count(DISTINCT ($det, $dep)) - count(DISTINCT $det)
                AS BIGINT) AS n_violating_pairs,
              CAST(count(DISTINCT ($det, $dep)) - count(DISTINCT $det)
                AS DOUBLE) / CAST(count(DISTINCT $det) AS DOUBLE)
                AS violation_rate
            FROM $table"""
      }
      Some(parts.mkString("\nUNION ALL\n"))
    }.get,
    "functional-dependency audit: exact distinct-count verdicts per candidate [audit]")

  def all: Seq[(String, QueryDef)] = Seq(
    "q148_key_discovery" -> q148,
    "q149_referential_integrity" -> q149,
    "q150_benford_screen" -> q150,
    "q183_dup_payments" -> q183,
    "q185_single_sourcing" -> q185,
    "q186_price_realization" -> q186,
    "q187_late_shipment_z" -> q187,
    "q196_order_reconciliation" -> q196,
    "q199_fd_audit" -> q199)
}
