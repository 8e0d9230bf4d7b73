package graft.queries

import graft.QueryDef
import graft.common.Exact._
import graft.common.Tables.load
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational operator surface (SURVEY.md §2.1–§2.8) re-expressed over
  * the TPC-H-ish testdata. Every query is declarative DataFrame API so
  * Catalyst gets full pushdown / pruning / join-selection freedom; scale
  * notes per query explain why the plan survives 100 TB.
  *
  * Reference sites covered (see /root/reference): projections & predicates
  * `src/transformations/orders_bronze_to_silver.py:48-77`, point-in-time and
  * bounded-window filters `src/features/customer_features_daily.py:129-148`,
  * joins `customer_features_daily.py:176-180`, `src/training/labels.py:184-193`,
  * aggregations `customer_features_daily.py:132-174`, `src/common/dq.py:19-39`,
  * windows `orders_bronze_to_silver.py:79-88`,
  * `src/serving_features/build_latest_features.py:112-121`.
  */
object Relational {

  /** P11+S1: projection + filter that must push to the parquet scan.
    * At scale: only 3 columns leave the scan; the shipdate predicate prunes
    * row groups via parquet min/max stats. No shuffle at all.
    */
  private val q01 = QueryDef(
    (s, d) =>
      load(s, d, "lineitem")
        .filter(col("l_shipdate") < to_timestamp(lit("1996-01-01 00:00:00")))
        .select(col("l_orderkey"), col("l_extendedprice")),
    Some("""SELECT l_orderkey, l_extendedprice FROM lineitem
            WHERE l_shipdate < TIMESTAMP '1996-01-01 00:00:00'"""),
    "pruned scan: projection + pushed filter [S1,P11]")

  /** P2/P3/P8: compound boolean predicate (null / isin / range / negation). */
  private val q02 = QueryDef(
    (s, d) =>
      load(s, d, "lineitem")
        .filter(
          col("l_returnflag").isin("A", "R") &&
            col("l_quantity").between(5.0, 45.0) &&
            col("l_discount") >= 0.02 &&
            col("l_tax").isNotNull &&
            !(col("l_linestatus") === "O" && col("l_quantity") > 40.0))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag",
          "l_linestatus"),
    Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag, l_linestatus
            FROM lineitem
            WHERE l_returnflag IN ('A','R')
              AND l_quantity BETWEEN 5.0 AND 45.0
              AND l_discount >= 0.02
              AND l_tax IS NOT NULL
              AND NOT (l_linestatus = 'O' AND l_quantity > 40.0)"""),
    "compound predicate: isin/between/not-null/negation [P2,P3,P8]")

  /** A1-style grouped multi-aggregate (TPC-H Q1 shape). Map-side partial
    * aggregation collapses 100 TB to |groups| rows before the shuffle; the
    * decimal cast keeps partial merges exact and order-independent.
    */
  private val q03 = QueryDef(
    (s, d) => {
      val li = load(s, d, "lineitem")
        .filter(col("l_shipdate") <= to_timestamp(lit("2001-09-02 00:00:00")))
      li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum(money(col("l_extendedprice")) * oneMinus(col("l_discount")))
          .cast("double").as("sum_disc_price"),
        sum(money(col("l_extendedprice")) * oneMinus(col("l_discount")) *
          onePlus(col("l_tax"))).cast("double").as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount")).as("avg_disc"),
        lcountAll.as("count_order"))
    },
    Some("""SELECT l_returnflag, l_linestatus,
              CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
              CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
              CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS sum_disc_price,
              CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))) * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2)))) AS DOUBLE) AS sum_charge,
              CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_quantity) AS DOUBLE) AS avg_qty,
              CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_extendedprice) AS DOUBLE) AS avg_price,
              CAST(CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_discount) AS DOUBLE) AS avg_disc,
              CAST(COUNT(*) AS BIGINT) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus"""),
    "grouped multi-agg, TPC-H Q1 shape [A1,P4]")

  /** A4: duplicate-key detection — groupBy(keys).count().filter(>1), the
    * reference's DQ `unique` check (`src/common/dq.py:31-35`).
    */
  private val q04 = QueryDef(
    (s, d) =>
      load(s, d, "lineitem")
        .groupBy("l_partkey")
        .agg(lcountAll.as("n_rows"))
        .filter(col("n_rows") > 1),
    Some("""SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_rows
            FROM lineitem GROUP BY l_partkey HAVING COUNT(*) > 1"""),
    "duplicate-key detection via grouped count [A4,D2]")

  /** A5+A6: global (ungrouped) aggregate incl. exact countDistinct. */
  private val q05 = QueryDef(
    (s, d) =>
      load(s, d, "lineitem").agg(
        lcountAll.as("n_rows"),
        countDistinct(col("l_orderkey")).cast("long").as("n_orders"),
        to_date(min(col("l_shipdate"))).as("min_ship"),
        to_date(max(col("l_shipdate"))).as("max_ship"),
        min(col("l_quantity")).cast("double").as("min_qty"),
        max(col("l_quantity")).cast("double").as("max_qty")),
    Some("""SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
              CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
              CAST(MIN(l_shipdate) AS DATE) AS min_ship,
              CAST(MAX(l_shipdate) AS DATE) AS max_ship,
              CAST(MIN(l_quantity) AS DOUBLE) AS min_qty,
              CAST(MAX(l_quantity) AS DOUBLE) AS max_qty
            FROM lineitem"""),
    "global agg + exact distinct count [A5,A6,A2]")

  /** J1: fact ⋈ small dim. No broadcast hint: AQE decides from the
    * dim's RUNTIME size (`autoBroadcastJoinThreshold` +
    * adaptive re-plan), which is the right call at every scale — a
    * pinned hint would force a 10+ GB broadcast of a 150M-row customer
    * dim at 100 TB, exactly the OOM AQE exists to avoid, while a dim
    * that does fit broadcasts anyway without the hint. q10's star join
    * keeps the explicit hint as the contrast case where dims are
    * known-tiny (region/nation).
    */
  private val q06 = QueryDef(
    (s, d) => {
      val o = load(s, d, "orders")
      val c = load(s, d, "customer")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(dsum(col("o_totalprice")).as("revenue"),
          lcountAll.as("n_orders"))
    },
    Some("""SELECT c_mktsegment,
              CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
              CAST(COUNT(*) AS BIGINT) AS n_orders
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment"""),
    "broadcast inner equi-join + agg [J1]")

  /** J2+P13: left join + null-fill (the gold feature join pattern,
    * `customer_features_daily.py:178-187`). Filter applied to the right side
    * BEFORE the join so the scan prunes to one year of orders.
    */
  private val q07 = QueryDef(
    (s, d) => {
      val c = load(s, d, "customer")
      val o = load(s, d, "orders").filter(
        col("o_orderdate") >= to_timestamp(lit("1998-01-01 00:00:00")) &&
          col("o_orderdate") < to_timestamp(lit("1999-01-01 00:00:00")))
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(lcount(col("o_orderkey")).as("n_orders_1998"),
          coalesce(dsum(col("o_totalprice")), lit(0.0)).as("spend_1998"))
    },
    Some("""SELECT c_custkey,
              CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders_1998,
              COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 0.0) AS spend_1998
            FROM customer LEFT JOIN orders
              ON c_custkey = o_custkey
             AND o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
             AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
            GROUP BY c_custkey"""),
    "left outer join + fillna(0) [J2,P13]")

  /** J3: anti join — customers with no 2001 orders (the churn-label idiom,
    * `labels.py:184-193`, expressed as a true left_anti).
    */
  private val q08 = QueryDef(
    (s, d) => {
      val c = load(s, d, "customer")
      val o = load(s, d, "orders")
        .filter(col("o_orderdate") >= to_timestamp(lit("2001-01-01 00:00:00")))
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    },
    Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey
                AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')"""),
    "left-anti existence check [J3]")

  /** Semi join: customers with ≥1 finished order since 2000. */
  private val q09 = QueryDef(
    (s, d) => {
      val c = load(s, d, "customer")
      val o = load(s, d, "orders").filter(
        col("o_orderstatus") === "F" &&
          col("o_orderdate") >= to_timestamp(lit("2000-01-01 00:00:00")))
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select("c_custkey", "c_mktsegment")
    },
    Some("""SELECT c_custkey, c_mktsegment FROM customer
            WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderstatus = 'F'
                AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')"""),
    "left-semi existence check [J5]")

  /** Multi-way star join (TPC-H Q5 shape): one shuffle join on the fact
    * key; the FIXED-size dims (nation: 25 rows, region: 5 rows) carry
    * explicit broadcast hints, while `customer` — corpus-proportional —
    * joins unhinted so AQE broadcasts it only while it fits. At 100 TB
    * the wide exchanges are lineitem⋈orders and (beyond the broadcast
    * threshold) orders⋈customer; AQE converts either to broadcast
    * post-filter when runtime sizes allow.
    */
  private val q10 = QueryDef(
    (s, d) => {
      val li = load(s, d, "lineitem")
      val o = load(s, d, "orders").filter(
        col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
          col("o_orderdate") < to_timestamp(lit("1998-01-01 00:00:00")))
      val c = load(s, d, "customer")
      val n = load(s, d, "nation")
      val r = load(s, d, "region")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy("r_name")
        .agg(
          sum(money(col("l_extendedprice")) * oneMinus(col("l_discount")))
            .cast("double").as("revenue"),
          lcountAll.as("n_items"))
    },
    Some("""SELECT r_name,
              CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue,
              CAST(COUNT(*) AS BIGINT) AS n_items
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation   ON c_nationkey = n_nationkey
            JOIN region   ON n_regionkey = r_regionkey
            WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
            GROUP BY r_name"""),
    "5-way star join, broadcast dims [J1,J4]")

  /** W1/W2: keep-latest-per-key via row_number with a total tie-break
    * (the silver dedupe / latest-features pattern,
    * `orders_bronze_to_silver.py:79-88`). One shuffle on the key; no sort
    * beyond the per-partition window sort.
    */
  private val q11 = QueryDef(
    (s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      load(s, d, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey"),
          to_date(col("o_orderdate")).as("latest_order_date"),
          col("o_totalprice"))
    },
    Some("""SELECT o_custkey, o_orderkey,
              CAST(o_orderdate AS DATE) AS latest_order_date, o_totalprice
            FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
                    ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
                  FROM orders)
            WHERE rn = 1"""),
    "keep-latest-per-key dedupe window [W1,W2]")

  /** W3: lag(1) inter-order gaps → avg per customer
    * (`customer_features_daily.py:150-174`). Exact integer gap sums divided
    * once at the end keep the double deterministic.
    */
  private val q12 = QueryDef(
    (s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      load(s, d, "orders")
        .withColumn("prev_date", lag(col("o_orderdate"), 1).over(w))
        .withColumn("gap_days",
          datediff(to_date(col("o_orderdate")), to_date(col("prev_date"))))
        .groupBy(col("o_custkey"))
        .agg(
          lcountAll.as("n_orders"),
          (sum(col("gap_days")).cast("double") / count(col("gap_days")))
            .cast("double").as("avg_gap_days"))
    },
    Some("""SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
              CAST(CAST(SUM(gap_days) AS DOUBLE) / COUNT(gap_days) AS DOUBLE) AS avg_gap_days
            FROM (SELECT o_custkey,
                    CAST(DATEDIFF('day',
                      CAST(LAG(o_orderdate, 1) OVER (PARTITION BY o_custkey
                        ORDER BY o_orderdate ASC, o_orderkey ASC) AS DATE),
                      CAST(o_orderdate AS DATE)) AS INTEGER) AS gap_days
                  FROM orders)
            GROUP BY o_custkey"""),
    "lag(1) gap analysis [W3,A3]")

  /** Per-group top-k via row_number (k=3). */
  private val q13 = QueryDef(
    (s, d) => {
      val o = load(s, d, "orders")
      val c = load(s, d, "customer")
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      o.join(c, o("o_custkey") === c("c_custkey"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("c_mktsegment"), col("o_orderkey"), col("o_totalprice"),
          col("rnk").cast("int").as("rnk"))
    },
    Some("""SELECT c_mktsegment, o_orderkey, o_totalprice, CAST(rnk AS INTEGER) AS rnk
            FROM (SELECT c_mktsegment, o_orderkey, o_totalprice,
                    ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
                  FROM orders JOIN customer ON o_custkey = c_custkey)
            WHERE rnk <= 3"""),
    "per-group top-k window [W1,O2]")

  /** q180: q13's per-segment top-3, recomputed through the engine's
    * bounded-heap typed aggregate (functions.TopKAgg) instead of a
    * window — SAME oracle, different physical contract: the window
    * sorts each segment's entire slice in ONE task (5 segments own the
    * corpus at 100 TB), while the aggregate reduces every input
    * partition to ≤3 rows per segment before the exchange, so the
    * shuffle is partition-count-bounded and no task ever sorts a
    * group. Cents quantization gives the heap an exact integer order
    * identical to the double order (2-dp values); the original price
    * rides as payload so nothing is re-derived lossily on emit.
    */
  private val q180 = QueryDef(
    (s, d) => {
      val o = load(s, d, "orders")
      val c = load(s, d, "customer")
      val topk3 = graft.functions.TopK.topk(3)
      o.join(c, o("o_custkey") === c("c_custkey"))
        .select(col("c_mktsegment"),
          cents(col("o_totalprice")).as("v"),
          col("o_orderkey").as("id"),
          col("o_totalprice").as("p"))
        .groupBy(col("c_mktsegment"))
        .agg(topk3(col("v"), col("id"), col("p")).as("top"))
        .select(col("c_mktsegment"),
          posexplode(col("top")).as(Seq("pos", "r")))
        .select(col("c_mktsegment"),
          col("r.id").as("o_orderkey"),
          col("r.payload").as("o_totalprice"),
          (col("pos") + 1).cast("int").as("rnk"))
    },
    Some("""SELECT c_mktsegment, o_orderkey, o_totalprice, CAST(rnk AS INTEGER) AS rnk
            FROM (SELECT c_mktsegment, o_orderkey, o_totalprice,
                    ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
                  FROM orders JOIN customer ON o_custkey = c_custkey)
            WHERE rnk <= 3"""),
    "per-group top-k via bounded-heap partial aggregate — no group ever sorts [O2]")

  /** O1: global order-by + limit with a total tie-break. Spark executes
    * this as TakeOrderedAndProject — no full sort of the table.
    */
  private val q14 = QueryDef(
    (s, d) =>
      load(s, d, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(100)
        .select("o_orderkey", "o_custkey", "o_totalprice"),
    Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100"""),
    "global top-k via orderBy+limit [O1,O4]")

  /** Set op: UNION (distinct). */
  private val q15 = QueryDef(
    (s, d) => {
      val a = load(s, d, "orders")
        .filter(col("o_orderstatus") === "F" &&
          col("o_orderdate") >= to_timestamp(lit("2001-01-01 00:00:00")))
        .select(col("o_custkey").as("custkey"))
      val b = load(s, d, "orders")
        .filter(col("o_totalprice") > 400000.0)
        .select(col("o_custkey").as("custkey"))
      a.union(b).distinct()
    },
    Some("""SELECT o_custkey AS custkey FROM orders
            WHERE o_orderstatus = 'F' AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
            UNION
            SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 400000.0"""),
    "UNION distinct of two predicates [set-op]")

  /** Set op: INTERSECT. */
  private val q16 = QueryDef(
    (s, d) => {
      val a = load(s, d, "orders").filter(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("custkey"))
      val b = load(s, d, "orders").filter(col("o_orderstatus") === "O")
        .select(col("o_custkey").as("custkey"))
      a.intersect(b)
    },
    Some("""SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
            INTERSECT
            SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'"""),
    "INTERSECT of two key sets [set-op]")

  /** Set op: EXCEPT. */
  private val q17 = QueryDef(
    (s, d) => {
      val a = load(s, d, "customer").select(col("c_custkey").as("custkey"))
      val b = load(s, d, "orders")
        .filter(col("o_orderdate") >= to_timestamp(lit("2000-01-01 00:00:00")))
        .select(col("o_custkey").as("custkey"))
      a.except(b)
    },
    Some("""SELECT c_custkey AS custkey FROM customer
            EXCEPT
            SELECT o_custkey AS custkey FROM orders
            WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'"""),
    "EXCEPT (anti set difference) [set-op]")

  /** P1-style normalization: when/otherwise canonicalization + string fns
    * (the silver status mapping, `orders_bronze_to_silver.py:22-28`).
    */
  private val q18 = QueryDef(
    (s, d) =>
      load(s, d, "orders").select(
        col("o_orderkey"),
        when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), lit("high"))
          .when(col("o_orderpriority") === "3-MEDIUM", lit("medium"))
          .otherwise(lit("low")).as("priority_class"),
        when(col("o_orderstatus") === "F", lit("finished"))
          .when(col("o_orderstatus") === "O", lit("open"))
          .otherwise(lit("pending")).as("status_name"),
        lower(trim(col("o_orderpriority"))).as("priority_norm")),
    Some("""SELECT o_orderkey,
              CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 'high'
                   WHEN o_orderpriority = '3-MEDIUM' THEN 'medium'
                   ELSE 'low' END AS priority_class,
              CASE WHEN o_orderstatus = 'F' THEN 'finished'
                   WHEN o_orderstatus = 'O' THEN 'open'
                   ELSE 'pending' END AS status_name,
              LOWER(TRIM(o_orderpriority)) AS priority_norm
            FROM orders"""),
    "when/otherwise canonicalization + lower/trim [P1, scalar]")

  /** Date/timestamp function battery (§2.8 timestamp row). */
  private val q19 = QueryDef(
    (s, d) =>
      load(s, d, "orders").select(
        col("o_orderkey"),
        to_date(col("o_orderdate")).as("order_date"),
        year(col("o_orderdate")).as("order_year"),
        month(col("o_orderdate")).as("order_month"),
        dayofmonth(col("o_orderdate")).as("order_day"),
        quarter(col("o_orderdate")).as("order_quarter"),
        date_add(to_date(col("o_orderdate")), 60).as("due_date"),
        datediff(lit("2002-01-01").cast("date"), to_date(col("o_orderdate")))
          .as("days_to_2002"),
        trunc(to_date(col("o_orderdate")), "MM").as("order_month_start"),
        add_months(to_date(col("o_orderdate")), 3).as("plus3m"),
        last_day(to_date(col("o_orderdate"))).as("month_end")),
    Some("""SELECT o_orderkey,
              CAST(o_orderdate AS DATE) AS order_date,
              CAST(YEAR(o_orderdate) AS INTEGER) AS order_year,
              CAST(MONTH(o_orderdate) AS INTEGER) AS order_month,
              CAST(DAY(o_orderdate) AS INTEGER) AS order_day,
              CAST(QUARTER(o_orderdate) AS INTEGER) AS order_quarter,
              CAST(o_orderdate AS DATE) + 60 AS due_date,
              CAST(DATEDIFF('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INTEGER) AS days_to_2002,
              CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS order_month_start,
              CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus3m,
              LAST_DAY(CAST(o_orderdate AS DATE)) AS month_end
            FROM orders"""),
    "date arithmetic battery [scalar: to_date/date_add/datediff/trunc]")

  /** String function battery (§2.8 string row). */
  private val q20 = QueryDef(
    (s, d) =>
      load(s, d, "part").select(
        col("p_partkey"),
        lower(col("p_name")).as("name_lower"),
        upper(col("p_brand")).as("brand_upper"),
        length(col("p_name")).as("name_len"),
        substring(col("p_name"), 1, 8).as("name_prefix"),
        regexp_replace(col("p_type"), lit(" "), lit("_")).as("type_snake"),
        concat(col("p_brand"), lit(":"), col("p_type")).as("brand_type"),
        instr(col("p_name"), "a").as("first_a"),
        lpad(col("p_brand"), 12, "*").as("brand_padded")),
    Some("""SELECT p_partkey,
              LOWER(p_name) AS name_lower,
              UPPER(p_brand) AS brand_upper,
              CAST(LENGTH(p_name) AS INTEGER) AS name_len,
              SUBSTRING(p_name, 1, 8) AS name_prefix,
              REPLACE(p_type, ' ', '_') AS type_snake,
              p_brand || ':' || p_type AS brand_type,
              CAST(INSTR(p_name, 'a') AS INTEGER) AS first_a,
              LPAD(p_brand, 12, '*') AS brand_padded
            FROM part"""),
    "string function battery [scalar: lower/upper/substr/replace/concat]")

  /** A7: multi-column distinct. */
  private val q21 = QueryDef(
    (s, d) =>
      load(s, d, "orders").select("o_orderstatus", "o_orderpriority").distinct(),
    Some("SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders"),
    "multi-column distinct [A7]")

  /** Rollup (hierarchical grouping sets) — beyond the reference surface but
    * standard warehouse capability; partial aggregation still applies.
    */
  private val q22 = QueryDef(
    (s, d) =>
      load(s, d, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(lcountAll.as("n_rows"), dsum(col("l_quantity")).as("sum_qty")),
    Some("""SELECT l_returnflag, l_linestatus,
              CAST(COUNT(*) AS BIGINT) AS n_rows,
              CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
            FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)"""),
    "rollup grouping sets [agg extension]")

  def all: Seq[(String, QueryDef)] = Seq(
    "q01_pruned_scan" -> q01,
    "q02_filter_complex" -> q02,
    "q03_agg_pricing" -> q03,
    "q04_dup_keys" -> q04,
    "q05_global_agg" -> q05,
    "q06_join_broadcast" -> q06,
    "q07_join_left_fillna" -> q07,
    "q08_join_anti" -> q08,
    "q09_join_semi" -> q09,
    "q10_star_join" -> q10,
    "q11_window_dedupe" -> q11,
    "q12_window_lag_gap" -> q12,
    "q13_window_topk" -> q13,
    "q14_orderby_limit" -> q14,
    "q15_set_union" -> q15,
    "q16_set_intersect" -> q16,
    "q17_set_except" -> q17,
    "q18_case_when" -> q18,
    "q19_date_arith" -> q19,
    "q20_string_funcs" -> q20,
    "q21_distinct" -> q21,
    "q22_rollup" -> q22,
    "q180_topk_heap" -> q180)
}
