package graft.queries

import graft.QueryDef
import graft.common.Exact._
import graft.common.Tables.load
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence over `lineitem`: which part pairs ship in
  * the same order more often than chance (lift). The classic
  * co-purchase / association-rule primitive — the reference has no
  * basket surface; this is a training-data extension (recommendation
  * candidates, negative-sampling priors).
  */
object Basket {

  /** Minimum pair support: pairs seen in a single order carry no signal
    * and at corpus scale are the overwhelming majority of the pair
    * space — filtering them INSIDE the pair aggregate bounds the output.
    */
  private val MinSupport = 2

  /** q119: co-purchase pair counts + lift.
    *
    * Scale: NO self-join. A lineitem self-join on l_orderkey shuffles
    * the fact table twice and rediscovers each order's items
    * combinatorially; instead ONE shuffle on l_orderkey aggregates each
    * order to its sorted distinct item array (bounded — an order has a
    * handful of items), pairs are generated locally inside the row
    * (C(n,2) with n ≤ items-per-order), and the pair aggregate map-side
    * combines before the only other data-sized exchange. Per-part order
    * counts reuse the same aggregated frame (one row per order, much
    * smaller than the fact table); the scalar order total joins back as
    * a broadcast, but the per-part count table is one row per DISTINCT
    * PART — corpus-proportional — so its two join-backs are unhinted:
    * the pair frame is already part-keyed, and AQE broadcasts the
    * counts only while they actually fit.
    *
    * Float parity: lift = (pair·total)/(cnt_a·cnt_b) — long products
    * and ONE double division of identical integers, IEEE-exact in both
    * engines.
    */
  private val q119 = QueryDef(
    (s, d) => {
      val orders = load(s, d, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_set(col("l_partkey"))).as("parts"))
      // in-row C(n,2) expansion as two chained explodes + a<b filter:
      // same pair set as the nested transform/slice HOF but fully
      // whole-stage-codegen — the interpreted slice-per-element chain
      // copies the array O(n²) times per order (the q64 shingle
      // pitfall; r16: measured ~2x task time on the pair stages)
      val pairs = orders
        .select(explode(col("parts")).as("part_a"), col("parts"))
        .select(col("part_a"), explode(col("parts")).as("part_b"))
        .filter(col("part_a") < col("part_b"))
        .groupBy(col("part_a"), col("part_b"))
        .agg(lcountAll.as("n_orders_pair"))
        .filter(col("n_orders_pair") >= MinSupport)
      val partCounts = orders
        .select(explode(col("parts")).as("partkey"))
        .groupBy(col("partkey"))
        .agg(lcountAll.as("cnt"))
      // count-distinct straight off the scan: the scalar total must NOT
      // hang off the collect_set aggregate (that would re-execute the
      // array-buffer pass a third time); AQE's ReusedExchange shares the
      // one orderkey shuffle between the pair and per-part-count branches
      val total = load(s, d, "lineitem")
        .agg(countDistinct(col("l_orderkey")).cast("long").as("n_orders"))
      pairs
        .join(partCounts.select(
          col("partkey").as("part_a"), col("cnt").as("n_orders_a")), "part_a")
        .join(partCounts.select(
          col("partkey").as("part_b"), col("cnt").as("n_orders_b")), "part_b")
        .crossJoin(broadcast(total))
        .withColumn("lift",
          (col("n_orders_pair") * col("n_orders")).cast("double") /
            (col("n_orders_a") * col("n_orders_b")).cast("double"))
        .select("part_a", "part_b", "n_orders_pair",
          "n_orders_a", "n_orders_b", "n_orders", "lift")
    },
    Some(s"""WITH i AS (
              SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
            ), pairs AS (
              SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                CAST(count(*) AS BIGINT) AS n_orders_pair
              FROM i a JOIN i b ON a.l_orderkey = b.l_orderkey
                AND a.l_partkey < b.l_partkey
              GROUP BY 1, 2 HAVING count(*) >= $MinSupport
            ), cnt AS (
              SELECT l_partkey, CAST(count(*) AS BIGINT) AS c
              FROM i GROUP BY 1
            ), tot AS (
              SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
              FROM lineitem
            )
            SELECT p.part_a, p.part_b, p.n_orders_pair,
              ca.c AS n_orders_a, cb.c AS n_orders_b, tot.n_orders,
              CAST(p.n_orders_pair * tot.n_orders AS DOUBLE) /
                CAST(ca.c * cb.c AS DOUBLE) AS lift
            FROM pairs p
            JOIN cnt ca ON p.part_a = ca.l_partkey
            JOIN cnt cb ON p.part_b = cb.l_partkey, tot"""),
    "co-purchase lift: per-order pair gen (no self-join), exact division [basket]")

  /** Neighbors kept per item by q197. */
  private val NeighborK = 3

  /** q197: top-K co-purchase neighbors PER ITEM — the recommendation
    * candidate-generation table ("users who bought X also bought …"),
    * where q119 is the global pair list. The distinction is the
    * per-item cut: every item keeps its K strongest neighbors, so the
    * output is K·|items| rows a serving layer can key-look-up, not a
    * pair dump to post-process.
    *
    * Scale: q119's no-self-join pair generation (ONE orderkey
    * exchange, map-side pair combine) with BOTH orientations emitted
    * in-row at explode time — a `union` of two references to the pair
    * frame would replan the whole generation lineage twice (measured:
    * two corpus scans), while the in-row mirror costs only the
    * unavoidable 2× pair fan-out in the same single pass. Then a
    * row_number cut per item — Spark's rank-limit pushdown inserts a
    * Partial WindowGroupLimit below the item exchange (pinned), so no
    * task ever sorts an item's full neighbor list corpus-wide.
    *
    * Exactness: counts and ranks are integers; ties break on neighbor
    * id — a total order, so the kept set is bit-identical in both
    * engines.
    */
  private val q197 = QueryDef(
    (s, d) => {
      val orders = load(s, d, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_set(col("l_partkey"))).as("parts"))
      // both orientations in one pass: two chained explodes + a≠b
      // filter — the codegen'd equivalent of the nested slice HOF's
      // in-row mirror (see q119's pair-expansion note)
      val sym = orders
        .select(explode(col("parts")).as("part"), col("parts"))
        .select(col("part"), explode(col("parts")).as("neighbor"))
        .filter(col("part") =!= col("neighbor"))
        .groupBy(col("part"), col("neighbor"))
        .agg(lcountAll.as("n_orders_pair"))
        .filter(col("n_orders_pair") >= MinSupport)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("part"))
        .orderBy(col("n_orders_pair").desc, col("neighbor").asc)
      sym.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= NeighborK)
        .select(col("part"), col("neighbor"), col("n_orders_pair"),
          col("rnk").cast("int").as("rnk"))
    },
    Some(s"""WITH i AS (
              SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
            ), pairs AS (
              SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                CAST(count(*) AS BIGINT) AS n_orders_pair
              FROM i a JOIN i b ON a.l_orderkey = b.l_orderkey
                AND a.l_partkey < b.l_partkey
              GROUP BY 1, 2 HAVING count(*) >= $MinSupport
            ), sym AS (
              SELECT part_a AS part, part_b AS neighbor, n_orders_pair
              FROM pairs
              UNION ALL
              SELECT part_b AS part, part_a AS neighbor, n_orders_pair
              FROM pairs
            ), r AS (
              SELECT part, neighbor, n_orders_pair,
                ROW_NUMBER() OVER (PARTITION BY part
                  ORDER BY n_orders_pair DESC, neighbor ASC) AS rnk
              FROM sym
            )
            SELECT part, neighbor, n_orders_pair, CAST(rnk AS INTEGER) AS rnk
            FROM r WHERE rnk <= $NeighborK"""),
    "per-item top-K co-purchase neighbors: in-row pairs + group-limited rank [basket]")

  def all: Seq[(String, QueryDef)] = Seq(
    "q119_copurchase_lift" -> q119,
    "q197_item_neighbors" -> q197)
}
