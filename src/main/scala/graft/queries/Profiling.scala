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

  def all: Seq[(String, QueryDef)] = Seq(
    "q57_column_profile" -> q57,
    "q58_histogram" -> q58,
    "q61_heavy_hitters" -> q59b)
}
