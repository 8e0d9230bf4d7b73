package graft.queries

import graft.QueryDef
import graft.common.Exact._
import graft.common.Tables.load
import org.apache.spark.sql.functions._

/** RFM (recency / frequency / monetary) customer segmentation — the
  * classic marketing cube: every customer lands in one of 5³ cells by
  * rank-quintile along each dimension, and each cell reports its size
  * and value. Rank binning (not value thresholds) keeps the cell sizes
  * balanced under any value distribution.
  */
object Rfm {

  /** q161: RFM segments over order history. Per customer: recency =
    * days since last order (vs the corpus max date), frequency = order
    * count, monetary = lifetime spend in exact cents. Quintile bins
    * come from (position·5) div n over a deterministic total order per
    * dimension — the same scalable rank-binning as the q151 deciles,
    * never NTILE (whose tie semantics differ across engines).
    *
    * Scale: the corpus collapses to one row per customer in one
    * map-side-combined aggregate; the three rank passes and the
    * segment fold all run on |customers| narrow rows
    * (Curation.globalOrder range partitions — no one-partition
    * window), and the output is ≤125 cells.
    *
    * Exactness: bins and counts are integers; avg cents is the single
    * exact-integer division.
    */
  private val q161 = QueryDef(
    (s, d) => {
      val orders = load(s, d, "orders")
      val mx = orders.agg(max(col("o_orderdate")).as("m"))
      // materialized ONCE: `per` has five consumers (the count, the
      // three rank passes, and the final join) — without the cut each
      // replans and re-runs the full orders scan + aggregation
      // (measured: 12 AQE jobs, 5 corpus scans; r16 guide §2.4/§5)
      val per = orders.groupBy(col("o_custkey"))
        .agg(max(col("o_orderdate")).as("last_ts"),
          lcountAll.as("freq"),
          sum(cents(col("o_totalprice"))).as("monetary"))
        .crossJoin(broadcast(mx))
        .select(col("o_custkey"),
          datediff(col("m"), col("last_ts")).cast("long").as("recency"),
          col("freq"), col("monetary"))
        .localCheckpoint()
      val n = per.count()
      def binOf(sorted: org.apache.spark.sql.DataFrame, out: String) =
        sorted.select(col("o_custkey"),
          expr(s"(position * 5) div ${n}L").cast("long").as(out))
      val r = binOf(Curation.globalOrder(per,
        Seq(col("recency").asc, col("o_custkey").asc)), "r_bin")
      val f = binOf(Curation.globalOrder(per,
        Seq(col("freq").desc, col("o_custkey").asc)), "f_bin")
      val m = binOf(Curation.globalOrder(per,
        Seq(col("monetary").desc, col("o_custkey").asc)), "m_bin")
      per.join(r, "o_custkey").join(f, "o_custkey").join(m, "o_custkey")
        .groupBy(col("r_bin"), col("f_bin"), col("m_bin"))
        .agg(lcountAll.as("n_customers"),
          sum("monetary").as("total_cents"))
        .select(col("r_bin"), col("f_bin"), col("m_bin"),
          col("n_customers"), col("total_cents"),
          (col("total_cents").cast("double") /
            col("n_customers").cast("double")).as("avg_cents"))
    },
    Some(s"""WITH mx AS (SELECT MAX(o_orderdate) AS m FROM orders),
            per AS (
              SELECT o_custkey,
                CAST(date_diff('day', CAST(MAX(o_orderdate) AS DATE),
                  CAST((SELECT m FROM mx) AS DATE)) AS BIGINT) AS recency,
                CAST(count(*) AS BIGINT) AS freq,
                CAST(SUM(${centsSql("o_totalprice")}) AS BIGINT)
                  AS monetary
              FROM orders GROUP BY o_custkey
            ), nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM per),
            binned AS (
              SELECT o_custkey, monetary,
                ((ROW_NUMBER() OVER (ORDER BY recency ASC, o_custkey ASC)
                  - 1) * 5) // (SELECT n FROM nn) AS r_bin,
                ((ROW_NUMBER() OVER (ORDER BY freq DESC, o_custkey ASC)
                  - 1) * 5) // (SELECT n FROM nn) AS f_bin,
                ((ROW_NUMBER() OVER (ORDER BY monetary DESC, o_custkey ASC)
                  - 1) * 5) // (SELECT n FROM nn) AS m_bin
              FROM per
            )
            SELECT CAST(r_bin AS BIGINT) AS r_bin,
              CAST(f_bin AS BIGINT) AS f_bin,
              CAST(m_bin AS BIGINT) AS m_bin,
              CAST(count(*) AS BIGINT) AS n_customers,
              CAST(SUM(monetary) AS BIGINT) AS total_cents,
              CAST(SUM(monetary) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                AS avg_cents
            FROM binned GROUP BY 1, 2, 3"""),
    "RFM segmentation: three scalable rank-quintile passes, 125-cell cube [behavior]")

  def all: Seq[(String, QueryDef)] = Seq(
    "q161_rfm_segments" -> q161)
}
