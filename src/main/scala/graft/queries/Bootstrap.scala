package graft.queries

import graft.QueryDef
import graft.common.Exact._
import graft.common.Tables.load
import org.apache.spark.sql.functions._

/** Hash-seeded bootstrap resampling — uncertainty quantification that
  * scales: instead of materializing B resampled datasets, every row
  * deterministically draws its per-replica multiplicity from the seeded
  * portable hash (the online/Poisson-bootstrap construction), so all B
  * replicas accumulate in ONE pass and the whole procedure is
  * reproducible and oracle-checkable.
  */
object Bootstrap {

  private val Replicas = 50
  private val Seed = 90210L

  /** Poisson(1) multiplicity thresholds on a [0,1000) hash draw:
    * P(0)=P(1)=368/1000, P(2)=184/1000, P(3)=80/1000 — the standard
    * 4-bucket truncation (mean 0.976 ≈ 1).
    */
  private def weight(u: org.apache.spark.sql.Column) =
    when(u < 368L, 0L).when(u < 736L, 1L).when(u < 920L, 2L).otherwise(3L)

  private def weightSql(u: String) =
    s"""CASE WHEN $u < 368 THEN 0 WHEN $u < 736 THEN 1
        WHEN $u < 920 THEN 2 ELSE 3 END"""

  /** q153: bootstrap distribution of the mean order value. Each of the
    * 50 replicas reweights every order by its hash-drawn Poisson
    * multiplicity; the replica's weighted mean is one double division
    * of exact integer sums. The 50 boot_means ARE the sampling
    * distribution — p05/p95 of this frame is the CI a metrics platform
    * quotes next to the point estimate.
    *
    * Scale: the ×B fan-out happens INSIDE the map stage (explode of a
    * literal range) and partial aggregation collapses it to B rows per
    * partition before the only exchange — the wire carries |partitions|·B
    * combined rows, never |rows|·B. One corpus pass for all replicas;
    * the naive bootstrap is B full passes.
    *
    * Exactness: multiplicities and sums are integers off the portable
    * hash; the mean is a single IEEE division.
    */
  private val q153 = QueryDef(
    (s, d) => {
      val rows = load(s, d, "orders").select(
        col("o_orderkey"), cents(col("o_totalprice")).as("c"))
        .select(col("o_orderkey"), col("c"),
          explode(sequence(lit(0), lit(Replicas - 1))).as("replica"))
      val u = Curation.shuffleKeyWith(
        col("o_orderkey") * lit(1009L) + col("replica"), Seed) % 1000L
      rows
        .select(col("replica").cast("long").as("replica"), col("c"),
          weight(u).as("w"))
        .groupBy(col("replica"))
        .agg(sum("w").as("sum_w"),
          sum(col("w") * col("c")).as("sum_wc"))
        .select(col("replica"), col("sum_w"), col("sum_wc"),
          (col("sum_wc").cast("double") / col("sum_w").cast("double"))
            .as("boot_mean_cents"))
    },
    Some {
      val u = Curation.shuffleKeySqlWith(
        "(o_orderkey * 1009 + replica)", Seed) + " % 1000"
      s"""WITH fan AS (
            SELECT o_orderkey,
              ${graft.common.Exact.centsSql("o_totalprice")} AS c,
              unnest(range(0, $Replicas)) AS replica
            FROM orders
          ), weighted AS (
            SELECT CAST(replica AS BIGINT) AS replica, c,
              ${weightSql(s"(($u))")} AS w
            FROM fan
          )
          SELECT replica, CAST(SUM(w) AS BIGINT) AS sum_w,
            CAST(SUM(w * c) AS BIGINT) AS sum_wc,
            CAST(SUM(w * c) AS DOUBLE) / CAST(SUM(w) AS DOUBLE)
              AS boot_mean_cents
          FROM weighted GROUP BY 1"""
    },
    "Poisson bootstrap: one-pass B-replica reweighting, map-side combined [stats]")

  def all: Seq[(String, QueryDef)] = Seq(
    "q153_bootstrap_ci" -> q153)
}
