package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** RFM cube (q161), cohort LTV (q162), grouped OLS (q163), CUSUM
  * (q164), EWMA (q165): conservation identities + local
  * recomputations at sf0.001.
  */
class BehaviorTsSpec extends AnyFunSuite with SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, Sf)

  test("q161 RFM cube conserves customers and money; bins are balanced") {
    val rows = run("q161_rfm_segments").collect()
    val orders = graft.common.Tables.load(spark, Sf, "orders")
    val nCust = orders.select("o_custkey").distinct().count()
    assert(rows.map(_.getLong(3)).sum == nCust)
    val totalCents = orders
      .agg(sum(graft.common.Exact.cents(col("o_totalprice"))))
      .head().getLong(0)
    assert(rows.map(_.getLong(4)).sum == totalCents)
    rows.foreach { r =>
      (0 to 2).foreach(i => assert(r.getLong(i) >= 0 && r.getLong(i) <= 4))
      assert(r.getDouble(5) ==
        r.getLong(4).toDouble / r.getLong(3).toDouble)
    }
    // each marginal quintile holds n/5 ± 1 customers (rank binning)
    Seq(0, 1, 2).foreach { dim =>
      val marginal = rows.groupBy(_.getLong(dim))
        .map { case (b, rs) => b -> rs.map(_.getLong(3)).sum }
      marginal.values.foreach(c =>
        assert(math.abs(c - nCust / 5) <= 1, s"dim $dim skewed: $marginal"))
    }
  }

  test("q162 LTV curve conserves revenue and is non-decreasing per cohort") {
    val rows = run("q162_cohort_ltv").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    val totalCents = graft.common.Tables.load(spark, Sf, "orders")
      .agg(sum(graft.common.Exact.cents(col("o_totalprice"))))
      .head().getLong(0)
    assert(rows.map(_._4).sum == totalCents)
    rows.groupBy(_._1).foreach { case (_, cells) =>
      val sorted = cells.sortBy(_._2)
      // months_since starts at 0 (first order defines the cohort)
      assert(sorted.head._2 == 0L)
      // cum is the running sum of rev, ltv the per-user division
      var cum = 0L
      sorted.foreach { c =>
        cum += c._4
        assert(c._5 == cum)
        assert(c._6 == cum.toDouble / c._3.toDouble)
      }
    }
  }

  test("q163 grouped OLS matches a local moment recomputation") {
    val rows = run("q163_ols_by_group").collect()
    val li = graft.common.Tables.load(spark, Sf, "lineitem")
      .select(col("l_returnflag"), col("l_quantity").cast("long"),
        graft.common.Exact.cents(col("l_extendedprice")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    rows.foreach { r =>
      val g = li.filter(_._1 == r.getString(0))
      val n = BigInt(g.length)
      val sx = g.map(t => BigInt(t._2)).sum
      val sy = g.map(t => BigInt(t._3)).sum
      val sxx = g.map(t => BigInt(t._2) * t._2).sum
      val syy = g.map(t => BigInt(t._3) * t._3).sum
      val sxy = g.map(t => BigInt(t._2) * t._3).sum
      assert(r.getLong(1) == g.length.toLong)
      val num = (n * sxy - sx * sy).toDouble
      val denx = (n * sxx - sx * sx).toDouble
      val deny = (n * syy - sy * sy).toDouble
      val slope = num / denx
      assert(math.abs(r.getDouble(2) - slope) < 1e-9)
      assert(math.abs(r.getDouble(3) -
        (sy.toDouble - slope * sx.toDouble) / n.toDouble) < 1e-6)
      assert(math.abs(r.getDouble(4) - num / denx * (num / deny)) < 1e-12)
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
    }
  }

  test("q164 CUSUM: 30-day grid, conserved counts, zero-ending centered sum") {
    val rows = run("q164_cusum_changepoint").orderBy("day").collect()
    assert(rows.length == 30)
    val nEvents = graft.common.Tables.load(spark, Sf, "events").count()
    assert(rows.map(_.getLong(1)).sum == nEvents)
    assert(rows.last.getLong(2) == nEvents)
    // centered cumulative sum returns to ~0 at the horizon
    assert(math.abs(rows.last.getDouble(3)) < 1e-6)
    // exactly the max-|C| rows are flagged
    val peak = rows.map(r => math.abs(r.getDouble(3))).max
    rows.foreach(r =>
      assert(r.getBoolean(4) == (math.abs(r.getDouble(3)) == peak)))
    assert(rows.count(_.getBoolean(4)) >= 1)
  }

  test("q165 EWMA matches the sequential recursion") {
    val rows = run("q165_ewma_daily").orderBy("day").collect()
    assert(rows.length == 30)
    var sPrev = 0.0
    rows.foreach { r =>
      val sNext = 0.3 * r.getLong(1) + 0.7 * sPrev
      assert(math.abs(r.getDouble(2) - sNext) < 1e-6,
        s"day ${r.get(0)}: ${r.getDouble(2)} vs $sNext")
      sPrev = sNext
    }
  }
}
