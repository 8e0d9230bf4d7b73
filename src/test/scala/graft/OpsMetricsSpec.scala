package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Fulfillment lead-time quartiles (q178) and the rolling revenue/
  * volume correlation (q179): local recomputations at sf0.001.
  */
class OpsMetricsSpec extends AnyFunSuite with SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, Sf)

  test("q178 quartiles match a local sort per priority") {
    val rows = run("q178_leadtime_quartiles").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    val gaps = graft.common.Tables.load(spark, Sf, "lineitem")
      .join(graft.common.Tables.load(spark, Sf, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority"),
        datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
          .cast("long").as("g"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.keySet == gaps.map(_._1).toSet)
    gaps.groupBy(_._1).foreach { case (p, xs) =>
      val s = xs.map(_._2).sorted
      val n = s.length
      def at(k: Int) = s(math.max((n + 1) * k / 4, 1) - 1).toDouble
      assert(rows(p) == ((n.toLong, at(1), at(2), at(3))), s"priority $p")
    }
  }

  test("q189 seasonal-naive backtest matches a local calendar lookup") {
    val rows = run("q189_seasonal_naive").collect()
    val daily = graft.common.Tables.load(spark, Sf, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(graft.common.Exact.cents(col("o_totalprice"))).as("c"))
      .collect()
      .map(r => r.getDate(0).toLocalDate.toEpochDay -> r.getLong(1))
      .toMap
    val expectDays = daily.keys.filter(d => daily.contains(d - 7)).toSet
    assert(rows.map(_.getDate(0).toLocalDate.toEpochDay).toSet
      == expectDays)
    val mae = rows.map(r =>
      math.abs(daily(r.getDate(0).toLocalDate.toEpochDay) -
        daily(r.getDate(0).toLocalDate.toEpochDay - 7))).sum.toDouble /
      rows.length
    rows.foreach { r =>
      val d = r.getDate(0).toLocalDate.toEpochDay
      assert(r.getLong(1) == daily(d))
      assert(r.getLong(2) == daily(d - 7))
      assert(r.getLong(3) == math.abs(daily(d) - daily(d - 7)))
      assert(r.getDouble(4) == r.getLong(3).toDouble / r.getLong(1).toDouble)
      assert(r.getDouble(5) == mae)
    }
  }

  test("q179 rolling correlation is bounded and matches local windows") {
    val rows = run("q179_rolling_corr").orderBy("day").collect()
    val daily = graft.common.Tables.load(spark, Sf, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(graft.common.Exact.cents(col("o_totalprice"))).as("x"),
        count(lit(1)).cast("long").as("y"))
      .orderBy("day").collect()
      .map(r => (r.getDate(0).toLocalDate.toEpochDay,
        r.getLong(1), r.getLong(2)))
    assert(rows.length == daily.length - 29)
    val byDay = daily.zipWithIndex.map { case (d, i) => d._1 -> i }.toMap
    rows.foreach { r =>
      val i = byDay(r.getDate(0).toLocalDate.toEpochDay)
      val win = daily.slice(i - 29, i + 1)
      assert(win.length == 30)
      val sx = win.map(t => BigInt(t._2)).sum
      val sy = win.map(t => BigInt(t._3)).sum
      val sxy = win.map(t => BigInt(t._2) * BigInt(t._3)).sum
      val sxx = win.map(t => BigInt(t._2) * BigInt(t._2)).sum
      val syy = win.map(t => BigInt(t._3) * BigInt(t._3)).sum
      val varx = 30 * sxx - sx * sx
      val vary = 30 * syy - sy * sy
      if (varx == 0 || vary == 0) assert(r.isNullAt(3))
      else {
        val want = BigDecimal(30 * sxy - sx * sy).toDouble /
          (math.sqrt(BigDecimal(varx).toDouble) *
            math.sqrt(BigDecimal(vary).toDouble))
        assert(math.abs(r.getDouble(3) - want) < 1e-12, s"corr at $r")
        assert(r.getDouble(3) >= -1.0 - 1e-12 &&
          r.getDouble(3) <= 1.0 + 1e-12)
      }
    }
  }
}
