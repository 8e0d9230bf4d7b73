package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gini/Lorenz (q167), categorical MI (q168), seasonal decomposition
  * (q169): conservation identities + brute-force local recomputation
  * at sf0.001.
  */
class ConcentrationSpec extends AnyFunSuite with SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, Sf)

  test("q167 Lorenz/Gini matches a local sorted recomputation") {
    val rows = run("q167_revenue_gini").orderBy("decile").collect()
    val rev = graft.common.Tables.load(spark, Sf, "orders")
      .groupBy("o_custkey")
      .agg(sum(graft.common.Exact.cents(col("o_totalprice"))).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(t => (t._2, t._1))
    val n = rev.length
    val total = rev.map(_._2).sum
    // conservation: deciles partition all customers and all revenue
    assert(rows.map(_.getLong(1)).sum == n)
    assert(rows.map(_.getLong(2)).sum == total)
    // exact rank-identity Gini
    val rankDot = rev.zipWithIndex
      .map { case ((_, c), i) => BigInt(i + 1) * BigInt(c) }.sum
    val want = (BigDecimal(2 * rankDot - BigInt(n + 1) * total) /
      BigDecimal(BigInt(n) * total)).toDouble
    rows.foreach(r => assert(math.abs(r.getDouble(4) - want) < 1e-12))
    // Lorenz curve is non-decreasing and ends at exactly 1.0
    val shares = rows.map(_.getDouble(3))
    assert(shares.zip(shares.tail).forall { case (a, b) => a <= b })
    assert(shares.last == 1.0)
    // ascending-revenue deciles: shares grow slower than uniform early
    assert(shares.head < 0.1)
  }

  test("q168 MI terms match the definition; corpus MI is non-negative") {
    val rows = run("q168_categorical_mi").collect()
    val cust = graft.common.Tables.load(spark, Sf, "customer")
      .select("c_nationkey", "c_mktsegment").collect()
      .map(r => (r.getInt(0), r.getString(1)))
    val nTot = cust.length.toLong
    val joint = cust.groupBy(identity).map { case (k, v) =>
      k -> v.length.toLong
    }
    val nx = cust.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    val ny = cust.groupBy(_._2).map { case (k, v) => k -> v.length.toLong }
    assert(rows.length == joint.size)
    rows.foreach { r =>
      val key = (r.getInt(0), r.getString(1))
      assert(r.getLong(2) == joint(key))
      assert(r.getLong(3) == nx(key._1))
      assert(r.getLong(4) == ny(key._2))
      assert(r.getLong(5) == nTot)
      val want = (joint(key).toDouble / nTot) *
        math.log(joint(key).toDouble * nTot / (nx(key._1).toDouble * ny(key._2)))
      assert(math.abs(r.getDouble(6) - want) < 1e-12)
    }
    // Jensen: total MI of any joint distribution is >= 0
    assert(rows.map(_.getDouble(6)).sum >= -1e-12)
  }

  test("q176 HHI is bounded by [1/n, 1] and matches a local recomputation") {
    val rows = run("q176_nation_hhi").collect()
    val perCust = graft.common.Tables.load(spark, Sf, "orders")
      .join(graft.common.Tables.load(spark, Sf, "customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"), col("o_custkey"))
      .agg(sum(graft.common.Exact.cents(col("o_totalprice"))).as("r"))
      .collect().map(r => (r.getInt(0), r.getLong(2)))
    val byNation = perCust.groupBy(_._1)
    assert(rows.length == byNation.size)
    rows.foreach { r =>
      val rs = byNation(r.getInt(0)).map(_._2)
      assert(r.getLong(1) == rs.length.toLong)
      assert(r.getLong(2) == rs.sum)
      val sq = rs.map(x => BigInt(x) * BigInt(x)).sum
      val tot = BigInt(rs.sum)
      val want = BigDecimal(sq).toDouble / BigDecimal(tot * tot).toDouble
      assert(r.getDouble(3) == want, s"hhi mismatch: $r want $want")
      assert(r.getDouble(3) >= 1.0 / rs.length - 1e-12)
      assert(r.getDouble(3) <= 1.0)
    }
  }

  test("q177 ABC classes partition parts and revenue; shares are Pareto-ordered") {
    val rows = run("q177_abc_classes").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val rev = graft.common.Tables.load(spark, Sf, "lineitem")
      .groupBy("l_partkey")
      .agg(sum(graft.common.Exact.cents(col("l_extendedprice"))).as("r"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val total = rev.map(_._2).sum
    assert(rows.values.map(_._1).sum == rev.length.toLong)
    assert(rows.values.map(_._2).sum == total)
    // local classification over the best-first cumulative
    val sorted = rev.sortBy(t => (-t._2, t._1))
    var cum = 0L
    val classes = sorted.map { case (_, r) =>
      cum += r
      val share = cum.toDouble / total.toDouble
      if (share <= 0.80) "A" else if (share <= 0.95) "B" else "C"
    }
    Seq("A", "B", "C").foreach { c =>
      val n = classes.count(_ == c).toLong
      if (n == 0) assert(!rows.contains(c))
      else assert(rows(c)._1 == n, s"class $c count mismatch")
    }
    // Pareto shape: A is fewer parts than C but more revenue
    if (rows.contains("A") && rows.contains("C")) {
      assert(rows("A")._2 > rows("C")._2)
    }
  }

  test("q169 decomposition matches a sequential local recomputation") {
    val rows = run("q169_seasonal_decomp").collect()
    assert(rows.nonEmpty)
    // local ground truth from the raw table
    val daily = graft.common.Tables.load(spark, Sf, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(graft.common.Exact.cents(col("o_totalprice"))).as("c"))
      .collect()
      .map(r => r.getDate(0).toLocalDate.toEpochDay -> r.getLong(1))
      .toMap
    // kept = days whose full ±3 calendar window exists in the series
    val kept = daily.keys.filter(d =>
      (-3L to 3L).forall(o => daily.contains(d + o))).toSeq.sorted
    val trend7 = kept.map(d =>
      d -> (-3L to 3L).map(o => daily(d + o)).sum).toMap
    val d7 = kept.map(d => d -> (7L * daily(d) - trend7(d))).toMap
    val seasonal = kept.groupBy(_ % 7).map { case (dow, ds) =>
      dow -> ds.map(d7).sum.toDouble / (7.0 * ds.length)
    }
    assert(rows.length == kept.length)
    rows.foreach { r =>
      val d = r.getDate(0).toLocalDate.toEpochDay
      assert(r.getLong(1) == d % 7)
      assert(r.getLong(2) == daily(d))
      assert(r.getLong(3) == trend7(d))
      assert(r.getDouble(4) == trend7(d).toDouble / 7.0)
      assert(r.getDouble(5) == seasonal(d % 7))
      // identity: observed = trend + seasonal + residual (exact chain)
      assert(r.getLong(2).toDouble - r.getDouble(4) - r.getDouble(5)
        == r.getDouble(6))
    }
  }
}
