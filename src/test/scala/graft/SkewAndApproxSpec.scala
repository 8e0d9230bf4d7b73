package graft

import graft.operators.SkewJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewAndApproxSpec extends AnyFunSuite with SparkSpec {

  test("saltedJoin produces identical results to a plain equi-join") {
    val o = graft.common.Tables.load(spark, Sf, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val c = graft.common.Tables.load(spark, Sf, "customer")
      .select("c_custkey", "c_mktsegment")
      .withColumnRenamed("c_custkey", "o_custkey")
    val plain = o.join(c, Seq("o_custkey"))
    val salted = SkewJoin.saltedJoin(o, c, Seq("o_custkey"), saltFactor = 4)
    assert(plain.count() == salted.count())
    assert(plain.exceptAll(salted).count() == 0)
    assert(salted.exceptAll(plain).count() == 0)
  }

  test("saltedJoin left-join keeps unmatched left rows exactly once") {
    val c = graft.common.Tables.load(spark, Sf, "customer")
      .select(col("c_custkey").as("k"), col("c_mktsegment"))
    val o = graft.common.Tables.load(spark, Sf, "orders")
      .filter(col("o_orderdate") >= lit("2001-01-01"))
      .select(col("o_custkey").as("k"), col("o_orderkey"))
    val plain = c.join(o, Seq("k"), "left")
    val salted = SkewJoin.saltedJoin(c, o, Seq("k"), "left", saltFactor = 4)
    assert(plain.count() == salted.count())
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("heavyHitters finds the hottest join keys") {
    val hh = SkewJoin.heavyHitters(
      graft.common.Tables.load(spark, Sf, "lineitem"), "l_partkey", topN = 5)
      .collect()
    assert(hh.length == 5)
    assert(hh.map(_.getLong(1)).sliding(2).forall(p => p(0) >= p(1)))
  }

  test("approx distinct is within the configured error of exact") {
    val rows = graft.queries.ApproxOps.approxDistinctRaw(spark, Sf).collect()
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_users").toDouble
      val exact = r.getAs[Long]("exact_users").toDouble
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"approx=$approx exact=$exact")
    }
    // the oracle-facing shape certifies the same bound as a boolean
    val certified = SparkEntry.queries("q45_approx_distinct")(spark, Sf)
      .collect()
    assert(certified.nonEmpty &&
      certified.forall(_.getAs[Boolean]("within_bound")))
  }

  test("approx median tracks exact median") {
    val rows = graft.queries.ApproxOps.approxMedianRaw(spark, Sf).collect()
    rows.foreach { r =>
      val a = r.getAs[Double]("approx_median")
      val e = r.getAs[Double]("exact_median")
      assert(math.abs(a - e) / e <= 0.02, s"approx=$a exact=$e")
    }
    val certified = SparkEntry.queries("q46_approx_quantiles")(spark, Sf)
      .collect()
    assert(certified.nonEmpty &&
      certified.forall(_.getAs[Boolean]("within_bound")))
  }
}
