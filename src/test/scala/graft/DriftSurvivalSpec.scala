package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Drift monitors (q155/q156), the skew profile (q158), triangle
  * counting (q157), Kaplan–Meier (q159), and the PrefixSum operator:
  * statistical identities + local recomputations at sf0.001.
  */
class DriftSurvivalSpec extends AnyFunSuite with SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, Sf)

  test("PrefixSum matches a sequential local scan and is partition-invariant") {
    import spark.implicits._
    val df = Seq((3L, 10L), (1L, 5L), (2L, 7L), (5L, 1L), (4L, 2L))
      .toDF("k", "v")
    def got(parts: String) = {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try graft.operators.PrefixSum
        .runningSums(df, Seq(col("k").asc), Seq("v"))
        .select("k", "v_cum").collect().map(r => (r.getLong(0), r.getLong(1)))
        .sortBy(_._1).toSeq
      finally spark.conf.set("spark.sql.shuffle.partitions", "4")
    }
    val expected = Seq(1L -> 5L, 2L -> 12L, 3L -> 22L, 4L -> 24L, 5L -> 25L)
    assert(got("4") == expected)
    assert(got("2") == expected)
    assert(got("16") == expected)
  }

  test("q155 grid is complete, counts conserve, PSI terms check locally") {
    val rows = run("q155_psi_drift").collect()
    val types = rows.map(_.getString(0)).distinct
    assert(rows.length == types.length * 10)
    val nEvents = graft.common.Tables.load(spark, Sf, "events").count()
    assert(rows.map(r => r.getLong(2) + r.getLong(3)).sum == nEvents)
    rows.foreach { r =>
      val (na, nb, ta, tb) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      val pa = (na + 1).toDouble / (ta + 10).toDouble
      val pb = (nb + 1).toDouble / (tb + 10).toDouble
      assert(r.getDouble(6) == pa && r.getDouble(7) == pb)
      assert(math.abs(r.getDouble(8) - (pa - pb) * math.log(pa / pb)) < 1e-12)
      assert(r.getDouble(8) >= 0.0) // (p−q)·ln(p/q) ≥ 0 always
    }
  }

  test("q156 marginals conserve and cell chi terms are non-negative") {
    val rows = run("q156_chisq_cells").collect()
    val n = rows.head.getLong(5)
    assert(rows.map(_.getLong(2)).sum == n)
    // each segment's cells sum to its row_tot
    rows.groupBy(_.getString(0)).foreach { case (_, cells) =>
      assert(cells.map(_.getLong(2)).sum == cells.head.getLong(3))
    }
    rows.foreach { r =>
      val expected = r.getLong(3).toDouble * r.getLong(4).toDouble / n
      assert(r.getDouble(6) == expected)
      assert(r.getDouble(7) >= 0.0)
    }
  }

  test("q157 triangle counts match a brute-force local recomputation") {
    val rows = run("q157_triangles").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // rebuild the support-filtered undirected edge set locally
    val li = graft.common.Tables.load(spark, Sf, "lineitem")
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = li.groupBy(_._1).values.map(_.map(_._2).sorted)
    val pairCounts = scala.collection.mutable.Map.empty[(Long, Long), Int]
    byOrder.foreach { parts =>
      for (i <- parts.indices; j <- i + 1 until parts.length)
        pairCounts((parts(i), parts(j))) =
          pairCounts.getOrElse((parts(i), parts(j)), 0) + 1
    }
    // NB: .collect{case (e,c) ...} on a Map would rebuild a Map and
    // collapse edges sharing a source — filter + keys instead
    val edges = pairCounts.filter(_._2 >= 2).keySet.toSet
    val adj = edges.toSeq.flatMap(e => Seq(e, e.swap))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val localTri = adj.map { case (node, nbrs) =>
      node -> nbrs.toSeq.combinations(2).count {
        case Seq(a, b) => adj(a).contains(b)
      }.toLong
    }
    assert(rows.length == adj.size)
    rows.foreach { case (part, deg, tri, clust) =>
      assert(deg == adj(part).size.toLong)
      assert(tri == localTri(part))
      assert(clust >= 0.0 && clust <= 1.0)
      if (deg >= 2)
        assert(clust == 2.0 * tri / (deg * (deg - 1.0)))
    }
  }

  test("q158 skew profile matches a local recomputation") {
    val r = run("q158_key_skew").head()
    val counts = graft.common.Tables.load(spark, Sf, "orders")
      .groupBy("o_custkey").count().collect()
      .map(x => (x.getLong(1), x.getLong(0))).sorted
    val n = counts.length.toLong
    val total = counts.map(_._1).sum
    assert(r.getLong(0) == n && r.getLong(1) == total)
    assert(r.getLong(2) == counts.map(_._1).max)
    def pct(p: Long) = counts((p * (n - 1) / 100).toInt)._1
    assert(r.getLong(3) == pct(50) && r.getLong(4) == pct(90) &&
      r.getLong(5) == pct(99))
    val rankSum = counts.zipWithIndex.map { case ((c, _), i) => (i + 1) * c }.sum
    val gini = (2.0 * rankSum - (n + 1) * total) / (n.toDouble * total)
    assert(math.abs(r.getDouble(6) - gini) < 1e-12)
    assert(r.getDouble(6) >= 0.0 && r.getDouble(6) < 1.0)
  }

  test("q159 KM curve: risk sets conserve and survival is a decreasing product") {
    val rows = run("q159_km_survival").orderBy("t").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    val nCust = graft.common.Tables.load(spark, Sf, "orders")
      .select("o_custkey").distinct().count()
    // everyone leaves exactly once
    assert(rows.map(t => t._3 + t._4).sum == nCust)
    // risk set at the first duration is the full population
    assert(rows.head._2 == nCust)
    // n_{t+1} = n_t − (d_t + c_t)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 == a._2 - a._3 - a._4)
      assert(b._5 <= a._5 + 1e-12) // survival non-increasing
    }
    // survival equals the running product of (1 − d/n)
    var prod = 1.0
    rows.foreach { case (_, n, d, _, s) =>
      prod *= (if (d < n) 1.0 - d.toDouble / n.toDouble else 0.0)
      assert(math.abs(s - prod) < 1e-9)
    }
    assert(rows.last._5 >= 0.0 && rows.head._5 <= 1.0)
  }
}
