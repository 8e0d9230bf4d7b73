package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Exact-covariance PCA power iteration (q253): invariants + a full
  * local BigInt recomputation of the quantize → center → iterate
  * pipeline.
  */
class PcaPowerSpec extends AnyFunSuite with SparkSpec {

  test("q253 matches a local BigInt recomputation end to end") {
    val vecs = graft.common.Tables.load(spark, Sf, "embeddings")
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toArray)
    val dim = vecs.head.length
    val n = vecs.length
    val q = vecs.map(_.map(x => math.floor(x.toDouble * 10000L + 0.5).toLong))
    val sums = Array.tabulate(dim)(i => q.map(_(i)).sum)
    val g = Array.tabulate(dim, dim)((i, j) =>
      q.map(r => r(i) * r(j)).sum)
    val gc = Array.tabulate(dim, dim)((i, j) =>
      BigInt(n) * BigInt(g(i)(j)) - BigInt(sums(i)) * BigInt(sums(j)))
    val vs = BigInt(1000000L)
    var v = Array.fill(dim)(vs)
    (1 to 6).foreach { _ =>
      val w = Array.tabulate(dim)(i =>
        (0 until dim).map(j => gc(i)(j) * v(j)).sum)
      val mx = w.map(_.abs).max
      v = w.map(x => ((x.abs * vs) / mx) * x.signum)
    }
    val vgv = (for (i <- 0 until dim; j <- 0 until dim)
      yield v(i) * gc(i)(j) * v(j)).sum
    val vtv = v.map(x => x * x).sum
    val trace = (0 until dim).map(i => gc(i)(i)).sum

    val rows = SparkEntry.queries("q253_pca_power")(spark, Sf).collect()
    assert(rows.length == dim)
    val emitted = rows.map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
    (0 until dim).foreach { i =>
      assert(BigInt(emitted(i)) == v(i), s"component $i")
    }
    val head = rows.head
    assert(BigInt(head.getString(2)) == vgv)
    assert(BigInt(head.getString(3)) == vtv)
    assert(BigInt(head.getString(4)) == trace)
    assert(head.getDouble(5) == vgv.toDouble / vtv.toDouble)
    // the rescale pins max|component| at exactly the vector scale
    assert(rows.map(r => math.abs(r.getLong(1))).max == 1000000L)
    // Gc is positive semidefinite: the quotient and the share are
    // non-negative, and one direction explains at most everything
    assert(head.getDouble(5) >= 0.0)
    assert(head.getDouble(6) > 0.0 && head.getDouble(6) <= 1.0)
  }
}
