package graft

import graft.queries.Projection
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** JL random projection (q96): geometry-preservation properties the
  * oracle's exact-arithmetic check cannot express — the projection must
  * actually behave like a JL sketch, not just compute deterministically.
  */
class ProjectionSpec extends AnyFunSuite with SparkSpec {

  test("sign matrix is balanced and fixed") {
    val flat = Projection.Signs.flatten
    assert(flat.length == 64 * 8)
    assert(flat.forall(s => s == 1 || s == -1))
    // seeded stream: the matrix is a constant of the engine — both
    // near-balanced (|mean| well under 3/sqrt(n)) and reproducible
    val mean = flat.sum.toDouble / flat.length
    assert(math.abs(mean) < 0.14, s"sign mean $mean")
  }

  test("norm preservation: corpus-mean jl_ratio concentrates near 1") {
    val df = SparkEntry.queries("q96_random_projection")(spark, Sf)
    val m = df.agg(avg("jl_ratio")).collect()(0).getDouble(0)
    // E[ratio] = 1 exactly; over 500 vectors the mean's spread is tiny
    assert(m > 0.8 && m < 1.2, s"mean jl_ratio $m")
  }

  test("pairwise distances survive projection on average") {
    import spark.implicits._
    val rows = SparkEntry.queries("q96_random_projection")(spark, Sf)
      .select("vec_id", "p0", "p1", "p2", "p3", "p4", "p5", "p6", "p7")
      .filter(col("vec_id") < 40)
      .as[(Long, Double, Double, Double, Double, Double, Double, Double, Double)]
      .collect().sortBy(_._1)
      .map(t => Array(t._2, t._3, t._4, t._5, t._6, t._7, t._8, t._9))
    val orig = spark.read.parquet(s"$Sf/embeddings.parquet")
      .filter(col("vec_id") < 40).select("vec_id", "embedding")
      .as[(Long, Seq[Float])].collect().sortBy(_._1)
      .map(_._2.map(_.toDouble).toArray)
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ratios = for {
      i <- 0 until 40; j <- (i + 1) until 40
    } yield d2(rows(i), rows(j)) / (8.0 * d2(orig(i), orig(j)))
    val mean = ratios.sum / ratios.size
    assert(mean > 0.7 && mean < 1.3, s"mean distance ratio $mean")
    // and individual pairs stay within a loose JL band at k=8
    assert(ratios.count(r => r > 0.1 && r < 4.0) > ratios.size * 9 / 10)
  }
}
