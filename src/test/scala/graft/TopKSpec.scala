package graft

import graft.functions.{Ranked, TopKAgg}
import org.scalatest.funsuite.AnyFunSuite

/** Bounded-heap top-k aggregate: algebraic laws on the buffer (the
  * partial/final split is only correct if merge is order-insensitive)
  * plus end-to-end equivalence with the window formulation (q13).
  */
class TopKSpec extends AnyFunSuite with SparkSpec {

  private val agg = new TopKAgg(3)

  private def ranked(xs: (Long, Long)*): Seq[Ranked] =
    xs.map { case (v, i) => Ranked(v, i, v.toDouble) }

  test("reduce keeps the k best in (value desc, id asc) order") {
    val buf = Seq((5L, 1L), (3L, 2L), (9L, 3L), (3L, 0L), (7L, 4L))
      .foldLeft(agg.zero) { case (b, (v, i)) =>
        agg.reduce(b, Ranked(v, i, v.toDouble))
      }
    assert(buf.map(r => (r.value, r.id)) == Seq((9L, 3L), (7L, 4L), (5L, 1L)))
  }

  test("ties break by id asc and never exceed k") {
    val buf = ranked((4L, 9L), (4L, 2L), (4L, 5L), (4L, 1L))
      .foldLeft(agg.zero)(agg.reduce)
    assert(buf.map(_.id) == Seq(1L, 2L, 5L))
  }

  test("merge is order-insensitive (partial aggregation soundness)") {
    val xs = (0 until 50).map(i => Ranked((i * 37 % 11).toLong, i.toLong, 0.0))
    val whole = xs.foldLeft(agg.zero)(agg.reduce)
    // every split point and both merge directions give the same result
    (1 until 49).foreach { cut =>
      val a = xs.take(cut).foldLeft(agg.zero)(agg.reduce)
      val b = xs.drop(cut).foldLeft(agg.zero)(agg.reduce)
      assert(agg.merge(a, b) == whole, s"cut $cut a-b")
      assert(agg.merge(b, a) == whole, s"cut $cut b-a")
    }
  }

  test("q180 (heap aggregate) equals q13 (window) row for row") {
    val a = SparkEntry.queries("q180_topk_heap")(spark, Sf)
      .collect().map(_.toString).sorted.toSeq
    val b = SparkEntry.queries("q13_window_topk")(spark, Sf)
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)
    assert(a.nonEmpty)
  }
}
