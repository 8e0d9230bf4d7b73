package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Markov removal-effect attribution (q251): chain-model invariants +
  * a full local recomputation of the integer value iteration.
  */
class AttributionChainSpec extends AnyFunSuite with SparkSpec {

  test("q251: removal effects are monotone-valid and shares sum to one") {
    val rows = SparkEntry.queries("q251_markov_attribution")(spark, Sf)
      .collect().sortBy(_.getString(0))
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("click", "error", "signup", "view"))
    val vBase = rows.head.getLong(1)
    assert(vBase > 0L, "no conversion mass reached START")
    rows.foreach { r =>
      assert(r.getLong(1) == vBase) // shared base chain value
      // redirecting a channel into NULL can only lose conversion mass
      assert(r.getLong(2) <= vBase, s"${r.getString(0)} gained mass")
      val eff = r.getDouble(3)
      assert(eff >= 0.0 && eff <= 1.0)
      assert(eff == (vBase - r.getLong(2)).toDouble / vBase)
    }
    val shares = rows.map(_.getDouble(4))
    assert(math.abs(shares.sum - 1.0) < 1e-12,
      s"shares ${shares.toSeq} do not normalize")
  }

  test("q251: value iteration matches a local integer recomputation") {
    // rebuild the journey transitions independently
    val ev = graft.common.Tables.load(spark, Sf, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2),
        r.getString(3)))
    val trans = scala.collection.mutable.Map.empty[(String, String), Long]
      .withDefaultValue(0L)
    ev.groupBy(_._1).values.foreach { g =>
      val seq = g.sortBy(e => (e._2, e._3)).map(_._4)
      val cut = seq.indexOf("purchase")
      val journey = if (cut >= 0) seq.take(cut) else seq
      val terminal = if (cut >= 0) "CONV" else "NULL"
      val path = "START" +: journey :+ terminal
      path.zip(path.tail).foreach(p => trans(p) += 1L)
    }
    val scale = 1000000L
    def iterate(removed: Option[String]): Long = {
      val t = trans.toSeq
        .filter { case ((s, _), _) => !removed.contains(s) }
        .map { case ((s, dd), c) =>
          (s, if (removed.contains(dd)) "NULL" else dd, c)
        }
        .groupBy(x => (x._1, x._2)).view
        .mapValues(_.map(_._3).sum).toSeq
        .map { case ((s, dd), c) => (s, dd, c) }
      val totals = t.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
      var v = Map.empty[String, Long].withDefaultValue(0L)
      (1 to 8).foreach { _ =>
        v = t.groupBy(_._1).map { case (s, outs) =>
          val num = outs.map { case (_, dd, c) =>
            val tv = dd match {
              case "CONV" => scale
              case "NULL" => 0L
              case ch => v(ch)
            }
            c * tv
          }.sum
          s -> num / totals(s)
        }.withDefaultValue(0L)
      }
      v("START")
    }
    val rows = SparkEntry.queries("q251_markov_attribution")(spark, Sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val base = iterate(None)
    rows.foreach { case (ch, (vb, vx)) =>
      assert(vb == base, s"base value: engine $vb local $base")
      assert(vx == iterate(Some(ch)), s"removed-$ch value mismatch")
    }
  }
}
