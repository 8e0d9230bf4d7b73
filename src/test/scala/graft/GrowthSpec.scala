package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Growth accounting (q172), WoE/IV (q173), engagement power curve
  * (q174): conservation identities + local recomputations at sf0.001.
  */
class GrowthSpec extends AnyFunSuite with SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, Sf)

  private def pairs() = graft.common.Tables.load(spark, Sf, "events")
    .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
    .collect()
    .map(r => (r.getDate(0).toLocalDate.toEpochDay, r.getLong(1)))

  test("q172 new/returning decomposition matches a local recomputation") {
    val rows = run("q172_new_vs_returning").orderBy("day").collect()
    val ps = pairs()
    val firstDay = ps.groupBy(_._2).map { case (u, xs) =>
      u -> xs.map(_._1).min
    }
    val byDay = ps.groupBy(_._1)
    assert(rows.length == byDay.size)
    var cum = 0L
    rows.foreach { r =>
      val d = r.getDate(0).toLocalDate.toEpochDay
      val active = byDay(d)
      val nNew = active.count(p => firstDay(p._2) == d).toLong
      assert(r.getLong(1) == active.length.toLong)
      assert(r.getLong(2) == nNew)
      assert(r.getLong(3) == active.length - nNew)
      cum += nNew
      assert(r.getLong(4) == cum)
    }
    // every user is new exactly once: the base ends at |users|
    assert(cum == firstDay.size.toLong)
  }

  test("q173 bins conserve users; IV terms are non-negative; woe from shares") {
    val rows = run("q173_woe_iv").orderBy("bin").collect()
    assert(rows.length == 5)
    val nUsers = graft.common.Tables.load(spark, Sf, "events")
      .select("user_id").distinct().count()
    assert(rows.map(_.getLong(1)).sum == nUsers)
    rows.foreach { r =>
      assert(r.getLong(2) + r.getLong(3) == r.getLong(1))
      // quintile bins are balanced to ±1 by the rank construction
      assert(math.abs(r.getLong(1) - nUsers / 5) <= 1)
      // (a-b)·ln(a/b) >= 0 for any positive shares
      assert(r.getDouble(7) >= 0.0, s"negative IV term: $r")
      assert(r.getDouble(6) == math.log(r.getDouble(4) / r.getDouble(5)))
    }
  }

  test("q175 cadence histogram matches a local lag recomputation") {
    val rows = run("q175_purchase_cadence").orderBy("gap_days").collect()
    val orders = graft.common.Tables.load(spark, Sf, "orders")
      .select("o_custkey", "o_orderkey", "o_orderdate").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getAs[java.time.LocalDateTime](2).toLocalDate.toEpochDay))
    val gaps = orders.groupBy(_._1).toSeq.flatMap { case (_, os) =>
      val s = os.toSeq.sortBy(o => (o._3, o._2)).map(_._3)
      s.zip(s.tail).map { case (a, b) => b - a }
    }
    val hist = gaps.groupBy(identity).map { case (k, v) =>
      k -> v.length.toLong
    }
    assert(rows.length == hist.size)
    val total = gaps.length.toLong
    var cum = 0L
    rows.foreach { r =>
      assert(r.getLong(1) == hist(r.getLong(0)))
      assert(r.getDouble(2) == hist(r.getLong(0)).toDouble / total.toDouble)
      cum += r.getLong(1)
      assert(r.getDouble(3) == cum.toDouble / total.toDouble)
    }
    assert(rows.last.getDouble(3) == 1.0)
  }

  test("q181 entropy matches the ordered local fold and its bounds") {
    val rows = run("q181_behavior_entropy").collect()
    val counts = graft.common.Tables.load(spark, Sf, "events")
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = counts.groupBy(_._1)
    assert(rows.length == byUser.size)
    rows.foreach { r =>
      val ts = byUser(r.getLong(0)).toSeq.sortBy(_._2)
      val n = ts.map(_._3).sum
      assert(r.getLong(1) == n)
      assert(r.getLong(2) == ts.length.toLong)
      // the same left fold in type order the engine's window runs
      val want = ts.foldLeft(0.0) { case (acc, (_, _, c)) =>
        val share = c.toDouble / n.toDouble
        acc + -share * math.log(share)
      }
      assert(r.getDouble(3) == want, s"entropy mismatch for ${r.getLong(0)}")
      assert(r.getDouble(3) >= 0.0 &&
        r.getDouble(3) <= math.log(ts.length.toDouble) + 1e-12)
    }
  }

  test("q184 abandonment decomposition is consistent with q42's sessions") {
    val rows = run("q184_browse_abandonment").collect()
    // session totals must agree with the q42 session build
    val nSessions = run("q42_events_sessions").count()
    assert(rows.map(_.getLong(1)).sum == nSessions)
    rows.foreach { r =>
      val (n, viewing, converted) =
        (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(viewing <= n && converted <= viewing)
      if (viewing == 0) assert(r.isNullAt(4))
      else assert(r.getDouble(4) ==
        (viewing - converted).toDouble / viewing.toDouble)
    }
    // the generator mixes types, so both outcomes must actually occur
    assert(rows.map(_.getLong(3)).sum > 0)
    assert(rows.exists(r => r.getLong(2) > r.getLong(3)))
  }

  test("q188 retention curve normalizes q74 and flags exactly below half") {
    val rows = run("q188_retention_curve").collect()
    val base = run("q74_retention_cohorts").collect()
      .map(r => (r.getDate(0).toLocalDate, r.getInt(1)) -> r.getLong(2))
      .toMap
    assert(rows.length == base.size)
    rows.foreach { r =>
      val k = (r.getDate(0).toLocalDate, r.getInt(1))
      assert(r.getLong(2) == base(k))
      val n0 = base((k._1, 0))
      assert(r.getLong(3) == n0)
      assert(r.getDouble(4) == base(k).toDouble / n0.toDouble)
      assert(r.getBoolean(5) == (2 * base(k) < n0))
      if (k._2 == 0) {
        assert(r.getDouble(4) == 1.0)
        assert(!r.getBoolean(5))
      }
    }
  }

  test("q174 power curve conserves users; L-ness cumulative is consistent") {
    val rows = run("q174_power_curve").orderBy("n_active_days").collect()
    val perUser = pairs().groupBy(_._2).map { case (_, xs) =>
      xs.map(_._1).distinct.length.toLong
    }.toSeq
    val hist = perUser.groupBy(identity).map { case (k, v) =>
      k -> v.length.toLong
    }
    assert(rows.length == hist.size)
    val total = perUser.length.toLong
    rows.foreach { r =>
      val k = r.getLong(0)
      assert(r.getLong(1) == hist(k))
      assert(r.getDouble(2) == hist(k).toDouble / total.toDouble)
      // users active on >= k days, recomputed
      assert(r.getLong(3) == perUser.count(_ >= k).toLong)
    }
    assert(math.abs(rows.map(_.getDouble(2)).sum - 1.0) < 1e-12)
    assert(rows.head.getLong(3) == total)
  }
}
