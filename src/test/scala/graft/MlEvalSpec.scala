package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gains table (q151) and exact AUC (q152): conservation, monotonicity,
  * and a local AUC recomputation.
  */
class MlEvalSpec extends AnyFunSuite with SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, Sf)

  test("q151 deciles cover all users, capture is monotone and ends at 1") {
    val rows = run("q151_gains_table").orderBy("decile").collect()
    assert(rows.map(_.getLong(0)).toSeq == (0L to 9L))
    val nUsers = graft.common.Tables.load(spark, Sf, "events")
      .select("user_id").distinct().count()
    assert(rows.map(_.getLong(1)).sum == nUsers)
    val caps = rows.map(_.getDouble(4))
    caps.sliding(2).foreach { case Array(a, b) => assert(a <= b + 1e-15) }
    assert(math.abs(caps.last - 1.0) < 1e-12)
  }

  test("q152 AUC matches a local recomputation and sits in [0, 1]") {
    val r = run("q152_exact_auc").head()
    val (n, p, rankSum, auc) =
      (r.getLong(0), r.getLong(1), r.getLong(3), r.getDouble(4))
    assert(auc >= 0.0 && auc <= 1.0)
    // recompute from the per-user frame locally
    val cut = lit("2024-01-24 00:00:00").cast("timestamp")
    val pu = graft.common.Tables.load(spark, Sf, "events")
      .groupBy("user_id")
      .agg(
        sum(when(col("ts") < cut, graft.common.Exact.cents(col("value")))
          .otherwise(0L)).as("score"),
        max(when(col("ts") >= cut && col("event_type") === "purchase", 1L)
          .otherwise(0L)).as("label"))
      .collect().map(x => (x.getLong(1), x.getLong(0), x.getLong(2)))
      .sortBy(t => (t._1, t._2))
    val localRankSum = pu.zipWithIndex.collect {
      case ((_, _, 1L), i) => (i + 1).toLong
    }.sum
    assert(pu.length == n)
    assert(localRankSum == rankSum)
    val nPos = pu.count(_._3 == 1L)
    assert(nPos.toLong == p)
    val expected = (rankSum - p * (p + 1) / 2).toDouble / (p * (n - p)).toDouble
    assert(auc == expected)
  }

  test("q154 KS matches a local recomputation over the score CDFs") {
    val r = run("q154_ks_statistic").head()
    val (nPos, nNeg, ks, ksScore) =
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))
    val cut = lit("2024-01-24 00:00:00").cast("timestamp")
    val pu = graft.common.Tables.load(spark, Sf, "events")
      .groupBy("user_id")
      .agg(
        sum(when(col("ts") < cut, graft.common.Exact.cents(col("value")))
          .otherwise(0L)).as("score"),
        max(when(col("ts") >= cut && col("event_type") === "purchase", 1L)
          .otherwise(0L)).as("label"))
      .collect().map(x => (x.getLong(1), x.getLong(2)))
    assert(nPos == pu.count(_._2 == 1L) && nNeg == pu.count(_._2 == 0L))
    val byScore = pu.groupBy(_._1).map { case (sc, xs) =>
      (sc, xs.count(_._2 == 1L).toLong, xs.count(_._2 == 0L).toLong)
    }.toSeq.sortBy(_._1)
    var (cp, cn) = (0L, 0L)
    var best = (0.0, Long.MaxValue)
    byScore.foreach { case (sc, p1, n1) =>
      cp += p1; cn += n1
      val diff = math.abs(cp.toDouble / nPos - cn.toDouble / nNeg)
      if (diff > best._1) best = (diff, sc)
    }
    assert(ks == best._1 && ksScore == best._2)
    assert(ks > 0.0 && ks <= 1.0)
  }

  test("q249 stump: the emitted split minimizes weighted Gini over every candidate") {
    val rows = run("q249_stump_split").collect()
    assert(rows.length == 1, "argmin must be unique")
    val r = rows.head
    val (nL, posL, nR, posR) = (r.getAs[Long]("n_l"), r.getAs[Long]("pos_l"),
      r.getAs[Long]("n_r"), r.getAs[Long]("pos_r"))
    def gini(pos: Long, n: Long): Double = {
      val p = pos.toDouble / n
      val q = (n - pos).toDouble / n
      1.0 - p * p - q * q
    }
    assert(r.getAs[Double]("gini_left") == gini(posL, nL))
    assert(r.getAs[Double]("gini_right") == gini(posR, nR))
    // local recomputation of the full candidate sweep
    val mid = java.sql.Timestamp.valueOf("2024-01-16 00:00:00")
    val pu = graft.common.Tables.load(spark, Sf, "events")
      .groupBy(col("user_id"))
      .agg(
        sum(when(col("ts") < lit(mid), 1L).otherwise(0L)).as("x"),
        max(when(col("ts") >= lit(mid) && col("event_type") === "purchase" &&
          graft.common.Exact.cents(col("value")) >= 10000L, 1L)
          .otherwise(0L)).as("y"))
      .collect().map(u => (u.getLong(1), u.getLong(2)))
    val n = pu.length.toLong
    val pos = pu.map(_._2).sum
    val cands = pu.map(_._1).distinct.sorted.dropRight(1)
    val costs = cands.map { t =>
      val (l, rr) = pu.partition(_._1 <= t)
      val (nl, pl) = (l.length.toLong, l.map(_._2).sum)
      val (nr, pr) = (rr.length.toLong, rr.map(_._2).sum)
      t -> (nl * gini(pl, nl) + nr * gini(pr, nr)) / n
    }
    val bestCost = costs.map(_._2).min
    assert(nL + nR == n && posL + posR == pos)
    val emitted = r.getAs[Double]("weighted_gini")
    assert(math.abs(emitted - bestCost) < 1e-12,
      s"emitted $emitted vs local best $bestCost")
    // no candidate strictly beats the emitted split
    assert(costs.forall(_._2 >= bestCost - 1e-15))
  }
}
