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
}
