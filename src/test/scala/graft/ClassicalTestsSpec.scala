package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Local recomputations and statistical identities for the round-13
  * continuation batch (q261–q272) — the StatsSpec discipline: every
  * emitted value either equals a from-scratch Scala recomputation on
  * the collected sf0.001 slice (exact, BigInt where the engine is
  * 128-bit) or satisfies the algebraic identity its formula promises,
  * bit-for-bit where the chain is fixed.
  */
class ClassicalTestsSpec extends AnyFunSuite with SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, Sf)

  test("q261 HITS authorities equal a BigInt recomputation from raw edges") {
    val edges = graft.common.Tables.load(spark, Sf, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
      .join(graft.common.Tables.load(spark, Sf, "lineitem")
        .select(col("l_orderkey"), col("l_partkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val indeg = edges.groupBy(_._2).map { case (p, es) => p -> es.length }
    val h1 = edges.groupBy(_._1).map { case (c, es) =>
      c -> es.map(e => BigInt(indeg(e._2))).sum
    }
    val a2 = edges.groupBy(_._2).map { case (p, es) =>
      p -> es.map(e => h1(e._1)).sum
    }
    val rows = run("q261_hits_authority").collect()
    assert(rows.length == indeg.size)
    rows.foreach { r =>
      val p = r.getAs[Long]("part")
      assert(r.getAs[Long]("indeg") == indeg(p))
      assert(BigInt(r.getAs[String]("auth2")) == a2(p),
        s"auth2 mismatch at part $p")
    }
  }

  test("q262 Welch t/df rebuild exactly from the emitted moments") {
    val r = run("q262_welch_t").head()
    val (n1, n2) = (r.getAs[Long]("n1"), r.getAs[Long]("n2"))
    val nRN = graft.common.Tables.load(spark, Sf, "lineitem")
      .filter(col("l_returnflag").isin("R", "N")).count()
    assert(n1 + n2 == nRN)
    val (m1, m2) = (r.getAs[Double]("mean1"), r.getAs[Double]("mean2"))
    assert(m1 >= 1.0 && m1 <= 50.0 && m2 >= 1.0 && m2 <= 50.0)
    val (v1, v2) = (r.getAs[Double]("var1"), r.getAs[Double]("var2"))
    val se1 = v1 / n1.toDouble
    val se2 = v2 / n2.toDouble
    assert(r.getAs[Double]("t_welch") == (m1 - m2) / math.sqrt(se1 + se2))
    assert(r.getAs[Double]("df_welch") ==
      (se1 + se2) * (se1 + se2) /
        (se1 * se1 / (n1 - 1).toDouble + se2 * se2 / (n2 - 1).toDouble))
  }

  test("q263 McNemar cells partition the corpus and the statistic rebuilds") {
    val r = run("q263_mcnemar").head()
    val n = r.getAs[Long]("n")
    assert(n == graft.common.Tables.load(spark, Sf, "documents").count())
    val (br, bw) = (r.getAs[Long]("both_right"), r.getAs[Long]("both_wrong"))
    val (b, c) = (r.getAs[Long]("b_disc"), r.getAs[Long]("c_disc"))
    assert(br + bw + b + c == n)
    assert(r.getAs[Double]("acc_argmax") == (br + b).toDouble / n)
    assert(r.getAs[Double]("acc_rule") == (br + c).toDouble / n)
    if (b + c > 0)
      assert(r.getAs[Double]("mcnemar_chi2") ==
        ((b - c) * (b - c)).toDouble / (b + c))
  }

  test("q264 Friedman rank sums partition each block and chi2 rebuilds") {
    val rows = run("q264_friedman").collect()
    assert(rows.length == 5)
    val n = rows.map(_.getAs[Long]("n_blocks")).distinct
    assert(n.length == 1) // complete blocks: same count per treatment
    // midranks partition 1..5 per block: Σ_j 2·R_j = n·2·(1+...+5)
    assert(rows.map(_.getAs[Long]("r2_sum")).sum == n.head * 30L)
    val s2 = rows.map { r =>
      val d = r.getAs[Long]("r2_sum") - n.head * 6L; d * d
    }.sum
    val chi2 = rows.head.getAs[Double]("chi2_friedman")
    assert(chi2 == 3.0 * s2.toDouble / (n.head.toDouble * 5.0 * 6.0))
    assert(rows.forall(_.getAs[Double]("chi2_friedman") == chi2))
  }

  test("q265 Brown-Forsythe medians match a local sort and F rebuilds") {
    val r = run("q265_brown_forsythe").head()
    val li = graft.common.Tables.load(spark, Sf, "lineitem")
      .select(col("l_returnflag"), col("l_quantity").cast("long"))
      .collect().map(x => (x.getString(0), x.getLong(1)))
    def med2(flag: String): Long = {
      val v = li.filter(_._1 == flag).map(_._2).sorted
      v((v.length - 1) / 2) + v(v.length / 2)
    }
    assert(r.getAs[Long]("med2_a") == med2("A"))
    assert(r.getAs[Long]("med2_n") == med2("N"))
    assert(r.getAs[Long]("med2_r") == med2("R"))
    // F rebuilds from the emitted integer moments via the same chain
    def g(x: String) = (r.getAs[Long](s"n_$x"), r.getAs[Long](s"sz_$x"),
      r.getAs[Long](s"zz_$x"))
    val (na, sa, za) = g("a"); val (nn, sn, zn) = g("n")
    val (nr, sr, zr) = g("r")
    val nT = na.toDouble + nn.toDouble + nr.toDouble
    val zbarAll = (sa + sn + sr).toDouble / nT
    def zb(s: Long, n: Long) = s.toDouble / n.toDouble
    def numT(n: Long, s: Long) = {
      val d = zb(s, n) - zbarAll; n.toDouble * d * d
    }
    def denT(n: Long, s: Long, z: Long) = z.toDouble - s.toDouble * zb(s, n)
    val f = ((nT - 3.0) / 2.0) *
      (numT(na, sa) + numT(nn, sn) + numT(nr, sr)) /
      (denT(na, sa, za) + denT(nn, sn, zn) + denT(nr, sr, zr))
    assert(r.getAs[Double]("f_bf") == f)
  }

  test("q266 W1 equals an exact integer recomputation from the slices") {
    val r = run("q266_wasserstein_drift").head()
    val li = graft.common.Tables.load(spark, Sf, "lineitem")
      .filter(year(col("l_shipdate")).isin(1996, 1997))
      .select(col("l_quantity").cast("long"), year(col("l_shipdate")))
      .collect().map(x => (x.getLong(0), x.getInt(1)))
    val qa = li.filter(_._2 == 1996).map(_._1)
    val qb = li.filter(_._2 == 1997).map(_._1)
    val vals = (qa ++ qb).distinct.sorted
    var num = 0L
    for (i <- vals.indices.dropRight(1)) {
      val v = vals(i)
      val cumA = qa.count(_ <= v).toLong
      val cumB = qb.count(_ <= v).toLong
      num += math.abs(cumA * qb.length - cumB * qa.length) *
        (vals(i + 1) - v)
    }
    assert(r.getAs[Long]("n_a") == qa.length &&
      r.getAs[Long]("n_b") == qb.length)
    assert(r.getAs[Long]("w1_num") == num)
    assert(r.getAs[Double]("w1") ==
      num.toDouble / (qa.length.toDouble * qb.length.toDouble))
  }

  test("q267 Cramér's V is the normalized chi2 and stays in [0, 1]") {
    val r = run("q267_cramers_v").head()
    val chi2 = r.getAs[Double]("chi2")
    val (n, rr, cc) =
      (r.getAs[Long]("n"), r.getAs[Long]("r"), r.getAs[Long]("c"))
    assert(chi2 >= 0.0)
    assert(r.getAs[Long]("dof") == (rr - 1) * (cc - 1))
    val v = r.getAs[Double]("cramers_v")
    assert(v == math.sqrt(chi2 / (n.toDouble * math.min(rr - 1, cc - 1)
      .toDouble)))
    assert(v >= 0.0 && v <= 1.0)
  }

  test("q268 MRR: reciprocal ranks and the pinned mean rebuild exactly") {
    val rows = run("q268_ann_mrr").orderBy("query_id").collect()
    assert(rows.length == 20)
    var s = 0.0
    rows.foreach { r =>
      val rr = r.getAs[Double]("rr")
      if (r.isNullAt(r.fieldIndex("first_hit_rank"))) assert(rr == 0.0)
      else assert(rr ==
        1.0 / r.getAs[Number]("first_hit_rank").longValue.toDouble)
      s += rr
    }
    val mrr = s / rows.length.toDouble
    rows.foreach(r => assert(r.getAs[Double]("mrr") == mrr))
  }

  test("q269 2JT equals an exact pair census on the collected slice") {
    val r = run("q269_jonckheere").head()
    val li = graft.common.Tables.load(spark, Sf, "lineitem")
      .select(col("l_orderkey"), col("l_quantity").cast("long"))
      .join(graft.common.Tables.load(spark, Sf, "orders")
        .select(col("o_orderkey"),
          substring(col("o_orderpriority"), 1, 1).cast("long").as("w")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_quantity"), col("w"))
      .collect()
    val byG = li.map(x => (x.getLong(1), x.getLong(0)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var jt2 = BigInt(0)
    val ws = byG.keys.toSeq.sorted
    for (gi <- ws; hi <- ws if gi < hi; x <- byG(gi); y <- byG(hi)) {
      if (x < y) jt2 += 2 else if (x == y) jt2 += 1
    }
    assert(BigInt(r.getAs[Long]("jt2")) == jt2)
    val n = r.getAs[Long]("n")
    assert(n == li.length)
    val sumNg2 = byG.values.map(v => v.length.toLong * v.length).sum
    assert(r.getAs[Long]("sum_ng2") == sumNg2)
    assert(r.getAs[Double]("mean_jt") ==
      (n.toDouble * n.toDouble - sumNg2.toDouble) / 4.0)
  }

  test("q270 log-rank populations conserve and chi2 is the normalized square") {
    val r = run("q270_logrank").head()
    val nCust = graft.common.Tables.load(spark, Sf, "orders")
      .select("o_custkey").distinct().count()
    assert(r.getAs[Long]("n1") + r.getAs[Long]("n2") == nCust)
    assert(r.getAs[Long]("events1") <= r.getAs[Long]("n1"))
    assert(r.getAs[Long]("events2") <= r.getAs[Long]("n2"))
    val ome = r.getAs[Double]("o_minus_e")
    val v = r.getAs[Double]("var_lr")
    assert(v > 0.0)
    assert(r.getAs[Double]("chi2_logrank") == ome * ome / v)
  }

  test("q271 RBO rebuilds from the emitted lists by a sequential fold") {
    val ex = run("q38_ann_bruteforce")
      .select("query_id", "vec_id", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val ap = run("q54_ann_ivf").select("query_id", "vec_id", "rn")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val powers = Array.iterate(1.0, 10)(_ * 0.9)
    val rows = run("q271_ann_rbo").collect()
    rows.foreach { r =>
      val q = r.getAs[Long]("query_id")
      val ms = ap.collect { case (`q`, v, rn) if ex.contains((q, v)) =>
        math.max(rn, ex((q, v)))
      }
      var s = 0.0
      for (d <- 1 to 10) {
        val cnt = ms.count(_ <= d)
        if (cnt > 0) s += (cnt.toDouble / d.toDouble) * powers(d - 1)
      }
      assert(r.getAs[Long]("n_overlap10") == ms.length)
      assert(r.getAs[Double]("rbo_trunc") == (1.0 - 0.9) * s,
        s"rbo mismatch at query $q")
      assert(r.getAs[Double]("rbo_trunc") >= 0.0 &&
        r.getAs[Double]("rbo_trunc") <= 1.0)
    }
  }

  test("q272 MASE rebuilds from q227's emitted backtest") {
    val f = run("q227_holt_forecast")
      .select("day", "n_events", "abs_err").orderBy("day").collect()
    val holt = f.flatMap(r =>
      if (r.isNullAt(2)) None else Some(r.getDouble(2)))
    var maeHolt = 0.0
    holt.foreach(maeHolt += _) // pinned day order, as emitted
    maeHolt /= holt.length.toDouble
    val naive = f.map(_.getLong(1)).sliding(2)
      .map { case Array(a, b) => math.abs(b - a) }.sum
    val maeNaive = naive.toDouble / (f.length - 1).toDouble
    val r = run("q272_mase").head()
    assert(r.getAs[Long]("n_forecasts") == holt.length)
    assert(r.getAs[Double]("mae_holt") == maeHolt)
    assert(r.getAs[Double]("mae_naive") == maeNaive)
    assert(r.getAs[Double]("mase") == maeHolt / maeNaive)
  }
}
