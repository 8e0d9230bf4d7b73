package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CUPED readout (q142) and the exact correlation matrix (q143):
  * statistical identities + partition-count invariance (the whole point
  * of the integer/decimal moment discipline).
  */
class StatsSpec extends AnyFunSuite with SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, Sf)

  test("q142 emits both arms, same theta, and users are conserved") {
    val rows = run("q142_cuped").orderBy("arm").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("control", "treatment"))
    assert(rows(0).getDouble(4) == rows(1).getDouble(4)) // pooled θ is shared
    val nUsers = graft.common.Tables.load(spark, Sf, "events")
      .select("user_id").distinct().count()
    assert(rows.map(_.getLong(1)).sum == nUsers)
  }

  test("q142 adjustment preserves the pooled mean (CUPED identity)") {
    // Σ_arm n_a·adjusted_a = Σ_arm n_a·(ȳ_a − θ(x̄_a − x̄)) = Σy −
    // θ·(Σx − Σx) = Σy: the adjustment is mean-preserving over the pool
    val rows = run("q142_cuped").collect()
    val pooledAdj = rows.map(r => r.getLong(1) * r.getDouble(6)).sum
    val sumY = rows.map(_.getLong(3)).sum.toDouble
    assert(math.abs(pooledAdj - sumY) / sumY < 1e-9)
  }

  test("q143 correlations are in [-1, 1] and the matrix matches mllib's stat") {
    val r = run("q143_exact_corr").head()
    val cs = Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3))
    cs.foreach(c => assert(c >= -1.0 && c <= 1.0, s"corr $c out of range"))
    // cross-check against Spark's own (float-summed) corr within float
    // noise — the synthetic generator draws the columns independently,
    // so values are near 0; the identity must still hold exactly
    val li = graft.common.Tables.load(spark, Sf, "lineitem")
    val ref = li.agg(corr(col("l_quantity"), col("l_extendedprice"))).head().getDouble(0)
    assert(math.abs(r.getDouble(1) - ref) < 1e-9)
  }

  test("q153 bootstrap replicas are complete, near the point estimate, and vary") {
    val df = run("q153_bootstrap_ci").cache()
    assert(df.count() == 50)
    val means = df.select("boot_mean_cents").collect().map(_.getDouble(0))
    // replicas differ (the hash draw actually resamples)
    assert(means.distinct.length > 1)
    // the bootstrap distribution brackets the plain mean
    val pointEst = graft.common.Tables.load(spark, Sf, "orders")
      .agg(avg(graft.common.Exact.cents(col("o_totalprice"))))
      .head().getDouble(0)
    assert(means.min <= pointEst && pointEst <= means.max)
    // total multiplicity mass ≈ 0.976·n per replica (±20% at sf0.001)
    val n = graft.common.Tables.load(spark, Sf, "orders").count()
    df.select("sum_w").collect().map(_.getLong(0)).foreach { w =>
      assert(w > n * 78 / 100 && w < n * 118 / 100, s"sum_w $w vs n $n")
    }
    df.unpersist()
  }

  test("q142/q143 are bitwise partition-count invariant") {
    val sp = spark.conf.get("spark.sql.shuffle.partitions")
    def snap() = Seq(
      run("q142_cuped").orderBy("arm").collect().toSeq,
      run("q143_exact_corr").collect().toSeq)
    val a = snap()
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      assert(snap() == a)
    } finally spark.conf.set("spark.sql.shuffle.partitions", sp)
  }

  test("q160 z-test counts conserve and z matches a local recomputation") {
    val r = run("q160_two_proportion").head()
    val (n1, x1, n2, x2) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val nUsers = graft.common.Tables.load(spark, Sf, "events")
      .select("user_id").distinct().count()
    assert(n1 + n2 == nUsers)
    assert(x1 <= n1 && x2 <= n2 && x1 >= 0 && x2 >= 0)
    assert(r.getDouble(4) == x1.toDouble / n1)
    assert(r.getDouble(5) == x2.toDouble / n2)
    val pp = (x1 + x2).toDouble / (n1 + n2)
    val z = (x1.toDouble / n1 - x2.toDouble / n2) /
      math.sqrt(pp * (1.0 - pp) * (1.0 / n1 + 1.0 / n2))
    assert(r.getDouble(6) == z)
  }

  test("q243 Kruskal-Wallis: rank sums conserve N(N+1) and ties only shrink the denominator") {
    val r = run("q243_kruskal_wallis").head()
    val n = r.getAs[Long]("n_total")
    assert(n == graft.common.Tables.load(spark, Sf, "orders").count())
    // midranks are a partition of ranks 1..N: Σ_g 2·R_g = 2·(N(N+1)/2)
    val twoRSum = (1 to 5)
      .map(i => BigInt(r.getAs[String](s"tr_$i"))).sum
    assert(twoRSum == BigInt(n) * (BigInt(n) + 1),
      s"rank-sum conservation broke: $twoRSum vs ${BigInt(n) * (BigInt(n) + 1)}")
    val h = r.getAs[Double]("h")
    val hT = r.getAs[Double]("h_tie_corrected")
    assert(h >= 0.0)
    // the tie correction divides by (1 − ΣT/(N³−N)) ∈ (0, 1]
    assert(hT >= h)
    // group sizes partition the corpus
    assert((1 to 5).map(i => r.getAs[Long](s"n_$i")).sum == n)
  }

  test("q244 BH-FDR: od IS z², rejections are a rank prefix, p in [0,1]") {
    val rows = run("q244_bh_fdr").collect()
    assert(rows.length == 25) // one per nation
    rows.foreach { r =>
      val z = r.getAs[Double]("z")
      val od = r.getAs[Double]("od")
      // the exact-integer ordering key is algebraically z²
      assert(math.abs(od - z * z) <= 1e-9 * math.max(od, 1.0),
        s"od=$od vs z²=${z * z}")
      val p = r.getAs[Double]("p")
      assert(p >= 0.0 && p <= 1.0)
    }
    // BH rejects exactly the k* smallest p-values: the rejected set is
    // a prefix of the rank order
    val byRank = rows.sortBy(_.getAs[Long]("rk"))
    val firstKeep = byRank.indexWhere(!_.getAs[Boolean]("rejected"))
    if (firstKeep >= 0)
      assert(byRank.drop(firstKeep).forall(!_.getAs[Boolean]("rejected")),
        "rejected set is not a rank prefix")
    // ranks are a permutation of 1..25
    assert(byRank.map(_.getAs[Long]("rk")).toSeq == (1L to 25L))
  }

  test("q252 Cochran-Armitage: moments conserve and z rebuilds from the integer evidence") {
    val rows = run("q252_ca_trend").collect()
    assert(rows.length == 5)
    val n = rows.head.getAs[Long]("n_tot")
    val x = rows.head.getAs[Long]("x_tot")
    assert(rows.map(_.getAs[Long]("n_g")).sum == n)
    assert(rows.map(_.getAs[Long]("x_g")).sum == x)
    // scores are the priority prefix digits 1..5
    assert(rows.map(_.getAs[Long]("w")).sorted.toSeq == (1L to 5L))
    // rebuild the statistic from the emitted integer moments
    val swx = rows.map(r => r.getAs[Long]("w") * r.getAs[Long]("x_g")).sum
    val swn = rows.map(r => r.getAs[Long]("w") * r.getAs[Long]("n_g")).sum
    val sw2n = rows.map(r =>
      r.getAs[Long]("w") * r.getAs[Long]("w") * r.getAs[Long]("n_g")).sum
    val num = BigInt(n) * BigInt(swx) - BigInt(x) * BigInt(swn)
    val den = BigInt(x) * BigInt(n - x) *
      (BigInt(n) * BigInt(sw2n) - BigInt(swn) * BigInt(swn))
    assert(BigInt(rows.head.getAs[String]("trend_num")) == num)
    assert(BigInt(rows.head.getAs[String]("var_den")) == den)
    val z2 = rows.head.getAs[Double]("z2")
    val z = rows.head.getAs[Double]("z")
    assert(math.abs(z2 - n.toDouble * num.toDouble * num.toDouble /
      den.toDouble) < 1e-12 * math.max(z2, 1.0))
    assert(math.signum(z) == num.signum.toDouble || num == 0)
    assert(math.abs(z * z - z2) < 1e-9)
  }

  test("q254 MH odds ratio matches the pinned-order local fold") {
    val rows = run("q254_mh_odds_ratio").collect()
    assert(rows.length == 25)
    // cells partition each stratum; per-stratum OR rebuilds exactly
    rows.foreach { r =>
      val (a, b, c, d) = (r.getAs[Long]("a"), r.getAs[Long]("b"),
        r.getAs[Long]("c"), r.getAs[Long]("d"))
      assert(r.getAs[Long]("n_i") == a + b + c + d)
      if (b * c != 0)
        assert(r.getAs[Double]("or_stratum") ==
          a.toDouble * d.toDouble / (b.toDouble * c.toDouble))
      else assert(r.isNullAt(r.fieldIndex("or_stratum")))
    }
    // the pooled OR equals a local fold in the SAME nation order
    val sorted = rows.sortBy(_.getAs[String]("nation"))
    var num = 0.0
    var den = 0.0
    sorted.foreach { r =>
      val n = r.getAs[Long]("n_i").toDouble
      num += r.getAs[Long]("a").toDouble * r.getAs[Long]("d").toDouble / n
      den += r.getAs[Long]("b").toDouble * r.getAs[Long]("c").toDouble / n
    }
    val orMh = rows.head.getAs[Double]("or_mh")
    assert(orMh == num / den, s"engine $orMh vs local ${num / den}")
    assert(rows.map(_.getAs[Double]("or_mh")).distinct.length == 1)
  }
}
