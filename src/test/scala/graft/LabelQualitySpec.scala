package graft

import graft.queries.LabelQuality
import org.scalatest.funsuite.AnyFunSuite

/** Label-noise auditing: planted label flips in well-separated clusters
  * must be flagged; clean labels must not.
  */
class LabelQualitySpec extends AnyFunSuite with SparkSpec {

  /** Two well-separated clusters of 8-dim vectors: cluster 0 points
    * near +e0, cluster 1 near +e4, deterministic per-vector jitter on
    * the remaining axes so neighbors are distinct. Labels follow the
    * cluster except for the planted flips.
    */
  private def writeClusters(dir: String, flipped: Set[Long]): Unit = {
    import spark.implicits._
    (0L until 60L).map { i =>
      val cluster = (i % 2).toInt
      val base = new Array[Float](8)
      base(cluster * 4) = 10f
      var j = 0
      while (j < 8) {
        if (j != cluster * 4) base(j) = ((i * 7 + j * 3) % 5).toFloat * 0.1f
        j += 1
      }
      val label = if (flipped(i)) 1 - cluster else cluster
      (i, base, label)
    }.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
  }

  test("q89 flags exactly the planted label flips") {
    val dir = java.nio.file.Files.createTempDirectory("lblq").toString
    val flipped = Set(11L, 24L, 37L)
    writeClusters(dir, flipped)
    val rows = LabelQuality.labelNoiseScan(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getBoolean(6)))).toMap
    assert(rows.size == 60)
    rows.foreach { case (id, (_, suspect)) =>
      assert(suspect == flipped(id),
        s"vec $id: suspect=$suspect, planted flip=${flipped(id)}")
    }
  }

  test("q88 probe-set audit has full-agreement rows on clean clusters") {
    val dir = java.nio.file.Files.createTempDirectory("lblq2").toString
    writeClusters(dir, flipped = Set.empty)
    val rows = SparkEntry.queries("q88_label_agreement")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3), r.getBoolean(4)))
    assert(rows.length == 20)
    rows.foreach { case (qid, nAgree, agreement, suspect) =>
      assert(nAgree == 10L && agreement == 1.0 && !suspect,
        s"query $qid: clean clusters must agree fully")
    }
  }

  test("q88/q89 run non-empty against the corpus embeddings") {
    assert(SparkEntry.queries("q88_label_agreement")(spark, Sf).count() == 20)
    val noise = SparkEntry.queries("q89_label_noise")(spark, Sf)
    assert(noise.count() == spark.read
      .parquet(s"$Sf/embeddings.parquet").count())
  }

  test("q246 kappa: marginals conserve, kappa identity holds from the integer evidence") {
    val rows = SparkEntry.queries("q246_labeler_kappa")(spark, Sf).collect()
    assert(rows.length == 5) // en/es/de/fr + the never-predicted zh
    val n = rows.head.getAs[Long]("n_total")
    val d = rows.head.getAs[Long]("d_agree")
    assert(rows.map(_.getAs[Long]("n_declared")).sum == n)
    assert(rows.map(_.getAs[Long]("n_predicted")).sum == n)
    assert(rows.map(_.getAs[Long]("n_agree")).sum == d)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_agree") <=
        math.min(r.getAs[Long]("n_declared"), r.getAs[Long]("n_predicted")))
    }
    // κ = (N·D − S)/(N² − S) recomputed from the emitted marginals
    val s = rows.map(r => BigInt(r.getAs[Long]("n_declared")) *
      BigInt(r.getAs[Long]("n_predicted"))).sum
    assert(BigInt(rows.head.getAs[String]("s_cross")) == s)
    val num = BigInt(n) * BigInt(d) - s
    val den = BigInt(n) * BigInt(n) - s
    assert(BigInt(rows.head.getAs[String]("kappa_num")) == num)
    assert(BigInt(rows.head.getAs[String]("kappa_den")) == den)
    val kappa = rows.head.getAs[Double]("kappa")
    assert(kappa <= 1.0 && kappa >= -1.0)
    assert(math.abs(kappa - num.toDouble / den.toDouble) < 1e-12)
    // all four rows carry the same shared statistics
    assert(rows.map(_.getAs[Double]("kappa")).distinct.length == 1)
  }
}
