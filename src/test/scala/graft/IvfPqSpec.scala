package graft

import graft.queries.{IvfPq, ProductQuantization, Similarity}
import org.scalatest.funsuite.AnyFunSuite

/** IVF-PQ ANN (q87): recall against the brute-force contract, exactness
  * of the re-ranked scores, index shape, and determinism.
  */
class IvfPqSpec extends AnyFunSuite with SparkSpec {

  private def topk(name: String): Map[Long, Seq[(Long, Double)]] =
    SparkEntry.queries(name)(spark, Sf)
      .select("query_id", "vec_id", "score").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) =>
        q -> rs.map(r => (r.getLong(1), r.getDouble(2))).toSeq
      }

  test("q87 reaches >=60% recall@10 vs brute force on 8-byte codes") {
    // the exact re-rank of the top-64 ADC pool recovers most of what
    // the coarse codes lose: measured 0.72 at sf0.001 / 0.71 at sf0.01
    // — ~5pp under q54's full-embedding probe scan while the candidate
    // scan reads codes (8 B/vector), not vectors. Floor at 0.60 clears
    // sampling noise, catches a broken ADC ranking (random pool ≈ 0.25)
    val exact = topk("q38_ann_bruteforce")
    val approx = topk("q87_ann_ivfpq")
    val recalls = exact.map { case (q, ids) =>
      val a = approx.getOrElse(q, Seq.empty).map(_._1).toSet
      (a & ids.map(_._1).toSet).size.toDouble / ids.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.60, s"mean recall@10 = $mean")
  }

  test("q87 scores are EXACT cosines: every overlap agrees with q38 bit-for-bit") {
    val exact = topk("q38_ann_bruteforce")
      .flatMap { case (q, rs) => rs.map { case (v, s) => (q, v) -> s } }
    val approx = topk("q87_ann_ivfpq")
      .flatMap { case (q, rs) => rs.map { case (v, s) => (q, v) -> s } }
    val overlap = exact.keySet & approx.keySet
    assert(overlap.nonEmpty)
    overlap.foreach { k =>
      assert(exact(k) == approx(k), s"score mismatch at $k")
    }
  }

  test("the compressed index row is cells + NumSubspaces byte codes") {
    val centroids = Similarity.kMeansCentroids(spark, Sf)
    val books = ProductQuantization.trainCodebooks(spark, Sf)
    val rows = IvfPq.encode(spark, Sf, centroids, books).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Array[Byte]]("codes").length ==
        ProductQuantization.NumSubspaces)
      assert(r.getDouble(3) > 0.0, "reconstruction norm must be positive")
      assert(r.getLong(1) >= 0L && r.getLong(1) < centroids.length)
    }
  }

  test("q87 plan: bounded exchanges only, corpus never on a build side") {
    val plan = SparkEntry.queries("q87_ann_ivfpq")(spark, Sf)
      .queryExecution.executedPlan.toString
    // exactly two shuffle exchanges — the pool and re-rank windows —
    // and both are preceded by a Partial WindowGroupLimit, so each
    // moves at most pool-size rows per query per partition, never the
    // candidate set or the corpus
    val shuffles = "(?m)Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles == 2, s"expected 2 bounded exchanges, got $shuffles:\n$plan")
    assert(plan.contains("WindowGroupLimit") && plan.contains("Partial"),
      "rank-limit pushdown must bound the pre-exchange rows")
    // the re-rank query side reaches the scan as a pushed filter: only
    // the 20 probe vectors are ever broadcast, not the corpus
    assert(plan.contains("(vec_id") && plan.contains("< 20)"),
      s"query-side scan must be pruned by vec_id < 20:\n$plan")
  }

  test("codebook cache: same content served memoized, rewrite retrains") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("pqemb").toString
    def write(seed: Int): Unit =
      (0L until 24L).map { i =>
        (i, Array.tabulate(8)(j =>
          ((i * 31 + j * 7 + seed) % 13 - 6).toFloat))
      }.toDF("vec_id", "embedding")
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    write(0)
    val b1 = ProductQuantization.trainCodebooks(spark, dir)
    // unchanged content: the SAME trained object comes back (one
    // training pass per dataset per session — q86/q87 share it)
    assert(b1 eq ProductQuantization.trainCodebooks(spark, dir))
    write(5)
    val b2 = ProductQuantization.trainCodebooks(spark, dir)
    def flat(b: Array[Array[Array[Double]]]): Seq[Double] =
      b.toSeq.flatMap(_.toSeq.flatMap(_.toSeq))
    assert(flat(b1) != flat(b2),
      "rewritten dataset was served stale codebooks")
  }

  test("q87 is deterministic across runs") {
    def run() = SparkEntry.queries("q87_ann_ivfpq")(spark, Sf)
      .collect().map(_.toString).sorted.toSeq
    assert(run() == run())
  }
}
