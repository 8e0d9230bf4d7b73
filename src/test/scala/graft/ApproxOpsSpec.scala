package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Correctness of the approximate operators (no DuckDB oracle): each is
  * checked against its exact counterpart on the same data.
  */
class ApproxOpsSpec extends AnyFunSuite with SparkSpec {

  private def pairs(name: String): Set[(Long, Long)] =
    SparkEntry.queries(name)(spark, Sf)
      .select("d1", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("MinHash-LSH finds the same verified near-dup pairs as exact Jaccard") {
    val exact = pairs("q35_dedup_ngram_jaccard")
    val lsh = pairs("q36_dedup_minhash_lsh")
    // LSH+verify can only lose candidates (recall), never add false
    // positives (both verify at the same threshold).
    assert(lsh.subsetOf(exact))
    // at similarity ~0.99 the miss probability is ~0 — expect full recall
    assert(lsh == exact, s"missed: ${exact -- lsh}")
  }

  test("SimHash(hamming<=3) catches most planted near-dup pairs") {
    val exact = pairs("q35_dedup_ngram_jaccard")
    val sim = pairs("q37_dedup_simhash")
    assert(sim.nonEmpty)
    // SimHash measures word-frequency similarity, 5-gram Jaccard measures
    // sequence similarity — related but not nested (measured: hamming of
    // the planted jaccard>=0.8 pairs spans 0..9). Expect substantial but
    // not total overlap at the standard hamming<=3 cut.
    val caught = (exact & sim).size.toDouble / exact.size
    assert(caught >= 0.5, s"simhash caught only ${(exact & sim).size}/${exact.size}")
  }

  private def topk(name: String): Map[Long, Set[Long]] =
    SparkEntry.queries(name)(spark, Sf)
      .select("query_id", "vec_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) =>
        q -> rs.map(_.getLong(1)).toSet
      }

  private def meanRecall(approxName: String): Double = {
    val exact = topk("q38_ann_bruteforce")
    val approx = topk(approxName)
    val recalls = exact.map { case (q, ids) =>
      approx.get(q).map(a => (a & ids).size.toDouble / ids.size).getOrElse(0.0)
    }
    recalls.sum / recalls.size
  }

  test("LSH ANN reaches >=80% recall@10 vs brute force") {
    val mean = meanRecall("q39_ann_lsh")
    assert(mean >= 0.8, s"mean recall@10 = $mean")
  }

  test("IVF ANN reaches >=65% recall@10 while probing 1/4 of the cells") {
    // 16 of 64 cells probed; finer quantization at the same scan
    // fraction recalls far better than the old 4-of-16 (measured 0.78
    // vs 0.53 at sf0.001) — the spec pins a floor well above both the
    // 25% a random probe would give and the coarse configuration
    val mean = meanRecall("q54_ann_ivf")
    assert(mean >= 0.65, s"mean recall@10 = $mean")
  }

  test("k-means quantizer: materially better cell balance, recall not worse unleaked") {
    import graft.queries.Similarity
    // the balance/leakage study is pinned at k=16 (where the leakage
    // analysis was done: first-16 centroids = 16 of the 20 queries);
    // production k is larger but the comparison is quantizer-vs-baseline
    val km = Similarity.trainKMeans(spark, Sf, 16, 4)
    val fv = Similarity.firstVectorCentroids(spark, Sf, 16)

    // cell-occupancy balance: coefficient of variation across the 16
    // cells (0 = perfectly even). Measured at this corpus: km ~0.11 vs
    // first-16 ~0.19 — the trained quantizer must stay materially better
    def cv(cs: Array[(Long, Array[Double], Double)]): Double = {
      val occ = Similarity.cellAssignments(spark, Sf, cs)
        .groupBy("cell").count().collect()
        .map(_.getLong(1)).padTo(16, 0L)
      val mean = occ.sum / 16.0
      math.sqrt(occ.map(c => (c - mean) * (c - mean)).sum / 16.0) / mean
    }
    val (cvKm, cvFv) = (cv(km), cv(fv))
    assert(cvKm <= 0.8 * cvFv, s"cv: kmeans=$cvKm first16=$cvFv")

    // recall comparison on UNLEAKED queries only: the first-16 centroids
    // are vec_ids 0..15, i.e. 16 of the 20 benchmark queries, so under
    // first-16 each such query's neighbors are assigned to "most similar
    // to the query" cells by construction and aggregate recall is
    // inflated (measured 0.90 on centroid queries vs 0.35 on the rest).
    // The fair comparison is queries 16..19, where neither quantizer
    // contains the query vector.
    val exact = topk("q38_ann_bruteforce")
    def recallOn(cs: Array[(Long, Array[Double], Double)]): Double = {
      val approx = Similarity.ivfTopK(spark, Sf, cs, nProbe = 4)
        .select("query_id", "vec_id").collect()
        .groupBy(_.getLong(0)).map { case (q, rs) =>
          q -> rs.map(_.getLong(1)).toSet
        }
      val qs = exact.keys.filter(_ >= 16)
      val rs = qs.map { q =>
        approx.get(q).map(a => (a & exact(q)).size.toDouble / exact(q).size)
          .getOrElse(0.0)
      }
      rs.sum / rs.size
    }
    val (rKm, rFv) = (recallOn(km), recallOn(fv))
    assert(rKm >= rFv, s"unleaked recall: kmeans=$rKm first16=$rFv")
  }

  test("quantization audit short-circuits the all-zero embedding (no NaN)") {
    import graft.queries.Similarity
    // scale = 0 would make every x/scale a 0/0 NaN; the defined result is
    // "a zero vector reconstructs exactly"
    assert(Similarity.quantizeAudit(7L, Array(0f, 0f, 0f)) ==
      ((7L, 0.0, 1.0, 0.0)))
    val (_, scale, cos, err) =
      Similarity.quantizeAudit(1L, Array(0.5f, -1.0f, 0.25f))
    assert(scale > 0 && !cos.isNaN && cos > 0.999 && err >= 0.0)
  }

  test("centroid cache keys on content, not path: in-session rewrite retrains") {
    import graft.queries.Similarity
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("emb").toString
    def write(seed: Int): Unit =
      (0L until 24L).map { i =>
        (i, Array.tabulate(8)(j =>
          ((i * 31 + j * 7 + seed) % 13 - 6).toFloat))
      }.toDF("vec_id", "embedding")
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    write(0)
    val c1 = Similarity.kMeansCentroids(spark, dir, k = 4, iters = 2)
    write(5)
    val c2 = Similarity.kMeansCentroids(spark, dir, k = 4, iters = 2)
    assert(!c1.zip(c2).forall { case ((_, a, _), (_, b, _)) =>
      a.sameElements(b)
    }, "rewritten dataset was served stale centroids")
  }

  test("exact 1-NN baseline refuses corpora above the cap, naming q62") {
    import graft.queries.Similarity
    val e = intercept[IllegalArgumentException] {
      Similarity.nearestNeighborBlocked(spark, Sf, maxRows = 10L)
    }
    assert(e.getMessage.contains("q62_dedup_embedding_ann"),
      s"refusal must point at the scale path: ${e.getMessage}")
    // the sf test corpora sit under the default cap — the oracle path
    // stays runnable where it is actually used
    assert(Similarity.nearestNeighborBlocked(spark, Sf).count() > 0)
  }

  test("LSH hyperplanes follow the data's embedding width (not fixed 64)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("emb8").toString
    // 8-dim embeddings: clustered pairs so top-k is non-trivial
    (0L until 40L).map { i =>
      (i, Array.tabulate(8)(j =>
        (math.sin(i / 2 * 31 + j) + (i % 2) * 0.01).toFloat))
    }.toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    // both the exact and the hyperplane-bucketed path must run at dim=8
    val exact = SparkEntry.queries("q38_ann_bruteforce")(spark, dir)
    val lsh = SparkEntry.queries("q39_ann_lsh")(spark, dir)
    assert(exact.count() > 0)
    assert(lsh.count() > 0)
    // the LSH result is a subset of scored pairs with correct cosines:
    // spot-check that every (query, vec, score) it returns appears in
    // the exact scoring with the same score when ranked in the top-10
    val e = exact.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    lsh.collect().foreach { r =>
      val k = (r.getLong(0), r.getLong(1))
      e.get(k).foreach(score => assert(score == r.getDouble(2)))
    }
  }

  test("candidates-then-rerank 1-NN (q62) reaches >=0.95 recall@1 vs exact q40") {
    val exact = SparkEntry.queries("q40_dedup_embedding")(spark, Sf)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    val approx = SparkEntry.queries("q62_dedup_embedding_ann")(spark, Sf)
      .collect().map { r =>
        r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getDouble(2))))
      }.toMap
    // every vector surfaces, even candidate-less ones
    assert(approx.keySet == exact.keySet)
    val hits = exact.count { case (v, (nn, cos)) =>
      // equal-cosine ties count as a hit: both are true 1-NNs
      approx(v).exists { case (ann, acos) => ann == nn || acos == cos }
    }
    val recall = hits.toDouble / exact.size
    assert(recall >= 0.95, s"recall@1 = $recall") // measured 0.98 here
    // when the candidate path finds the exact neighbor, its score is the
    // bit-identical exact cosine (same fold), not an approximation
    exact.foreach { case (v, (nn, cos)) =>
      approx(v).foreach { case (ann, acos) =>
        if (ann == nn) assert(acos == cos, s"vector $v cosine mismatch")
      }
    }
  }

  test("int8 quantization (q68) preserves cosine geometry") {
    val rows = SparkEntry.queries("q68_embedding_quantize")(spark, Sf)
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, scale, cos, err) =>
      assert(scale > 0.0, s"vec $id degenerate scale")
      // int8 symmetric quantization of a 64-dim vector keeps the
      // reconstruction within half a quantization step per component —
      // cosine to the original should be essentially 1
      assert(cos > 0.999, s"vec $id recon cosine $cos")
      assert(err <= scale / 2 + 1e-12, s"vec $id error $err > step/2")
    }
  }

  test("PQ reconstructs within the pinned floor and is deterministic") {
    import graft.queries.ProductQuantization
    val rows = ProductQuantization.pqAuditRaw(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2)))
    assert(rows.nonEmpty)
    // every vector clears the derived-oracle floor, with real margin:
    // measured min ~0.53 on this near-uniform corpus
    rows.foreach { case (id, cos, ok) =>
      assert(ok && cos >= ProductQuantization.MinReconCos,
        s"vec $id recon cosine $cos under floor")
      assert(cos <= 1.0 + 1e-12)
    }
    // near-uniform data is PQ's worst case; the mean must still carry
    // substantial signal (measured ~0.68)
    val mean = rows.map(_._2).sum / rows.length
    assert(mean >= 0.5, s"mean recon cosine $mean")
    // training is bit-deterministic: same file layout → same codebooks
    val a = ProductQuantization.trainCodebooks(spark, Sf)
    val b = ProductQuantization.trainCodebooks(spark, Sf)
    assert(a.length == b.length)
    a.zip(b).foreach { case (ma, mb) =>
      ma.zip(mb).foreach { case (ca, cb) => assert(ca.sameElements(cb)) }
    }
  }

  test("k-means training is deterministic across repeated runs") {
    import graft.queries.Similarity
    // train twice for real (bypassing the per-dataset memo) — partial
    // sums fold in partition order, so retraining must be bit-identical
    val a = Similarity.trainKMeans(spark, Sf, 16, 4)
    val b = Similarity.trainKMeans(spark, Sf, 16, 4)
    assert(a.length == b.length)
    a.zip(b).foreach { case ((ida, ca, na), (idb, cb, nb)) =>
      assert(ida == idb && na == nb)
      assert(ca.sameElements(cb))
    }
  }

  test("driver union-find and distributed propagation agree on clusters") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 6L), (8L, 5L), (10L, 11L))
      .toDF("d1", "d2")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a = canon(graft.queries.DedupClusters
      .connectedComponents(spark, edges)) // small: union-find
    val b = canon(graft.queries.DedupClusters
      .connectedComponents(spark, edges, driverMaxEdges = 0L)) // forced loop
    assert(a == b)
    assert(a == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      5L -> 5L, 6L -> 5L, 8L -> 5L, 10L -> 10L, 11L -> 10L))
  }

  test("blocked-broadcast 1-NN merges per-block argmaxes bit-identically") {
    import graft.queries.Similarity
    // 500 vectors at sf0.001: 64-row blocks force an 8-way block split,
    // so the cross-block argmax merge (including the id tie-break) is
    // genuinely exercised against the single-block result.
    assert(Similarity.blockCount(500L, 64) > 1)
    val multi = Similarity.nearestNeighborBlocked(spark, Sf, blockRows = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val single = Similarity.nearestNeighborBlocked(spark, Sf, blockRows = 1 << 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(multi == single)
    // the default block size keeps the sf0.1 correctness gate (2000
    // vectors) on the multi-block path
    assert(Similarity.blockCount(2000L, Similarity.DefaultBlockRows) > 1)
  }

  test("signature buckets are deterministic across invocations") {
    val a = SparkEntry.queries("q39_ann_lsh")(spark, Sf).collect().toSet
    val b = SparkEntry.queries("q39_ann_lsh")(spark, Sf).collect().toSet
    assert(a == b)
  }

  test("q250 MMR: greedy invariants hold and rank-1 is the relevance argmax") {
    val rows = SparkEntry.queries("q250_mmr_diversify")(spark, Sf).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet == (0L until 20L).toSet)
    // q38's per-query top hit is MMR's first pick (max-sim to the empty
    // selection is 0, so step 1 is pure relevance)
    val top1 = SparkEntry.queries("q38_ann_bruteforce")(spark, Sf)
      .filter(org.apache.spark.sql.functions.col("rn") === 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    byQ.foreach { case (q, rs) =>
      val ordered = rs.sortBy(_.getInt(2))
      assert(ordered.map(_.getInt(2)).toSeq == (1 to 10))
      assert(ordered.head.getLong(1) == top1(q), s"query $q first pick")
      assert(ordered.head.getDouble(4) == 0.0)
      // the MMR identity per row, and picked items are distinct
      ordered.foreach { r =>
        // (1.0 - 0.7) on purpose: that double is NOT the literal 0.3,
        // and the engine computes the weight as 1 − λ
        assert(r.getDouble(5) ==
          0.7 * r.getDouble(3) - (1.0 - 0.7) * r.getDouble(4))
      }
      assert(ordered.map(_.getLong(1)).distinct.length == 10)
      // the chosen MMR score can only fall as the selection grows
      val ms = ordered.map(_.getDouble(5))
      assert(ms.zip(ms.tail).forall { case (a, b) => b <= a },
        s"query $q MMR sequence not non-increasing: ${ms.toSeq}")
      // diversification actually engages: later picks carry positive
      // similarity to the selected set on this corpus
      assert(ordered.tail.exists(_.getDouble(4) > 0.0))
    }
  }
}
