package graft

import graft.queries.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Skew behavior of the n-gram near-dup path: a boilerplate gram shared
  * by every document must not drive quadratic pair fan-out, and the
  * df-cap must not change which pairs qualify (the exact-verify phase
  * computes Jaccard on full gram sets regardless of the cap).
  */
class DedupSkewSpec extends AnyFunSuite with SparkSpec {

  /** 40 docs opening with the same 8-word boilerplate sentence (so every
    * boilerplate 5-gram has df = 40) followed by unique tails; docs 100
    * and 101 are planted near-dups sharing a long unique passage.
    */
  private lazy val planted = {
    import spark.implicits._
    val boiler = "this document is provided as is without any warranty"
    val tail = (id: Int) =>
      (0 until 30).map(i => s"unique${id}word$i").mkString(" ")
    val common = (0 until 40).map(i => s"sharedpassageword$i").mkString(" ")
    val docs =
      (0 until 38).map(i => (i.toLong, s"$boiler ${tail(i)}")) ++
        Seq(
          (100L, s"$boiler $common extraA"),
          (101L, s"$boiler $common extraB"))
    docs.toDF("doc_id", "text")
  }

  private def pairs(maxGramDf: Long): Set[(Long, Long, Double)] =
    Dedup.nearDupPairsFrom(spark, planted, maxGramDf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet

  test("df-cap bounds boilerplate fan-out without losing qualifying pairs") {
    // cap = 4 excludes every boilerplate gram (df = 40) from candidate
    // generation; the planted twins still pair via their unique passage,
    // and their Jaccard is computed on FULL sets (boilerplate included)
    val capped = pairs(maxGramDf = 4L)
    assert(capped.map(p => (p._1, p._2)) == Set((100L, 101L)))
    // the uncapped run finds the same pairs with identical Jaccard —
    // boilerplate-only overlap never reaches 0.8, so the cap is lossless
    val uncapped = pairs(maxGramDf = Long.MaxValue)
    assert(capped == uncapped)
    // Jaccard uses the full gram sets: both docs have the same gram count
    // g and share all but 2 grams (extraA/extraB tails differ), so the
    // value reflects boilerplate grams even though they were df-capped out
    val j = capped.head._3
    assert(j > 0.8 && j < 1.0)
  }

  test("default cap is inactive on the test corpus (oracle-exact)") {
    val sfPairs = SparkEntry.queries("q35_dedup_ngram_jaccard")(spark, Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = Dedup.nearDupPairsFrom(spark,
        spark.read.parquet(s"$Sf/documents.parquet"), Long.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sfPairs == uncapped)
    assert(sfPairs.nonEmpty)
  }

  test("clustering over LSH edges matches clustering over exact edges") {
    val viaLsh = SparkEntry.queries("q59_dedup_clusters")(spark, Sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exactEdges = Dedup.nearDupPairsFrom(spark,
      spark.read.parquet(s"$Sf/documents.parquet"))
    val viaExact = graft.queries.DedupClusters
      .connectedComponents(spark, exactEdges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaLsh == viaExact)
  }

  test("primitive driver union-find labels 200k chain edges with each chain's min id") {
    import spark.implicits._
    // 1000 chains of 200 nodes each: node ids interleaved so components
    // are NOT contiguous id ranges; expected label = chain head's id
    val edges = (0 until 1000).flatMap { c =>
      (0 until 199).map(j => (c + 1000L * j, c + 1000L * (j + 1)))
    }.toDF("d1", "d2")
    val labels = graft.queries.DedupClusters
      .connectedComponents(spark, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(labels.length == 200000)
    labels.foreach { case (node, label) =>
      assert(label == node % 1000, s"node $node labeled $label")
    }
  }

  test("driver union-find and distributed propagation agree on a random graph") {
    import spark.implicits._
    // deterministic pseudo-random graph: 2000 edges over ~1500 nodes
    val edges = (0 until 2000).map { i =>
      val a = (i * 2654435761L) % 1500
      val b = (i * 40503L + 7) % 1500
      (math.min(a, b), math.max(a, b) + 1) // +1 avoids self-loops
    }.toDF("d1", "d2")
    val viaDriver = graft.queries.DedupClusters
      .connectedComponents(spark, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaPropagation = graft.queries.DedupClusters
      .connectedComponents(spark, edges, maxIter = 40, driverMaxEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaDriver == viaPropagation)
  }

  test("union-find threshold boundary: both paths agree on a skewed 1M-edge graph") {
    // a graph just OVER driverMaxEdges (1,000,003 edges) with the skew
    // shapes near-dup graphs actually have: one 400k-leaf hub (a
    // boilerplate mega-cluster), 300k isolated pairs, and 100k 4-node
    // chains. The default call crosses the threshold onto distributed
    // propagation; an explicitly raised cap forces the same graph
    // through the driver union-find — the two labelings must be
    // identical row for row.
    val hub = spark.range(1, 400001)
      .select(lit(0L).as("d1"), col("id").as("d2"))
    val pairs = spark.range(0, 300000)
      .select((lit(1000000L) + col("id") * 2).as("d1"),
        (lit(1000000L) + col("id") * 2 + 1).as("d2"))
    val chains = spark.range(0, 300003)
      .select(
        (lit(3000000L) + floor(col("id") / 3) * 4 + col("id") % 3).as("d1"),
        (lit(3000000L) + floor(col("id") / 3) * 4 + col("id") % 3 + 1)
          .as("d2"))
    val edges = hub.unionByName(pairs).unionByName(chains)
    assert(edges.count() == 1000003L,
      "the planted graph must sit just above the 1M default threshold")

    def used(): Long = {
      System.gc()
      Runtime.getRuntime.totalMemory() - Runtime.getRuntime.freeMemory()
    }

    // driver path (cap raised above the edge count)
    val before = used()
    val viaDriver = graft.queries.DedupClusters
      .connectedComponents(spark, edges, driverMaxEdges = 2000000L)
      .persist()
    val nDriver = viaDriver.count()
    val deltaMb = (used() - before) / (1 << 20)
    // documented budget for the primitive-array solve at the 1M-edge
    // threshold is ~120 MB peak; the measured retained delta (which
    // also includes the materialized result relation) must stay the
    // same order of magnitude — the old boxed-HashMap shape was
    // multi-GB here
    assert(deltaMb < 400, s"driver union-find retained ${deltaMb} MB")

    // distributed path (default threshold: 1,000,003 > 1,000,000)
    val viaProp = graft.queries.DedupClusters
      .connectedComponents(spark, edges).persist()
    assert(viaProp.count() == nDriver)
    assert(viaDriver.exceptAll(viaProp).limit(1).count() == 0 &&
      viaProp.exceptAll(viaDriver).limit(1).count() == 0,
      "driver and propagation labelings diverge")

    // spot-check the skewed component: every hub leaf labeled 0
    assert(viaDriver.filter(col("label") === 0L).count() == 400001L)
    viaDriver.unpersist(blocking = false)
    viaProp.unpersist(blocking = false)
  }

  test("propagation throws instead of returning wrong labels at maxIter") {
    import spark.implicits._
    // a 6-node path graph has diameter 5: maxIter=2 cannot converge
    val chain = (1L to 5L).map(i => (i, i + 1)).toDF("d1", "d2")
    intercept[IllegalStateException] {
      graft.queries.DedupClusters.connectedComponents(
        spark, chain, maxIter = 2, driverMaxEdges = 0L)
    }
    // and with enough rounds the same graph converges to one component
    val ok = graft.queries.DedupClusters.connectedComponents(
      spark, chain, maxIter = 10, driverMaxEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ok.values.toSet == Set(1L))
  }
  test("q260 SemDeDup: chained-successor audit matches a full local recompute") {
    val rows = SparkEntry.queries("q260_semdedup")(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)),
        r.getBoolean(5)))
    val nVecs = spark.read.parquet(s"$Sf/embeddings.parquet").count()
    assert(rows.length.toLong == nVecs, "every vector classified once")
    val emb = spark.read.parquet(s"$Sf/embeddings.parquet")
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    // local recompute: per cluster, order by (c_cos desc, vec_id asc),
    // each row's nn is the most-similar of its <= 3 successors
    rows.groupBy(_._2).foreach { case (cluster, members) =>
      val ordered = members.sortBy(t => (-t._3, t._1))
      ordered.zipWithIndex.foreach { case ((id, _, _, nnSucc, nnCos, kept), i) =>
        val succs = ordered.slice(i + 1, i + 4).map(_._1)
        if (succs.isEmpty) {
          assert(nnSucc.isEmpty && nnCos.isEmpty && kept,
            s"cluster tail $id must have no witness and stay kept")
        } else {
          val scored = succs.map(sid => sid -> cos(emb(id), emb(sid)))
          val bestCos = scored.map(_._2).max
          // ties break by the fixed successor order (first match)
          val bestId = scored.find(_._2 == bestCos).get._1
          assert(nnCos.contains(bestCos),
            s"$id nn_cos ${nnCos} != recomputed $bestCos")
          assert(nnSucc.contains(bestId),
            s"$id nn_succ ${nnSucc} != recomputed $bestId")
          assert(kept == (bestCos < 0.95), s"$id kept flag vs theta")
        }
      }
      assert(cluster >= 0)
    }
  }

}
