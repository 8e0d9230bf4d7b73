package graft

import graft.queries.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Filtered ANN (q273, round-14): a metadata predicate joined into the
  * index probe — never post-filtered on the top-k — with adaptive probe
  * widening so a sparse filter can't silently under-return. Recall is
  * pinned against the exact FILTERED brute-force baseline (the filtered
  * universe's own ground truth, not q38's unfiltered one).
  */
class FilteredAnnSpec extends AnyFunSuite with SparkSpec {

  private val K = 10

  private def run() =
    SparkEntry.queries("q273_ann_filtered")(spark, Sf)

  /** Exact filtered top-K: brute-force cosine over ONLY the rows
    * matching `pred` (round-16: parameterized over the declared
    * stored-filter-column set — documents-resident columns are joined
    * in exactly like the probes' backstops do).
    */
  private def exactFilteredBy(
      pred: org.apache.spark.sql.Column): Map[Long, Set[Long]] = {
    val e = graft.common.Tables.load(spark, Sf, "embeddings")
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id").asc)
    Similarity.enrichForPred(spark, Sf, e, pred).filter(pred)
      .join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        Similarity.cosine(col("qv"), col("embedding")).as("score"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= K)
      .select("query_id", "vec_id").collect()
      .groupBy(_.getLong(0)).map { case (qid, rs) =>
        qid -> rs.map(_.getLong(1)).toSet
      }
  }

  private def exactFiltered(): Map[Long, Set[Long]] =
    exactFilteredBy(col("label") === 1)

  test("every returned row satisfies the filter (no leakage past the scan)") {
    val e = graft.common.Tables.load(spark, Sf, "embeddings")
      .select(col("vec_id"), col("label"))
    val leaked = run().join(e, "vec_id").filter(col("label") =!= 1).count()
    assert(leaked == 0L)
  }

  test("no silent under-return: every query fills to min(k, filtered universe)") {
    val e = graft.common.Tables.load(spark, Sf, "embeddings")
    val nFiltered = e.filter(col("label") === 1).count()
    val selfFiltered = e.filter(col("label") === 1 && col("vec_id") < 20)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val counts = run().groupBy("query_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts.size == 20, "all 20 queries must answer")
    counts.foreach { case (qid, n) =>
      // a query that itself has label=1 can't be its own neighbor
      val universe = nFiltered - (if (selfFiltered.contains(qid)) 1 else 0)
      assert(n == math.min(K.toLong, universe),
        s"query $qid returned $n of expected ${math.min(K.toLong, universe)} " +
          s"(filtered universe $universe) — adaptive widening failed")
    }
  }

  test("recall vs the exact FILTERED baseline") {
    val exact = exactFiltered()
    val approx = run().select("query_id", "vec_id").collect()
      .groupBy(_.getLong(0)).map { case (qid, rs) =>
        qid -> rs.map(_.getLong(1)).toSet
      }
    val recalls = exact.map { case (qid, ids) =>
      approx.get(qid).map(a => (a & ids).size.toDouble / ids.size).getOrElse(0.0)
    }
    val mean = recalls.sum / recalls.size
    // at sf0.001 (47 label-1 rows in 500) most queries fall short of
    // the 3k over-fetch floor at partial probes and widen to the full
    // cell space (exact within the filter); a query whose probed cells
    // are label-1-dense may finish early with >=30-candidate depth —
    // that IS the approximate path, so the pin is a high band, not 1.0
    // (measured 0.99 here vs 0.53 without the over-fetch floor)
    assert(mean >= 0.9, s"mean filtered recall@$K = $mean")
  }

  test("over-fetch floor is what buys the recall (knob documented by measurement)") {
    // with the floor disabled (overFetch=1: done at k candidates) a
    // sparse filter serves weak tails from the first probe set that
    // technically fills — measured 0.53 here vs 1.0 with the floor
    val (cs, idx) = Similarity.resolveIvfIndex(spark, Sf)
    val loose = Similarity.ivfTopKFiltered(spark, Sf, cs,
      col("label") === 1, k = K, overFetch = 1, assignments = Some(idx))
      .select("query_id", "vec_id").collect()
      .groupBy(_.getLong(0)).map { case (qid, rs) =>
        qid -> rs.map(_.getLong(1)).toSet
      }
    val exact = exactFiltered()
    val recalls = exact.map { case (qid, ids) =>
      loose.get(qid).map(a => (a & ids).size.toDouble / ids.size).getOrElse(0.0)
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.4 && mean < 0.999,
      s"overFetch=1 recall $mean — expected the measured weak-tail band; " +
        "if this reads 1.0 the floor test is no longer exercising widening")
  }

  // ---- q274: the same contract on the NSW graph index ----

  test("q274 graph-filtered: purity, fill, and recall vs the exact filtered baseline") {
    val df = SparkEntry.queries("q274_ann_graph_filtered")(spark, Sf)
    val e = graft.common.Tables.load(spark, Sf, "embeddings")
      .select(col("vec_id"), col("label"))
    assert(df.join(e, "vec_id").filter(col("label") =!= 1).count() == 0,
      "filter leaked past the beam")
    val counts = df.groupBy("query_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts.size == 20 && counts.values.forall(_ == 10L),
      s"under-returned despite the exact backstop: $counts")
    val exact = exactFiltered()
    val approx = df.select("query_id", "vec_id").collect()
      .groupBy(_.getLong(0)).map { case (qid, rs) =>
        qid -> rs.map(_.getLong(1)).toSet
      }
    val recalls = exact.map { case (qid, ids) =>
      approx.get(qid).map(a => (a & ids).size.toDouble / ids.size).getOrElse(0.0)
    }
    val mean = recalls.sum / recalls.size
    // at sf0.001 (47 label-1 in 500) the 128-beam rarely holds 10
    // matches, so most queries take the exact backstop — the pin is a
    // high floor, not 1.0, for the beam-satisfied remainder
    assert(mean >= 0.9, s"mean graph-filtered recall@$K = $mean")
  }

  test("the filter and the probed cells both reach the stored index scan") {
    run().collect() // warm the store so the query serves the stored index
    val plan = run().queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[cell#\\d+ (INSET|IN)".r
      .findFirstIn(plan).nonEmpty,
      s"probed cells must prune partitions at listing time:\n$plan")
    assert("PushedFilters: \\[.*EqualTo\\(label,1\\)".r
      .findFirstIn(plan).nonEmpty,
      s"the label predicate must reach the parquet scan as a pushed filter:\n$plan")
  }

  // ---- q275/q276 (round-15): the same contract on the last two indexes ----

  private def purityFillRecall(q: String): Unit = {
    val df = SparkEntry.queries(q)(spark, Sf)
    val e = graft.common.Tables.load(spark, Sf, "embeddings")
    assert(df.join(e.select(col("vec_id"), col("label")), "vec_id")
      .filter(col("label") =!= 1).count() == 0,
      s"$q: filter leaked past the index scan")
    val nFiltered = e.filter(col("label") === 1).count()
    val selfFiltered = e.filter(col("label") === 1 && col("vec_id") < 20)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val counts = df.groupBy("query_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts.size == 20, s"$q: all 20 queries must answer")
    counts.foreach { case (qid, n) =>
      val universe = nFiltered - (if (selfFiltered.contains(qid)) 1 else 0)
      assert(n == math.min(K.toLong, universe),
        s"$q query $qid returned $n of ${math.min(K.toLong, universe)} " +
          "— adaptive widening / backstop failed")
    }
    val exact = exactFiltered()
    val approx = df.select("query_id", "vec_id").collect()
      .groupBy(_.getLong(0)).map { case (qid, rs) =>
        qid -> rs.map(_.getLong(1)).toSet
      }
    val recalls = exact.map { case (qid, ids) =>
      approx.get(qid).map(a => (a & ids).size.toDouble / ids.size).getOrElse(0.0)
    }
    val mean = recalls.sum / recalls.size
    // at sf0.001's sparse filtered universe most queries widen to full
    // coverage (q275: whole cell space + a RerankPool that covers the
    // universe = exact; q276: multiprobe then the exact backstop), so
    // the floor is high; early-satisfied queries are the approximate
    // remainder
    assert(mean >= 0.9, s"$q mean filtered recall@$K = $mean")
  }

  test("q275 IVF-PQ-filtered: purity, fill, and recall vs the exact filtered baseline") {
    purityFillRecall("q275_ann_ivfpq_filtered")
  }

  test("q276 LSH-filtered: purity, fill, and recall vs the exact filtered baseline") {
    purityFillRecall("q276_ann_lsh_filtered")
  }

  test("q275: the label predicate reaches the stored CODE scan beside the cell pruning") {
    val q = SparkEntry.queries("q275_ann_ivfpq_filtered")
    q(spark, Sf).collect() // warm the store
    val plan = q(spark, Sf).queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[cell#\\d+ (INSET|IN)".r
      .findFirstIn(plan).nonEmpty,
      s"probed cells must prune the code table's partitions:\n$plan")
    assert("PushedFilters: \\[.*EqualTo\\(label,1\\)".r
      .findFirstIn(plan).nonEmpty,
      s"the label predicate must reach the code scan as a pushed filter:\n$plan")
  }

  test("q276: the label predicate reaches the stored BUCKET scan beside the bkt pruning") {
    val q = SparkEntry.queries("q276_ann_lsh_filtered")
    q(spark, Sf).collect() // warm the store
    val plan = q(spark, Sf).queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[bkt#\\d+ (INSET|IN)".r
      .findFirstIn(plan).nonEmpty,
      s"probed buckets must prune the bucket table's partitions:\n$plan")
    assert("PushedFilters: \\[.*EqualTo\\(label,1\\)".r
      .findFirstIn(plan).nonEmpty,
      s"the label predicate must reach the bucket scan as a pushed filter:\n$plan")
  }

  // ---- q278/q279 (round-16): the generalized filter-column contract ----

  /** Purity + fill + recall for a probe under an arbitrary predicate
    * over the declared stored filter columns — the round-15
    * purityFillRecall generalized to any (pred, universe).
    */
  private def purityFillRecallBy(q: String,
      pred: org.apache.spark.sql.Column): Unit = {
    val df = SparkEntry.queries(q)(spark, Sf)
    val e = graft.common.Tables.load(spark, Sf, "embeddings")
    val universe = Similarity.enrichForPred(spark, Sf, e, pred)
      .filter(pred).select("vec_id").collect().map(_.getLong(0)).toSet
    val leaked = df.select("vec_id").collect().map(_.getLong(0))
      .filterNot(universe.contains)
    assert(leaked.isEmpty, s"$q: ${leaked.length} rows leaked the filter")
    val counts = df.groupBy("query_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts.size == 20, s"$q: all 20 queries must answer")
    counts.foreach { case (qid, n) =>
      val u = universe.size - (if (universe.contains(qid) && qid < 20) 1 else 0)
      assert(n == math.min(K.toLong, u),
        s"$q query $qid returned $n of ${math.min(K.toLong, u)} " +
          "— adaptive widening / backstop failed")
    }
    val exact = exactFilteredBy(pred)
    val approx = df.select("query_id", "vec_id").collect()
      .groupBy(_.getLong(0)).map { case (qid, rs) =>
        qid -> rs.map(_.getLong(1)).toSet
      }
    val recalls = exact.map { case (qid, ids) =>
      approx.get(qid).map(a => (a & ids).size.toDouble / ids.size).getOrElse(0.0)
    }
    val mean = recalls.sum / recalls.size
    // measured floors: q278's lang='fr' universe (82 of 500, ~16%) is
    // DENSER than label=1 (~10%), so more queries hit the 3k over-fetch
    // floor early and finish on the approximate path (measured 0.86 —
    // consistent with the unfiltered IVF probe's ~0.78-0.85 recall
    // band); the sparser predicates widen to full coverage and sit near
    // 1.0
    assert(mean >= 0.8, s"$q mean filtered recall@$K = $mean")
  }

  test("q278 non-label-column-filtered IVF: purity, fill, and recall") {
    purityFillRecallBy("q278_ann_filtered_lang", col("lang") === "fr")
  }

  test("q279 conjunctive two-column-filtered LSH: purity, fill, and recall") {
    purityFillRecallBy("q279_ann_lsh_filtered_multi",
      col("lang") === "en" && col("label") === 1)
  }

  test("q278: the lang predicate reaches the stored index scan beside the cell pruning") {
    val q = SparkEntry.queries("q278_ann_filtered_lang")
    q(spark, Sf).collect() // warm the store
    val plan = q(spark, Sf).queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[cell#\\d+ (INSET|IN)".r
      .findFirstIn(plan).nonEmpty,
      s"probed cells must prune partitions at listing time:\n$plan")
    assert("PushedFilters: \\[.*EqualTo\\(lang,fr\\)".r
      .findFirstIn(plan).nonEmpty,
      s"the lang predicate must reach the parquet scan as a pushed filter:\n$plan")
  }

  test("a multi-column conjunction reaches the stored bucket scan as pushed filters") {
    // q279's registered predicate is so sparse at sf0.001 (~19 rows)
    // that EVERY query exhausts multiprobe and the emitted plan is the
    // backstop alone — so the stored-scan pushdown contract is pinned
    // here with a DENSE two-column conjunction that satisfies at radius
    // 0 and therefore emits the bucket-scan plan
    val df = Similarity.lshTopKFiltered(spark, Sf,
      col("lang").isin("en", "fr", "es", "zh", "de") && col("label") >= 0)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[bkt#\\d+ (INSET|IN)".r
      .findFirstIn(plan).nonEmpty,
      s"probed buckets must prune the bucket table's partitions:\n$plan")
    // [^\n]* not [^\]]*: In(lang, [de,en,...]) itself contains brackets
    assert("PushedFilters: \\[[^\\n]*In\\(lang".r
      .findFirstIn(plan).nonEmpty &&
      "PushedFilters: \\[[^\\n]*GreaterThanOrEqual\\(label,0\\)".r
        .findFirstIn(plan).nonEmpty,
      s"both conjuncts must reach the bucket scan as pushed filters:\n$plan")
  }

  test("q279: the backstop pushes each conjunct to its own corpus scan") {
    // the all-backstop emitted plan is still scan-shape-disciplined:
    // label=1 lands on the embeddings scan and lang='en' on the
    // documents scan as ordinary parquet PushedFilters (the metadata
    // join is filtered BEFORE the join, not after)
    val q = SparkEntry.queries("q279_ann_lsh_filtered_multi")
    q(spark, Sf).collect() // warm the store
    val plan = q(spark, Sf).queryExecution.executedPlan.toString
    assert("PushedFilters: \\[[^\\]]*EqualTo\\(label,1\\)".r
      .findFirstIn(plan).nonEmpty,
      s"label=1 must reach the embeddings scan pushed:\n$plan")
    assert("PushedFilters: \\[[^\\]]*EqualTo\\(lang,en\\)".r
      .findFirstIn(plan).nonEmpty,
      s"lang='en' must reach the documents scan pushed:\n$plan")
  }

  test("multiprobe widening is real: Hamming-1 ids strictly contain the exact ids") {
    val e = graft.common.Tables.load(spark, Sf, "embeddings")
    val v = e.filter(col("vec_id") === 0)
      .select("embedding").collect()(0).getSeq[Float](0).toArray
    val exact = Similarity.multiprobeBucketIdsOf(v, 0).toSet
    val widened = Similarity.multiprobeBucketIdsOf(v, 1).toSet
    assert(exact.subsetOf(widened))
    // 16 tables x (1 exact + 4 one-bit perturbations), all distinct by
    // the table-prefix encoding
    assert(exact.size == 16 && widened.size == 16 * 5,
      s"got ${exact.size} exact / ${widened.size} widened")
  }
}
