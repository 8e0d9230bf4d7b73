package graft

import graft.pipeline.CorpusPipeline
import graft.queries.Packing
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end corpus preparation: quality → dedup → decontaminate →
  * chunk → pack, against real testdata into a temp dir.
  */
class CorpusPipelineSpec extends AnyFunSuite with SparkSpec with IsolatedIndexRoot {

  private lazy val out =
    java.nio.file.Files.createTempDirectory("corpus").toString
  private lazy val summary = CorpusPipeline.run(spark, Sf, out)

  test("funnel counts are monotone and nothing is invented") {
    assert(summary.nInput > 0)
    assert(summary.nAfterQuality <= summary.nInput)
    assert(summary.nAfterDedup <= summary.nAfterQuality)
    assert(summary.nAfterDecontam <= summary.nAfterDedup)
    // every surviving doc chunks into >= 1 chunk
    assert(summary.nChunks >= summary.nAfterDecontam)
    assert(summary.nPacks > 0 && summary.nPacks <= summary.nChunks)
  }

  test("benchmark docs are excluded from the packed corpus") {
    val ids = spark.read.parquet(s"$out/packed")
      .select("doc_id").distinct().collect().map(_.getLong(0))
    assert(ids.nonEmpty && ids.forall(_ % 50 != 0))
  }

  test("packs respect the token budget (oversized singletons allowed)") {
    val bad = spark.read.parquet(s"$out/packed")
      .groupBy("pack_group", "pack_seq")
      .agg(sum("n_tokens").as("tok"), count(lit(1)).as("n"))
      .filter(col("tok") > Packing.PackBudget && col("n") > 1)
      .count()
    assert(bad == 0)
  }

  test("a document's chunks stay contiguous and ordered through packing") {
    val rows = spark.read.parquet(s"$out/packed")
      .select("pack_group", "pack_seq", "doc_id", "chunk_id")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3)))
    rows.groupBy(_._1).foreach { case (g, inGroup) =>
      // within a group, ordering by (pack_seq, doc_id, chunk_id) must
      // list every doc's chunks consecutively and in chunk order
      val ordered = inGroup.sortBy(t => (t._2, t._3, t._4))
      ordered.groupBy(_._3).foreach { case (doc, cs) =>
        val seq = cs.sortBy(_._4).map(_._4).toSeq
        assert(seq == (seq.min to seq.max).toSeq,
          s"group $g doc $doc chunk ids not consecutive")
        // chunks of one doc never interleave with another doc's between
        // positions in the ordered pack stream
        val pos = ordered.zipWithIndex.filter(_._1._3 == doc).map(_._2).toSeq
        assert(pos == (pos.min to pos.max).toSeq,
          s"group $g doc $doc chunks interleaved")
      }
    }
  }

  test("stats sidecar matches the summary") {
    val json = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/corpus_stats.json"))
    assert(json.contains(s""""n_chunks": ${summary.nChunks}""") ||
      json.contains(s""""n_chunks":${summary.nChunks}"""))
    assert(json.contains(summary.packedTokens.toString))
  }

  test("rerun overwrites cleanly and is deterministic") {
    val again = CorpusPipeline.run(spark, Sf, out)
    assert(again == summary)
  }

  test("curation drops auto-tombstone every ANN index: probes exclude them, builds flat") {
    // round-15 (VERDICT task 2): before this wiring a curated-out doc
    // stayed servable from ANN until someone ran `IndexMain
    // --tombstone`. The lazy `summary` above has already run the pass
    // under this suite's private index root, so the tombstones exist.
    import graft.tables.IndexStore
    val curated = spark.read.parquet(s"$out/packed")
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    val dropped = IndexStore.tombstoneIds(spark, "ivf_index", Sf).toSet
    assert(dropped.nonEmpty, "this corpus has known near-dup/exact drops")
    assert((dropped & curated).isEmpty,
      "a surviving doc must never be tombstoned")
    Seq("lsh_index", "pq_index", "nsw_index").foreach { k =>
      assert(IndexStore.tombstoneIds(spark, k, Sf).toSet == dropped,
        s"$k must carry the same drop set")
    }
    // warm the indexes AFTER the drops exist (first resolve under this
    // suite's fresh root legitimately builds them), then assert every
    // serve path — plain and filtered, scan and backstop — excludes
    // every dropped id
    Seq("q54_ann_ivf", "q39_ann_lsh", "q87_ann_ivfpq", "q211_ann_graph",
      "q273_ann_filtered", "q275_ann_ivfpq_filtered",
      "q276_ann_lsh_filtered", "q274_ann_graph_filtered").foreach { q =>
      val served = SparkEntry.queries(q)(spark, Sf)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      assert((served & dropped).isEmpty,
        s"$q serves a curation-dropped doc")
    }
    // a SECOND curation pass re-derives the same drops: idempotent
    // (no duplicate tombstone growth), and the re-add of an already-
    // live set must not rebuild a standing index
    import graft.queries.IvfPq
    val encodesWarm = IvfPq.encodeCount.get()
    val graphsWarm = queries.GraphAnn.graphBuildCount.get()
    CorpusPipeline.run(spark, Sf, out)
    assert(IndexStore.tombstoneIds(spark, "ivf_index", Sf).toSet == dropped)
    assert(IvfPq.encodeCount.get() == encodesWarm &&
      queries.GraphAnn.graphBuildCount.get() == graphsWarm,
      "curation tombstones must never trigger an index rebuild")
  }

  test("a verbatim copy of a deduped-away or quality-dropped benchmark " +
    "doc is still decontaminated") {
    import spark.implicits._
    // 25 distinct words: passes the quality floor, yields 5-grams
    val benchText = (1 to 25).map(i => s"alpha$i").mkString(" ")
    // 10 words: FAILS the quality floor (MinWords = 20)
    val shortBench = (1 to 10).map(i => s"beta$i").mkString(" ")
    val docs = Seq(
      // training doc 3 is a verbatim copy of bench doc 50; under the
      // min-doc_id survivor rule doc 3 wins dedup and doc 50 vanishes
      // from the cleaned frame
      (3L, benchText),
      (50L, benchText),
      // bench doc 100 fails quality outright; training doc 7 embeds its
      // full text (shares its 5-grams) inside a quality-passing doc
      (7L, shortBench + " " + (1 to 15).map(i => s"pad$i").mkString(" ")),
      (100L, shortBench),
      // clean training doc: survives everything
      (9L, (1 to 25).map(i => s"gamma$i").mkString(" "))
    ).toDF("doc_id", "text")
    val isBench = col("doc_id") % 50 === 0
    val cleaned = CorpusPipeline.cleanDocs(docs)
    // precondition: neither bench doc is in the cleaned frame, so a gram
    // set built from the cleaned slice would be empty — the bug ADVICE
    // flagged
    assert(cleaned.filter(isBench).count() == 0)
    val kept = CorpusPipeline.decontaminate(spark, docs, cleaned, isBench)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!kept.contains(3L), "verbatim copy of a deduped bench doc leaked")
    assert(!kept.contains(7L),
      "doc sharing grams with a quality-dropped bench doc leaked")
    assert(kept == Set(9L))
  }

  test("a gram-less (under-5-word) doc is kept, not silently dropped") {
    import spark.implicits._
    // decontaminate takes arbitrary frames; a doc under 5 words yields
    // zero 5-grams, so the audit has no row for it — it shares nothing
    // with the benchmark and must survive (the old inner-join shape
    // dropped it)
    val docs = Seq(
      (2L, "tiny doc here"), // 3 words: no 5-grams
      (4L, (1 to 25).map(i => s"delta$i").mkString(" ")),
      (50L, (1 to 25).map(i => s"epsilon$i").mkString(" "))
    ).toDF("doc_id", "text")
    val kept = CorpusPipeline.decontaminate(
      spark, docs, docs, col("doc_id") % 50 === 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 4L))
  }
}
