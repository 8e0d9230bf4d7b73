package graft

import graft.queries.BpeVocab
import org.scalatest.funsuite.AnyFunSuite

/** BPE vocabulary learning: exact hand-computed merges on the classic
  * Sennrich-style corpus, merge-application edge cases, and the
  * local-vs-distributed path equivalence that lets the operator claim
  * one semantics at every scale.
  */
class BpeVocabSpec extends AnyFunSuite with SparkSpec {

  test("hand-computed merges on the classic 4-word corpus") {
    // low×5 lower×2 newest×6 widest×3 — the worked example of the BPE
    // paper. Hand-derived: (e,s)=9 ties (s,t),(t,</w>) and wins on lhs;
    // then (es,t)=9, (est,</w>)=9, (l,o)=7 ties (o,w) and wins, (lo,w)=7.
    // Base vocab: 10 distinct chars + the end marker = 11.
    val types = Array(("low", 5L), ("lower", 2L), ("newest", 6L),
      ("widest", 3L))
    val m = BpeVocab.mergesLocal(types, 5)
    val expected = Seq(
      BpeVocab.Merge(1, "e", "s", "es", 9L, 12),
      BpeVocab.Merge(2, "es", "t", "est", 9L, 13),
      BpeVocab.Merge(3, "est", "</w>", "est</w>", 9L, 14),
      BpeVocab.Merge(4, "l", "o", "lo", 7L, 15),
      BpeVocab.Merge(5, "lo", "w", "low", 7L, 16))
    assert(m == expected)
  }

  test("merge application is left-to-right non-overlapping") {
    // "aaa" under (a,a): the first pair merges, scanning resumes past
    // it — ["aa","a"], never ["aa","aa"] or ["a","aa"]
    assert(BpeVocab.applyMerge(Array("a", "a", "a"), "a", "a").toSeq ==
      Seq("aa", "a"))
    assert(BpeVocab.applyMerge(Array("a", "a", "a", "a"), "a", "a").toSeq ==
      Seq("aa", "aa"))
    assert(BpeVocab.applyMerge(Array("x", "y"), "a", "a").toSeq ==
      Seq("x", "y"))
  }

  test("merge loop stops when no pairs remain") {
    // a 1-char word is [c, </w>] — one pair, then a single symbol
    val m = BpeVocab.mergesLocal(Array(("a", 3L)), 10)
    assert(m == Seq(BpeVocab.Merge(1, "a", "</w>", "a</w>", 3L, 3)))
  }

  test("distributed pair-count path is bit-identical to the driver loop") {
    import spark.implicits._
    val types = BpeVocab.wordTypes(spark, Sf)
    val local = BpeVocab.mergesLocal(
      types.as[(String, Long)].collect().sortBy(_._1), 8)
    val dist = BpeVocab.mergesDistributed(spark, types, 8)
    assert(local == dist)
  }

  test("encodeWord reproduces the trainer's segmentation") {
    // ranks from the classic corpus above; "lowest" was never a training
    // word yet segments into the learned units low + est</w>
    val ranks = Map(("e", "s") -> 1, ("es", "t") -> 2,
      ("est", "</w>") -> 3, ("l", "o") -> 4, ("lo", "w") -> 5)
    assert(BpeVocab.encodeWord("lowest", ranks).toSeq ==
      Seq("low", "est</w>"))
    assert(BpeVocab.encodeWord("newest", ranks).toSeq ==
      Seq("n", "e", "w", "est</w>"))
    assert(BpeVocab.encodeWord("low", ranks).toSeq == Seq("low", "</w>"))
    // no applicable merges: stays fully split
    assert(BpeVocab.encodeWord("hi", ranks).toSeq ==
      Seq("h", "i", "</w>"))
  }

  test("q98 tokenize: segmentation spells each document exactly") {
    import org.apache.spark.sql.functions._
    import graft.functions.Text
    val seg = SparkEntry.queries("q98_bpe_tokenize")(spark, Sf)
    val src = graft.common.Tables.load(spark, Sf, "documents")
      .select(col("doc_id"), Text.norm(col("text")).as("norm"))
    val joined = seg.join(src, "doc_id")
    assert(joined.count() > 0)
    val bad = joined.filter(
      regexp_replace(col("seg"), BpeVocab.SegMark.toString, "") =!=
        col("norm") ||
      col("n_bpe_tokens") < col("n_words") ||
      col("n_chars_norm") =!= length(col("norm")))
    assert(bad.count() == 0)
  }

  test("one training serves q94 and q98 in a session (merge memo)") {
    BpeVocab.clearMergeSessionCache()
    val before = BpeVocab.trainCount.get()
    SparkEntry.queries("q94_bpe_merges")(spark, Sf).collect()
    SparkEntry.queries("q98_bpe_tokenize")(spark, Sf).collect()
    SparkEntry.queries("q94_bpe_merges")(spark, Sf).collect()
    assert(BpeVocab.trainCount.get() == before + 1)
  }

  test("q94 registry output: dense ranks, consistent vocab accounting") {
    val rows = SparkEntry.queries("q94_bpe_merges")(spark, Sf)
      .orderBy("merge_rank").collect()
    assert(rows.length == BpeVocab.NumMerges)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Int]("merge_rank") == i + 1)
      assert(r.getAs[String]("merged") ==
        r.getAs[String]("lhs") + r.getAs[String]("rhs"))
      assert(r.getAs[Long]("pair_n") > 0L)
    }
    // vocab_size strictly increments with rank off one base
    val base = rows.head.getAs[Int]("vocab_size") - 1
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Int]("vocab_size") == base + i + 1)
    }
  }
}
