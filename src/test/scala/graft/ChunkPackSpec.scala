package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariant specs for the sequence-chunking (q65), incremental-dedup
  * (q66), and sequence-packing (q67) operators. Exact value parity is
  * the driver's DuckDB oracle; here we assert the structural guarantees
  * that make the operators safe to compose in a training pipeline:
  * chunking loses no tokens, incremental dedup classifies every batch
  * doc exactly once with a canonical survivor, packing respects the
  * token budget.
  */
class ChunkPackSpec extends AnyFunSuite with SparkSpec {

  private def wordsOf: Map[Long, Vector[String]] = {
    import graft.functions.Text.words
    spark.read.parquet(s"$Sf/documents.parquet")
      .select(col("doc_id"), words(col("text")))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toVector)
      .toMap
  }

  test("q65: chunks cover every token exactly, in order, per doc") {
    val w = wordsOf
    val chunks = SparkEntry.queries("q65_doc_chunks")(spark, Sf)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .groupBy(_._1)
    assert(chunks.keySet == w.keySet)
    import graft.queries.TextOps.{ChunkLen, ChunkStride}
    chunks.foreach { case (id, cs) =>
      val n = w(id).length
      val starts = Range(0, math.max(n, 1), ChunkStride)
      assert(cs.length == starts.length, s"doc $id chunk count")
      cs.sortBy(_._2).zip(starts).foreach { case ((_, cid, nt, text), st) =>
        assert(cid == st / ChunkStride)
        val expect = w(id).slice(st, math.min(st + ChunkLen, n))
        assert(nt == expect.length, s"doc $id chunk $cid length")
        assert(text == expect.mkString(" "), s"doc $id chunk $cid text")
      }
    }
  }

  test("q66: every batch doc classified once with a canonical survivor") {
    val rows = SparkEntry.queries("q66_dedup_incremental")(spark, Sf)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    val batchIds = spark.read.parquet(s"$Sf/documents.parquet")
      .filter(col("doc_id") % 5 === 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(rows.map(_._1).toSet == batchIds && rows.length == batchIds.size)
    rows.groupBy(_._2).foreach { case (hash, group) =>
      val keeps = group.map(_._4).distinct
      assert(keeps.length == 1, s"hash $hash has ${keeps.length} survivors")
      val keep = keeps.head
      group.foreach { case (id, _, status, _) =>
        status match {
          case "dup_of_corpus" =>
            assert(keep % 5 != 0, "corpus survivor must be a corpus doc")
          case "new" =>
            assert(keep == id, "a new doc is its own survivor")
          case "dup_in_batch" =>
            assert(keep % 5 == 0 && keep < id,
              "in-batch dup must point at an earlier batch doc")
          case other => fail(s"unknown status $other")
        }
      }
      // statuses within one hash are homogeneous-or-ordered: either all
      // dup_of_corpus, or exactly one 'new' (the min id) + dups after it
      if (group.exists(_._3 != "dup_of_corpus")) {
        val news = group.filter(_._3 == "new")
        assert(news.length == 1 && news.head._1 == group.map(_._1).min)
      }
    }
  }

  test("q66 core: planted duplicates hit every status branch") {
    // the natural corpus has no exact duplicates (q34 shows one copy per
    // hash), so plant them: corpus = ids 1-3, batch = ids 10,15,20,25
    val session = spark
    import session.implicits._
    val docs = Seq(
      (1L, "alpha beta"), (2L, "gamma delta"), (3L, "unique corpus text"),
      (10L, "Alpha   beta"), // dup_of_corpus (normalizes to doc 1's text)
      (15L, "fresh batch text"), // new
      (20L, "fresh  BATCH text"), // dup_in_batch of 15
      (25L, "another new one") // new
    ).toDF("doc_id", "text")
    val out = graft.queries.Dedup
      .incrementalExactFrom(docs, col("doc_id") >= 10)
      .collect()
      .map(r => r.getLong(0) -> (r.getString(2), r.getLong(3)))
      .toMap
    assert(out == Map(
      10L -> ("dup_of_corpus", 1L),
      15L -> ("new", 15L),
      20L -> ("dup_in_batch", 15L),
      25L -> ("new", 25L)))
  }

  test("q66 agrees with q34's global copy counts") {
    val inc = SparkEntry.queries("q66_dedup_incremental")(spark, Sf)
      .groupBy("content_hash").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val global = SparkEntry.queries("q34_dedup_exact")(spark, Sf)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    // batch rows per hash can never exceed the hash's global copy count
    inc.foreach { case (h, n) =>
      assert(global.contains(h) && n <= global(h))
    }
  }

  test("q69 core: planted benchmark overlap is detected, clean docs report zero") {
    val session = spark
    import session.implicits._
    val bench = "the quick brown fox jumps over the lazy dog tonight"
    val docs = Seq(
      (100L, bench), // benchmark doc
      // training doc embedding a benchmark 5-gram run verbatim
      (1L, s"intro words then $bench and a tail"),
      (2L, "completely unrelated training text with enough words here")
    ).toDF("doc_id", "text")
    val out = graft.queries.Dedup
      .decontaminationFrom(docs.sparkSession, docs, col("doc_id") === 100L)
      .collect()
      .map(r => r.getLong(0) -> (r.getInt(2), r.getBoolean(4)))
      .toMap
    assert(out.keySet == Set(1L, 2L))
    val (shared1, flag1) = out(1L)
    // all 6 of the benchmark's 5-grams appear contiguously in doc 1
    assert(shared1 == 6 && flag1, s"doc 1 reported $shared1 shared grams")
    assert(out(2L) == ((0, false)), "clean doc must report zero overlap")
  }

  test("q67: packs respect the budget and are dense in doc order") {
    import graft.queries.Packing.{GroupSize, PackBudget}
    val rows = SparkEntry.queries("q67_sequence_packing")(spark, Sf)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3)))
    val nDocs = spark.read.parquet(s"$Sf/documents.parquet").count()
    assert(rows.length.toLong == nDocs, "one row per document")
    rows.foreach { case (g, _, id, _) => assert(g == id / GroupSize) }
    rows.groupBy(_._1).foreach { case (g, docs) =>
      val byId = docs.sortBy(_._3)
      // pack_seq starts at 0, advances by at most 1, never decreases
      byId.foldLeft(-1) { case (prev, (_, seq, _, _)) =>
        assert(seq == prev || seq == prev + 1, s"group $g pack_seq gap")
        seq
      }
      byId.groupBy(_._2).foreach { case (seq, pack) =>
        val total = pack.map(_._4.toLong).sum
        assert(total <= PackBudget || pack.length == 1,
          s"group $g pack $seq overflows with ${pack.length} docs")
      }
    }
  }

  test("q256/q257: token-true packs count in q98's BPE tokens and match a local next-fit") {
    import graft.queries.Packing.{GroupSize, TokenPackBudget}
    val rows = SparkEntry.queries("q256_token_packing")(spark, Sf)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    // n_tokens per doc IS q98's n_bpe_tokens — the learned-token count,
    // not the word proxy
    val q98 = SparkEntry.queries("q98_bpe_tokenize")(spark, Sf)
      .select("doc_id", "n_bpe_tokens").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.length == q98.size, "one pack row per tokenized doc")
    rows.foreach { case (g, _, id, n) =>
      assert(g == id / GroupSize)
      assert(n == q98(id), s"doc $id n_tokens $n != q98 ${q98(id)}")
    }
    // pack_seq matches a local next-fit replay over (doc order, q98 counts)
    rows.groupBy(_._1).foreach { case (g, docs) =>
      var acc = 0L
      var pack = 0
      var first = true
      docs.sortBy(_._3).foreach { case (_, seq, id, n) =>
        if (first) { acc = n; first = false }
        else if (acc + n > TokenPackBudget) { pack += 1; acc = n }
        else acc += n
        assert(seq == pack, s"group $g doc $id pack_seq $seq != $pack")
      }
    }
    // q257 aggregates q256 exactly
    val eff = SparkEntry.queries("q257_token_packing_efficiency")(spark, Sf)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val local = rows.groupBy(t => (t._1, t._2)).map { case (k, ds) =>
      k -> (ds.length.toLong, ds.map(_._4).sum)
    }
    assert(eff.keySet == local.keySet)
    local.foreach { case (k, (nd, tok)) =>
      val (en, et, ef) = eff(k)
      assert(en == nd && et == tok)
      assert(ef == tok.toDouble / TokenPackBudget.toDouble)
    }
  }
}
