package graft

import graft.pipeline.CorpusPipeline
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Incremental CONTAINMENT dedup under the cap-stable contract: the
  * standing `containment_pairs` audit must always equal a fresh q248
  * run over the survivor union with gram dfs computed on the FINAL
  * corpus — candidates appear only via grams under the df cap in the
  * post-batch state, and a standing pair is retracted the moment its
  * every shared gram crosses the cap (its witnesses all became
  * boilerplate, so a rebuild would never even pair the docs).
  *
  * The planted corpus (cap = 3) covers all four transition classes:
  * a new batch-vs-standing pair, a pair retracted by a crossing, pairs
  * AFFECTED by a crossing but still valid via surviving witnesses, and
  * untouched pairs — with rebuild parity asserted after every batch.
  */
class IncrementalContainmentSpec extends AnyFunSuite with SparkSpec with IsolatedIndexRoot {

  private val Cap = 3L

  private def wordsOf(prefix: String, from: Int, to: Int): String =
    (from to to).map(i => s"$prefix$i").mkString(" ")

  private def writeDocs(dir: String, docs: Seq[(Long, String)]): Unit = {
    import spark.implicits._
    docs.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  private def rowsOf(path: String): Set[Seq[Any]] =
    spark.read.parquet(path).collect().map(_.toSeq).toSet

  private def pairIds(out: String): Set[(Long, Long)] =
    spark.read.parquet(s"$out/containment_pairs")
      .select("inner_doc", "outer_doc").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  // base: a long doc L and a snippet S1 inside it (containment 1.0,
  // Jaccard 0.72 — survives near-dup); a second nest I ⊂ O whose ONLY
  // shared grams are the x-block (the pair batch 2 will kill); filler
  private val L = 1L -> wordsOf("l", 1, 40)
  private val S1 = 2L -> wordsOf("l", 1, 30)
  private val I = 3L -> wordsOf("x", 1, 24)
  private val O = 4L -> (wordsOf("x", 1, 24) + " " + wordsOf("y", 1, 16))
  private val baseDocs: Seq[(Long, String)] =
    Seq(L, S1, I, O) ++
      (5L to 9L).map(i => i -> wordsOf(s"f${i}w", 1, 25))

  // batch 1: a second snippet of L (new vs-standing pair) + filler;
  // l-gram dfs reach 3 = cap — nothing crosses yet
  private val batch1: Seq[(Long, String)] = Seq(
    201L -> wordsOf("l", 5, 34),
    202L -> wordsOf("b1w", 1, 25))

  // batch 2: two more copies of the x-block push every x-gram to df 4
  // (> cap) — retracting (I, O), whose only witnesses they were —
  // while a third L snippet both CROSSES the mid-l grams (df 3 → 4,
  // affecting the standing L pairs, which survive via their remaining
  // under-cap witnesses) and creates a new pair with L
  private val batch2: Seq[(Long, String)] = Seq(
    301L -> (wordsOf("x", 1, 24) + " " + wordsOf("z", 1, 6)),
    302L -> (wordsOf("x", 1, 24) + " " + wordsOf("z", 7, 12)),
    303L -> wordsOf("l", 11, 40))

  test("incremental containment = rebuild after every batch, " +
      "including a cap-crossing retraction") {
    import spark.implicits._
    val baseDir = java.nio.file.Files.createTempDirectory("ct_base").toString
    val out = java.nio.file.Files.createTempDirectory("ct_out").toString
    writeDocs(baseDir, baseDocs)
    CorpusPipeline.run(spark, baseDir, out, containCap = Cap)

    // base state: the two nests are the only pairs
    assert(pairIds(out) == Set((2L, 1L), (3L, 4L)))

    // ---- batch 1: new vs-standing pair, no crossings ----
    val shingledBefore = graft.queries.Dedup.shingledDocCount.get()
    val r1 = CorpusPipeline.runIncremental(spark, out,
      batch1.toDF("doc_id", "text"))
    // containment maintenance re-shingles NOTHING: the delta is still
    // exactly the near-dup stage's batch-only shingling
    assert(graft.queries.Dedup.shingledDocCount.get() - shingledBefore
      == r1.nNewDocs + r1.nNearDup)
    assert(r1.nContainmentPairs == 3)
    assert(pairIds(out) == Set((2L, 1L), (3L, 4L), (201L, 1L)))

    // ---- batch 2: crossing retracts (3,4); (2,1)/(201,1) are
    // affected but survive; (303,1) is new ----
    val r2 = CorpusPipeline.runIncremental(spark, out,
      batch2.toDF("doc_id", "text"))
    assert(r2.nContainmentPairs == 3)
    assert(pairIds(out) == Set((2L, 1L), (201L, 1L), (303L, 1L)))

    // ---- rebuild parity on the FULL artifact rows, not just ids ----
    val fullDir = java.nio.file.Files.createTempDirectory("ct_full").toString
    val outFull = java.nio.file.Files.createTempDirectory("ct_ofull").toString
    writeDocs(fullDir, baseDocs ++ batch1 ++ batch2)
    val full = CorpusPipeline.run(spark, fullDir, outFull,
      containCap = Cap)
    assert(r2.summary == full)
    assert(rowsOf(s"$out/containment_pairs")
      == rowsOf(s"$outFull/containment_pairs"))
    assert(rowsOf(s"$out/overcap_grams") == rowsOf(s"$outFull/overcap_grams"))
    assert(rowsOf(s"$out/lsh_index") == rowsOf(s"$outFull/lsh_index"))
    assert(rowsOf(s"$out/packed") == rowsOf(s"$outFull/packed"))

    // the crossing really happened: 20 x-grams + 16 mid-l grams
    assert(spark.read.parquet(s"$out/overcap_grams").count() == 36)
  }

  test("a crash-replayed batch leaves the pair table at the same " +
      "fixed point") {
    import spark.implicits._
    val baseDir = java.nio.file.Files.createTempDirectory("ct_rb").toString
    val out = java.nio.file.Files.createTempDirectory("ct_ro").toString
    writeDocs(baseDir, baseDocs)
    CorpusPipeline.run(spark, baseDir, out, containCap = Cap)
    CorpusPipeline.runIncremental(spark, out, batch1.toDF("doc_id", "text"))

    // the hardest replay: every artifact write of batch 2 (lsh ingest,
    // pair-table swap, overcap append, packed swap) landed, but the
    // sidecar commit was lost — simulated by restoring the pre-batch
    // sidecar after a full run. The replay re-executes the whole stage
    // against the already-mutated artifacts and must converge to the
    // identical state: batch pairs re-verify to the same rows (the
    // final distinct collapses them), the tombstone re-retracts
    // nothing new, and the overcap ingest file overwrites itself.
    val sidecar = java.nio.file.Paths.get(s"$out/corpus_stats.json")
    val preBatch = java.nio.file.Files.readString(sidecar)
    val b2 = batch2.toDF("doc_id", "text")
    val r1 = CorpusPipeline.runIncremental(spark, out, b2)
    val pairsAfter = rowsOf(s"$out/containment_pairs")
    val overcapAfter = rowsOf(s"$out/overcap_grams")
    java.nio.file.Files.writeString(sidecar, preBatch) // "crash"
    val r2 = CorpusPipeline.runIncremental(spark, out, b2)
    assert(r2 == r1)
    assert(rowsOf(s"$out/containment_pairs") == pairsAfter)
    assert(rowsOf(s"$out/overcap_grams") == overcapAfter)
  }

  test("refuses a standing corpus without containment artifacts") {
    import spark.implicits._
    val baseDir = java.nio.file.Files.createTempDirectory("ct_nb").toString
    val out = java.nio.file.Files.createTempDirectory("ct_no").toString
    writeDocs(baseDir, baseDocs)
    CorpusPipeline.run(spark, baseDir, out, containCap = Cap)
    // simulate a pre-containment standing corpus
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$out/containment_pairs"), true)
    val e = intercept[IllegalArgumentException] {
      CorpusPipeline.runIncremental(spark, out,
        batch1.toDF("doc_id", "text"))
    }
    assert(e.getMessage.contains("full rebuild"))
  }
}
