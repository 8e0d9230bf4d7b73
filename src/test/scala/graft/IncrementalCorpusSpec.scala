package graft

import graft.pipeline.CorpusPipeline
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Incremental corpus preparation: a second batch processed against a
  * standing run's output must reproduce the full rebuild bit-for-bit
  * while touching only the new docs and the pack groups they land in.
  */
class IncrementalCorpusSpec extends AnyFunSuite with SparkSpec with IsolatedIndexRoot {

  /** 25 distinct words, unique to the seed — passes the quality floor
    * and shares no 5-grams across seeds.
    */
  private def txt(seed: Long): String =
    (1 to 25).map(i => s"w${seed}x$i").mkString(" ")

  private def writeDocs(dir: String, docs: Seq[(Long, String)]): Unit = {
    import spark.implicits._
    docs.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  private def rowsOf(path: String): Set[Seq[Any]] =
    spark.read.parquet(path).collect().map(_.toSeq).toSet

  // base corpus: ids 0..119 (bench docs at 0/50/100 by the %50 rule),
  // one quality-reject at 30
  private val baseDocs: Seq[(Long, String)] =
    (0L until 120L).map(i =>
      i -> (if (i == 30L) "short doc under the floor" else txt(i)))

  // batch: append-only ids 121..131, all in pack group 2 — which the
  // base corpus (ids 100..119) already occupies, so the repack must
  // merge old and new chunks of a MIXED group
  private val batchDocs: Seq[(Long, String)] = Seq(
    121L -> txt(7), // verbatim copy of corpus doc 7 → dup_of_corpus
    122L -> txt(900), // new; survives
    123L -> txt(900), // in-batch duplicate of 122 → dropped
    124L -> txt(50), // verbatim copy of BENCH doc 50 → dup_of_corpus
    125L -> (txt(50) + " extra tail words here"), // NEAR-dup of bench doc 50 (J = 21/25 = 0.84) → near-dup drop
    126L -> "tiny five word doc", // quality reject
    127L -> txt(901), // new; survives
    128L -> txt(902), // new; survives
    129L -> (txt(20) + " tailone tailtwo"), // NEAR-dup of STANDING doc 20 (J = 21/23 ≈ 0.91) → near-dup drop
    130L -> txt(903), // new; survives (and drops 131)
    131L -> (txt(903) + " tailthree")) // in-batch NEAR-dup of 130 (J = 21/22 ≈ 0.95) → near-dup drop

  test("incremental run = full rebuild, processing only the batch") {
    import spark.implicits._
    val baseDir = java.nio.file.Files.createTempDirectory("inc_base").toString
    val fullDir = java.nio.file.Files.createTempDirectory("inc_full").toString
    val outInc = java.nio.file.Files.createTempDirectory("inc_out").toString
    val outFull = java.nio.file.Files.createTempDirectory("full_out").toString
    writeDocs(baseDir, baseDocs)
    writeDocs(fullDir, baseDocs ++ batchDocs)

    CorpusPipeline.run(spark, baseDir, outInc)
    val batch: DataFrame = batchDocs.toDF("doc_id", "text")
    // scan counter: the incremental near-dup stage must shingle ONLY
    // batch-derived rows, never the standing corpus
    val shingledBefore = graft.queries.Dedup.shingledDocCount.get()
    val res = CorpusPipeline.runIncremental(spark, outInc, batch)
    val shingledDelta = graft.queries.Dedup.shingledDocCount.get() - shingledBefore
    val full = CorpusPipeline.run(spark, fullDir, outFull)

    // the TOTAL summary after the incremental run equals the rebuild's
    assert(res.summary == full)

    // and so do the materialized outputs, row for row — including the
    // standing LSH index the NEXT batch will near-dup against
    assert(rowsOf(s"$outInc/packed") == rowsOf(s"$outFull/packed"))
    assert(rowsOf(s"$outInc/chunks") == rowsOf(s"$outFull/chunks"))
    assert(rowsOf(s"$outInc/hash_index") == rowsOf(s"$outFull/hash_index"))
    assert(rowsOf(s"$outInc/lsh_index") == rowsOf(s"$outFull/lsh_index"))

    // only the batch was processed: 11 docs in, 10 past quality (the
    // floor drops only 126), 7 genuinely new after the exact index join
    // (122, 125, 127, 128, 129, 130, 131), 4 past near-dup (122, 127,
    // 128, 130 — 125 near-dups bench doc 50, 129 near-dups standing
    // doc 20, 131 near-dups its in-batch sibling 130), and exactly
    // pack group 2 repacked
    assert(res.nBatch == 11)
    assert(res.nBatchQuality == 10)
    assert(res.nNewDocs == 7)
    assert(res.nNearDup == 4)
    assert(res.repackedGroups == Seq(2L))

    // the near-dup stage shingled batch docs only: the exact survivors
    // once for the signature pass + the near-dup survivors once for the
    // index append — nowhere near the 119-doc standing corpus
    assert(shingledDelta == res.nNewDocs + res.nNearDup,
      s"expected batch-only shingling, got $shingledDelta")
  }

  test("refuses a batch that extends the benchmark slice") {
    import spark.implicits._
    val baseDir = java.nio.file.Files.createTempDirectory("inc_b2").toString
    val out = java.nio.file.Files.createTempDirectory("inc_o2").toString
    writeDocs(baseDir, baseDocs)
    CorpusPipeline.run(spark, baseDir, out)
    val e = intercept[IllegalArgumentException] {
      CorpusPipeline.runIncremental(spark, out,
        Seq(150L -> txt(950)).toDF("doc_id", "text"))
    }
    assert(e.getMessage.contains("full rebuild"))
  }

  test("refuses non-append-only ids") {
    import spark.implicits._
    val baseDir = java.nio.file.Files.createTempDirectory("inc_b3").toString
    val out = java.nio.file.Files.createTempDirectory("inc_o3").toString
    writeDocs(baseDir, baseDocs)
    CorpusPipeline.run(spark, baseDir, out)
    val e = intercept[IllegalArgumentException] {
      CorpusPipeline.runIncremental(spark, out,
        Seq(42L -> txt(951)).toDF("doc_id", "text"))
    }
    assert(e.getMessage.contains("append-only"))
  }
}
