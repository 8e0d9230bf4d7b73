package graft

import graft.pipeline.CorpusPipeline
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Incremental corpus preparation: a second batch processed against a
  * standing run's output must reproduce the full rebuild bit-for-bit
  * while touching only the new docs and the pack groups they land in.
  */
class IncrementalCorpusSpec extends AnyFunSuite with SparkSpec {

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

  // batch: append-only ids 121..128, all in pack group 2 — which the
  // base corpus (ids 100..119) already occupies, so the repack must
  // merge old and new chunks of a MIXED group
  private val batchDocs: Seq[(Long, String)] = Seq(
    121L -> txt(7), // verbatim copy of corpus doc 7 → dup_of_corpus
    122L -> txt(900), // new; survives
    123L -> txt(900), // in-batch duplicate of 122 → dropped
    124L -> txt(50), // verbatim copy of BENCH doc 50 → dup_of_corpus
    125L -> (txt(50) + " extra tail words here"), // shares bench grams → decontaminated
    126L -> "tiny five word doc", // quality reject
    127L -> txt(901), // new; survives
    128L -> txt(902)) // new; survives

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
    val res = CorpusPipeline.runIncremental(spark, outInc, batch)
    val full = CorpusPipeline.run(spark, fullDir, outFull)

    // the TOTAL summary after the incremental run equals the rebuild's
    assert(res.summary == full)

    // and so do the materialized outputs, row for row
    assert(rowsOf(s"$outInc/packed") == rowsOf(s"$outFull/packed"))
    assert(rowsOf(s"$outInc/chunks") == rowsOf(s"$outFull/chunks"))
    assert(rowsOf(s"$outInc/hash_index") == rowsOf(s"$outFull/hash_index"))

    // only the batch was processed: 8 docs in, 6 past quality (126 and
    // the in-batch dup's SECOND copy still count toward quality — the
    // floor drops only 126), 4 genuinely new after the index join
    // (122, 125, 127, 128), and exactly pack group 2 repacked
    assert(res.nBatch == 8)
    assert(res.nBatchQuality == 7)
    assert(res.nNewDocs == 4)
    assert(res.repackedGroups == Seq(2L))
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
