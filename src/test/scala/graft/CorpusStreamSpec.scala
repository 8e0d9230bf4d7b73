package graft

import graft.pipeline.CorpusPipeline
import graft.streaming.CorpusStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming corpus ingestion: files draining through the checkpointed
  * file source must fold into the standing corpus exactly like the
  * batch incremental path — and a restart must skip already-folded
  * files (the checkpoint IS the exactly-once ledger).
  */
class CorpusStreamSpec extends AnyFunSuite with SparkSpec {

  private def txt(seed: Long): String =
    (1 to 25).map(i => s"s${seed}v$i").mkString(" ")

  private def writeDocs(path: String, docs: Seq[(Long, String)]): Unit = {
    import spark.implicits._
    docs.toDF("doc_id", "text").coalesce(1)
      .write.mode("append").parquet(path)
  }

  private def rowsOf(path: String): Set[Seq[Any]] =
    spark.read.parquet(path).collect().map(_.toSeq).toSet

  test("drain, fold, restart-skip: streaming ingest = full rebuild") {
    val baseDir = java.nio.file.Files.createTempDirectory("cs_base").toString
    val srcDir = java.nio.file.Files.createTempDirectory("cs_src").toString +
      "/incoming"
    val ckpt = java.nio.file.Files.createTempDirectory("cs_ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("cs_out").toString
    val fullDir = java.nio.file.Files.createTempDirectory("cs_full").toString
    val outFull = java.nio.file.Files.createTempDirectory("cs_ofull").toString

    // standing corpus: ids 0..99 (bench docs at 0/50 by the %50 rule)
    val base = (0L until 100L).map(i => i -> txt(i))
    writeDocs(s"$baseDir/documents.parquet", base)
    CorpusPipeline.run(spark, baseDir, out)

    // batch 1 lands: one new, one verbatim corpus dup, one quality reject
    val batch1 = Seq(120L -> txt(500), 121L -> txt(7),
      122L -> "short reject doc")
    writeDocs(srcDir, batch1)
    val r1 = CorpusStream.ingestAvailable(spark, srcDir, out, ckpt)
    assert(r1.map(_.nBatch).sum == 3 && r1.map(_.nNewDocs).sum == 1)

    // batch 2 lands later; the restarted stream must process ONLY it
    val batch2 = Seq(130L -> txt(501), 131L -> txt(502))
    writeDocs(srcDir, batch2)
    val r2 = CorpusStream.ingestAvailable(spark, srcDir, out, ckpt)
    assert(r2.map(_.nBatch).sum == 2 && r2.map(_.nNewDocs).sum == 2,
      s"restart must fold only the new file: $r2")

    // nothing new: the checkpoint skips everything
    val r3 = CorpusStream.ingestAvailable(spark, srcDir, out, ckpt)
    assert(r3.isEmpty, s"no-new-files drain must fold nothing: $r3")

    // the streamed corpus equals a full rebuild over everything
    writeDocs(s"$fullDir/documents.parquet", base ++ batch1 ++ batch2)
    val full = CorpusPipeline.run(spark, fullDir, outFull)
    assert(r2.last.summary == full)
    assert(rowsOf(s"$out/packed") == rowsOf(s"$outFull/packed"))
    assert(rowsOf(s"$out/chunks") == rowsOf(s"$outFull/chunks"))
    assert(rowsOf(s"$out/hash_index") == rowsOf(s"$outFull/hash_index"))
  }
}
