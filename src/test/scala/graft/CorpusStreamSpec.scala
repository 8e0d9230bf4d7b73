package graft

import graft.pipeline.CorpusPipeline
import graft.streaming.CorpusStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming corpus ingestion: files draining through the checkpointed
  * file source must fold into the standing corpus exactly like the
  * batch incremental path — and a restart must skip already-folded
  * files (the checkpoint IS the exactly-once ledger).
  */
class CorpusStreamSpec extends AnyFunSuite with SparkSpec with IsolatedIndexRoot {

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

    // standing corpus: ids 0..99 (bench docs at 0/50 by the %50 rule);
    // doc 99 is LONG so a later streamed snippet of it exercises the
    // containment stage (high containment, sub-0.8 Jaccard)
    val longText = (1 to 40).map(i => s"s99v$i").mkString(" ")
    val base = (0L until 99L).map(i => i -> txt(i)) :+ (99L -> longText)
    writeDocs(s"$baseDir/documents.parquet", base)
    CorpusPipeline.run(spark, baseDir, out)

    // batch 1 lands: one new, one verbatim corpus dup, one quality reject
    val batch1 = Seq(120L -> txt(500), 121L -> txt(7),
      122L -> "short reject doc")
    writeDocs(srcDir, batch1)
    val r1 = CorpusStream.ingestAvailable(spark, srcDir, out, ckpt)
    assert(r1.map(_.nBatch).sum == 3 && r1.map(_.nNewDocs).sum == 1)

    // batch 2 lands later; the restarted stream must process ONLY it —
    // its NEAR-dup of standing doc 20 (not a verbatim copy, so the
    // exact index passes it) must drop through the streamed near-dup
    // stage against the persisted LSH index, and its SNIPPET of
    // standing doc 99 (containment 1.0, Jaccard 26/36 — survives
    // near-dup) must land in the streamed containment audit
    val batch2 = Seq(130L -> txt(501), 131L -> txt(502),
      132L -> (txt(20) + " tailone tailtwo"),
      133L -> (1 to 30).map(i => s"s99v$i").mkString(" "))
    writeDocs(srcDir, batch2)
    val r2 = CorpusStream.ingestAvailable(spark, srcDir, out, ckpt)
    assert(r2.map(_.nBatch).sum == 4 && r2.map(_.nNewDocs).sum == 4,
      s"restart must fold only the new file: $r2")
    assert(r2.map(_.nNearDup).sum == 3,
      s"the streamed near-dup stage must drop doc 132: $r2")
    assert(r2.last.nContainmentPairs == 1,
      s"the streamed containment stage must pair 133 inside 99: $r2")

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
    assert(rowsOf(s"$out/lsh_index") == rowsOf(s"$outFull/lsh_index"))
    assert(rowsOf(s"$out/containment_pairs")
      == rowsOf(s"$outFull/containment_pairs"))
    assert(rowsOf(s"$out/overcap_grams") == rowsOf(s"$outFull/overcap_grams"))
  }

  test("long-lived processing-time trigger: multi-batch fold, stop, restart-no-refold") {
    import org.apache.spark.sql.streaming.Trigger
    val baseDir = java.nio.file.Files.createTempDirectory("cl_base").toString
    val srcDir = java.nio.file.Files.createTempDirectory("cl_src").toString +
      "/incoming"
    val ckpt = java.nio.file.Files.createTempDirectory("cl_ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("cl_out").toString
    val fullDir = java.nio.file.Files.createTempDirectory("cl_full").toString
    val outFull = java.nio.file.Files.createTempDirectory("cl_ofull").toString

    val base = (0L until 100L).map(i => i -> txt(i))
    writeDocs(s"$baseDir/documents.parquet", base)
    CorpusPipeline.run(spark, baseDir, out)

    // the file source needs the directory to exist at stream start
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(srcDir))

    // the same query stays up across several micro-batches
    val h = CorpusStream.startIngest(spark, srcDir, out, ckpt,
      Trigger.ProcessingTime("50 milliseconds"))
    try {
      val batch1 = Seq(202L -> txt(900), 203L -> txt(901))
      writeDocs(srcDir, batch1)
      h.query.processAllAvailable()
      assert(h.results.map(_.nNewDocs).sum == 2,
        s"first micro-batch must fold both docs: ${h.results}")

      val batch2 = Seq(211L -> txt(902))
      writeDocs(srcDir, batch2)
      h.query.processAllAvailable()
      assert(h.results.map(_.nNewDocs).sum == 3,
        s"second micro-batch must fold one more doc: ${h.results}")
    } finally h.query.stop()

    // a RESTARTED long-lived query refolds nothing (ledger + checkpoint)
    val h2 = CorpusStream.startIngest(spark, srcDir, out, ckpt,
      Trigger.ProcessingTime("50 milliseconds"))
    try {
      h2.query.processAllAvailable()
      assert(h2.results.isEmpty, s"restart refolded: ${h2.results}")
    } finally h2.query.stop()

    // and the folded corpus equals a full rebuild over everything
    writeDocs(s"$fullDir/documents.parquet",
      base ++ Seq(202L -> txt(900), 203L -> txt(901), 211L -> txt(902)))
    CorpusPipeline.run(spark, fullDir, outFull)
    assert(rowsOf(s"$out/packed") == rowsOf(s"$outFull/packed"))
    assert(rowsOf(s"$out/chunks") == rowsOf(s"$outFull/chunks"))
    assert(rowsOf(s"$out/hash_index") == rowsOf(s"$outFull/hash_index"))
  }

  test("a replayed committed batch is recognized by the ledger and skipped") {
    import spark.implicits._
    val baseDir = java.nio.file.Files.createTempDirectory("cr_base").toString
    val out = java.nio.file.Files.createTempDirectory("cr_out").toString
    val base = (0L until 100L).map(i => i -> txt(i))
    writeDocs(s"$baseDir/documents.parquet", base)
    CorpusPipeline.run(spark, baseDir, out)

    val batch = Seq(302L -> txt(950), 303L -> txt(951)).toDF("doc_id", "text")
    val r1 = CorpusPipeline.runIncremental(spark, out, batch,
      ledgerKey = Some("ckpt-A"), batchId = Some(7L))
    assert(!r1.skipped && r1.nNewDocs == 2)
    val statsAfter = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/corpus_stats.json"))
    val chunksAfter = rowsOf(s"$out/chunks")

    // at-least-once delivery: the SAME batch id arrives again after the
    // commit — must be a no-op, not a double-count or a wedge
    val r2 = CorpusPipeline.runIncremental(spark, out, batch,
      ledgerKey = Some("ckpt-A"), batchId = Some(7L))
    assert(r2.skipped && r2.summary == r1.summary)
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/corpus_stats.json")) == statsAfter,
      "a skipped replay must not touch the sidecar")
    assert(rowsOf(s"$out/chunks") == chunksAfter)

    // a DIFFERENT checkpoint's batch 7 is NOT the same batch — the
    // ledger is keyed per checkpoint (fresh checkpoints restart at 0)
    val batchB = Seq(311L -> txt(960)).toDF("doc_id", "text")
    val r3 = CorpusPipeline.runIncremental(spark, out, batchB,
      ledgerKey = Some("ckpt-B"), batchId = Some(7L))
    assert(!r3.skipped && r3.nNewDocs == 1)
  }

  test("a crashed attempt's leftover ingest file is overwritten, not duplicated") {
    import spark.implicits._
    val baseDir = java.nio.file.Files.createTempDirectory("cw_base").toString
    val out = java.nio.file.Files.createTempDirectory("cw_out").toString
    val fullDir = java.nio.file.Files.createTempDirectory("cw_full").toString
    val outFull = java.nio.file.Files.createTempDirectory("cw_ofull").toString
    val base = (0L until 100L).map(i => i -> txt(i))
    writeDocs(s"$baseDir/documents.parquet", base)
    CorpusPipeline.run(spark, baseDir, out)

    // simulate a crash mid-run: a prior attempt of batch (min id 400)
    // left its chunk and hash-index files, but never committed stats
    Seq((402L, 0, 3, "stale partial rows"))
      .toDF("doc_id", "chunk_id", "n_tokens", "chunk").coalesce(1)
      .write.parquet(s"$out/chunks-crash-stage")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val part = fs.listStatus(new org.apache.hadoop.fs.Path(
        s"$out/chunks-crash-stage"))
      .map(_.getPath).filter(_.getName.endsWith(".parquet")).head
    fs.rename(part, new org.apache.hadoop.fs.Path(
      s"$out/chunks/ingest-402.parquet"))

    // the replayed batch overwrites the stale file: the corpus ends up
    // exactly at the clean-rebuild state
    val batch = Seq(402L -> txt(970), 403L -> txt(971)).toDF("doc_id", "text")
    val r = CorpusPipeline.runIncremental(spark, out, batch,
      ledgerKey = Some("ckpt-C"), batchId = Some(0L))
    assert(!r.skipped && r.nNewDocs == 2)

    writeDocs(s"$fullDir/documents.parquet",
      base ++ Seq(402L -> txt(970), 403L -> txt(971)))
    val full = CorpusPipeline.run(spark, fullDir, outFull)
    assert(r.summary == full)
    assert(rowsOf(s"$out/chunks") == rowsOf(s"$outFull/chunks"))
    assert(rowsOf(s"$out/packed") == rowsOf(s"$outFull/packed"))
  }
}
