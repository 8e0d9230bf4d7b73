package graft

import graft.queries.{IvfPq, ProductQuantization, Similarity}
import graft.streaming.IndexStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming ANN index maintenance (`streaming.IndexStream`): embedding
  * files landing under a dataset stream through the same pinned-
  * quantizer delta path as the `IndexMain` cron, so the standing
  * IVF / PQ / LSH indexes follow the ingest. The file-source checkpoint
  * is only a wake-up signal — correctness (no double-append, no
  * re-encode of the standing corpus) comes from the index state
  * sidecar + witness probe, which the "deleted checkpoint" test proves
  * by replaying every file through a fresh checkpoint.
  */
class IndexStreamSpec extends AnyFunSuite with SparkSpec {

  private var savedRoot: Option[String] = None

  override def beforeAll(): Unit = {
    super.beforeAll()
    savedRoot = sys.props.get("graft.index.root")
    sys.props("graft.index.root") =
      java.nio.file.Files.createTempDirectory("graft_stream_index").toString
  }

  override def afterAll(): Unit = {
    savedRoot match {
      case Some(v) => sys.props("graft.index.root") = v
      case None => sys.props -= "graft.index.root"
    }
    super.afterAll()
  }

  private def writeBatch(dir: String, ids: Range, seed: Int,
      mode: String): Unit = {
    import spark.implicits._
    ids.map { i =>
      (i.toLong, Array.tabulate(64)(j =>
        (((i * 31 + j * 7 + seed * 5) % 13) - 6).toFloat))
    }.toDF("vec_id", "embedding")
      .coalesce(1).write.mode(mode)
      .parquet(s"$dir/embeddings.parquet")
  }

  private def ivfCells(dir: String): Map[Long, Long] =
    Similarity.resolveIvfIndex(spark, dir)._2
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("streamed files extend the standing indexes through the delta path") {
    val dir = java.nio.file.Files.createTempDirectory("idxstream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("idxstream_ck").toString
    writeBatch(dir, 0 until 48, seed = 11, "overwrite")

    val first = IndexStream.maintainAvailable(spark, dir, ckpt)
    assert(first.map(r => (r.ivfRows, r.pqRows, r.lshRows)) ==
      Seq((48L, 48L, 48L * 16)))
    val standing = ivfCells(dir)

    writeBatch(dir, 48 until 64, seed = 11, "append")
    val before = (Similarity.kMeansTrainCount.get(),
      ProductQuantization.codebookTrainCount.get(),
      IvfPq.encodeCount.get(),
      Similarity.cellAssignCount.get(),
      Similarity.lshBucketCount.get())
    val second = IndexStream.maintainAvailable(spark, dir, ckpt)
    assert(second.map(r => (r.ivfRows, r.pqRows, r.lshRows)) ==
      Seq((64L, 64L, 64L * 16)))
    assert((Similarity.kMeansTrainCount.get(),
      ProductQuantization.codebookTrainCount.get(),
      IvfPq.encodeCount.get(),
      Similarity.cellAssignCount.get(),
      Similarity.lshBucketCount.get()) == before,
      "a streamed batch must never retrain or touch the standing corpus")

    val grown = ivfCells(dir)
    standing.foreach { case (id, cell) =>
      assert(grown(id) == cell, s"standing row $id moved cells")
    }
  }

  test("nothing new to drain is a no-op wake-up") {
    val dir = java.nio.file.Files.createTempDirectory("idxstream_idle").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("idxstream_idle_ck").toString
    writeBatch(dir, 0 until 32, seed = 12, "overwrite")
    assert(IndexStream.maintainAvailable(spark, dir, ckpt).size == 1)

    val before = (Similarity.kMeansTrainCount.get(),
      Similarity.cellAssignCount.get(), Similarity.lshBucketCount.get())
    assert(IndexStream.maintainAvailable(spark, dir, ckpt).isEmpty,
      "no new files: the drain must deliver no batches")
    assert((Similarity.kMeansTrainCount.get(),
      Similarity.cellAssignCount.get(),
      Similarity.lshBucketCount.get()) == before)
  }

  test("a lost checkpoint replays every file without double-appending") {
    val dir = java.nio.file.Files.createTempDirectory("idxstream_ck2").toString
    writeBatch(dir, 0 until 48, seed = 13, "overwrite")
    val ck1 = java.nio.file.Files.createTempDirectory("idxstream_a").toString
    assert(IndexStream.maintainAvailable(spark, dir, ck1).size == 1)

    // fresh checkpoint: the file source re-delivers all 48 vectors, but
    // resolution diffs the sidecar, sees an identical file set, and
    // serves — the index state is the ledger, not the checkpoint
    val ck2 = java.nio.file.Files.createTempDirectory("idxstream_b").toString
    val replayed = IndexStream.maintainAvailable(spark, dir, ck2)
    assert(replayed.map(r => (r.ivfRows, r.pqRows, r.lshRows)) ==
      Seq((48L, 48L, 48L * 16)))
    val idx = Similarity.resolveIvfIndex(spark, dir)._2
    assert(idx.count() == 48 &&
      idx.select("vec_id").distinct().count() == 48,
      "replay through a fresh checkpoint must not duplicate rows")
  }

  test("a long ingest keeps probe reads bounded: stream maintenance auto-compacts") {
    import graft.tables.IndexStore
    val dir = java.nio.file.Files.createTempDirectory("idxstream_cmp").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("idxstream_cmp_ck").toString
    writeBatch(dir, 0 until 32, seed = 15, "overwrite")
    IndexStream.maintainAvailable(spark, dir, ckpt)
    (0 until 5).foreach { b =>
      writeBatch(dir, (32 + 8 * b) until (40 + 8 * b), seed = 15, "append")
      IndexStream.maintainAvailable(spark, dir, ckpt)
    }
    // 6 ingest batches through the stream: without compaction each
    // touched partition would hold up to 6 files; the delta path's
    // threshold compaction (which streaming rides) must keep every
    // index's per-partition file count bounded
    for ((kind, pcol) <- Seq("ivf_index" -> "cell", "pq_index" -> "cell",
        "lsh_index" -> "bkt")) {
      val t = IndexStore.corpusIndexTable(spark, kind, dir)
      val perPart = t.currentFiles
        .groupBy(_.split('/').find(_.startsWith(pcol + "=")).getOrElse(""))
        .view.mapValues(_.size)
      assert(perPart.nonEmpty &&
        perPart.valuesIterator.max <= IndexStore.compactThreshold,
        s"$kind files/partition exceeded ${IndexStore.compactThreshold}: " +
          s"max=${perPart.valuesIterator.max}")
    }
    assert(Similarity.resolveIvfIndex(spark, dir)._2.count() == 72)
  }

  test("IndexMain --stream drives the drain end-to-end") {
    val dir = java.nio.file.Files.createTempDirectory("idxstream_cli").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("idxstream_cli_ck").toString
    writeBatch(dir, 0 until 32, seed = 14, "overwrite")
    graft.pipeline.cli.IndexMain.main(
      Array("--data", dir, "--stream", ckpt))
    writeBatch(dir, 32 until 40, seed = 14, "append")
    graft.pipeline.cli.IndexMain.main(
      Array("--data", dir, "--stream", ckpt))
    assert(Similarity.resolveIvfIndex(spark, dir)._2.count() == 40)
  }
}
