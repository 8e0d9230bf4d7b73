package graft

import graft.queries.{IvfPq, ProductQuantization, Similarity}
import graft.tables.IndexStore
import org.scalatest.funsuite.AnyFunSuite

/** Incremental maintenance of the corpus-sized ANN indexes: when new
  * embedding files land (the production shape — a day's partition),
  * the standing index is EXTENDED — only the new files' rows are
  * assigned/encoded, under the quantizer PINNED in the index state,
  * and appended through the table layer's atomic commit. No retrain,
  * no full re-assign/re-encode, standing rows untouched. Any
  * rewritten or removed file instead forces a full rebuild, and a
  * crash between the table append and the sidecar commit replays
  * without duplicating rows (single-witness probe).
  */
class IncrementalIndexSpec extends AnyFunSuite with SparkSpec {

  private var savedRoot: Option[String] = None

  override def beforeAll(): Unit = {
    super.beforeAll()
    savedRoot = sys.props.get("graft.index.root")
    sys.props("graft.index.root") =
      java.nio.file.Files.createTempDirectory("graft_incr_index").toString
  }

  override def afterAll(): Unit = {
    savedRoot match {
      case Some(v) => sys.props("graft.index.root") = v
      case None => sys.props -= "graft.index.root"
    }
    super.afterAll()
  }

  /** Deterministic synthetic vectors; `mode=append` lands a NEW part
    * file next to the standing ones, exactly like an ingest batch.
    */
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

  private def cellsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("ivf inverted file: new files append under the pinned quantizer") {
    val dir = java.nio.file.Files.createTempDirectory("incr_ivf").toString
    writeBatch(dir, 0 until 48, seed = 0, "overwrite")
    val (cs1, idx1) = Similarity.resolveIvfIndex(spark, dir)
    val standing = cellsOf(idx1)
    assert(standing.size == 48)

    writeBatch(dir, 48 until 64, seed = 0, "append")
    Similarity.clearCentroidSessionCache() // "restart the session"
    Similarity.clearServedIndexCaches()
    val trainBefore = Similarity.kMeansTrainCount.get()
    val assignBefore = Similarity.cellAssignCount.get()
    val (cs2, idx2) = Similarity.resolveIvfIndex(spark, dir)

    assert(Similarity.kMeansTrainCount.get() == trainBefore,
      "delta ingest must reuse the pinned quantizer, not retrain")
    assert(Similarity.cellAssignCount.get() == assignBefore,
      "delta ingest must not re-assign the standing corpus")
    cs1.zip(cs2).foreach { case ((i1, c1, n1), (i2, c2, n2)) =>
      assert(i1 == i2 && n1 == n2 &&
        java.util.Arrays.equals(c1, c2), s"quantizer drifted at cell $i1")
    }

    val grown = cellsOf(idx2)
    assert(grown.size == 64)
    standing.foreach { case (id, cell) =>
      assert(grown(id) == cell, s"standing row $id moved cells")
    }
    // appended rows sit exactly where the pinned quantizer puts them
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(org.apache.spark.sql.functions.col("vec_id") >= 48)
    val expected = cellsOf(Similarity.assignRows(spark, emb, cs1))
    (48L until 64L).foreach(id => assert(grown(id) == expected(id)))

    // idempotent: nothing new → same index
    val (_, idx3) = Similarity.resolveIvfIndex(spark, dir)
    assert(cellsOf(idx3) == grown)
  }

  test("pq code table: new files encode under the pinned quantizers and append") {
    val dir = java.nio.file.Files.createTempDirectory("incr_pq").toString
    writeBatch(dir, 0 until 48, seed = 1, "overwrite")
    val (cs1, books1, idx1) = IvfPq.resolvePqIndex(spark, dir)
    val standing = idx1.collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("codes").toSeq).toMap
    assert(standing.size == 48)

    writeBatch(dir, 48 until 64, seed = 1, "append")
    Similarity.clearCentroidSessionCache()
    Similarity.clearServedIndexCaches()
    ProductQuantization.clearCodebookSessionCache()
    val encodeBefore = IvfPq.encodeCount.get()
    val trainBefore = (Similarity.kMeansTrainCount.get(),
      ProductQuantization.codebookTrainCount.get())
    val (cs2, books2, idx2) = IvfPq.resolvePqIndex(spark, dir)

    assert(IvfPq.encodeCount.get() == encodeBefore,
      "delta ingest must not re-encode the standing corpus")
    assert((Similarity.kMeansTrainCount.get(),
      ProductQuantization.codebookTrainCount.get()) == trainBefore,
      "delta ingest must reuse both pinned quantizers")
    cs1.zip(cs2).foreach { case ((i1, c1, _), (i2, c2, _)) =>
      assert(i1 == i2 && java.util.Arrays.equals(c1, c2))
    }
    books1.zip(books2).foreach { case (b1, b2) =>
      b1.zip(b2).foreach { case (w1, w2) =>
        assert(java.util.Arrays.equals(w1, w2))
      }
    }

    val grown = idx2.collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("codes").toSeq).toMap
    assert(grown.size == 64)
    standing.foreach { case (id, codes) =>
      assert(grown(id) == codes, s"standing row $id re-encoded differently")
    }
  }

  test("a crash between append and sidecar commit replays without double-append") {
    val dir = java.nio.file.Files.createTempDirectory("incr_crash").toString
    writeBatch(dir, 0 until 48, seed = 2, "overwrite")
    val meta0 = Similarity.embeddingsFileMeta(spark, dir)
    val fp0 = Similarity.fingerprintOf(dir, meta0)
    Similarity.resolveIvfIndex(spark, dir)

    writeBatch(dir, 48 until 64, seed = 2, "append")
    val (_, grown) = Similarity.resolveIvfIndex(spark, dir) // delta commits
    assert(grown.count() == 64)

    // simulate the crash window: table append committed, sidecar not —
    // roll the sidecar back to the pre-append state and resolve again
    // (serve memo dropped so the resolution actually replays)
    IndexStore.commitCorpusIndexState("ivf_index", dir, fp0, meta0,
      Similarity.IvfFormat)
    Similarity.clearServedIndexCaches()
    val (_, replayed) = Similarity.resolveIvfIndex(spark, dir)
    assert(replayed.count() == 64,
      "witness probe must recognize the committed append on replay")
    assert(replayed.select("vec_id").distinct().count() == 64)
  }

  test("lsh bucket table: new files append, the standing corpus is never re-hashed") {
    val dir = java.nio.file.Files.createTempDirectory("incr_lsh").toString
    writeBatch(dir, 0 until 48, seed = 7, "overwrite")
    val idx1 = Similarity.resolveLshIndex(spark, dir)
    val standing = idx1.collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(standing.map(_._1).size == 48 && standing.size == 48 * 16,
      "16 tables per vector")

    writeBatch(dir, 48 until 64, seed = 7, "append")
    val bucketBefore = Similarity.lshBucketCount.get()
    val idx2 = Similarity.resolveLshIndex(spark, dir)
    assert(Similarity.lshBucketCount.get() == bucketBefore,
      "delta ingest must not re-bucket the standing corpus")
    val grown = idx2.collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(grown.size == 64 * 16)
    assert(standing.subsetOf(grown), "standing buckets changed")
    // appended rows bucket exactly as the pure-function planes dictate
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(org.apache.spark.sql.functions.col("vec_id") >= 48)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    emb.foreach { case (id, v) =>
      Similarity.bucketIdsOf(v).foreach(b =>
        assert(grown.contains((id, b)), s"vector $id missing bucket $b"))
    }
  }

  test("maintenance vacuums honor a retention window (no 0L backdoor)") {
    // round-16 (ADVICE r15): compactCorpusIndex/maybeFoldCorpusIndex
    // passed olderThanMs=0 on an UNENFORCED single-maintainer
    // assumption — two sessions resolving one shared store key would
    // let one vacuum reclaim the other's in-flight uncommitted append
    // dir (the r14 race, reintroduced). Production default is a
    // 10-minute floor; this spec proves the maintenance path passes it
    // through: young superseded files survive compaction's vacuum.
    val saved = sys.props.get("graft.index.vacuum.retention.ms")
    try {
      sys.props -= "graft.index.vacuum.retention.ms"
      assert(IndexStore.maintenanceRetentionMs == 10L * 60L * 1000L,
        "production default must be the 10-minute floor")
      sys.props("graft.index.vacuum.retention.ms") = "600000"
      val dir = java.nio.file.Files.createTempDirectory("incr_ret").toString
      writeBatch(dir, 0 until 48, seed = 11, "overwrite")
      Similarity.resolveIvfIndex(spark, dir)
      writeBatch(dir, 48 until 56, seed = 11, "append")
      Similarity.resolveIvfIndex(spark, dir)
      val t = IndexStore.corpusIndexTable(spark, "ivf_index", dir)
      def onDisk: Long = {
        val stream = java.nio.file.Files.walk(
          java.nio.file.Paths.get(t.rootPath, "d"))
        try stream.filter(_.toString.endsWith(".parquet")).count()
        finally stream.close()
      }
      val diskBefore = onDisk
      assert(IndexStore.compactCorpusIndex(spark, "ivf_index", dir).nonEmpty)
      val current = t.read.inputFiles.length
      assert(onDisk >= diskBefore + current,
        s"young superseded files must SURVIVE a retention-window vacuum " +
          s"(disk=$onDisk, before=$diskBefore, current=$current)")
    } finally {
      saved match {
        case Some(v) => sys.props("graft.index.vacuum.retention.ms") = v
        case None => sys.props -= "graft.index.vacuum.retention.ms"
      }
    }
  }

  test("index compaction: one file per cell, identical rows, layout preserved") {
    val dir = java.nio.file.Files.createTempDirectory("incr_cmp").toString
    writeBatch(dir, 0 until 48, seed = 5, "overwrite")
    Similarity.resolveIvfIndex(spark, dir)
    writeBatch(dir, 48 until 56, seed = 5, "append")
    Similarity.resolveIvfIndex(spark, dir)
    writeBatch(dir, 56 until 64, seed = 5, "append")
    val (_, idx) = Similarity.resolveIvfIndex(spark, dir)
    val rowsBefore = cellsOf(idx)

    val t = IndexStore.corpusIndexTable(spark, "ivf_index", dir)
    def onDisk: Long = {
      val stream = java.nio.file.Files.walk(java.nio.file.Paths.get(
        s"${sys.props("graft.index.root")}/ivf_index"))
      try stream.filter(p => p.toString.endsWith(".parquet")).count()
      finally stream.close()
    }
    val filesBefore = t.read.inputFiles.length
    val diskBefore = onDisk
    assert(IndexStore.compactCorpusIndex(spark, "ivf_index", dir).nonEmpty)

    val filesAfter = t.read.inputFiles.length
    val cells = rowsBefore.values.toSet.size
    assert(filesAfter == cells,
      s"expected one file per cell ($cells), got $filesAfter")
    assert(filesAfter <= filesBefore)
    // compaction vacuums superseded versions: the append history's
    // small files are gone from disk, not just from the manifest
    assert(onDisk < diskBefore + filesAfter,
      s"vacuum must remove superseded files (disk=$onDisk, " +
        s"before=$diskBefore, current=$filesAfter)")
    // still a HIT serving identical rows — compaction changed the file
    // layout, not the coverage or the values
    val (_, after) = Similarity.resolveIvfIndex(spark, dir)
    assert(cellsOf(after) == rowsBefore)
  }

  test("IndexMain drives refresh + compact end-to-end") {
    val dir = java.nio.file.Files.createTempDirectory("incr_cli").toString
    writeBatch(dir, 0 until 48, seed = 6, "overwrite")
    graft.pipeline.cli.IndexMain.main(Array("--data", dir))
    writeBatch(dir, 48 until 64, seed = 6, "append")
    graft.pipeline.cli.IndexMain.main(
      Array("--data", dir, "--refresh", "true", "--compact", "true"))
    val (_, idx) = Similarity.resolveIvfIndex(spark, dir)
    assert(idx.count() == 64)
    val t = IndexStore.corpusIndexTable(spark, "ivf_index", dir)
    assert(t.read.inputFiles.length ==
      idx.select("cell").distinct().count())
  }

  test("a rewritten file forces a full rebuild with a fresh quantizer") {
    val dir = java.nio.file.Files.createTempDirectory("incr_rw").toString
    writeBatch(dir, 0 until 48, seed = 3, "overwrite")
    Similarity.resolveIvfIndex(spark, dir)

    writeBatch(dir, 0 until 64, seed = 4, "overwrite") // content rewritten
    Similarity.clearCentroidSessionCache()
    Similarity.clearServedIndexCaches()
    val trainBefore = Similarity.kMeansTrainCount.get()
    val (_, idx) = Similarity.resolveIvfIndex(spark, dir)
    assert(Similarity.kMeansTrainCount.get() == trainBefore + 1,
      "a rewritten dataset must retrain, never serve the stale index")
    assert(idx.count() == 64)
  }

  test("crash window with a second batch landing: per-file witness heals exactly") {
    // The interleaved replay the single-witness scheme got wrong: batch
    // A's table append commits, the sidecar does NOT (crash), then
    // batch B lands before the replay. The replay's newFiles span both
    // batches — a witness drawn from A would skip B (rows silently
    // never indexed), one drawn from B would double-append A. Per-file
    // witnesses append exactly the absent files.
    val dir = java.nio.file.Files.createTempDirectory("incr_ilv").toString
    writeBatch(dir, 0 until 32, seed = 8, "overwrite")
    val meta0 = Similarity.embeddingsFileMeta(spark, dir)
    val fp0 = Similarity.fingerprintOf(dir, meta0)
    Similarity.resolveIvfIndex(spark, dir)

    writeBatch(dir, 32 until 48, seed = 8, "append") // batch A
    Similarity.resolveIvfIndex(spark, dir) // A's rows + sidecar commit
    // roll the sidecar back: the crash-window state (A in table, not
    // in sidecar)…
    IndexStore.commitCorpusIndexState("ivf_index", dir, fp0, meta0,
      Similarity.IvfFormat)
    writeBatch(dir, 48 until 64, seed = 8, "append") // …then B lands
    Similarity.clearServedIndexCaches()
    val assignBefore = Similarity.cellAssignCount.get()
    val (_, healed) = Similarity.resolveIvfIndex(spark, dir)
    assert(Similarity.cellAssignCount.get() == assignBefore,
      "healing must never re-assign the standing corpus")
    assert(healed.count() == 64, "batch B's rows must be indexed")
    assert(healed.select("vec_id").distinct().count() == 64,
      "batch A's rows must not be double-appended")
  }

  test("delta appends auto-compact: files per cell stay bounded") {
    val dir = java.nio.file.Files.createTempDirectory("incr_auto").toString
    writeBatch(dir, 0 until 32, seed = 9, "overwrite")
    Similarity.resolveIvfIndex(spark, dir)
    (0 until 6).foreach { b =>
      writeBatch(dir, (32 + 8 * b) until (40 + 8 * b), seed = 9, "append")
      Similarity.resolveIvfIndex(spark, dir)
    }
    val t = IndexStore.corpusIndexTable(spark, "ivf_index", dir)
    val perCell = t.currentFiles
      .groupBy(_.split('/').find(_.startsWith("cell=")).getOrElse(""))
      .view.mapValues(_.size)
    assert(perCell.nonEmpty &&
      perCell.valuesIterator.max <= IndexStore.compactThreshold,
      s"serve path must keep files/cell <= ${IndexStore.compactThreshold}: " +
        s"${perCell.toMap}")
    // compaction rewrote layout only — coverage and values intact
    assert(t.read.select("vec_id").distinct().count() == 80)
  }

  test("auto-compaction is TIERED: folds the delta files, carries the base by reference") {
    // a full rewrite per trigger would pay O(index) I/O every
    // ~threshold ingests — at scale, compaction would dwarf ingest.
    // The fold must leave every partition with at least one file from
    // an OLD data dir (the carried base); a full rewrite leaves every
    // file in the fold's own (newest) data dir.
    val saved = sys.props.get("graft.index.compact.threshold")
    sys.props("graft.index.compact.threshold") = "2"
    try {
      val dir = java.nio.file.Files.createTempDirectory("incr_tier").toString
      writeBatch(dir, 0 until 256, seed = 12, "overwrite") // base build
      Similarity.resolveIvfIndex(spark, dir)
      (0 until 3).foreach { b => // three tiny ingests: crosses threshold 2
        writeBatch(dir, (256 + 4 * b) until (260 + 4 * b), seed = 12, "append")
        Similarity.resolveIvfIndex(spark, dir)
      }
      val t = IndexStore.corpusIndexTable(spark, "ivf_index", dir)
      val files = t.currentFiles
      def dataDirNum(f: String): Long = {
        val parts = f.split('/')
        parts(parts.indexOf("d") + 1).stripPrefix("v").toLong
      }
      val newest = files.map(dataDirNum).max
      val perCell = files.groupBy(
        _.split('/').find(_.startsWith("cell=")).getOrElse(""))
      assert(perCell.valuesIterator.map(_.size).max <= 2,
        "fold must restore the files-per-partition bound")
      perCell.foreach { case (cell, fs) =>
        assert(fs.exists(f => dataDirNum(f) != newest),
          s"$cell holds only newest-dir files — the base was rewritten")
      }
      // coverage and values intact across base + 3 ingests
      assert(t.read.select("vec_id").distinct().count() == 268)
    } finally {
      saved match {
        case Some(v) => sys.props("graft.index.compact.threshold") = v
        case None => sys.props -= "graft.index.compact.threshold"
      }
    }
  }

  test("nsw graph: appended files insert via search-link-prune, never a rebuild") {
    import org.apache.spark.sql.functions._
    import graft.queries.GraphAnn
    val dir = java.nio.file.Files.createTempDirectory("incr_nsw").toString
    writeBatch(dir, 0 until 48, seed = 16, "overwrite")
    val meta0 = Similarity.embeddingsFileMeta(spark, dir)
    GraphAnn.resolveGraphIndex(spark, dir).count()
    val buildsAfterBase = GraphAnn.graphBuildCount.get()

    writeBatch(dir, 48 until 64, seed = 16, "append")
    graft.common.Memos.clearAll() // drop the walk/index session memos
    val insertsBefore = GraphAnn.graphInsertCount.get()
    val grown = GraphAnn.resolveGraphIndex(spark, dir)
    assert(GraphAnn.graphBuildCount.get() == buildsAfterBase,
      "an appended batch must take the insert path, never a full rebuild")
    assert(GraphAnn.graphInsertCount.get() == insertsBefore + 1)

    // every new vector is linked into the graph…
    val sources = grown.select("u").distinct().collect()
      .map(_.getLong(0)).toSet
    (48L until 64L).foreach(id =>
      assert(sources.contains(id), s"new vector $id has no edges"))
    // …and the stored form's invariants survive the insert: symmetric
    // adjacency and a 2M degree bound PER LAYER (the prune contract)
    val edges = grown.select(col("u"), col("v"), col("layer"))
    val asym = edges
      .join(edges.select(col("v").as("u"), col("u").as("v"), col("layer")),
        Seq("u", "v", "layer"), "left_anti").count()
    assert(asym == 0, s"$asym directed edges lack their reverse after insert")
    val maxDeg = edges.groupBy("u", "layer").count()
      .agg(max("count")).collect()(0).getLong(0)
    assert(maxDeg <= 32L, s"degree $maxDeg exceeds the 2M bound after insert")

    // the serve contract holds on the GROWN corpus: macro recall@10 of
    // the walk vs the exact baseline clears the q212 oracle floor
    val recall = SparkEntry.queries("q212_graph_recall")(spark, dir)
      .agg(avg(col("n_hits").cast("double") / col("n_exact")))
      .collect()(0).getDouble(0)
    assert(recall >= 0.70, s"grown-corpus macro recall $recall under the floor")

    // crash window: insert committed, sidecar not — the replay's
    // witness probe must skip the already-linked files (no duplicate
    // edges, no second insert) and the state-derived prune re-runs
    val edgeCount = grown.count()
    graft.tables.IndexStore.commitCorpusIndexState("nsw_index", dir,
      GraphAnn.GraphScheme, meta0)
    graft.common.Memos.clearAll()
    val healed = GraphAnn.resolveGraphIndex(spark, dir)
    assert(GraphAnn.graphBuildCount.get() == buildsAfterBase &&
      GraphAnn.graphInsertCount.get() == insertsBefore + 1,
      "replay must neither rebuild nor re-insert witnessed files")
    assert(healed.count() == edgeCount,
      "replay changed the edge set — the witness probe double-applied")

    // an OUTLIER batch (vectors pointing away from the corpus pattern)
    // must also come out linked: the prune protects each mirror
    // endpoint's best edge, so even if every link target ranks the
    // newcomer past its 2M bound, the newcomer keeps its best edge
    // (min-degree >= 1) instead of being silently orphaned
    {
      import spark.implicits._
      (64 until 67).map { i =>
        (i.toLong, Array.tabulate(64)(j =>
          if (j == i % 64) 100.0f else -((i * 13 + j) % 7).toFloat))
      }.toDF("vec_id", "embedding")
        .coalesce(1).write.mode("append").parquet(s"$dir/embeddings.parquet")
    }
    graft.common.Memos.clearAll()
    val grown2 = GraphAnn.resolveGraphIndex(spark, dir)
    val sources2 = grown2.select("u").distinct().collect()
      .map(_.getLong(0)).toSet
    (64L until 67L).foreach(id =>
      assert(sources2.contains(id), s"outlier $id orphaned by the prune"))
    val edges2 = grown2.select(col("u"), col("v"), col("layer"))
    assert(edges2
      .join(edges2.select(col("v").as("u"), col("u").as("v"), col("layer")),
        Seq("u", "v", "layer"), "left_anti").count() == 0,
      "adjacency must stay symmetric after the protected prune")

    // a rewritten file still invalidates the whole graph (global state)
    writeBatch(dir, 0 until 67, seed = 17, "overwrite")
    graft.common.Memos.clearAll()
    GraphAnn.resolveGraphIndex(spark, dir).count()
    assert(GraphAnn.graphBuildCount.get() == buildsAfterBase + 1,
      "a rewritten corpus must rebuild, never serve stale edges")
  }

  test("vacuumStores drops stale store keys and retains fresh ones") {
    val d1 = java.nio.file.Files.createTempDirectory("incr_gc1").toString
    val d2 = java.nio.file.Files.createTempDirectory("incr_gc2").toString
    writeBatch(d1, 0 until 32, seed = 10, "overwrite")
    writeBatch(d2, 0 until 32, seed = 11, "overwrite")
    Similarity.resolveIvfIndex(spark, d1)
    Similarity.resolveIvfIndex(spark, d2)

    // key dir of d1's inverted file, derived from its own data files
    def keyDir(d: String): java.nio.file.Path = {
      val f = java.nio.file.Paths.get(
        IndexStore.corpusIndexTable(spark, "ivf_index", d).currentFiles.head)
      var p = f
      while (p.getParent != null &&
        p.getParent.getFileName.toString != "ivf_index") p = p.getParent
      p
    }
    val stale = keyDir(d1)
    val fresh = keyDir(d2)
    // backdate every use marker of BOTH keys two days…
    val old = java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - 48L * 3600 * 1000)
    for (dir <- Seq(stale, fresh); f <- Seq("_LATEST", "state.json",
        ".last_served") if java.nio.file.Files.exists(dir.resolve(f))) {
      java.nio.file.Files.setLastModifiedTime(dir.resolve(f), old)
    }
    // …then SERVE d2: retention is by last use, not last commit — the
    // index of a stable dataset that is queried daily but never
    // updated must survive (an uncached resolve touches .last_served)
    Similarity.clearServedIndexCaches()
    Similarity.resolveIvfIndex(spark, d2)

    val removed = IndexStore.vacuumStores(maxAgeMs = 24L * 3600 * 1000)
    assert(removed.contains(stale.toString),
      s"stale key must be vacuumed (removed=$removed)")
    assert(!java.nio.file.Files.exists(stale))
    assert(java.nio.file.Files.exists(fresh),
      "a recently-SERVED key must survive retention even with old commits")
    // a vacuumed store is derived state: the next resolve rebuilds it
    Similarity.clearServedIndexCaches()
    val (_, rebuilt) = Similarity.resolveIvfIndex(spark, d1)
    assert(rebuilt.count() == 32)
  }
}
