package graft.pipeline.cli

import graft.pipeline.ChurnPipeline
import org.apache.spark.sql.SparkSession

/** Per-stage CLI entry points — the reference's operational unit is one
  * OS process per stage (`python -m src.ingestion.orders_to_bronze
  * --input ... --bronze_path ... --run_id ...`,
  * `orders_to_bronze.py:189-199` and siblings), with crash-restart
  * between stages exercised by launching them as subprocesses
  * (`tests/integration/test_slice_e2e.py:109-337`). Each main here is an
  * independently launchable JVM entry point: it builds its own
  * SparkSession, runs exactly one stage against the warehouse, prints
  * one status line, and exits — all cross-stage state lives in the
  * tables, never in the process.
  *
  * Common flags: `--warehouse <dir>` and `--run_id <id>` everywhere;
  * stage-specific flags documented per main. `--expectations <file>`
  * points at a DQ expectations JSON (reference `--expectations`).
  *
  * When a main runs inside a JVM that already has a SparkSession (the
  * in-JVM e2e spec), it reuses it and leaves it running; as a real OS
  * process it owns the session and stops it on exit.
  */
object StageMains {

  private[cli] def parseArgs(args: Array[String]): Map[String, String] = {
    require(args.length % 2 == 0,
      s"arguments must be --flag value pairs, got: ${args.mkString(" ")}")
    args.grouped(2).map { pair =>
      require(pair(0).startsWith("--"), s"expected a --flag, got ${pair(0)}")
      pair(0).drop(2) -> pair(1)
    }.toMap
  }

  private[cli] def required(a: Map[String, String], k: String): String =
    a.getOrElse(k, throw new IllegalArgumentException(s"missing --$k"))

  private[cli] def withSession[A](f: SparkSession => A): A = {
    val owned = SparkSession.getDefaultSession.isEmpty
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try f(spark) finally if (owned) spark.stop()
  }

  private[cli] def pipeline(spark: SparkSession,
      a: Map[String, String]): ChurnPipeline =
    new ChurnPipeline(spark, required(a, "warehouse"),
      expectationsPath = a.get("expectations"))
}

/** `--input <raw parquet> --warehouse <dir> --run_id <id>` —
  * reference `orders_to_bronze.py:189-199`.
  */
object BronzeMain {
  import StageMains._
  def main(args: Array[String]): Unit = withSession { spark =>
    val a = parseArgs(args)
    val r = pipeline(spark, a)
      .ingestBronze(required(a, "input"), required(a, "run_id"))
    println(s"[bronze] rows=${r.rowCount} skipped=${r.skipped} " +
      s"fingerprint=${r.fingerprint} version=${r.version.getOrElse(-1L)}")
  }
}

/** `--warehouse <dir> --run_id <id> [--expectations <json>]` —
  * reference `orders_bronze_to_silver.py:94-106`.
  */
object SilverMain {
  import StageMains._
  def main(args: Array[String]): Unit = withSession { spark =>
    val a = parseArgs(args)
    val out = pipeline(spark, a).publishSilver(required(a, "run_id"))
    println(s"[silver] rows=${out.count()}")
  }
}

/** `--warehouse <dir> --as_of_date <yyyy-mm-dd> --run_id <id>
  * [--changed_since <ts>]` — reference `customer_features_daily.py`;
  * `--changed_since` selects the incremental rebuild.
  */
object GoldMain {
  import StageMains._
  def main(args: Array[String]): Unit = withSession { spark =>
    val a = parseArgs(args)
    val p = pipeline(spark, a)
    val asOf = required(a, "as_of_date")
    val runId = required(a, "run_id")
    val out = a.get("changed_since") match {
      case Some(since) => p.publishGoldIncremental(asOf, runId, since)
      case None => p.publishGold(asOf, runId)
    }
    println(s"[gold] as_of=$asOf rows=${out.count()}")
  }
}

/** `--warehouse <dir> --as_of_date <yyyy-mm-dd> --run_id <id>
  * [--horizon_days <n>]` — reference `labels.py`.
  */
object LabelsMain {
  import StageMains._
  def main(args: Array[String]): Unit = withSession { spark =>
    val a = parseArgs(args)
    val horizon = a.get("horizon_days").map(_.toInt)
      .getOrElse(graft.pipeline.Labels.DefaultHorizonDays)
    val out = pipeline(spark, a).publishLabels(
      required(a, "as_of_date"), required(a, "run_id"), horizon)
    println(s"[labels] as_of=${required(a, "as_of_date")} rows=${out.count()}")
  }
}

/** `--warehouse <dir> --run_id <id>` — reference
  * `build_training_snapshot.py:114-125`.
  */
object SnapshotMain {
  import StageMains._
  def main(args: Array[String]): Unit = withSession { spark =>
    val a = parseArgs(args)
    val out = pipeline(spark, a)
      .publishTrainingSnapshot(required(a, "run_id"))
    println(s"[snapshot] rows=${out.count()}")
  }
}

/** `--warehouse <dir> --bundle_dir <dir> --run_id <id>
  * [--validation_fraction <f>] [--feature_contract <json>]` — reference
  * `train_stub.py:93-109`: trains on the standing snapshot, saves +
  * approves the bundle. With `--feature_contract` the contract artifact
  * is re-hashed and a mismatched snapshot refuses to train
  * (`train_stub.py:154-165`).
  */
object TrainMain {
  import StageMains._
  def main(args: Array[String]): Unit = withSession { spark =>
    val a = parseArgs(args)
    val p = pipeline(spark, a)
    val snap = graft.tables.ParquetTable(spark, p.snapshotRoot).read
    val tr = graft.ml.ChurnTrainer.train(snap,
      validationFraction =
        a.get("validation_fraction").map(_.toDouble).getOrElse(0.2),
      expectedFeatureVersion =
        a.get("feature_contract").map(graft.contracts.ContractFile.hash))
    val bundleDir = required(a, "bundle_dir")
    graft.serving.Scorer.saveBundle(tr.model, bundleDir, tr.modelVersion,
      p.featureVersion, tr.metrics)
    graft.serving.Scorer.approve(bundleDir, tr.modelVersion)
    println(s"[train] model_version=${tr.modelVersion} " +
      tr.metrics.map { case (k, v) => f"$k=$v%.4f" }.mkString(" "))
  }
}

/** `--warehouse <dir> --run_id <id>` — reference
  * `build_latest_features.py`.
  */
object LatestFeaturesMain {
  import StageMains._
  def main(args: Array[String]): Unit = withSession { spark =>
    val a = parseArgs(args)
    val out = pipeline(spark, a).exportLatestFeatures(required(a, "run_id"))
    println(s"[latest_features] rows=${out.count()}")
  }
}

/** `--out <dir> --run_id <id>` plus one of `--sf_dir <testdata dir>`
  * (full build), `--incremental <batch parquet>` (batch-only run
  * against the standing output — needs no corpus access at all; see
  * `CorpusPipeline.runIncremental`), or `--stream <src dir>
  * --checkpoint <dir>` (drain all unprocessed document files through
  * the checkpointed streaming front door, then exit; see
  * `streaming.CorpusStream`) — the training-corpus preparation
  * pipeline (quality → dedup → decontaminate → chunk → pack) as a CLI
  * stage with the same started/completed/failed event contract as the
  * churn stages (events under `<out>/_logs/pipeline.jsonl`).
  */
object CorpusMain {
  import StageMains._
  def main(args: Array[String]): Unit = withSession { spark =>
    val a = parseArgs(args)
    val out = required(a, "out")
    val runId = required(a, "run_id")
    val mode =
      if (a.contains("stream")) "stream"
      else if (a.contains("incremental")) "incremental"
      else "full"
    graft.pipeline.StageEvents.staged(out, "corpus", runId,
      Map("mode" -> mode)) {
      mode match {
        case "stream" =>
          // drain every unprocessed file under --stream via the
          // checkpointed incremental path, then exit (AvailableNow)
          val rs = graft.streaming.CorpusStream.ingestAvailable(spark,
            required(a, "stream"), out, required(a, "checkpoint"))
          println(s"[corpus] mode=stream batches=${rs.size} " +
            s"docs=${rs.map(_.nBatch).sum} new=${rs.map(_.nNewDocs).sum} " +
            s"neardup_kept=${rs.map(_.nNearDup).sum} " +
            s"containment_pairs=${rs.lastOption.fold(-1L)(_.nContainmentPairs)} " +
            s"packs=${rs.lastOption.fold(-1L)(_.summary.nPacks)}")
        case "incremental" =>
          val r = graft.pipeline.CorpusPipeline.runIncremental(
            spark, out, spark.read.parquet(a("incremental")))
          println(s"[corpus] mode=incremental batch=${r.nBatch} " +
            s"new=${r.nNewDocs} neardup_kept=${r.nNearDup} " +
            s"containment_pairs=${r.nContainmentPairs} " +
            s"repacked_groups=${r.repackedGroups.size} " +
            s"packs=${r.summary.nPacks} tokens=${r.summary.packedTokens}")
        case _ =>
          val s = graft.pipeline.CorpusPipeline.run(spark,
            required(a, "sf_dir"), out)
          println(s"[corpus] mode=full input=${s.nInput} " +
            s"neardup=${s.nAfterNearDup} training=${s.nAfterDecontam} " +
            s"chunks=${s.nChunks} " +
            s"packs=${s.nPacks} tokens=${s.packedTokens}")
      }
    }
  }
}

/** `--data <dir holding an embeddings table> [--refresh true]
  * [--compact true] [--stream <checkpointDir>]
  * [--vacuum_stores <maxAgeHours>]` — ANN index maintenance, the
  * nightly-cron shape: refresh resolves the corpus indexes against
  * the dataset's current backing files (identical set → serve; new
  * files only → assign/encode just those under the pinned quantizer
  * and append; anything else → full rebuild), compact rewrites each
  * index back to one file per cell, preserving the cell partitioning
  * the probe paths prune on (the serve path also auto-compacts past a
  * files-per-partition threshold; the explicit flag remains for
  * operator-scheduled maintenance). With no flag, refresh runs.
  * `--stream` instead drains newly landed embedding files through
  * `streaming.IndexStream` (checkpoint-tracked catch-up-and-exit, the
  * corpus `--stream` twin for the index side). `--vacuum_stores N`
  * drops every store key (any kind, any dataset) not committed to in
  * the last N hours — retention for the derived-state cache, which
  * otherwise accumulates one entry per dataset fingerprint forever.
  */
object IndexMain {
  import StageMains._
  def main(args: Array[String]): Unit = withSession { spark =>
    val a = parseArgs(args)
    a.get("vacuum_stores").foreach { hours =>
      val removed = graft.tables.IndexStore.vacuumStores(
        (hours.toDouble * 3600 * 1000).toLong)
      println(s"[index] vacuumed ${removed.size} stale store keys")
    }
    // a vacuum-only invocation needs no dataset; anything else does
    if (!a.contains("vacuum_stores") || a.contains("data")) {
      val d = required(a, "data")
      // takedown: record dropped vec_ids against EVERY index of the
      // dataset — probes mask them immediately (no rebuild), the
      // threshold fold removes them physically later. Failures
      // propagate: a takedown that silently doesn't apply is a
      // compliance bug, so this runs BEFORE any serve/refresh action.
      a.get("tombstone").foreach { ids =>
        val parsed = ids.split(",").map(_.trim.toLong).toSeq
        Seq("ivf_index", "pq_index", "lsh_index", "nsw_index").foreach {
          kind => graft.tables.IndexStore.addTombstones(spark, kind, d, parsed)
        }
        println(s"[index] tombstoned ${parsed.size} ids across 4 index kinds")
      }
      a.get("stream") match {
        case Some(ckpt) =>
          val rs = graft.streaming.IndexStream.maintainAvailable(spark, d, ckpt)
          println(s"[index] stream batches=${rs.size} " +
            s"ivf=${rs.lastOption.fold(-1L)(_.ivfRows)} " +
            s"pq=${rs.lastOption.fold(-1L)(_.pqRows)} " +
            s"lsh=${rs.lastOption.fold(-1L)(_.lshRows)} rows")
        case None =>
          if (a.contains("refresh") || !a.contains("compact")) {
            val (_, ivf) = graft.queries.Similarity.resolveIvfIndex(spark, d)
            val (_, _, pq) = graft.queries.IvfPq.resolvePqIndex(spark, d)
            val lsh = graft.queries.Similarity.resolveLshIndex(spark, d)
            println(s"[index] refreshed ivf=${ivf.count()} pq=${pq.count()} " +
              s"lsh=${lsh.count()} rows")
          }
          if (a.contains("compact")) {
            val v1 = graft.tables.IndexStore
              .compactCorpusIndex(spark, "ivf_index", d)
            val v2 = graft.tables.IndexStore
              .compactCorpusIndex(spark, "pq_index", d)
            val v3 = graft.tables.IndexStore
              .compactCorpusIndex(spark, "lsh_index", d, partitionCol = "bkt")
            println(s"[index] compacted ivf=$v1 pq=$v2 lsh=$v3")
          }
      }
    }
  }
}

/** `--table <root>` plus actions — table-layout maintenance as an
  * operational stage (Delta OPTIMIZE / OPTIMIZE ZORDER / VACUUM's
  * role for the engine's table layer):
  *   `--compact <targetFiles>`    plain rewrite into N files
  *   `--cluster c1[,c2,...]`      1 column → range-clustered compaction;
  *                                2+ → z-ordered rewrite (Morton key);
  *                                file count via `--target_files N`
  *   `--vacuum <keepLast>`        drop data of superseded versions
  *   `--vacuum_age_hours <N>`     vacuum retention window (default 168 =
  *                                7 days, Delta's; 0 = unsafe override)
  *   `--restore <v>`              make committed version v current again
  *                                as a NEW commit (zero data copied)
  *   `--history true`             print per-commit audit rows (DESCRIBE
  *                                HISTORY: version, op, ts, file count)
  *   `--stats c1[,c2,...]`        declare stats columns so the rewrite
  *                                records per-file min/max (data skipping)
  *   `--append <parquetDir>`      O(batch) append of landed rows (CAS
  *                                commit: a concurrent writer makes
  *                                this rebase, never lose data)
  *   `--partition_by c1[,c2,...]` with `--maintain`: rewrite THROUGH
  *                                the table's k=v partition layout
  *                                instead of flattening it
  *   `--maintain <targetBytes>`   POLICY pass (round-14): run q203's
  *                                bin-packing planner over the current
  *                                manifest's file census and apply it —
  *                                rewrite to the planned bin count when
  *                                fragmented (clustered/z-ordered when
  *                                `--cluster` names columns), then
  *                                vacuum(`--retain`, default 2). The
  *                                one-flag invocation a maintenance
  *                                cron runs; exclusive of the manual
  *                                actions above.
  * Manual actions compose in fixed order (compact → cluster → vacuum),
  * so one invocation can rewrite and then reclaim.
  */
object TableMain {
  import StageMains._

  /** The `--maintain <targetBytes>` policy pass: run q203's bin-packing
    * planner (`Layout.packBins`) over the table's CURRENT file census —
    * manifest paths + `Files.size`, zero data read — and apply it:
    * rewrite to the planned file count when the layout is fragmented
    * (more files than planned bins AND at least one small input), into
    * a clustered / z-ordered layout when `--cluster` names columns;
    * then reclaim superseded versions with `vacuum(--retain, default
    * 2)`. A table already within policy is left untouched (no rewrite
    * churn from a no-op maintenance cron). Returns lines a table
    * service would log: the before/after file counts and the plan.
    */
  private[graft] def maintain(t: graft.tables.ParquetTable,
      a: Map[String, String], target: Long): Unit = {
    val files = t.currentFiles
    val sizes = files.map { f =>
      try java.nio.file.Files.size(java.nio.file.Paths.get(f))
      catch { case _: Exception => 0L }
    }
    val plan = graft.queries.Layout.packBins(sizes, target)
    val nBins = plan.size
    val nSmall = plan.map(_._4).sum
    // fragmented = strictly more files than the plan needs; n_small is
    // reported as evidence (q203's n_small_inputs) but not gated on —
    // parquet's fixed per-file overhead keeps even 1-row files above a
    // bytes-only smallness cut at test scale
    if (files.size > nBins) {
      val v = (a.get("cluster").map(_.split(",").toSeq),
          a.get("partition_by").map(_.split(",").toSeq)) match {
        case (Some(cs), _) if cs.size == 1 => t.compactClustered(nBins, cs)
        case (Some(cs), _) => t.compactZOrdered(nBins, cs)
        // a table living under a k=v partition layout must be rewritten
        // THROUGH that layout — a plain compact() would flatten it and
        // silently destroy partition pruning for every later reader.
        // rewriteCurrent, not overwrite: a concurrent --append landing
        // mid-rewrite makes this recompute, never lose the appended rows
        case (None, Some(pcols)) =>
          import org.apache.spark.sql.functions.col
          t.rewriteCurrent(_.repartition(nBins, pcols.map(col): _*),
            partitionBy = pcols)
        case (None, None) => t.compact(nBins)
      }
      println(s"[table] maintain: packed ${files.size} files " +
        s"($nSmall small) -> ${t.currentFiles.size} " +
        s"(plan=$nBins bins) version=$v")
    } else {
      println(s"[table] maintain: layout within policy " +
        s"(${files.size} files, plan=$nBins bins) - no rewrite")
    }
    val removed = t.vacuum(a.getOrElse("retain", "2").toInt,
      olderThanMs = vacuumAgeMs(a))
    println(s"[table] maintain: vacuumed versions=${removed.mkString(",")}")
  }

  /** `--vacuum_age_hours N` → retention window for vacuum; defaults to
    * the table layer's 7-day safety window (a maintenance cron racing a
    * live writer must never reclaim in-flight state). 0 is the explicit
    * unsafe override for single-writer operation and tests.
    */
  private def vacuumAgeMs(a: Map[String, String]): Long =
    a.get("vacuum_age_hours").map(_.toLong * 3600L * 1000L)
      .getOrElse(graft.tables.ParquetTable.DefaultVacuumRetentionMs)

  def main(args: Array[String]): Unit = withSession { spark =>
    val a = parseArgs(args)
    val stats = a.get("stats").map(_.split(",").toSeq).getOrElse(Nil)
    val t = graft.tables.ParquetTable(spark, required(a, "table"), stats)
    a.get("append").foreach { dir =>
      val v = t.append(spark.read.parquet(dir))
      println(s"[table] appended version=$v rows=${t.read.count()} " +
        s"conflicts=${t.lastConflicts}")
    }
    if (a.contains("maintain")) {
      // policy pass: --cluster is a layout HINT here, not a standalone
      // action, and retention is part of the pass — the single-flag
      // invocation a maintenance cron runs
      maintain(t, a, a("maintain").toLong)
    } else {
      a.get("compact").foreach { n =>
        val v = t.compact(n.toInt)
        println(s"[table] compacted version=$v files=${t.currentFiles.size}")
      }
      a.get("cluster").foreach { cols0 =>
        val cols = cols0.split(",").toSeq
        val n = a.getOrElse("target_files", "1").toInt
        val v =
          if (cols.size == 1) t.compactClustered(n, cols)
          else t.compactZOrdered(n, cols)
        println(s"[table] clustered version=$v by=${cols.mkString(",")} " +
          s"files=${t.currentFiles.size}")
      }
      a.get("vacuum").foreach { k =>
        val removed = t.vacuum(k.toInt, olderThanMs = vacuumAgeMs(a))
        println(s"[table] vacuumed versions=${removed.mkString(",")}")
      }
      a.get("restore").foreach { v =>
        val nv = t.restore(v.toLong)
        println(s"[table] restored v=$v as version=$nv " +
          s"rows=${t.read.count()}")
      }
      if (a.contains("history")) t.history.foreach { h =>
        println(s"[table] v=${h.version} op=${h.op} ts=${h.tsMillis} " +
          s"files=${h.nFiles}")
      }
    }
  }
}

/** `--warehouse <dir> --bundle_dir <dir> --customer_id <id>` — one-shot
  * scoring through the serving path (feature store + version gate),
  * the CLI twin of POST /v1/churn/predict.
  */
object ScoreMain {
  import StageMains._
  def main(args: Array[String]): Unit = withSession { spark =>
    val a = parseArgs(args)
    val p = pipeline(spark, a)
    val bundle = graft.serving.Scorer.loadBundle(spark,
      required(a, "bundle_dir"))
    val store = graft.serving.Scorer.loadFeatureStore(spark,
      p.latestFeaturesPath)
    graft.serving.Scorer.predict(bundle, store,
      required(a, "customer_id")) match {
      case Some(pred) =>
        println(f"[score] customer=${pred.customerId} " +
          f"p_churn=${pred.probability}%.6f label=${pred.label} " +
          s"model=${pred.modelVersion}")
      case None =>
        println(s"[score] customer=${required(a, "customer_id")} NOT_FOUND")
        sys.exit(4)
    }
  }
}

/** `--table <root> --feed <root> --keys k1[,k2...] --compare c1[,c2...]
  * --checkpoint <dir>` — change-feed publication as an operational
  * stage: drain every unpublished commit of the table into the feed
  * (Trigger.AvailableNow catch-up-and-exit, the CorpusMain `--stream`
  * shape). Re-running with the same checkpoint publishes only what
  * landed since — including any commit whose record was still in
  * flight during the previous drain (the `_PUBLISHED` reconciliation
  * in `streaming.ChangeFeedStream`).
  */
object FeedMain {
  import StageMains._
  def main(args: Array[String]): Unit = withSession { spark =>
    val a = parseArgs(args)
    val feedRoot = required(a, "feed")
    graft.streaming.ChangeFeedStream.publishAvailable(spark,
      required(a, "table"), feedRoot,
      required(a, "keys").split(",").toSeq,
      required(a, "compare").split(",").toSeq,
      required(a, "checkpoint"))
    val pairs = graft.streaming.ChangeFeedStream.publishedPairs(feedRoot)
    val rows =
      if (pairs.isEmpty) 0L
      else graft.streaming.ChangeFeedStream.readFeed(spark, feedRoot).count()
    println(s"[feed] transitions=${pairs.size} rows=$rows")
  }
}

/** `--src <dir of landing base-table files> --state <tableRoot>
  * --checkpoint <dir>` — streaming quantile-MV maintenance as an
  * operational stage: drain unprocessed base files into the
  * additively-mergeable histogram state log, then print the served
  * percentiles (≤|groups| rows — bounded output by construction).
  * The file-source schema comes from the landed files themselves
  * (one footer read, no data scan).
  */
object QuantileMvMain {
  import StageMains._
  def main(args: Array[String]): Unit = withSession { spark =>
    val a = parseArgs(args)
    val state = required(a, "state")
    graft.streaming.QuantileStream.refreshAvailable(spark,
      required(a, "src"),
      spark.read.parquet(required(a, "src")).schema,
      state, required(a, "checkpoint"))
    val served = graft.streaming.QuantileStream.readQuantiles(spark, state)
      .orderBy("l_returnflag").collect()
    served.foreach { r =>
      println(s"[quantile_mv] group=${r.getAs[String]("l_returnflag")} " +
        s"n=${r.getAs[Long]("n_rows")} p50=${r.getAs[Long]("p50_cents")} " +
        s"p90=${r.getAs[Long]("p90_cents")} p99=${r.getAs[Long]("p99_cents")}")
    }
    println(s"[quantile_mv] groups=${served.length}")
  }
}

/** CLI stage for the streaming KMV distinct-sketch MV: drain landed
  * orders files into the k-min state log (AvailableNow), then print
  * the served per-scope + union sketch. Re-running with nothing new
  * landed is a no-op drain and reprints the same sketch.
  */
object KmvMvMain {
  import StageMains._
  def main(args: Array[String]): Unit = withSession { spark =>
    val a = parseArgs(args)
    val state = required(a, "state")
    graft.streaming.KmvStream.refreshAvailable(spark,
      required(a, "src"),
      spark.read.parquet(required(a, "src")).schema,
      state, required(a, "checkpoint"))
    val served = graft.streaming.KmvStream.readSketch(spark, state)
      .orderBy("scope").collect()
    served.foreach { r =>
      println(s"[kmv_mv] scope=${r.getAs[String]("scope")} " +
        s"n_mins=${r.getAs[Long]("n_mins")} " +
        s"kth=${r.getAs[Long]("kth_hash")} " +
        s"est=${r.getAs[Double]("est")}")
    }
    println(s"[kmv_mv] scopes=${served.length}")
  }
}
