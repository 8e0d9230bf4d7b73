package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Subprocess-shaped e2e: every pipeline stage runs as its OWN JVM
  * process (the reference launches each stage with `python -m src.<stage>`
  * from subprocesses in `tests/integration/test_slice_e2e.py:109-337`).
  * Crash-restart between stages is therefore a tested reality here: no
  * state survives a stage except what the tables/sidecars hold.
  */
class CliE2eSpec extends AnyFunSuite with SparkSpec {

  /** Classpath pieces recovered from loaded classes, not hardcoded: the
    * compiled classes dir from this project and the Spark jar dir.
    */
  private lazy val classesDir = new java.io.File(
    classOf[graft.pipeline.ChurnPipeline]
      .getProtectionDomain.getCodeSource.getLocation.toURI).getPath
  private lazy val sparkJarsGlob = new java.io.File(
    classOf[org.apache.spark.sql.SparkSession]
      .getProtectionDomain.getCodeSource.getLocation.toURI)
    .getParent + "/*"

  /** Spark-on-JDK17 module opens (what spark-submit passes). */
  private val opens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio", "java.base/java.util",
    "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic", "java.base/jdk.internal.ref",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar"
  ).map(p => s"--add-opens=$p=ALL-UNNAMED")

  /** Launch one stage main as a separate JVM; returns (exitCode, output). */
  private def stageRaw(mainClass: String,
      args: (String, String)*): (Int, String) = {
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val cmd = Seq(javaBin) ++ opens ++ Seq(
      "-Xmx2g", "-cp", s"$classesDir:$sparkJarsGlob",
      mainClass) ++ args.flatMap { case (k, v) => Seq(s"--$k", v) }
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val out = new String(proc.getInputStream.readAllBytes(), "UTF-8")
    val finished = proc.waitFor(240, java.util.concurrent.TimeUnit.SECONDS)
    assert(finished, s"$mainClass timed out.\n$out")
    (proc.exitValue(), out)
  }

  /** Launch one stage main as a separate JVM; asserts success, returns
    * its stdout.
    */
  private def stage(mainClass: String, args: (String, String)*): String = {
    val (rc, out) = stageRaw(mainClass, args: _*)
    assert(rc == 0, s"$mainClass exited $rc.\n${out.takeRight(4000)}")
    out
  }

  test("e2e slice across separate JVM stage processes") {
    import spark.implicits._
    val wh = Files.createTempDirectory("cli_e2e").toString
    val rawPath = s"$wh/raw_orders"
    Seq(
      ("A1", "CUST_0001", "delivered", "2025-01-10 10:00:00"),
      ("B1", "CUST_0002", "delivered", "2025-01-20 12:00:00"),
      ("C1", "CUST_0003", "delivered", "2025-02-15 09:00:00"),
      ("A2", "CUST_0001", "delivered", "2025-03-10 11:00:00"),
      ("C2", "CUST_0003", "delivered", "2025-04-10 15:00:00"),
      ("A3", "CUST_0001", "delivered", "2025-05-10 08:30:00"),
      ("Z1", "CUST_9999", "delivered", "2025-06-15 00:00:00"))
      .toDF("order_id", "customer_id", "order_status",
        "order_purchase_timestamp")
      .withColumn("order_approved_at", lit(null).cast("string"))
      .withColumn("order_delivered_carrier_date", lit(null).cast("string"))
      .withColumn("order_delivered_customer_date", lit(null).cast("string"))
      .withColumn("order_estimated_delivery_date", lit(null).cast("string"))
      .write.parquet(rawPath)
    val lake = s"$wh/lake"

    val b1 = stage("graft.pipeline.cli.BronzeMain",
      "input" -> rawPath, "warehouse" -> lake, "run_id" -> "cli-1")
    assert(b1.contains("rows=7") && b1.contains("skipped=false"))
    // idempotency survives the process boundary: a SECOND JVM skips
    val b2 = stage("graft.pipeline.cli.BronzeMain",
      "input" -> rawPath, "warehouse" -> lake, "run_id" -> "cli-2")
    assert(b2.contains("skipped=true"))

    val s1 = stage("graft.pipeline.cli.SilverMain",
      "warehouse" -> lake, "run_id" -> "cli-3",
      "expectations" -> "conf/expectations/silver_orders.json")
    assert(s1.contains("[silver] rows=7"))

    Seq("2025-01-31", "2025-02-28", "2025-03-31").foreach { d =>
      stage("graft.pipeline.cli.GoldMain",
        "warehouse" -> lake, "as_of_date" -> d, "run_id" -> s"cli-g-$d")
      stage("graft.pipeline.cli.LabelsMain",
        "warehouse" -> lake, "as_of_date" -> d, "run_id" -> s"cli-l-$d")
    }
    stage("graft.pipeline.cli.SnapshotMain",
      "warehouse" -> lake, "run_id" -> "cli-4")
    stage("graft.pipeline.cli.TrainMain",
      "warehouse" -> lake, "bundle_dir" -> s"$wh/bundle",
      "run_id" -> "cli-5", "validation_fraction" -> "0.34",
      "feature_contract" ->
        "conf/contracts/gold_customer_features_daily.v1.json")
    stage("graft.pipeline.cli.LatestFeaturesMain",
      "warehouse" -> lake, "run_id" -> "cli-6")

    // the reference e2e's prediction contract, through the CLI scorer
    val score = stage("graft.pipeline.cli.ScoreMain",
      "warehouse" -> lake, "bundle_dir" -> s"$wh/bundle",
      "customer_id" -> "cust_0001")
    assert(score.contains("customer=cust_0001") &&
      score.contains("p_churn="))

    // cust_0001 @ 2025-03-31 goldens (same as the unit/e2e fixtures),
    // read back from the tables the subprocesses wrote
    val snap = graft.tables.ParquetTable(spark,
      s"$lake/training_snapshot").read
    val c1 = snap.filter(col("customer_id") === "cust_0001" &&
      col("as_of_date") === to_date(lit("2025-03-31"))).collect()(0)
    assert(c1.getAs[Int]("recency_days") == 21)
    assert(c1.getAs[Long]("lifetime_orders") == 2L)
    assert(c1.getAs[Double]("avg_days_between_orders") == 59.0)

    // the sidecar set the stages must leave behind (reference
    // labels.py:82-112, build_training_snapshot.py:82-110,
    // build_latest_features.py:62-86)
    val meta = new java.io.File(s"$lake/_meta").list().toSet
    Seq("labels_2025-03-31.json", "training_snapshot.json",
      "latest_features_manifest.json", "silver_dq_report.json")
      .foreach(f => assert(meta.contains(f), s"missing sidecar $f"))
    val labelsMeta = graft.serving.Scorer
      .parseFlatJson(Files.readString(
        java.nio.file.Paths.get(s"$lake/_meta/labels_2025-03-31.json")))
    Seq("as_of_date", "label_horizon_days", "label_version",
      "labels_run_id", "row_count", "positive_rows", "negative_rows")
      .foreach(k => assert(labelsMeta.contains(k), s"labels sidecar lacks $k"))
    val snapMeta = graft.serving.Scorer.parseFlatJson(Files.readString(
      java.nio.file.Paths.get(s"$lake/_meta/training_snapshot.json")))
    Seq("data_snapshot_id", "row_count", "as_of_date_min", "as_of_date_max",
      "feature_version", "label_version", "payload_schema_hash")
      .foreach(k => assert(snapMeta.contains(k), s"snapshot sidecar lacks $k"))
    val manifest = graft.serving.Scorer.parseFlatJson(Files.readString(
      java.nio.file.Paths.get(s"$lake/_meta/latest_features_manifest.json")))
    Seq("latest_features_path", "row_count", "as_of_date_max",
      "feature_versions", "run_id")
      .foreach(k => assert(manifest.contains(k), s"manifest lacks $k"))
  }

  test("corpus pipeline runs as a CLI stage with the event contract") {
    import spark.implicits._
    val base = Files.createTempDirectory("cli_corpus").toString
    val sfDir = s"$base/sf"
    val out = s"$base/out"
    def txt(seed: Long) = (1 to 25).map(i => s"c${seed}x$i").mkString(" ")
    (0L until 60L).map(i => i -> txt(i)).toDF("doc_id", "text")
      .write.parquet(s"$sfDir/documents.parquet")

    val full = stage("graft.pipeline.cli.CorpusMain",
      "sf_dir" -> sfDir, "out" -> out, "run_id" -> "corpus-1")
    assert(full.contains("[corpus] mode=full input=60"))
    assert(Files.exists(java.nio.file.Paths.get(s"$out/packed")))

    // incremental batch through its own JVM against the standing output
    val batchPath = s"$base/batch"
    Seq(61L -> txt(61), 62L -> txt(7)) // one new, one corpus dup
      .toDF("doc_id", "text").write.parquet(batchPath)
    val inc = stage("graft.pipeline.cli.CorpusMain",
      "out" -> out, "run_id" -> "corpus-2",
      "incremental" -> batchPath)
    assert(inc.contains("mode=incremental batch=2 new=1"))

    // both runs left the started/completed pairs behind
    val lines = Files.readAllLines(
      java.nio.file.Paths.get(s"$out/_logs/pipeline.jsonl"))
      .toArray.toSeq.map(_.toString)
    Seq("corpus-1" -> "full", "corpus-2" -> "incremental").foreach {
      case (runId, mode) =>
        Seq("started", "completed").foreach { status =>
          assert(lines.exists(l => l.contains("\"stage\": \"corpus\"") &&
            l.contains(s""""run_id": "$runId"""") &&
            l.contains(s""""status": "$status"""") &&
            l.contains(s""""mode": "$mode"""")),
            s"missing $status event for $runId")
        }
    }

    // a refused incremental (non-append id) exits nonzero + failed event
    val badPath = s"$base/bad_batch"
    Seq(5L -> txt(990)).toDF("doc_id", "text").write.parquet(badPath)
    val (rc, _) = stageRaw("graft.pipeline.cli.CorpusMain",
      "out" -> out, "run_id" -> "corpus-3",
      "incremental" -> badPath)
    assert(rc != 0)
    val after = Files.readAllLines(
      java.nio.file.Paths.get(s"$out/_logs/pipeline.jsonl"))
      .toArray.toSeq.map(_.toString)
    assert(after.exists(l => l.contains(""""run_id": "corpus-3"""") &&
      l.contains(""""status": "failed"""") && l.contains("append-only")))
  }

  test("corpus stream mode drains landed files as a CLI stage, then no-ops") {
    import spark.implicits._
    val base = Files.createTempDirectory("cli_cstream").toString
    val sfDir = s"$base/sf"
    val out = s"$base/out"
    val src = s"$base/incoming"
    val ckpt = s"$base/ckpt"
    def txt(seed: Long) = (1 to 25).map(i => s"v${seed}x$i").mkString(" ")
    (0L until 60L).map(i => i -> txt(i)).toDF("doc_id", "text")
      .write.parquet(s"$sfDir/documents.parquet")
    stage("graft.pipeline.cli.CorpusMain",
      "sf_dir" -> sfDir, "out" -> out, "run_id" -> "cs-0")

    // two files land; the drain folds both (one new doc, one corpus dup)
    Seq(70L -> txt(700), 71L -> txt(7)).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(src)
    val drained = stage("graft.pipeline.cli.CorpusMain",
      "out" -> out, "run_id" -> "cs-1",
      "stream" -> src, "checkpoint" -> ckpt)
    assert(drained.contains("mode=stream") && drained.contains("new=1"),
      drained.linesIterator.filter(_.contains("[corpus]")).mkString)

    // a fresh JVM with the same checkpoint folds nothing
    val again = stage("graft.pipeline.cli.CorpusMain",
      "out" -> out, "run_id" -> "cs-2",
      "stream" -> src, "checkpoint" -> ckpt)
    assert(again.contains("mode=stream batches=0"),
      again.linesIterator.filter(_.contains("[corpus]")).mkString)

    // both drains left started/completed pairs with the stream mode tag
    val lines = Files.readAllLines(
      java.nio.file.Paths.get(s"$out/_logs/pipeline.jsonl"))
      .toArray.toSeq.map(_.toString)
    Seq("cs-1", "cs-2").foreach { runId =>
      Seq("started", "completed").foreach { status =>
        assert(lines.exists(l => l.contains(s""""run_id": "$runId"""") &&
          l.contains(s""""status": "$status"""") &&
          l.contains(""""mode": "stream"""")),
          s"missing $status event for $runId")
      }
    }
  }

  test("change feed drains through the CLI across separate JVM stages") {
    import spark.implicits._
    val base = Files.createTempDirectory("cli_feed").toString
    val tableRoot = s"$base/table"
    val feedRoot = s"$base/feed"
    val ckpt = s"$base/ckpt"
    val t = graft.tables.ParquetTable(spark, tableRoot)
    val v1 = t.overwrite((1L to 20L).map(i => (i, i.toDouble)).toDF("id", "price"))
    val v2 = t.merge(Seq((3L, 33.0), (21L, 21.0)).toDF("id", "price"), Seq("id"))

    val out1 = stage("graft.pipeline.cli.FeedMain",
      "table" -> tableRoot, "feed" -> feedRoot,
      "keys" -> "id", "compare" -> "price", "checkpoint" -> ckpt)
    assert(out1.contains("[feed] transitions=2"),
      out1.linesIterator.filter(_.contains("[feed]")).mkString)

    // a commit after the drain publishes incrementally on the next run
    val v3 = t.delete(col("id") <= 2L).get
    val out2 = stage("graft.pipeline.cli.FeedMain",
      "table" -> tableRoot, "feed" -> feedRoot,
      "keys" -> "id", "compare" -> "price", "checkpoint" -> ckpt)
    assert(out2.contains("[feed] transitions=3"),
      out2.linesIterator.filter(_.contains("[feed]")).mkString)

    // the CLI-built feed equals batch changesBetween transition by
    // transition (read back in THIS JVM — all state lives in the tables)
    val feed = graft.streaming.ChangeFeedStream.readFeed(spark, feedRoot)
    Seq(v1 -> v2, v2 -> v3).foreach { case (p, v) =>
      val streamed = feed.filter(col("to_version") === v)
        .drop("from_version", "to_version").collect().map(_.toString).toSet
      val batch = t.changesBetween(p, v, Seq("id"), Seq("price"))
        .collect().map(_.toString).toSet
      assert(streamed == batch, s"transition $p -> $v diverges")
    }
  }

  test("quantile MV maintains through the CLI and serves q198's integer readout") {
    import spark.implicits._
    val base = Files.createTempDirectory("cli_qmv").toString
    val src = s"$base/incoming"
    val state = s"$base/state"
    val ckpt = s"$base/ckpt"
    def land(seed: Int): Unit =
      (1 to 200).map { i =>
        (if ((seed + i) % 3 == 0) "A" else "R", (seed * 31 + i * 7).toDouble / 4)
      }.toDF("l_returnflag", "l_extendedprice")
        .coalesce(1).write.mode("append").parquet(src)

    land(1)
    val out1 = stage("graft.pipeline.cli.QuantileMvMain",
      "src" -> src, "state" -> state, "checkpoint" -> ckpt)
    assert(out1.contains("[quantile_mv] groups=2"),
      out1.linesIterator.filter(_.contains("[quantile_mv]")).mkString)

    // a second landing folds into the same state via the checkpoint
    land(2)
    stage("graft.pipeline.cli.QuantileMvMain",
      "src" -> src, "state" -> state, "checkpoint" -> ckpt)

    // served percentiles equal a one-shot recompute over ALL landed rows
    // (exact integer state: fold order cannot change the answer)
    val served = graft.streaming.QuantileStream.readQuantiles(spark, state)
      .collect().map(_.toString).toSet
    val oneShot = graft.queries.Lakehouse.quantileRead(
      graft.queries.Lakehouse.quantilePartial(spark.read.parquet(src)))
      .collect().map(_.toString).toSet
    assert(served == oneShot)
  }

  test("KMV sketch MV maintains through the CLI and serves q241's sketch") {
    import spark.implicits._
    val base = Files.createTempDirectory("cli_kmv").toString
    val src = s"$base/incoming"
    val state = s"$base/state"
    val ckpt = s"$base/ckpt"
    def land(seed: Int): Unit =
      (1 to 300).map { i =>
        (if ((seed + i) % 2 == 0) "1-URGENT" else "5-LOW",
          (seed * 97L + i * 13L) % 180L)
      }.toDF("o_orderpriority", "o_custkey")
        .coalesce(1).write.mode("append").parquet(src)

    land(1)
    val out1 = stage("graft.pipeline.cli.KmvMvMain",
      "src" -> src, "state" -> state, "checkpoint" -> ckpt)
    assert(out1.contains("[kmv_mv] scopes=3"), // 2 scopes + __union__
      out1.linesIterator.filter(_.contains("[kmv_mv]")).mkString)

    // a second landing folds into the same state via the checkpoint
    land(2)
    stage("graft.pipeline.cli.KmvMvMain",
      "src" -> src, "state" -> state, "checkpoint" -> ckpt)

    // the served sketch equals the one-shot k-min fold over ALL landed
    // rows (the KMV merge law; integer state, fold-order-free)
    val served = graft.streaming.KmvStream.readSketch(spark, state)
      .collect().map(_.toString).toSet
    val oneTable = Files.createTempDirectory("cli_kmv_one").toString
    graft.streaming.KmvStream.applyBatch(spark,
      spark.read.parquet(src), batchId = 0L, tableRoot = oneTable)
    val oneShot = graft.streaming.KmvStream.readSketch(spark, oneTable)
      .collect().map(_.toString).toSet
    assert(served == oneShot)
  }

  test("a failing stage process exits nonzero and logs a failed event") {
    val lake = s"${Files.createTempDirectory("cli_fail")}/lake"
    // silver against an empty warehouse: no bronze table to read
    val (rc, out) = stageRaw("graft.pipeline.cli.SilverMain",
      "warehouse" -> lake, "run_id" -> "cli-fail-1")
    assert(rc != 0, s"expected nonzero exit.\n${out.takeRight(2000)}")
    val log = java.nio.file.Paths.get(s"$lake/_logs/pipeline.jsonl")
    assert(Files.exists(log))
    val lines = Files.readAllLines(log).toArray.toSeq.map(_.toString)
    assert(lines.exists(l => l.contains("\"stage\": \"silver\"") &&
      l.contains("\"status\": \"failed\"") && l.contains("\"error\"")))
  }
}
