package graft

import graft.multimodal.Media
import graft.streaming.EventStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalStreamingSpec extends AnyFunSuite with SparkSpec {

  test("media feature extraction is deterministic with fixed dim") {
    val media = Media.mediaFromDocuments(spark, Sf)
    val a = Media.extractFeatures(media).collect()
      .map(f => f.media_id -> f.feature.toSeq).toMap
    val b = Media.extractFeatures(media).collect()
      .map(f => f.media_id -> f.feature.toSeq).toMap
    assert(a == b)
    assert(a.values.forall(_.size == Media.FeatureDim))
    assert(a.size == media.count())
  }

  test("frame sampling emits bounded deterministic frames for videos") {
    val media = Media.mediaFromDocuments(spark, Sf)
    val frames = Media.sampleFrames(media, maxFrames = 4).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(f => f.frame_idx >= 0 && f.frame_idx < 4))
    val nVideos = media.filter(_.kind == "video").count()
    assert(frames.map(_.media_id).distinct.length == nVideos)
  }

  test("resize fits the box, preserves aspect, and passes non-images through") {
    val media = Media.mediaFromDocuments(spark, Sf)
    val out = Media.resize(media, maxW = 400, maxH = 225).collect()
    val in = media.collect().map(m => m.media_id -> m).toMap
    assert(out.nonEmpty)
    out.foreach { m =>
      val orig = in(m.media_id)
      if (orig.kind != "image" ||
          (orig.width <= 400 && orig.height <= 225)) {
        assert(m.width == orig.width && m.height == orig.height &&
          (m.bytes sameElements orig.bytes))
      } else {
        assert(m.width <= 400 && m.height <= 225)
        assert(m.bytes.length == m.width * m.height)
        // aspect preserved to integer truncation
        val scale = math.min(400.0 / orig.width, 225.0 / orig.height)
        assert(m.width == math.max(1, math.floor(orig.width * scale).toInt))
        assert(m.height == math.max(1, math.floor(orig.height * scale).toInt))
      }
    }
    // deterministic
    val again = Media.resize(media, maxW = 400, maxH = 225).collect()
    assert(out.map(_.bytes.toSeq).toSeq == again.map(_.bytes.toSeq).toSeq)
  }

  test("streaming hourly agg matches the batch q41 counts") {
    // file-stream sources need a directory: stage the single parquet file
    val dir = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$Sf/events.parquet"),
      dir.resolve("events.parquet"))
    val streamed = EventStream.runHourlyToMemory(
      spark, dir.toString, "hourly_test")
      .select("hour_start", "event_type", "n_events", "sum_value")
    val batch = SparkEntry.queries("q41_events_hourly")(spark, Sf)
      .select("hour_start", "event_type", "n_events", "sum_value")
    assert(streamed.count() == batch.count())
    // exact-decimal discipline: even the double sums match bit-for-bit
    assert(streamed.exceptAll(batch).count() == 0)
  }

  test("streaming incremental dedup classifies like batch q66") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val session = spark
    import session.implicits._
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    // static corpus: two docs, one of which the stream re-sends
    val corpus = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon"))
      .toDF("doc_id", "text")
    val corpusIdx = corpus
      .groupBy(sha2(graft.functions.Text.norm(col("text")), 256)
        .as("content_hash"))
      .agg(min("doc_id").as("corpus_doc_id"))
    val input = MemoryStream[(Long, String, java.sql.Timestamp)](session)
    val q = EventStream.classifyIncoming(
      input.toDF.toDF("doc_id", "text", "ts"), corpusIdx)
      .writeStream.format("memory").queryName("incoming_dedup")
      .outputMode("append").start()
    try {
      input.addData(
        (10L, "ALPHA beta   gamma", t0), // dup_of_corpus (normalizes to doc 1)
        (11L, "brand new text", t0), // new
        (12L, "brand  NEW text", t0)) // in-stream dup of 11 → dropped
      q.processAllAvailable()
      val out = spark.table("incoming_dedup")
        .select("doc_id", "status", "keep_doc_id").collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
      // 12 was swallowed by dropDuplicatesWithinWatermark (first arrival
      // 11 survives); 10 carries the corpus survivor id
      assert(out == Map(
        10L -> (("dup_of_corpus", 1L)),
        11L -> (("new", 11L))))
    } finally q.stop()
  }

  test("watermark drops late data in append mode across restarts") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    val base = java.nio.file.Files.createTempDirectory("late").toString
    val src = s"$base/src"; val out = s"$base/out"; val ckpt = s"$base/ckpt"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(src))

    def writeBatch(name: String, rows: Seq[(Long, String)]): Unit = {
      import spark.implicits._
      rows.toDF("epoch_s", "event_type")
        .select(timestamp_seconds(col("epoch_s")).as("ts"), col("event_type"))
        .coalesce(1).write.parquet(s"$base/stage_$name")
      // atomic-ish move into the watched dir
      val staged = new java.io.File(s"$base/stage_$name").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(staged.toPath,
        java.nio.file.Paths.get(src, s"$name.parquet"))
    }

    def runOnce(): Unit = {
      val schema = spark.read.parquet(src).schema
      val q = spark.readStream.schema(schema).parquet(src)
        .withWatermark("ts", "2 hours")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("hour_start"), col("event_type"), col("n"))
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append())
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    val h = 1700000000L - (1700000000L % 3600) // an exact hour boundary
    // batch 1: one event in window H, plus one 3.5h later -> watermark
    // advances past H+1h, finalizing window H with n=1
    writeBatch("b1", Seq((h + 600, "click"), (h + 12600, "click")))
    runOnce()
    // batch 2: a LATE event in window H (behind the watermark) -> dropped
    writeBatch("b2", Seq((h + 1200, "click"), (h + 16200, "click")))
    runOnce()

    val finalized = spark.read.parquet(out)
      .filter(col("hour_start") === timestamp_seconds(lit(h)))
      .agg(sum("n")).collect()(0).getLong(0)
    assert(finalized == 1L,
      s"late row behind the watermark must not change finalized window H (got $finalized)")
  }

  test("streaming dedup drops in-watermark duplicate event_ids") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("sdedup").toString
    val src = s"$base/src"
    Seq((1L, 1000L), (2L, 1010L), (1L, 1020L), (3L, 1030L), (2L, 1040L))
      .toDF("event_id", "epoch_s")
      .select(col("event_id"), timestamp_seconds(col("epoch_s")).as("ts"))
      .coalesce(1).write.parquet(src)
    val schema = spark.read.parquet(src).schema
    val q = EventStream.dedupeStream(
      spark.readStream.schema(schema).parquet(src))
      .writeStream.format("memory").queryName("sdedup_test")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val ids = spark.table("sdedup_test").select("event_id")
      .collect().map(_.getLong(0)).toSeq
    assert(ids.sorted == Seq(1L, 2L, 3L)) // dups of 1 and 2 dropped
  }

  test("stateful sessionizer produces the same session count as batch q42") {
    import spark.implicits._
    val events = graft.common.Tables.load(spark, Sf, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[EventStream.Event]
    // one mega-batch through the stateful function: each user's final
    // open-session update carries session_seq == that user's total
    // session count, and closed emissions cover all earlier sessions
    val updates = EventStream.sessionize(events).collect()
    val totalSessions = updates.groupBy(_.user_id)
      .map { case (_, us) => us.map(_.session_seq).max }.sum
    val batchSessions = SparkEntry.queries("q42_events_sessions")(spark, Sf)
      .count()
    assert(totalSessions == batchSessions)
    // every non-final session was emitted exactly once as closed
    val closedCount = updates.count(_.closed)
    val nUsers = updates.map(_.user_id).distinct.length
    assert(closedCount == totalSessions - nUsers)
  }
}
