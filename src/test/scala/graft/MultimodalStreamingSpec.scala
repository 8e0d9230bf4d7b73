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

  test("streaming hourly agg matches the batch q41 counts") {
    // file-stream sources need a directory: stage the single parquet file
    val dir = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$Sf/events.parquet"),
      dir.resolve("events.parquet"))
    val streamed = EventStream.runHourlyToMemory(
      spark, dir.toString, "hourly_test")
      .select("hour_start", "event_type", "n_events")
    val batch = SparkEntry.queries("q41_events_hourly")(spark, Sf)
      .select("hour_start", "event_type", "n_events")
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).count() == 0)
  }

  test("stateful sessionizer produces the same session count as batch q42") {
    import spark.implicits._
    val events = graft.common.Tables.load(spark, Sf, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[EventStream.Event]
    // one mega-batch through the stateful function == final session state
    val updates = EventStream.sessionize(events).collect()
    val totalSessions = updates.map(_.session_seq).sum
    val batchSessions = SparkEntry.queries("q42_events_sessions")(spark, Sf)
      .count()
    assert(totalSessions == batchSessions)
  }
}
