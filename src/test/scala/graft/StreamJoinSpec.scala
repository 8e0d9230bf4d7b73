package graft

import graft.streaming.EventStream
import org.scalatest.funsuite.AnyFunSuite

/** Stream-stream watermarked interval join (conversion attribution):
  * in-window pairs join, out-of-window and cross-user pairs don't, and
  * the left-outer variant emits abandoned views with nulls once the
  * watermark proves no conversion can arrive.
  */
class StreamJoinSpec extends AnyFunSuite with SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  // (event_id, user_id, ts, value)
  private type Ev = (Long, Long, java.sql.Timestamp, Double)

  test("inner interval join: same user within the window, nothing else") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val session = spark
    import session.implicits._
    val views = MemoryStream[Ev](session)
    val buys = MemoryStream[Ev](session)
    def named(df: org.apache.spark.sql.DataFrame) =
      df.toDF("event_id", "user_id", "ts", "value")
    val q = EventStream.attributeConversions(
      named(views.toDF), named(buys.toDF))
      .writeStream.format("memory").queryName("conv_inner")
      .outputMode("append").start()
    try {
      views.addData(
        (1L, 10L, ts("2026-01-01 10:00:00"), 0.0),
        (2L, 20L, ts("2026-01-01 10:05:00"), 0.0))
      buys.addData(
        (100L, 10L, ts("2026-01-01 10:30:00"), 9.99), // joins view 1
        (101L, 10L, ts("2026-01-01 12:30:00"), 5.00), // > 1h after view 1
        (102L, 30L, ts("2026-01-01 10:10:00"), 1.00)) // no view for user 30
      q.processAllAvailable()
      val got = spark.table("conv_inner")
        .select("view_id", "purchase_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((1L, 100L)))
    } finally q.stop()
  }

  test("stream-stream join emits exactly the batch directed-window pairs") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.Trigger
    val dir = java.nio.file.Files.createTempDirectory("conv_parity")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$Sf/events.parquet"),
      dir.resolve("events.parquet"))
    val src = EventStream.readEvents(spark, dir.toString)
    val q = EventStream.attributeConversions(
      src.filter(col("event_type") === "view"),
      src.filter(col("event_type") === "purchase"))
      .writeStream.format("memory").queryName("conv_parity")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("conv_parity")
    val e = graft.common.Tables.load(spark, Sf, "events")
    val batch = graft.operators.TemporalJoins.directedWindowJoin(
      e.filter(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("user_id"),
          col("ts").as("view_ts")),
      e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"),
          col("user_id").as("p_user"), col("ts").as("purchase_ts"),
          col("value"))
        .withColumnRenamed("p_user", "user_id"),
      "user_id", "view_ts", "purchase_ts", 3600L)
      .select("view_id", "user_id", "view_ts",
        "purchase_id", "purchase_ts", "value")
    assert(streamed.count() == batch.count() && batch.count() > 0)
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }

  test("left outer: abandoned view surfaces with nulls after watermark") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val session = spark
    import session.implicits._
    val views = MemoryStream[Ev](session)
    val buys = MemoryStream[Ev](session)
    def named(df: org.apache.spark.sql.DataFrame) =
      df.toDF("event_id", "user_id", "ts", "value")
    val q = EventStream.attributeConversions(
      named(views.toDF), named(buys.toDF), leftOuter = true)
      .writeStream.format("memory").queryName("conv_outer")
      .outputMode("append").start()
    try {
      views.addData((1L, 10L, ts("2026-01-01 10:00:00"), 0.0))
      buys.addData((100L, 10L, ts("2026-01-01 10:30:00"), 9.99))
      q.processAllAvailable()
      // advance BOTH watermarks far past view 1's window (+1h) +
      // watermark (30m); the matched pair must not re-emit, the view
      // with no match in-window emits exactly once with nulls
      views.addData((2L, 99L, ts("2026-01-01 15:00:00"), 0.0))
      buys.addData((200L, 98L, ts("2026-01-01 15:00:00"), 1.0))
      q.processAllAvailable()
      // one more micro-batch pushing the watermark (18:00 - 30m =
      // 17:30) past view 2's window close (15:00 + 1h = 16:00) so the
      // state-eviction pass emits the unmatched row
      views.addData((3L, 99L, ts("2026-01-01 18:00:00"), 0.0))
      buys.addData((201L, 98L, ts("2026-01-01 18:00:00"), 1.0))
      q.processAllAvailable()
      val rows = spark.table("conv_outer")
        .select("view_id", "purchase_id").collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1))))
      val matched = rows.filter(_._2.isDefined).toSet
      assert(matched == Set((1L, Some(100L))))
      // view 1 matched → never emitted as unmatched
      assert(!rows.contains((1L, None)))
      // view 2 (15:00) window closed once watermark reached ~16:30 —
      // it must surface as abandoned exactly once
      assert(rows.count(_ == ((2L, None))) == 1)
    } finally q.stop()
  }
}
