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

  /** File-stream source over an events parquet directory. Pass the
    * schema explicitly for cold-start deployments (a watched directory
    * that is still empty cannot be inferred from); omitted, the source
    * dir is schema-probed ONCE with a static read. Whatever physical
    * `ts` encoding arrives (legacy nanos long, micros NTZ, timestamp) is
    * canonicalized by the same Tables.normalizeEventTs branch as the
    * batch loader, so stream and batch agree by construction.
    */
  def readEvents(spark: SparkSession, dir: String,
      schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    val s = schema.getOrElse(
      try spark.read.parquet(dir).schema
      catch {
        case e: Exception if e.getMessage != null &&
            e.getMessage.toLowerCase.contains("nanos") =>
          spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          spark.read.parquet(dir).schema
      })
    graft.common.Tables.normalizeEventTs(
      spark.readStream.schema(s).parquet(dir))
  }

  /** Tumbling 1-hour windowed aggregate with a 2-hour watermark —
    * the streaming twin of q41. sum_value uses the exact-decimal
    * discipline (graft.common.Exact) so stream and batch agree
    * bit-for-bit regardless of partial-agg order.
    */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        graft.common.Exact.dsum(col("value")).as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Sliding 7-day windows advancing daily: distinct users per trailing
    * week off the live stream — the streaming twin of q170. Streaming
    * keeps ONE mergeable HLL++ sketch per open window (constant bytes
    * per window); an exact windowed `count(distinct)` is unsupported in
    * streaming precisely because its state would be the full id set per
    * window. The bounded-TOTAL-state contract holds in append/update
    * output modes, where the 2-day watermark evicts closed windows; in
    * `complete` mode the store retains every window ever opened — the
    * parity spec deliberately drains in complete mode to read all
    * windows at once, so it exercises correctness, not the
    * constant-memory path a production sink would use. The sketch is
    * deterministic, so the drained stream equals the batch run of the
    * same expression bit-for-bit (SlidingDistinctStreamSpec pins it).
    */
  def slidingDistinct(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 days")
      .groupBy(window(col("ts"), "7 days", "1 day"))
      .agg(approx_count_distinct(col("user_id")).as("approx_users"))
      .select(col("window.start").as("win_start"),
        col("window.end").as("win_end"), col("approx_users"))

  /** Batch twin of [[slidingDistinct]] for parity checks. */
  def slidingDistinctBatch(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "7 days", "1 day"))
      .agg(approx_count_distinct(col("user_id")).as("approx_users"))
      .select(col("window.start").as("win_start"),
        col("window.end").as("win_end"), col("approx_users"))

  // ---- stateful sessionization (mapGroupsWithState) ----
  final case class Event(event_id: Long, ts: java.sql.Timestamp,
      user_id: Long, event_type: String, value: Double)
  final case class SessionState(
      sessionSeq: Long, start: Long, end: Long, nEvents: Long)
  final case class SessionUpdate(
      user_id: Long, session_seq: Long, n_events: Long,
      session_start: java.sql.Timestamp, session_end: java.sql.Timestamp,
      closed: Boolean)

  val GapSeconds: Long = 30 * 60L

  /** Per-user gap sessionizer: emits every session CLOSED by an
    * intra-batch gap plus one open-session update per touched user, and
    * flushes idle users' open sessions via a processing-time timeout so
    * state stays bounded. Gap comparison truncates to whole seconds —
    * the same arithmetic as the batch twin q42's unix_timestamp diff, so
    * stream and batch agree on boundary gaps.
    */
  def sessionize(events: Dataset[Event],
      idleFlush: String = "1 hour"): Dataset[SessionUpdate] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionUpdate](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.ProcessingTimeTimeout()) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          def update(s: SessionState, closed: Boolean) = SessionUpdate(
            userId, s.sessionSeq, s.nEvents,
            new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.end),
            closed)
          if (state.hasTimedOut) {
            // idle user: close and drop the open session
            val out = state.getOption.map(update(_, closed = true)).toSeq
            state.remove()
            out.iterator
          } else {
            val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var s = state.getOption.getOrElse(SessionState(0L, -1L, -1L, 0L))
            val closedOut = Seq.newBuilder[SessionUpdate]
            sorted.foreach { e =>
              val t = e.ts.getTime
              s =
                if (s.start < 0) SessionState(1L, t, t, 1L)
                else if (t / 1000L - s.end / 1000L > GapSeconds) {
                  closedOut += update(s, closed = true)
                  SessionState(s.sessionSeq + 1, t, t, 1L)
                } else s.copy(end = math.max(s.end, t), nEvents = s.nEvents + 1)
            }
            state.update(s)
            state.setTimeoutDuration(idleFlush)
            (closedOut.result() :+ update(s, closed = false)).iterator
          }
      }
  }

  // ---- streaming transition pairs (q117's streaming twin) ----
  final case class LastEvent(ts: Long, eventId: Long, eventType: String)
  final case class Transition(
      user_id: Long, event_type: String, next_type: String)

  /** Per-user adjacent-event transition emitter — the streaming twin of
    * q117's transition matrix. State per user is ONE tuple (the last
    * event seen), so the state store holds |active users| rows
    * regardless of event volume; each micro-batch sorts its own events
    * per user and the state carries the boundary pair across batches.
    * Assumes per-user in-order arrival ACROSS micro-batches (the
    * log-shipping contract the file source provides when fed
    * time-ordered files); within a batch any order is fine. Downstream,
    * a grouped count over (event_type, next_type) — trivially tiny —
    * maintains the matrix incrementally.
    */
  def transitionPairs(events: Dataset[Event]): Dataset[Transition] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[LastEvent, Transition](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, batch: Iterator[Event], state: GroupState[LastEvent]) =>
          val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          val out = Seq.newBuilder[Transition]
          var prev = state.getOption
          sorted.foreach { e =>
            prev.foreach(p =>
              out += Transition(userId, p.eventType, e.event_type))
            prev = Some(LastEvent(e.ts.getTime, e.event_id, e.event_type))
          }
          prev.foreach(state.update)
          out.result().iterator
      }
  }

  // ---- streaming latest-value state (q144's streaming twin) ----
  final case class LatestState(ts: Long, eventId: Long, cents: Long)
  final case class LatestUpdate(
      user_id: Long, cents: Long, as_of_micros: Long, event_id: Long)

  /** Per-user latest-value maintainer — the streaming twin of q144's
    * LOCF panel: the state store continuously holds each user's most
    * recent event value (cents, (ts, event_id)-deterministic), which is
    * exactly the "filled" value a gap-day panel would carry forward.
    * State is ONE tuple per user; each micro-batch emits the refreshed
    * value per touched user, so a serving layer reading the update
    * stream always has the current carry-forward without recomputing
    * any panel. Cross-batch ordering is handled by the max-(ts,
    * event_id) compare, so late files that interleave users still
    * converge to the batch answer.
    */
  def latestValues(events: Dataset[Event]): Dataset[LatestUpdate] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[LatestState, LatestUpdate](
        GroupStateTimeout.NoTimeout()) {
        (userId: Long, batch: Iterator[Event], state: GroupState[LatestState]) =>
          var s = state.getOption.getOrElse(
            LatestState(Long.MinValue, Long.MinValue, 0L))
          batch.foreach { e =>
            // full microsecond key — Timestamp.getTime alone is ms and
            // would mis-order events inside the same millisecond
            val t = e.ts.getTime / 1000L * 1000000L + e.ts.getNanos / 1000L
            if (t > s.ts || (t == s.ts && e.event_id > s.eventId))
              // scalar twin of Exact.cents — same ⌊100·v+0.5⌉ convention
              s = LatestState(t, e.event_id,
                math.floor(e.value * 100.0 + 0.5).toLong)
          }
          state.update(s)
          // the update carries its own ordering key, so any consumer can
          // resolve multiple batches' emissions without sink-order
          // assumptions
          LatestUpdate(userId, s.cents, s.ts, s.eventId)
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

  /** Streaming incremental dedup — the streaming twin of the batch
    * q66 classifier. Incoming documents (doc_id, text, ts) are content-
    * hashed, first-arrival-deduped against the stream's own recent
    * history (`dropDuplicatesWithinWatermark` on the hash: state is
    * bounded by the watermark horizon, the streaming rendering of
    * q66's `dup_in_batch` window), then left-joined against the STATIC
    * corpus hash index (stream-static join: the static side is planned
    * per micro-batch, broadcast while it fits). Survivors emerge
    * labeled `new` or `dup_of_corpus` with the canonical survivor id —
    * exactly the rows an ingest sink appends vs skips.
    */
  def classifyIncoming(docs: DataFrame, corpusIdx: DataFrame,
      watermark: String = "2 hours"): DataFrame =
    docs
      .withColumn("content_hash",
        sha2(graft.functions.Text.norm(col("text")), 256))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("content_hash")
      .join(corpusIdx, Seq("content_hash"), "left")
      .select(col("doc_id"), col("content_hash"), col("ts"),
        when(col("corpus_doc_id").isNotNull, "dup_of_corpus")
          .otherwise("new").as("status"),
        coalesce(col("corpus_doc_id"), col("doc_id")).as("keep_doc_id"))

  /** Stream-stream conversion attribution — the watermarked
    * time-interval join Structured Streaming exists for: every purchase
    * joins the views by the same user in the preceding attribution
    * window, with BOTH sides watermarked and the time-range condition
    * bounding state (each side's join state evicts once the other
    * side's watermark passes the range — without the interval bound the
    * state store grows without limit, which at 100 TB/day of events is
    * the difference between a runnable query and an OOM). `leftOuter`
    * additionally emits each view with null purchase columns once the
    * watermark proves no conversion can arrive — the abandonment
    * stream; outer emission is DEFERRED by design until the watermark
    * closes the window, so the unmatched rows trail by one trigger.
    */
  def attributeConversions(views: DataFrame, purchases: DataFrame,
      watermark: String = "30 minutes",
      attributionWindow: String = "1 hour",
      leftOuter: Boolean = false): DataFrame = {
    val v = views.withWatermark("ts", watermark)
      .select(col("event_id").as("view_id"), col("user_id"),
        col("ts").as("view_ts"))
    val p = purchases.withWatermark("ts", watermark)
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("value"))
    v.join(p,
      col("user_id") === col("p_user") &&
        col("purchase_ts") >= col("view_ts") &&
        col("purchase_ts") <= col("view_ts") +
          expr(s"INTERVAL $attributionWindow"),
      if (leftOuter) "leftOuter" else "inner")
      .select(col("view_id"), col("user_id"), col("view_ts"),
        col("purchase_id"), col("purchase_ts"), col("value"))
  }

  /** Streaming rate-anomaly alerts — the streaming twin of the batch
    * q102: live hourly counts per event type are z-scored against a
    * BATCH-computed per-type baseline (`Curation.typeStats` over
    * historical data) and flagged at |z| > 2. Stream-static join: the
    * baseline is tiny (one row per event type, integer sums) and
    * broadcast per micro-batch, so the stream side stays one windowed
    * aggregation with watermark-bounded state — the standard production
    * monitoring shape (batch job refreshes the baseline on its own
    * cadence; the stream just scores against the latest snapshot). The
    * z arithmetic is the SAME expression object as the batch query, so
    * stream and batch flag identically on identical counts.
    */
  def rateAnomalies(events: DataFrame, baseline: DataFrame,
      watermark: String = "2 hours"): DataFrame = {
    val z = graft.queries.Curation.zScore
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n_events"))
      .join(broadcast(baseline), Seq("event_type"))
      .select(col("event_type"), col("hour_start"), col("n_events"),
        z.as("z_score"), (abs(z) > 2.0).as("is_anomaly"))
  }

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
