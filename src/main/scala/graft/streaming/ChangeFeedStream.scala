package graft.streaming

import graft.tables.ParquetTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming change-feed publication: the continuous counterpart of
  * `ParquetTable.changesBetween` (q105's table-layer form), completing
  * the lakehouse-maintenance family's streaming parity the way
  * `MvStream` does for q106.
  *
  * The commit log IS the manifest directory: every `ParquetTable`
  * commit atomically lands one immutable `m/v=N.manifest` file, so a
  * plain file-source stream over `m/` tails the commit log exactly the
  * way Delta's CDF reader tails `_delta_log` — no poll loop, no
  * custom source, and the checkpoint's processed-file set is the
  * stream's progress marker. Each micro-batch delivers the NEW
  * manifest files; `foreachBatch` resolves their versions, computes
  * each commit's row-level diff against its committed predecessor via
  * `changesBetween` (manifest symmetric difference — a commit that
  * rewrote 0.1% of files diffs 0.1% of the table), and upserts the
  * change rows into the feed table.
  *
  * Exactly-once is MvStream's structural pattern: the feed table is
  * keyed by (from_version, to_version, row keys) through
  * `ParquetTable.merge`, so an at-least-once `foreachBatch` replay
  * re-merges identical rows onto themselves — a no-op. Version
  * ordering inside a batch is explicit (ascending), and a version's
  * diff is against its predecessor in the COMMITTED sequence, so the
  * concatenated feed reproduces every intermediate state transition —
  * not just the endpoint diff.
  *
  * A batch's manifest announcements are a TRIGGER, not the work list:
  * each reconciliation publishes `committedVersions` minus the feed's
  * `_PUBLISHED` sidecar (one "from,to" line per published transition,
  * appended AFTER the rows merge — a crash between merge and append
  * republishes once and the keyed upsert absorbs it). So a commit whose
  * `_COMMITTED` record lands after the grace window is published by a
  * LATER reconciliation instead of dropped, and when a late commit w
  * lands after its successor v was already published as (u, v), the
  * chain is repaired: the stale skip-level rows for v are deleted and v
  * is re-published as (w, v), keeping the concatenated feed's
  * every-intermediate-transition contract intact. Both derivations are
  * metadata-only — O(|commits|) sidecar lines, never a feed-data scan.
  *
  * Repairs are derived from a standing INVARIANT, not from this
  * reconciliation's announcements: a published version whose recorded
  * predecessor is no longer its immediate committed predecessor needs
  * (re-)repair. That makes the delete+merge repair crash-idempotent —
  * a crash between the delete and the merge leaves the invariant
  * violated (the corrected pair is still unrecorded), so the NEXT
  * reconciliation retries the whole repair; deriving repairs from
  * "versions published this batch" would never retry, because the late
  * commit's own publication was already recorded before the crash.
  * And because the work list never depends on the announcements, a
  * reconciliation fired with NO new manifests (an empty micro-batch,
  * or the direct post-drain call in [[publishAvailable]]) still
  * publishes any commit whose record landed after the last drain.
  */
object ChangeFeedStream {

  /** from_version of the genesis commit's feed rows (every row of the
    * first version is an insert relative to the empty table).
    */
  val GenesisFrom: Long = -1L

  private val ManifestRe = ".*v=(\\d+)\\.manifest$".r

  /** Start tailing `tableRoot`'s commit log, publishing row-level
    * changes into the feed table at `feedRoot`. Caller owns the query
    * lifecycle.
    */
  def start(spark: SparkSession, tableRoot: String, feedRoot: String,
      keys: Seq[String], compare: Seq[String], checkpointDir: String,
      trigger: Trigger): StreamingQuery =
    spark.readStream
      .text(s"$tableRoot/m")
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyBatch(spark, batch, tableRoot, feedRoot, keys, compare)
      }
      .start()

  /** The published-transition sidecar: one "from,to" line per
    * transition the feed holds, appended after the rows merge. Reading
    * it is the metadata-only answer to "what has been published?" —
    * O(|commits|) lines, never a feed-data scan.
    */
  private def publishedLog(feedRoot: String): java.nio.file.Path =
    java.nio.file.Paths.get(feedRoot, "_PUBLISHED")

  private[graft] def publishedPairs(feedRoot: String): Set[(Long, Long)] = {
    val p = publishedLog(feedRoot)
    if (!java.nio.file.Files.exists(p)) Set.empty
    else new String(java.nio.file.Files.readAllBytes(p))
      .split("\n").iterator.map(_.trim).filter(_.nonEmpty)
      .map { line =>
        val Array(f, t) = line.split(","); (f.toLong, t.toLong)
      }.toSet
  }

  private def recordPublished(feedRoot: String, from: Long, to: Long): Unit =
    java.nio.file.Files.writeString(publishedLog(feedRoot), s"$from,$to\n",
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)

  /** Parse a micro-batch's manifest announcements and reconcile. The
    * batch's PAYLOAD is irrelevant — the manifest FILE NAMES are the
    * commit announcements (bounded: one row per manifest line, one
    * file name per commit). Package-visible so the spec can replay it
    * directly.
    */
  private[graft] def applyBatch(spark: SparkSession, batch: DataFrame,
      tableRoot: String, feedRoot: String, keys: Seq[String],
      compare: Seq[String]): Unit = {
    val announced = batch.select(input_file_name().as("f")).distinct()
      .collect().map(_.getString(0))
      .collect { case ManifestRe(v) => v.toLong }
      .sorted
    reconcile(spark, tableRoot, feedRoot, keys, compare, announced)
  }

  /** Publish every committed-but-unpublished transition and re-run any
    * incomplete chain repair — announcements only bound the grace-window
    * wait; the work list is derived entirely from `committedVersions`
    * against the `_PUBLISHED` sidecar, so a commit whose record landed
    * after an earlier drain (with no new manifests to fire a batch) is
    * published by any later invocation, and an interrupted delete+merge
    * repair retries until its corrected pair is recorded. Idempotent
    * under replay.
    */
  private[graft] def reconcile(spark: SparkSession, tableRoot: String,
      feedRoot: String, keys: Seq[String], compare: Seq[String],
      announced: Seq[Long] = Nil): Unit = {
    val t = ParquetTable(spark, tableRoot)
    // A manifest lands (atomic move) momentarily BEFORE its commit
    // record; re-check briefly so a healthy writer's in-flight commit is
    // published in THIS batch. A version still uncommitted after the
    // grace window is left for a later batch (a slow-but-healthy writer)
    // or never committed at all (a crashed writer's orphan — permanently
    // invisible to readers and correctly never published).
    def committed(): Set[Long] = t.committedVersions
    var seen = committed()
    var tries = 0
    while (tries < 5 && !announced.forall(seen.contains)) {
      Thread.sleep(100L); seen = committed(); tries += 1
    }
    val allCommitted = seen.toSeq.sorted
    val already = publishedPairs(feedRoot)
    val publishedTo = already.map(_._2)
    def predOf(v: Long): Option[Long] = allCommitted.takeWhile(_ < v).lastOption
    // the publish list: every committed version the feed has never
    // published — new commits, plus any late commit an earlier
    // reconciliation's grace window missed
    val newVs = allCommitted.filterNot(publishedTo.contains)
    // the repair list, from the standing invariant (see object doc): a
    // published version whose IMMEDIATE committed predecessor's pair is
    // unrecorded either straddles a late commit (stale skip-level rows)
    // or had its repair interrupted between delete and merge — both
    // retry here until the corrected pair lands in the sidecar
    val repairs = allCommitted.filter { s =>
      publishedTo.contains(s) &&
        !already.contains((predOf(s).getOrElse(GenesisFrom), s))
    }
    if (newVs.isEmpty && repairs.isEmpty) return
    val feed = ParquetTable(spark, feedRoot)

    def publish(prev: Option[Long], v: Long, replaceStale: Boolean): Unit = {
      val diff = prev match {
        case Some(p) => t.changesBetween(p, v, keys, compare)
        case None =>
          // genesis: every row is an insert relative to the empty table
          val snap = t.readVersion(v)
          graft.operators.ChangeFeed.snapshotDiff(
            snap.where(lit(false)), snap, keys, compare)
      }
      // merge keys lead the column order so the initial publish and
      // every later keyed merge agree on the feed's physical schema
      val valueCols = diff.columns.filterNot(keys.contains).toSeq
      val rows = diff
        .withColumn("from_version", lit(prev.getOrElse(GenesisFrom)))
        .withColumn("to_version", lit(v))
        .select((Seq("from_version", "to_version") ++ keys ++ valueCols)
          .map(col): _*)
      if (!feed.exists) feed.overwrite(rows)
      else {
        // chain repair: drop a stale skip-level transition's rows for
        // this to_version before the corrected (prev, v) rows land
        if (replaceStale) feed.delete(col("to_version") === v)
        feed.merge(rows, keys = Seq("from_version", "to_version") ++ keys)
      }
      recordPublished(feedRoot, prev.getOrElse(GenesisFrom), v)
    }

    newVs.foreach { v => publish(predOf(v), v, replaceStale = false) }
    repairs.foreach { s => publish(predOf(s), s, replaceStale = true) }
  }

  /** Drain all unpublished commits (Trigger.AvailableNow), then return.
    * After the drain, one direct reconciliation runs regardless of
    * whether any batch fired: a late commit whose record landed after
    * the previous drain produces NO new manifest file, so no micro-batch
    * would ever announce it — the post-drain pass publishes it (and
    * retries any interrupted repair) from the commit log alone.
    */
  def publishAvailable(spark: SparkSession, tableRoot: String,
      feedRoot: String, keys: Seq[String], compare: Seq[String],
      checkpointDir: String): Unit = {
    val q = start(spark, tableRoot, feedRoot, keys, compare, checkpointDir,
      Trigger.AvailableNow())
    q.awaitTermination()
    reconcile(spark, tableRoot, feedRoot, keys, compare)
  }

  /** The served feed: every published state transition, readable by
    * (from_version, to_version) slice.
    */
  def readFeed(spark: SparkSession, feedRoot: String): DataFrame =
    ParquetTable(spark, feedRoot).read
}
