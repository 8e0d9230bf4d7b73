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

  /** Publish every commit the batch's manifest files announce —
    * idempotent under replay. Package-visible so the spec can replay
    * it directly.
    */
  private[graft] def applyBatch(spark: SparkSession, batch: DataFrame,
      tableRoot: String, feedRoot: String, keys: Seq[String],
      compare: Seq[String]): Unit = {
    // the batch's PAYLOAD is irrelevant — the manifest FILE NAMES are
    // the commit announcements (bounded: one row per manifest line, one
    // file name per commit)
    val versions = batch.select(input_file_name().as("f")).distinct()
      .collect().map(_.getString(0))
      .collect { case ManifestRe(v) => v.toLong }
      .sorted
    if (versions.isEmpty) return
    val t = ParquetTable(spark, tableRoot)
    // A manifest lands (atomic move) momentarily BEFORE its commit
    // record; re-check briefly so a healthy writer's in-flight commit is
    // published rather than skipped. A version still uncommitted after
    // the grace window is a crashed writer's orphan — permanently
    // invisible to readers and correctly skipped here too.
    def committed(): Set[Long] = t.committedVersions
    var seen = committed()
    var tries = 0
    while (tries < 5 && !versions.forall(seen.contains)) {
      Thread.sleep(100L); seen = committed(); tries += 1
    }
    val publishable = versions.filter(seen.contains)
    if (publishable.isEmpty) return
    val allCommitted = seen.toSeq.sorted
    val feed = ParquetTable(spark, feedRoot)
    publishable.foreach { v =>
      val prev = allCommitted.takeWhile(_ < v).lastOption
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
      else feed.merge(rows, keys = Seq("from_version", "to_version") ++ keys)
    }
  }

  /** Drain all unpublished commits (Trigger.AvailableNow), then return. */
  def publishAvailable(spark: SparkSession, tableRoot: String,
      feedRoot: String, keys: Seq[String], compare: Seq[String],
      checkpointDir: String): Unit = {
    val q = start(spark, tableRoot, feedRoot, keys, compare, checkpointDir,
      Trigger.AvailableNow())
    q.awaitTermination()
  }

  /** The served feed: every published state transition, readable by
    * (from_version, to_version) slice.
    */
  def readFeed(spark: SparkSession, feedRoot: String): DataFrame =
    ParquetTable(spark, feedRoot).read
}
