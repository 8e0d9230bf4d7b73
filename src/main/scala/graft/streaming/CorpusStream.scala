package graft.streaming

import graft.pipeline.CorpusPipeline
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StringType, StructType}

/** Continuous corpus ingestion: document parquet files landing under a
  * source directory stream through the SAME corpus-scan-free
  * incremental path as the batch CLI (`CorpusPipeline.runIncremental`)
  * — quality floor, hash-index dedup, persisted-gram decontamination,
  * chunk, repack-touched-groups — via Structured Streaming's file
  * source + `foreachBatch`.
  *
  * Why this shape at 100 TB: the file source's checkpoint tracks which
  * files were delivered, and `foreachBatch` hands each micro-batch to
  * the incremental path, which reads NO corpus data (only the standing
  * hash index, gram set, and stats sidecar), so ingest cost tracks the
  * batch, not the corpus. Micro-batches run strictly one at a time, so
  * the append-only-id precondition is checked batch by batch exactly
  * as in CLI mode.
  *
  * EXACTLY-ONCE is earned, not assumed: `foreachBatch` delivery is
  * at-least-once (the checkpoint commits AFTER the batch function
  * returns, so a crash mid-fold replays the batch). The incremental
  * path closes the gap — its writes are idempotent batch-keyed
  * overwrites, and its sidecar commit carries a per-checkpoint ledger
  * of the last committed batch id, so a replayed batch is recognized
  * (`skipped = true`) and dropped instead of double-counting stats or
  * wedging on the append-only precondition. The checkpoint dir is the
  * ledger key because batch ids restart at 0 under a fresh checkpoint.
  *
  * [[ingestAvailable]] uses Trigger.AvailableNow: drain everything
  * new, then stop — the cron-style "catch up and exit" deployment.
  * [[startIngest]] exposes the long-lived deployment: pass a
  * processing-time trigger, keep the query running, stop it on your
  * own schedule; everything else is identical.
  */
object CorpusStream {

  private val DocSchema = new StructType()
    .add("doc_id", LongType)
    .add("text", StringType)

  /** A running ingest query plus access to the per-batch results it
    * has folded so far (replayed-and-skipped batches excluded).
    */
  final class IngestHandle private[CorpusStream] (
      val query: StreamingQuery,
      buf: scala.collection.mutable.ArrayBuffer[
        CorpusPipeline.IncrementalResult]) {
    def results: Seq[CorpusPipeline.IncrementalResult] =
      buf.synchronized(buf.toSeq)
  }

  /** Start the ingest stream under an arbitrary trigger and return the
    * handle — the long-lived-deployment entry point. The caller owns
    * the query lifecycle (`processAllAvailable`/`stop`/`awaitTermination`).
    */
  def startIngest(spark: SparkSession, srcDir: String, outDir: String,
      checkpointDir: String, trigger: Trigger): IngestHandle = {
    val buf = scala.collection.mutable.ArrayBuffer
      .empty[CorpusPipeline.IncrementalResult]
    val ledgerKey = new java.io.File(checkpointDir).getAbsolutePath
    val query = spark.readStream
      .schema(DocSchema)
      .parquet(srcDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        // foreachBatch may hand an empty batch on (re)start; the
        // incremental path requires at least one id to check order
        val persisted = batch.persist()
        try {
          if (persisted.limit(1).count() > 0) {
            val r = CorpusPipeline.runIncremental(spark, outDir, persisted,
              ledgerKey = Some(ledgerKey), batchId = Some(batchId))
            if (!r.skipped) buf.synchronized { buf += r; () }
          }
        } finally persisted.unpersist(blocking = false)
        ()
      }
      .start()
    new IngestHandle(query, buf)
  }

  /** Drain all unprocessed files under `srcDir` into the standing
    * corpus at `outDir` (which a full `CorpusPipeline.run` must have
    * initialized), tracking processed files in `checkpointDir`.
    * Returns one [[CorpusPipeline.IncrementalResult]] per non-empty
    * micro-batch, in processing order.
    */
  def ingestAvailable(spark: SparkSession, srcDir: String, outDir: String,
      checkpointDir: String): Seq[CorpusPipeline.IncrementalResult] = {
    val h = startIngest(spark, srcDir, outDir, checkpointDir,
      Trigger.AvailableNow())
    h.query.awaitTermination()
    h.results
  }
}
