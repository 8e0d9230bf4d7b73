package graft.streaming

import graft.pipeline.CorpusPipeline
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StringType, StructType}

/** Continuous corpus ingestion: document parquet files landing under a
  * source directory stream through the SAME corpus-scan-free
  * incremental path as the batch CLI (`CorpusPipeline.runIncremental`)
  * — quality floor, hash-index dedup, persisted-gram decontamination,
  * chunk, repack-touched-groups — via Structured Streaming's file
  * source + `foreachBatch`.
  *
  * Why this shape at 100 TB: the file source's checkpoint is the
  * exactly-once ledger — a restarted stream never re-folds a file that
  * already reached the corpus, with no bookkeeping of our own; and
  * `foreachBatch` hands each micro-batch to the incremental path,
  * which reads NO corpus data (only the standing hash index, gram set,
  * and stats sidecar), so ingest cost tracks the batch, not the corpus.
  * Micro-batches run strictly one at a time, so the append-only-id
  * precondition is checked batch by batch exactly as in CLI mode.
  *
  * [[ingestAvailable]] uses Trigger.AvailableNow: drain everything new,
  * then stop — the cron-style "catch up and exit" deployment. A
  * long-lived deployment would pass a processing-time trigger instead;
  * everything else is identical.
  */
object CorpusStream {

  private val DocSchema = new StructType()
    .add("doc_id", LongType)
    .add("text", StringType)

  /** Drain all unprocessed files under `srcDir` into the standing
    * corpus at `outDir` (which a full `CorpusPipeline.run` must have
    * initialized), tracking processed files in `checkpointDir`.
    * Returns one [[CorpusPipeline.IncrementalResult]] per non-empty
    * micro-batch, in processing order.
    */
  def ingestAvailable(spark: SparkSession, srcDir: String, outDir: String,
      checkpointDir: String): Seq[CorpusPipeline.IncrementalResult] = {
    val results =
      scala.collection.mutable.ArrayBuffer
        .empty[CorpusPipeline.IncrementalResult]
    val query = spark.readStream
      .schema(DocSchema)
      .parquet(srcDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // foreachBatch may hand an empty batch on (re)start; the
        // incremental path requires at least one id to check order
        val persisted = batch.persist()
        try {
          if (persisted.limit(1).count() > 0) {
            results += CorpusPipeline.runIncremental(spark, outDir, persisted)
          }
        } finally persisted.unpersist(blocking = false)
        ()
      }
      .start()
    query.awaitTermination()
    results.toSeq
  }
}
