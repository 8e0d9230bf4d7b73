package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType
import graft.queries.Lakehouse
import graft.tables.ParquetTable

/** Streaming materialized-view maintenance: base-table batches landing
  * as files stream through `foreachBatch` into a PARTIAL-STATE log, and
  * the MV read folds the log — the continuous counterpart of q106's
  * batch fold.
  *
  * Exactly-once is earned structurally, not via an external ledger:
  * each micro-batch's partial aggregate is upserted into the state
  * table KEYED BY (batch_key, group) through `ParquetTable.merge`, so
  * a foreachBatch replay after a crash (at-least-once delivery)
  * re-merges identical rows onto themselves — a no-op. The log grows by
  * ≤|groups| rows per batch; the fold that serves reads is a keyed sum
  * over |batches|×|groups| rows (exact integer state, so fold order is
  * free), and `ParquetTable.compact` folds the file count back down on
  * the maintenance cadence.
  */
object MvStream {

  private val StateKeys = Seq("batch_key", "l_returnflag", "l_linestatus")

  /** Start the maintenance stream over base-table files in `srcDir`
    * (schema required by the file source — pass the base table's).
    * Caller owns the query lifecycle.
    */
  def start(spark: SparkSession, srcDir: String, schema: StructType,
      tableRoot: String, checkpointDir: String,
      trigger: Trigger): StreamingQuery =
    spark.readStream
      .schema(schema)
      .parquet(srcDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(spark, batch, batchId, tableRoot)
      }
      .start()

  /** One micro-batch's effect on the state log — idempotent under
    * replay with the same (batchId, rows). Package-visible so specs can
    * replay it directly.
    */
  private[graft] def applyBatch(spark: SparkSession, batch: DataFrame,
      batchId: Long, tableRoot: String): Unit = {
    val persisted = batch.persist()
    try {
      if (persisted.limit(1).count() > 0) {
        val partial = Lakehouse.mvPartial(persisted)
          .withColumn("batch_key", lit(batchId))
        val t = ParquetTable(spark, tableRoot)
        if (!t.exists) t.overwrite(partial)
        else t.merge(partial, keys = StateKeys)
      }
    } finally { persisted.unpersist(blocking = false); () }
  }

  /** Drain all unprocessed base files into the state log
    * (Trigger.AvailableNow), then return.
    */
  def refreshAvailable(spark: SparkSession, srcDir: String,
      schema: StructType, tableRoot: String, checkpointDir: String): Unit = {
    val q = start(spark, srcDir, schema, tableRoot, checkpointDir,
      Trigger.AvailableNow())
    q.awaitTermination()
  }

  /** The served MV: fold the partial-state log across batches. Exact
    * integer state — any fold order/parallelism yields the bitwise
    * answer q106's one-shot recompute yields.
    */
  def readMv(spark: SparkSession, tableRoot: String): DataFrame =
    Lakehouse.mvRead(
      ParquetTable(spark, tableRoot).read
        .groupBy("l_returnflag", "l_linestatus").agg(
          sum("n_rows").as("n_rows"),
          sum("sum_qty").as("sum_qty"),
          sum("sum_price_cents").as("sum_price_cents"))
        .filter(col("n_rows") =!= 0))
}
