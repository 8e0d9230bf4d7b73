package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType
import graft.queries.Lakehouse
import graft.tables.ParquetTable

/** Streaming quantile-MV maintenance — the continuous counterpart of
  * q198's batch fold, completing the MV family's streaming parity
  * (counts/sums: MvStream; second moments: the stats MV; quantiles:
  * here). Base-table batches landing as files stream through
  * `foreachBatch` into an additively-mergeable HISTOGRAM state log
  * (group, bucket, cnt); the read folds the log and derives P50/90/99
  * in pure integer arithmetic.
  *
  * Exactly-once is structural (the MvStream pattern): each
  * micro-batch's histogram partial upserts KEYED BY
  * (batch_key, group, bucket) through `ParquetTable.merge`, so an
  * at-least-once foreachBatch replay re-merges identical rows onto
  * themselves — a no-op. State grows by ≤|groups|·|buckets| rows per
  * batch regardless of batch size, and the serving fold touches
  * |batches|·|groups|·|buckets| rows, never the corpus — the property
  * that makes a quantile MV viable at 100 TB where re-sorting the fact
  * table per refresh is not.
  */
object QuantileStream {

  private val StateKeys = Seq("batch_key", "l_returnflag", "bucket")

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

  /** One micro-batch's effect on the histogram state log — idempotent
    * under replay with the same (batchId, rows). Package-visible so
    * specs can replay it directly.
    */
  private[graft] def applyBatch(spark: SparkSession, batch: DataFrame,
      batchId: Long, tableRoot: String): Unit = {
    val persisted = batch.persist()
    try {
      if (persisted.limit(1).count() > 0) {
        val partial = Lakehouse.quantilePartial(persisted)
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

  /** The served quantiles: fold the histogram log across batches, then
    * derive the percentiles. Exact integer state — any fold
    * order/parallelism yields the bitwise answer q198's one-shot
    * recompute yields.
    */
  def readQuantiles(spark: SparkSession, tableRoot: String): DataFrame =
    Lakehouse.quantileRead(
      ParquetTable(spark, tableRoot).read
        .groupBy("l_returnflag", "bucket")
        .agg(sum("cnt").as("cnt"))
        .filter(col("cnt") =!= 0L))
}
