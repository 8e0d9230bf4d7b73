package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType
import graft.queries.Sketches
import graft.tables.ParquetTable

/** Streaming KMV-sketch maintenance — the continuous counterpart of
  * q241's batch fold, extending the MV family's streaming parity to
  * CARDINALITY state (counts/sums: MvStream; second moments: stats MV;
  * quantiles: QuantileStream; distinct counts: here). Orders batches
  * landing as files stream through `foreachBatch` into a k-minimum-
  * values state log (batch_key, scope, h): each micro-batch
  * contributes its per-scope k smallest buyer hashes — ≤ |scopes|·k
  * rows per batch REGARDLESS of batch size, because the bounded-heap
  * partial reduces before the exchange — and the serve folds the log
  * back to the k smallest distinct hashes per scope. Correctness rides
  * the KMV merge law: the k smallest of a union are always contained
  * in the union of per-side k-mins, so the folded sketch is EXACTLY
  * the one q241 computes over the full table (the spec pins bitwise
  * parity, estimate included).
  *
  * Exactly-once is structural (the MvStream pattern): partials upsert
  * keyed by (batch_key, scope, h) through `ParquetTable.merge`, so an
  * at-least-once foreachBatch replay re-merges identical rows onto
  * themselves. State grows by ≤ |scopes|·k rows per batch; the serving
  * fold touches |batches|·|scopes|·k rows, never the corpus — a
  * distinct-count MV that stays refreshable at 100 TB where a
  * count-distinct recompute per refresh is not.
  */
object KmvStream {

  private val StateKeys = Seq("batch_key", "scope", "h")

  /** Start the maintenance stream over orders files in `srcDir`.
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

  /** One micro-batch's effect on the k-min state log — idempotent
    * under replay with the same (batchId, rows). Package-visible so
    * specs can replay it directly.
    */
  private[graft] def applyBatch(spark: SparkSession, batch: DataFrame,
      batchId: Long, tableRoot: String): Unit = {
    val persisted = batch.persist()
    try {
      if (persisted.limit(1).count() > 0) {
        val partial = Sketches.kmvTops(persisted)
          .select(col("scope"), explode(col("top")).as("r"))
          .select(col("scope"), col("r.id").as("h"))
          .withColumn("batch_key", lit(batchId))
        // merge already overwrites when the table has no version yet
        ParquetTable(spark, tableRoot).merge(partial, keys = StateKeys)
      }
    } finally { persisted.unpersist(blocking = false); () }
  }

  /** Drain all unprocessed orders files into the state log
    * (Trigger.AvailableNow), then return.
    */
  def refreshAvailable(spark: SparkSession, srcDir: String,
      schema: StructType, tableRoot: String, checkpointDir: String): Unit = {
    val q = start(spark, srcDir, schema, tableRoot, checkpointDir,
      Trigger.AvailableNow())
    q.awaitTermination()
  }

  /** The served sketch: fold the k-min log to each scope's k smallest
    * DISTINCT hashes (a buyer landing in several batches dedups here),
    * plus the merged `__union__` row across scopes — q241's sketch
    * surface minus the exact-count audit columns (exactness is the
    * batch query's job; the stream serves the sketch). The fold runs
    * on the ≤ |batches|·|scopes|·k state log, never the corpus.
    */
  def readSketch(spark: SparkSession, tableRoot: String): DataFrame = {
    val log = ParquetTable(spark, tableRoot).read
      .select(col("scope"), col("h")).distinct()
      .localCheckpoint()
    val perScope = log
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("scope")).orderBy(col("h"))))
      .filter(col("rn") <= Sketches.KmvK)
      .groupBy(col("scope"))
      .agg(count(lit(1)).as("n_mins"), max(col("h")).as("kth_hash"))
    val unionScope = log.select(col("h")).distinct()
      .orderBy(col("h")).limit(Sketches.KmvK)
      .agg(count(lit(1)).as("n_mins"), max(col("h")).as("kth_hash"))
      .select(lit("__union__").as("scope"), col("n_mins"), col("kth_hash"))
    perScope.unionByName(unionScope)
      .withColumn("est",
        Sketches.kmvEstimate(col("n_mins"), col("kth_hash")))
  }
}
