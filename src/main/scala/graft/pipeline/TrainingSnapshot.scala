package graft.pipeline

import graft.common.Versioning
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training snapshot assembly (reference
  * `src/training/build_training_snapshot.py:140-235`): gold features ⋈
  * labels on (customer_id, as_of_date), lineage carried from both sides,
  * stamped with a deterministic data_snapshot_id.
  */
object TrainingSnapshot {

  final case class Bounds(minAsOf: String, maxAsOf: String)

  def build(gold: DataFrame, labels: DataFrame, runId: String,
      asOfStart: Option[String] = None,
      asOfEnd: Option[String] = None): DataFrame = {
    def slice(df: DataFrame): DataFrame = {
      val s = asOfStart.map(d => df.filter(col("as_of_date") >= to_date(lit(d))))
        .getOrElse(df)
      asOfEnd.map(d => s.filter(col("as_of_date") <= to_date(lit(d))))
        .getOrElse(s)
    }
    val g = slice(gold).alias("g")
    val l = slice(labels).alias("l")

    val payload = g.join(l, Seq("customer_id", "as_of_date"), "inner")
      .select(
        col("customer_id"), col("as_of_date"), col("recency_days"),
        col("orders_30d"), col("orders_90d"), col("lifetime_orders"),
        col("customer_tenure_days"), col("avg_days_between_orders"),
        col("churn_label"),
        col("g._snapshot_id").as("_feature_snapshot_id"),
        col("g._feature_version").as("_feature_version"),
        col("l._label_version").as("_label_version"),
        col("l._label_horizon_days").as("_label_horizon_days"))

    assertQuality(payload)

    val bounds = payload.agg(
      min("as_of_date").as("lo"), max("as_of_date").as("hi")).collect()(0)
    if (bounds.isNullAt(0))
      throw new IllegalStateException(
        "training snapshot assembly produced zero rows " +
          "(no (customer_id, as_of_date) overlap between gold and labels)")
    val dataSnapshotId = Versioning.stableHash(Map(
      "as_of_date_min" -> bounds.get(0).toString,
      "as_of_date_max" -> bounds.get(1).toString,
      "feature_version" -> singleDistinct(payload, "_feature_version"),
      "label_version" -> singleDistinct(payload, "_label_version"),
      "label_horizon_days" -> singleDistinct(payload, "_label_horizon_days"),
      "payload_schema_hash" -> Versioning.stableHash(payload.schema.json),
      "version" -> "1"))

    payload
      .withColumn("_data_snapshot_id", lit(dataSnapshotId))
      .withColumn("_training_run_id", lit(runId))
      .withColumn("_training_ts", current_timestamp())
  }

  private def singleDistinct(df: DataFrame, c: String): String = {
    val vs = df.select(c).distinct().limit(3).collect().map(_.get(0).toString)
    if (vs.length != 1)
      throw new IllegalStateException(
        s"expected a single distinct $c, got ${vs.toSeq}")
    vs.head
  }

  /** Quality gate (`build_training_snapshot.py:46-79`). */
  def assertQuality(df: DataFrame): Unit = {
    import graft.dq._
    val report = DqRunner.run(df, Seq(
      NotNull(Seq("customer_id", "as_of_date", "recency_days",
        "orders_30d", "orders_90d", "lifetime_orders",
        "customer_tenure_days", "avg_days_between_orders", "churn_label")),
      UniqueKey(Seq("customer_id", "as_of_date")),
      Predicate("invalid_label", !col("churn_label").isin(0, 1))))
    if (!report.passed)
      throw new IllegalStateException(
        s"training snapshot quality gate failed: ${report.criticalFailures}")
  }
}
