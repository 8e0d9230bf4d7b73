package graft.pipeline

import graft.common.Versioning
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** 60-day churn labels (reference `src/training/labels.py:140-199`):
  * label 1 iff a customer active on or before as_of places no valid order
  * in (as_of, as_of + horizon]. Canceled/unavailable orders don't count as
  * retention activity.
  */
object Labels {

  val DefaultHorizonDays = 60
  val InvalidLabelStatuses: Seq[String] = Seq("canceled", "unavailable")

  def labelPolicyVersion(horizonDays: Int): String =
    Versioning.stableHash(Map(
      "label_horizon_days" -> horizonDays.toString,
      "invalid_statuses" -> InvalidLabelStatuses.sorted.mkString(","),
      "version" -> "1"))

  /** Training-eligibility guard (`labels.py:158-163`): the full future
    * window must be observable in the data.
    */
  def assertEligible(silver: DataFrame, asOfDate: String,
      horizonDays: Int): Unit = {
    val end = silver
      .agg(max(to_date(col("order_purchase_ts"))).as("end")).collect()(0)
    if (end.isNullAt(0))
      throw new IllegalStateException("silver orders empty; cannot label")
    val datasetEnd = end.getDate(0).toLocalDate
    val needed = java.time.LocalDate.parse(asOfDate).plusDays(horizonDays)
    if (needed.isAfter(datasetEnd))
      throw new IllegalStateException(
        s"as_of_date $asOfDate + ${horizonDays}d exceeds dataset end $datasetEnd")
  }

  /** Build labels for one as_of date. The churned side is a left join +
    * null check in the reference (J3); expressed here with the same shape
    * so the distinct-customer sets partition once on customer_id.
    */
  def buildLabels(silver: DataFrame, asOfDate: String,
      horizonDays: Int = DefaultHorizonDays, runId: String = "run"): DataFrame = {
    val asOf = to_date(lit(asOfDate))
    val orders = silver
      .select(col("customer_id"), col("order_status"),
        to_date(col("order_purchase_ts")).as("order_date"))

    val eligible = orders.filter(col("order_date") <= asOf)
      .select("customer_id").distinct()

    val validFuture = orders.filter(
      col("order_date") > asOf &&
        col("order_date") <= date_add(asOf, horizonDays) &&
        !col("order_status").isin(InvalidLabelStatuses: _*))
      .select(col("customer_id").as("future_customer_id")).distinct()

    eligible
      .join(validFuture,
        col("customer_id") === col("future_customer_id"), "left")
      .withColumn("churn_label",
        when(col("future_customer_id").isNull, lit(1)).otherwise(lit(0)))
      .drop("future_customer_id")
      .withColumn("as_of_date", asOf)
      .withColumn("_label_horizon_days", lit(horizonDays))
      .withColumn("_label_version", lit(labelPolicyVersion(horizonDays)))
      .withColumn("_labels_run_id", lit(runId))
      .withColumn("_labels_ts", current_timestamp())
      .select("customer_id", "as_of_date", "churn_label",
        "_label_horizon_days", "_label_version", "_labels_run_id",
        "_labels_ts")
  }
}
