package graft.ml

import graft.common.Versioning
import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.evaluation.BinaryClassificationEvaluator
import org.apache.spark.ml.feature.{StandardScaler, VectorAssembler}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Churn model training, Spark-ML-native (replaces the reference's
  * sklearn StandardScaler + class-balanced LogisticRegression,
  * `src/training/train_stub.py:218-239`; split policy :181-199).
  *
  * Class balancing uses a weight column (n / (2 * n_class)) — the Spark
  * equivalent of sklearn's class_weight="balanced". Metrics: ROC-AUC and
  * PR-AUC from the built-in evaluator; Brier score as one aggregate.
  * Training is distributed (L-BFGS over the cluster) — no driver-side
  * collect of the training set, unlike the reference's toPandas.
  */
object ChurnTrainer {

  val FeatureCols: Seq[String] = Seq(
    "recency_days", "orders_30d", "orders_90d", "lifetime_orders",
    "customer_tenure_days", "avg_days_between_orders")

  final case class SplitResult(train: DataFrame, valid: DataFrame,
      validDates: Seq[String])

  /** Time-based split (`train_stub.py:181-199`): the last
    * ceil(fraction * n) distinct as_of dates (min 1, max n-1) go to
    * validation.
    */
  def timeSplit(df: DataFrame, validationFraction: Double): SplitResult = {
    val dates = df.select("as_of_date").distinct()
      .collect().map(_.get(0).toString).sorted
    if (dates.length < 2)
      throw new IllegalStateException(
        s"need >=2 distinct as_of dates to split, got ${dates.length}")
    val nValid = math.min(dates.length - 1,
      math.max(1, math.ceil(validationFraction * dates.length).toInt))
    val validDates = dates.takeRight(nValid).toSeq
    SplitResult(
      train = df.filter(!col("as_of_date").isin(validDates: _*)),
      valid = df.filter(col("as_of_date").isin(validDates: _*)),
      validDates = validDates)
  }

  /** Balanced class weights: w(c) = n / (2 * n_c). */
  def withBalancedWeights(df: DataFrame): DataFrame = {
    val counts = df.groupBy("churn_label").count()
      .collect().map(r => r.getAs[Any](0).toString.toInt -> r.getLong(1))
      .toMap
    val n = counts.values.sum.toDouble
    val w0 = n / (2.0 * counts.getOrElse(0, 1L))
    val w1 = n / (2.0 * counts.getOrElse(1, 1L))
    df.withColumn("weight",
      when(col("churn_label") === 1, lit(w1)).otherwise(lit(w0)))
  }

  final case class TrainResult(model: PipelineModel, metrics: Map[String, Double],
      modelVersion: String)

  /** @param expectedFeatureVersion when set (the re-hashed feature
    *   contract artifact), training REFUSES a snapshot stamped with any
    *   other `_feature_version` — the reference's contract gate
    *   (`train_stub.py:154-165`): a drifted contract must fail the run,
    *   not silently train on mismatched features.
    */
  def train(snapshot: DataFrame, validationFraction: Double = 0.2,
      expectedFeatureVersion: Option[String] = None): TrainResult = {
    expectedFeatureVersion.foreach { expected =>
      val versions = snapshot.select("_feature_version").distinct()
        .collect().map(_.getString(0)).toSeq
      if (versions != Seq(expected))
        throw new IllegalStateException(
          "feature contract hash does not match training snapshot " +
            s"feature version: contract=$expected, snapshot=$versions")
    }
    val base = snapshot.select(
      (Seq("as_of_date", "churn_label") ++ FeatureCols).map(col): _*)
    val split = timeSplit(base, validationFraction)
    val train = withBalancedWeights(split.train)

    val pipeline = new Pipeline().setStages(Array(
      new VectorAssembler()
        .setInputCols(FeatureCols.toArray).setOutputCol("features_raw"),
      new StandardScaler()
        .setInputCol("features_raw").setOutputCol("features")
        .setWithMean(true).setWithStd(true),
      new LogisticRegression()
        .setFeaturesCol("features").setLabelCol("churn_label")
        .setWeightCol("weight").setMaxIter(1000)))

    val model = pipeline.fit(train)
    val scoredValid = model.transform(
      split.valid.withColumn("weight", lit(1.0)))

    val rocAuc = new BinaryClassificationEvaluator()
      .setLabelCol("churn_label").setRawPredictionCol("rawPrediction")
      .setMetricName("areaUnderROC").evaluate(scoredValid)
    val prAuc = new BinaryClassificationEvaluator()
      .setLabelCol("churn_label").setRawPredictionCol("rawPrediction")
      .setMetricName("areaUnderPR").evaluate(scoredValid)
    // Brier = mean((p1 - y)^2), one distributed aggregate
    val p1 = element_at(vector_to_array(col("probability")), 2)
    val brier = scoredValid
      .agg(avg(pow(p1 - col("churn_label"), 2)).as("brier"))
      .collect()(0).getDouble(0)

    val metrics = Map(
      "roc_auc" -> rocAuc, "pr_auc" -> prAuc, "brier" -> brier,
      "n_train" -> split.train.count().toDouble,
      "n_valid" -> split.valid.count().toDouble)

    // model identity must cover the DATA it was trained on, not only the
    // recipe — the reference hashes data_snapshot_id/feature_version/
    // label_version into model_version (train_stub.py:241-251) so that a
    // retrain on different data cannot impersonate an approved model
    def lineage(c: String): String =
      if (!snapshot.columns.contains(c)) "none"
      else snapshot.select(c).distinct().limit(10).collect()
        .map(_.get(0).toString).sorted.mkString(",")
    val modelVersion = Versioning.stableHash(Map(
      "features" -> FeatureCols.mkString(","),
      "validation_dates" -> split.validDates.mkString(","),
      "data_snapshot_id" -> lineage("_data_snapshot_id"),
      "feature_version" -> lineage("_feature_version"),
      "label_version" -> lineage("_label_version"),
      "algo" -> "spark-ml-logreg-balanced", "version" -> "1"))

    TrainResult(model, metrics, modelVersion)
  }

  /** Score a features frame → probability of churn per customer (M4/M5). */
  def score(model: PipelineModel, features: DataFrame): DataFrame =
    model.transform(features.withColumn("weight", lit(1.0)))
      .withColumn("churn_probability",
        element_at(vector_to_array(col("probability")), 2))
      .select((Seq("customer_id") ++ Seq("churn_probability")).map(col): _*)

  private def vector_to_array(c: org.apache.spark.sql.Column) =
    org.apache.spark.ml.functions.vector_to_array(c)
}
