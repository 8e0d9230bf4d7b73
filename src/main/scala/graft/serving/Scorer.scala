package graft.serving

import graft.common.JsonIO
import graft.ml.ChurnTrainer
import org.apache.spark.ml.PipelineModel
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Serving path (reference M4-M7, the `services/api/app` tree minus HTTP):
  * model bundle save/load with required-metadata checks and an
  * approved-model pointer, an in-memory feature store built from the
  * latest-features export, and single-customer scoring with the
  * feature-version gate.
  */
object Scorer {

  final case class FeatureRecord(
      customerId: String, featureVersion: String,
      features: Map[String, Double])

  /** M5: latest-features export → Map lookup store (the reference loads
    * the export into a pandas dict at API start,
    * `local_latest_features.py:29-92`). One bounded collect at startup —
    * the export is one row per customer.
    */
  def loadFeatureStore(spark: SparkSession,
      latestFeaturesPath: String): Map[String, FeatureRecord] = {
    val cols = ChurnTrainer.FeatureCols
    spark.read.parquet(latestFeaturesPath)
      .select((Seq("customer_id", "_feature_version") ++ cols).map(col): _*)
      .collect().map { r =>
        val feats = cols.zipWithIndex.map { case (c, i) =>
          c -> r.get(i + 2).toString.toDouble
        }.toMap
        r.getString(0) -> FeatureRecord(r.getString(0), r.getString(1), feats)
      }.toMap
  }

  /** M7: model bundle = Spark-ML native save + JSON metadata sidecar. */
  def saveBundle(model: PipelineModel, dir: String, modelVersion: String,
      featureVersion: String, metrics: Map[String, Double]): Unit = {
    model.write.overwrite().save(s"$dir/model")
    JsonIO.write(s"$dir/model_meta.json",
      Map("model_version" -> modelVersion,
        "feature_version" -> featureVersion,
        "feature_cols" -> ChurnTrainer.FeatureCols.mkString(",")) ++
        metrics.map { case (k, v) => s"metric_$k" -> v })
  }

  /** Approved-model pointer (`train_stub.py:254-276` /
    * `model_loader.py:34-64`): loading refuses a bundle whose version
    * doesn't match the approval file.
    */
  def approve(dir: String, modelVersion: String): Unit =
    JsonIO.write(s"$dir/approved_model_version.json",
      Map("approved_model_version" -> modelVersion))

  final case class Bundle(model: PipelineModel, modelVersion: String,
      featureVersion: String)

  def loadBundle(spark: SparkSession, dir: String): Bundle = {
    val meta = readFlatJson(s"$dir/model_meta.json")
    val required = Seq("model_version", "feature_version", "feature_cols")
    val missing = required.filterNot(meta.contains)
    if (missing.nonEmpty)
      throw new IllegalStateException(s"model bundle missing keys: $missing")
    val approved = readFlatJson(s"$dir/approved_model_version.json")
      .getOrElse("approved_model_version",
        throw new IllegalStateException("no approved model pointer"))
    if (approved != meta("model_version"))
      throw new IllegalStateException(
        s"model ${meta("model_version")} is not the approved version $approved")
    Bundle(PipelineModel.load(s"$dir/model"),
      meta("model_version"), meta("feature_version"))
  }

  final case class Prediction(customerId: String, probability: Double,
      label: Int, modelVersion: String, featureVersion: String)

  /** M4+M6: score one customer from the store, gated on feature-version
    * equality (`predict.py:97-106`: mismatch → unavailable, not a wrong
    * answer).
    */
  def predict(spark: SparkSession, bundle: Bundle,
      store: Map[String, FeatureRecord],
      customerId: String): Option[Prediction] = {
    val rec = store.getOrElse(customerId, return None)
    if (rec.featureVersion != bundle.featureVersion)
      throw new IllegalStateException(
        s"serving features ${rec.featureVersion} != model's ${bundle.featureVersion}")
    // row layout derived from FeatureCols, never duplicated by hand — a
    // reordered/extended feature list must not silently shift values
    // under the wrong column names
    val schema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("customer_id",
        org.apache.spark.sql.types.StringType) +:
        ChurnTrainer.FeatureCols.map(c =>
          org.apache.spark.sql.types.StructField(c,
            org.apache.spark.sql.types.DoubleType)))
    val row = spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row.fromSeq(
        customerId +: ChurnTrainer.FeatureCols.map(rec.features))),
      schema)
    val p = ChurnTrainer.score(bundle.model, row).collect()(0).getDouble(1)
    Some(Prediction(customerId, p, if (p >= 0.5) 1 else 0,
      bundle.modelVersion, bundle.featureVersion))
  }

  /** Tiny flat-JSON reader for the sidecars this module writes. */
  private[serving] def readFlatJson(path: String): Map[String, String] =
    parseFlatJson(new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8"))

  /** Flat JSON-object parser (sidecars + request bodies — same shape as
    * JsonIO.render emits; nested objects are not produced or consumed).
    */
  private[graft] def parseFlatJson(txt: String): Map[String, String] =
    """"((?:[^"\\]|\\.)*)"\s*:\s*(?:"((?:[^"\\]|\\.)*)"|([-0-9.eE+]+|true|false))"""
      .r.findAllMatchIn(txt).map { m =>
        val k = unescape(m.group(1))
        val v = if (m.group(2) != null) unescape(m.group(2)) else m.group(3)
        k -> v
      }.toMap

  /** Inverse of JsonIO.escape — values must round-trip, not accumulate
    * literal backslash sequences.
    */
  private def unescape(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => sb.append('\n'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'u' if i + 5 < s.length =>
            sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar)
            i += 6
          case c => sb.append(c); i += 2
        }
      } else { sb.append(s.charAt(i)); i += 1 }
    }
    sb.toString
  }
}
