package graft

import graft.pipeline.ChurnPipeline
import graft.serving.Scorer
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Serving path (M4-M7): bundle save/approve/load, feature store,
  * version-gated prediction — driven end-to-end off a trained slice.
  */
class ServingSpec extends AnyFunSuite with SparkSpec {

  private lazy val ctx: (ChurnPipeline, Scorer.Bundle, Map[String, Scorer.FeatureRecord]) = {
    import spark.implicits._
    val wh = Files.createTempDirectory("serving_wh").toString
    val rawPath = s"$wh/raw"
    Seq(
      ("A1", "CUST_0001", "delivered", "2025-01-10 10:00:00"),
      ("B1", "CUST_0002", "delivered", "2025-01-20 12:00:00"),
      ("C1", "CUST_0003", "delivered", "2025-02-15 09:00:00"),
      ("A2", "CUST_0001", "delivered", "2025-03-10 11:00:00"),
      ("C2", "CUST_0003", "delivered", "2025-04-10 15:00:00"),
      ("A3", "CUST_0001", "delivered", "2025-05-10 08:30:00"),
      ("Z1", "CUST_9999", "delivered", "2025-06-15 00:00:00"))
      .toDF("order_id", "customer_id", "order_status",
        "order_purchase_timestamp")
      .withColumn("order_approved_at", lit(null).cast("string"))
      .withColumn("order_delivered_carrier_date", lit(null).cast("string"))
      .withColumn("order_delivered_customer_date", lit(null).cast("string"))
      .withColumn("order_estimated_delivery_date", lit(null).cast("string"))
      .write.parquet(rawPath)
    val p = new ChurnPipeline(spark, s"$wh/lake")
    p.ingestBronze(rawPath, "r1")
    p.publishSilver("r2")
    Seq("2025-01-31", "2025-02-28", "2025-03-31").foreach { d =>
      p.publishGold(d, s"g-$d"); p.publishLabels(d, s"l-$d")
    }
    val snap = p.publishTrainingSnapshot("r3")
    val tr = graft.ml.ChurnTrainer.train(snap, validationFraction = 0.34)
    p.exportLatestFeatures()

    val bundleDir = s"$wh/bundle"
    Scorer.saveBundle(tr.model, bundleDir, tr.modelVersion,
      p.featureVersion, tr.metrics)
    Scorer.approve(bundleDir, tr.modelVersion)
    val bundle = Scorer.loadBundle(spark, bundleDir)
    val store = Scorer.loadFeatureStore(spark, p.latestFeaturesPath)
    (p, bundle, store)
  }

  test("bundle round-trips with version + approval checks") {
    val (_, bundle, _) = ctx
    assert(bundle.modelVersion.nonEmpty && bundle.featureVersion.nonEmpty)
  }

  test("prediction returns a gated, bounded probability") {
    val (_, bundle, store) = ctx
    val pred = Scorer.predict(spark, bundle, store, "cust_0001").get
    assert(pred.probability >= 0.0 && pred.probability <= 1.0)
    assert(pred.label == 0 || pred.label == 1)
    assert(pred.modelVersion == bundle.modelVersion)
    assert(Scorer.predict(spark, bundle, store, "no_such_customer").isEmpty)
  }

  test("feature-version mismatch is refused, not mis-served") {
    val (_, bundle, store) = ctx
    val tampered = store.map { case (k, v) =>
      k -> v.copy(featureVersion = "stale0000"
      )
    }
    intercept[IllegalStateException] {
      Scorer.predict(spark, bundle, tampered, "cust_0001")
    }
  }

  test("auth utilities: constant-time key check, request id, log hash") {
    import graft.serving.Auth
    assert(Auth.checkApiKey(Some("secret-key"), "secret-key"))
    assert(!Auth.checkApiKey(Some("wrong"), "secret-key"))
    assert(!Auth.checkApiKey(None, "secret-key"))
    assert(!Auth.checkApiKey(Some("anything"), "")) // fail closed
    assert(Auth.requestId(Some("req-123")) == "req-123")
    assert(Auth.requestId(None).length == 36)
    val h = Auth.customerIdLogHash("cust_0001")
    assert(h.length == 12 && h.matches("[0-9a-f]{12}"))
    assert(h == Auth.customerIdLogHash("cust_0001")) // stable
  }

  test("unapproved model version refuses to load") {
    val (p, bundle, _) = ctx
    val dir = Files.createTempDirectory("bundle2").toString
    // reuse saved model but approve a different version
    Scorer.saveBundle(bundle.model, dir, "deadbeef00000000",
      p.featureVersion, Map.empty)
    Scorer.approve(dir, "someother0000000")
    intercept[IllegalStateException] { Scorer.loadBundle(spark, dir) }
  }
}
