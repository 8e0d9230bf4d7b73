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
    val pred = Scorer.predict(bundle, store, "cust_0001").get
    assert(pred.probability >= 0.0 && pred.probability <= 1.0)
    assert(pred.label == 0 || pred.label == 1)
    assert(pred.modelVersion == bundle.modelVersion)
    assert(Scorer.predict(bundle, store, "no_such_customer").isEmpty)
  }

  test("in-process scorer matches the Spark ML pipeline to 1e-12 for every store customer") {
    val (_, bundle, store) = ctx
    assert(store.nonEmpty)
    store.keys.foreach { cid =>
      val fast = Scorer.predict(bundle, store, cid).get
      val oracle = Scorer.predictViaSparkJob(spark, bundle, store, cid).get
      assert(math.abs(fast.probability - oracle.probability) < 1e-12,
        s"$cid: in-process=${fast.probability} spark=${oracle.probability}")
      assert(fast.label == oracle.label)
    }
  }

  test("predict schedules zero Spark jobs per request") {
    val (_, bundle, store) = ctx
    val tracker = spark.sparkContext.statusTracker
    val before = tracker.getJobIdsForGroup(null).length
    (1 to 50).foreach { _ =>
      assert(Scorer.predict(bundle, store, "cust_0001").nonEmpty)
    }
    val after = tracker.getJobIdsForGroup(null).length
    assert(after == before,
      s"predict scheduled ${after - before} Spark jobs across 50 requests")
  }

  test("feature-version mismatch is refused, not mis-served") {
    val (_, bundle, store) = ctx
    val tampered = store.map { case (k, v) =>
      k -> v.copy(featureVersion = "stale0000"
      )
    }
    intercept[IllegalStateException] {
      Scorer.predict(bundle, tampered, "cust_0001")
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

  // --- HTTP loop e2e (reference services/api/tests/test_predict_auth.py:8-20,
  // test_predict_validation.py:8-23, over a real localhost port) ---

  private def http(port: Int, method: String, path: String,
      headers: Map[String, String] = Map.empty,
      body: Option[String] = None): (Int, Map[String, String], String) = {
    val url = java.net.URI.create(s"http://127.0.0.1:$port$path").toURL
    val c = url.openConnection().asInstanceOf[java.net.HttpURLConnection]
    c.setRequestMethod(method)
    headers.foreach { case (k, v) => c.setRequestProperty(k, v) }
    body.foreach { b =>
      c.setDoOutput(true)
      val os = c.getOutputStream
      try os.write(b.getBytes("UTF-8")) finally os.close()
    }
    val status = c.getResponseCode
    val stream = if (status >= 400) c.getErrorStream else c.getInputStream
    val text = new String(stream.readAllBytes(), "UTF-8")
    val respHeaders = Map("X-Request-Id" ->
      Option(c.getHeaderField("X-Request-Id")).getOrElse(""))
    c.disconnect()
    (status, respHeaders, text)
  }

  private def jsonField(body: String, key: String): Option[String] =
    graft.serving.Scorer.parseFlatJson(body).get(key)

  test("HTTP: auth failure returns 401 with error envelope + request id") {
    val (_, bundle, store) = ctx
    val srv = new graft.serving.PredictServer(
      spark, "test-api-key", Some(bundle), Some(store))
    srv.start()
    try {
      val p = srv.boundPort
      // no key at all (reference test_predict_auth.py)
      val (s1, h1, b1) = http(p, "POST", "/v1/churn/predict",
        body = Some("""{"customer_id": "cust_0001"}"""))
      assert(s1 == 401)
      assert(jsonField(b1, "detail").contains("Invalid or missing API key."))
      assert(jsonField(b1, "request_id").exists(_.nonEmpty))
      assert(h1("X-Request-Id").nonEmpty)
      // wrong key
      val (s2, _, _) = http(p, "POST", "/v1/churn/predict",
        headers = Map("X-API-Key" -> "nope"),
        body = Some("""{"customer_id": "cust_0001"}"""))
      assert(s2 == 401)
    } finally srv.stop()
  }

  test("HTTP: validation failure returns 422 with errors list") {
    val (_, bundle, store) = ctx
    val srv = new graft.serving.PredictServer(
      spark, "test-api-key", Some(bundle), Some(store))
    srv.start()
    try {
      val p = srv.boundPort
      // blank customer_id (reference test_predict_validation.py)
      val (s1, _, b1) = http(p, "POST", "/v1/churn/predict",
        headers = Map("X-API-Key" -> "test-api-key"),
        body = Some("""{"customer_id": "   "}"""))
      assert(s1 == 422)
      assert(jsonField(b1, "detail").contains("Invalid request payload."))
      assert(jsonField(b1, "request_id").exists(_.nonEmpty))
      assert(b1.contains("\"errors\": ["))
      // missing field entirely
      val (s2, _, _) = http(p, "POST", "/v1/churn/predict",
        headers = Map("X-API-Key" -> "test-api-key"), body = Some("{}"))
      assert(s2 == 422)
    } finally srv.stop()
  }

  test("HTTP: successful predict returns scored envelope; 404 on miss") {
    val (_, bundle, store) = ctx
    val srv = new graft.serving.PredictServer(
      spark, "test-api-key", Some(bundle), Some(store))
    srv.start()
    try {
      val p = srv.boundPort
      val (s1, h1, b1) = http(p, "POST", "/v1/churn/predict",
        headers = Map("X-API-Key" -> "test-api-key",
          "X-Request-Id" -> "req-e2e-1"),
        body = Some("""{"customer_id": "cust_0001"}"""))
      assert(s1 == 200)
      assert(jsonField(b1, "customer_id").contains("cust_0001"))
      val prob = jsonField(b1, "churn_probability").get.toDouble
      assert(prob >= 0.0 && prob <= 1.0)
      assert(Set("0", "1").contains(jsonField(b1, "churn_label").get))
      assert(jsonField(b1, "model_version").contains(bundle.modelVersion))
      assert(jsonField(b1, "request_id").contains("req-e2e-1")) // propagated
      assert(h1("X-Request-Id") == "req-e2e-1")
      val (s2, _, b2) = http(p, "POST", "/v1/churn/predict",
        headers = Map("X-API-Key" -> "test-api-key"),
        body = Some("""{"customer_id": "no_such_customer"}"""))
      assert(s2 == 404)
      assert(jsonField(b2, "detail")
        .contains("No serving features found for customer_id."))
      assert(srv.counters.getOrElse("predictions_total", 0L) == 1L)
    } finally srv.stop()
  }

  test("HTTP: not-ready stores answer 503; health/ready/version routes") {
    val (_, bundle, store) = ctx
    val notReady = new graft.serving.PredictServer(
      spark, "test-api-key", None, None)
    notReady.start()
    try {
      val p = notReady.boundPort
      val (hs, _, hb) = http(p, "GET", "/health")
      assert(hs == 200 && jsonField(hb, "status").contains("ok"))
      val (rs, _, rb) = http(p, "GET", "/ready")
      assert(rs == 503 && jsonField(rb, "status").contains("not_ready"))
      val (ps, _, pb) = http(p, "POST", "/v1/churn/predict",
        headers = Map("X-API-Key" -> "test-api-key"),
        body = Some("""{"customer_id": "cust_0001"}"""))
      assert(ps == 503)
      assert(jsonField(pb, "detail")
        .contains("Latest feature store is not ready."))
    } finally notReady.stop()

    // feature-version mismatch -> 503, never a mis-served score
    val stale = store.map { case (k, v) =>
      k -> v.copy(featureVersion = "stale0000")
    }
    val mismatched = new graft.serving.PredictServer(
      spark, "test-api-key", Some(bundle), Some(stale))
    mismatched.start()
    try {
      val p = mismatched.boundPort
      val (rs, _, rb) = http(p, "GET", "/ready")
      assert(rs == 200 && jsonField(rb, "status").contains("ready"))
      val (s, _, b) = http(p, "POST", "/v1/churn/predict",
        headers = Map("X-API-Key" -> "test-api-key"),
        body = Some("""{"customer_id": "cust_0001"}"""))
      assert(s == 503)
      assert(jsonField(b, "detail").exists(
        _.startsWith("Serving feature version does not match")))
      val (vs, _, vb) = http(p, "GET", "/version")
      assert(vs == 200 &&
        jsonField(vb, "model_version").contains(bundle.modelVersion))
    } finally mismatched.stop()
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
