package graft.serving

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.common.JsonIO
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.{ConcurrentHashMap, Executors}
import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.sql.SparkSession

/** The serving process: an HTTP loop over `Scorer`/`Auth`, mirroring the
  * reference's FastAPI app (`services/api/app/main.py`,
  * `routers/predict.py:64-134`, `auth/api_key.py:17-28`,
  * `schemas/predict.py`) on the JDK's built-in `com.sun.net.httpserver` —
  * no new dependencies.
  *
  * Routes and envelopes (reference parity):
  *   - `POST /v1/churn/predict` — `X-API-Key` auth (constant-time check,
  *     401 `Invalid or missing API key.`), payload validation (422
  *     `Invalid request payload.` with an `errors` list), feature lookup
  *     (404), readiness + feature-version gate (503), scored response
  *     with model/feature versions and the request id.
  *   - `GET /health` / `GET /ready` / `GET /version` — liveness,
  *     readiness checks object (503 when not ready), version report.
  *
  * Request ids propagate from `X-Request-Id` or are minted per request,
  * appear in every response body AND the `X-Request-Id` response header
  * (the reference's RequestContextMiddleware). Counters mirror the
  * reference's observability increments; raw customer ids never reach
  * log lines (only `Auth.customerIdLogHash`).
  *
  * Scoring state is immutable after construction (bundle + in-memory
  * feature store), matching the reference's startup-loaded stores; a
  * `None` store/bundle models the not-ready states the reference
  * answers with 503.
  */
final class PredictServer(
    spark: SparkSession,
    apiKey: String,
    bundle: Option[Scorer.Bundle],
    store: Option[Map[String, Scorer.FeatureRecord]],
    port: Int = 0) {

  private val server =
    HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
  server.createContext("/", new RootHandler)
  server.setExecutor(Executors.newFixedThreadPool(4))

  private val counterMap = new ConcurrentHashMap[String, AtomicLong]()
  private def inc(name: String): Unit =
    counterMap.computeIfAbsent(name, _ => new AtomicLong()).incrementAndGet()
  def counters: Map[String, Long] = {
    val b = Map.newBuilder[String, Long]
    counterMap.forEach((k, v) => b += (k -> v.get()))
    b.result()
  }

  def start(): Unit = server.start()
  def stop(): Unit = server.stop(0)
  /** Bound port (pass port=0 to let the OS pick a free one). */
  def boundPort: Int = server.getAddress.getPort

  private final case class Resp(status: Int, json: String)

  private def errBody(detail: String, rid: String,
      errors: Option[Seq[(String, String)]] = None): String = {
    val errsPart = errors.map { es =>
      es.map { case (loc, msg) =>
        s"""{"loc": "${JsonIO.escape(loc)}", "msg": "${JsonIO.escape(msg)}"}"""
      }.mkString(""", "errors": [""", ", ", "]")
    }.getOrElse("")
    s"""{"detail": "${JsonIO.escape(detail)}", """ +
      s""""request_id": "${JsonIO.escape(rid)}"$errsPart}"""
  }

  private def route(method: String, path: String,
      presentedKey: Option[String], rid: String, body: String): Resp =
    (method, path) match {
      case ("GET", "/health") => Resp(200, """{"status": "ok"}""")
      case ("GET", "/ready") => ready()
      case ("GET", "/version") => version()
      case ("POST", "/v1/churn/predict") =>
        predict(presentedKey, rid, body)
      case (_, "/v1/churn/predict") | ("POST", "/health" | "/ready" | "/version") =>
        Resp(405, errBody("Method not allowed.", rid))
      case _ => Resp(404, errBody("Not found.", rid))
    }

  private def ready(): Resp = {
    val modelReady = bundle.isDefined
    val featuresReady = store.isDefined
    val all = modelReady && featuresReady
    val versions = bundle.map { b =>
      s""", "model_version": "${JsonIO.escape(b.modelVersion)}"""" +
        s""", "feature_version": "${JsonIO.escape(b.featureVersion)}"""" +
        s""", "approved_model_version": "${JsonIO.escape(b.modelVersion)}""""
    }.getOrElse("")
    Resp(if (all) 200 else 503,
      s"""{"status": "${if (all) "ready" else "not_ready"}", """ +
        s""""checks": {"model_store_ready": $modelReady, """ +
        s""""feature_store_ready": $featuresReady, """ +
        s""""observability_ready": true}$versions}""")
  }

  private def version(): Resp = {
    val versions = bundle.map { b =>
      s""", "model_version": "${JsonIO.escape(b.modelVersion)}"""" +
        s""", "feature_version": "${JsonIO.escape(b.featureVersion)}""""
    }.getOrElse("")
    Resp(200, s"""{"api_name": "graft churn api"$versions}""")
  }

  private def predict(presentedKey: Option[String], rid: String,
      body: String): Resp = {
    if (!Auth.checkApiKey(presentedKey, apiKey)) {
      inc("http_exception_401_total")
      return Resp(401, errBody("Invalid or missing API key.", rid))
    }
    val parsed = Scorer.parseFlatJson(body)
    val customerId = parsed.get("customer_id").map(_.trim) match {
      case None =>
        inc("http_validation_errors_total")
        return Resp(422, errBody("Invalid request payload.", rid,
          Some(Seq("customer_id" -> "field required"))))
      case Some("") =>
        inc("http_validation_errors_total")
        return Resp(422, errBody("Invalid request payload.", rid,
          Some(Seq("customer_id" -> "customer_id must not be blank."))))
      case Some(c) if c.length > 128 =>
        inc("http_validation_errors_total")
        return Resp(422, errBody("Invalid request payload.", rid,
          Some(Seq("customer_id" -> "customer_id too long (max 128)."))))
      case Some(c) => c
    }
    val st = store.getOrElse {
      inc("prediction_feature_store_not_ready_total")
      return Resp(503, errBody("Latest feature store is not ready.", rid))
    }
    val b = bundle.getOrElse {
      inc("prediction_model_store_not_ready_total")
      return Resp(503, errBody("Model store is not ready.", rid))
    }
    val rec = st.getOrElse(customerId, {
      inc("prediction_feature_miss_total")
      return Resp(404,
        errBody("No serving features found for customer_id.", rid))
    })
    if (rec.featureVersion != b.featureVersion) {
      inc("prediction_feature_version_mismatch_total")
      return Resp(503, errBody(
        "Serving feature version does not match approved model feature " +
          s"version. serving=${rec.featureVersion}, " +
          s"model=${b.featureVersion}", rid))
    }
    val pred = Scorer.predict(b, st, customerId).get
    inc("predictions_total")
    inc(s"predictions_label_${pred.label}_total")
    Resp(200,
      s"""{"customer_id": "${JsonIO.escape(pred.customerId)}", """ +
        s""""churn_probability": ${pred.probability}, """ +
        s""""churn_label": ${pred.label}, """ +
        s""""model_version": "${JsonIO.escape(pred.modelVersion)}", """ +
        s""""feature_version": "${JsonIO.escape(pred.featureVersion)}", """ +
        s""""request_id": "${JsonIO.escape(rid)}"}""")
  }

  private final class RootHandler extends HttpHandler {
    override def handle(ex: HttpExchange): Unit = {
      val rid = Auth.requestId(
        Option(ex.getRequestHeaders.getFirst("X-Request-Id")))
      val resp =
        try {
          val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
          route(ex.getRequestMethod,
            ex.getRequestURI.getPath,
            Option(ex.getRequestHeaders.getFirst("X-API-Key")),
            rid, body)
        } catch {
          case scala.util.control.NonFatal(_) =>
            inc("http_exception_500_total")
            Resp(500, errBody("Internal server error.", rid))
        }
      val bytes = resp.json.getBytes(UTF_8)
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.getResponseHeaders.set("X-Request-Id", rid)
      ex.sendResponseHeaders(resp.status, bytes.length.toLong)
      val os = ex.getResponseBody
      try os.write(bytes) finally os.close()
    }
  }
}

/** CLI entry point: `runMain graft.serving.PredictServerMain
  * <bundleDir> <latestFeaturesPath> [port]` with the API key from
  * `$GRAFT_API_KEY` (reference: `API_KEY` env, `api_key.py:13-14`).
  */
object PredictServerMain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: PredictServerMain <bundleDir> <latestFeaturesPath> [port]")
    val spark = SparkSession.builder()
      .appName("graft-predict-server")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    val apiKey = sys.env.getOrElse("GRAFT_API_KEY", "dev-api-key")
    val bundle = Scorer.loadBundle(spark, args(0))
    val store = Scorer.loadFeatureStore(spark, args(1))
    val port = if (args.length > 2) args(2).toInt else 8080
    val server = new PredictServer(spark, apiKey, Some(bundle),
      Some(store), port)
    server.start()
    println(s"[serving] listening on ${server.boundPort}")
    Thread.currentThread().join()
  }
}
