package graft

import graft.dq._
import graft.pipeline.ChurnPipeline
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Externalized DQ expectations: the silver gate is driven by a config
  * FILE (reference `data/expectations/silver/orders.yml`), and an edit
  * to that file — not a recompile — changes gating behavior.
  */
class DqConfigSpec extends AnyFunSuite with SparkSpec {

  test("shipped expectations file parses to the built-in check set") {
    val exp = DqConfig.load("conf/expectations/silver_orders.json")
    assert(exp.dataset == "orders" && exp.layer == "silver"
      && exp.version == "v1")
    assert(exp.checks.map(_.getClass.getSimpleName).sorted ==
      Seq("InSet", "NotNull", "UniqueKey"))
    assert(exp.checks.forall(_.severity == "critical"))
    val inSet = exp.checks.collectFirst { case c: InSet => c }.get
    assert(inSet.allowed == graft.pipeline.Silver.AllowedStatuses)
  }

  test("config parse errors are loud, not silent") {
    val p = Files.createTempFile("dq", ".json")
    Files.writeString(p, """{"checks": [{"type": "no_such_check"}]}""")
    intercept[IllegalArgumentException] { DqConfig.load(p.toString) }
    Files.writeString(p, """{"checks": []}""")
    intercept[IllegalArgumentException] { DqConfig.load(p.toString) }
  }

  test("a severity edit in the config flips the gate without recompile") {
    import spark.implicits._
    val wh = Files.createTempDirectory("dqconf").toString
    val rawPath = s"$wh/raw"
    Seq(("A1", "CUST_0001", "delivered", "2025-01-10 10:00:00"))
      .toDF("order_id", "customer_id", "order_status",
        "order_purchase_timestamp")
      .withColumn("order_approved_at", lit(null).cast("string"))
      .withColumn("order_delivered_carrier_date", lit(null).cast("string"))
      .withColumn("order_delivered_customer_date", lit(null).cast("string"))
      .withColumn("order_estimated_delivery_date", lit(null).cast("string"))
      .write.parquet(rawPath)

    def configJson(severity: String): String =
      s"""{"dataset": "orders", "layer": "silver", "version": "vtest",
           "checks": [
             {"name": "always_fires", "type": "predicate",
              "violated_when": "1 = 1", "severity": "$severity"},
             {"name": "ids_not_null", "type": "not_null",
              "columns": ["order_id"], "severity": "critical"}
           ]}"""
    val confPath = Paths.get(s"$wh/expectations.json")
    Files.writeString(confPath, configJson("critical"))

    val p = new ChurnPipeline(spark, s"$wh/lake",
      expectationsPath = Some(confPath.toString))
    p.ingestBronze(rawPath, "r1")
    // critical always-violated check -> the gate blocks the publish
    intercept[IllegalStateException] { p.publishSilver("r2") }

    // EDIT THE FILE (severity critical -> warn); same pipeline object,
    // no recompile: the publish now passes
    Files.writeString(confPath, configJson("warn"))
    assert(p.publishSilver("r3").count() == 1)
  }
}
