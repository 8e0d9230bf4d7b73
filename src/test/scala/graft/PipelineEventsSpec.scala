package graft

import graft.pipeline.ChurnPipeline
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Silver DQ failed-row quarantine samples (reference `dq.py:101-118`)
  * and uniform started/completed/failed stage events (reference
  * `orders_to_bronze.py:202-209,314-324`).
  */
class PipelineEventsSpec extends AnyFunSuite with SparkSpec {

  private def writeRaw(path: String): Unit = {
    import spark.implicits._
    Seq(
      ("A1", "CUST_0001", "delivered", "2025-01-10 10:00:00"),
      ("B1", "CUST_0002", "shipped", "2025-01-20 12:00:00"),
      ("C1", "CUST_0003", "delivered", "2025-02-15 09:00:00"),
      ("D1", "CUST_0001", "delivered", "2025-04-20 11:00:00"),
      ("E1", "CUST_0003", "delivered", "2025-06-15 00:00:00"))
      .toDF("order_id", "customer_id", "order_status",
        "order_purchase_timestamp")
      .withColumn("order_approved_at", lit(null).cast("string"))
      .withColumn("order_delivered_carrier_date", lit(null).cast("string"))
      .withColumn("order_delivered_customer_date", lit(null).cast("string"))
      .withColumn("order_estimated_delivery_date", lit(null).cast("string"))
      .write.parquet(path)
  }

  private def logLines(wh: String): Seq[String] = {
    val p = Paths.get(s"$wh/_logs/pipeline.jsonl")
    if (Files.exists(p)) Files.readAllLines(p).toArray.toSeq.map(_.toString)
    else Nil
  }

  test("failing DQ check quarantines its offending rows and the report links them") {
    val wh = Files.createTempDirectory("dq_quarantine").toString
    val rawPath = s"$wh/raw"
    writeRaw(rawPath)
    // expectations stricter than the normalize whitelist: 'shipped'
    // survives silver normalization but fails this gate
    val expPath = s"$wh/expectations.json"
    Files.writeString(Paths.get(expPath),
      """{ "dataset": "orders", "layer": "silver", "version": "vtest",
        |  "checks": [
        |    {"name": "status", "type": "in_set", "column": "order_status",
        |     "allowed": ["delivered"], "severity": "critical"}
        |  ] }""".stripMargin)
    val p = new ChurnPipeline(spark, s"$wh/lake", Some(expPath))
    p.ingestBronze(rawPath, "r1")
    val e = intercept[IllegalStateException] { p.publishSilver("r2") }
    assert(e.getMessage.contains("silver DQ gate failed"))

    // the <=100-row sample parquet exists and holds exactly the offenders
    val samplePath = s"$wh/lake/quarantine/silver_dq_in_set_order_status"
    val sample = spark.read.parquet(samplePath)
    assert(sample.count() == 1)
    assert(sample.select("order_status").collect()
      .map(_.getString(0)).toSeq == Seq("shipped"))

    // the report sidecar references the sample path
    val report = new String(Files.readAllBytes(
      Paths.get(s"$wh/lake/_meta/silver_dq_report.json")), "UTF-8")
    assert(report.contains("\"sample_in_set_order_status\""))
    assert(report.contains("quarantine/silver_dq_in_set_order_status"))

    // the gate failure logged a uniform failed event with the cause
    val failed = logLines(s"$wh/lake").filter(l =>
      l.contains("\"stage\": \"silver\"") && l.contains("\"status\": \"failed\""))
    assert(failed.nonEmpty && failed.head.contains("silver DQ gate failed"))
  }

  test("every stage logs started and completed on the happy path") {
    val wh = Files.createTempDirectory("stage_events").toString
    val rawPath = s"$wh/raw"
    writeRaw(rawPath)
    val p = new ChurnPipeline(spark, s"$wh/lake")
    p.ingestBronze(rawPath, "r1")
    p.publishSilver("r2")
    p.publishGold("2025-01-31", "r3")
    p.publishLabels("2025-01-31", "r4")
    val lines = logLines(s"$wh/lake")
    Seq("bronze", "silver", "gold", "labels").foreach { stage =>
      Seq("started", "completed").foreach { status =>
        assert(lines.exists(l => l.contains(s""""stage": "$stage"""") &&
          l.contains(s""""status": "$status"""")),
          s"missing $stage/$status in:\n${lines.mkString("\n")}")
      }
    }
    // no failures on the happy path
    assert(!lines.exists(_.contains("\"status\": \"failed\"")))
  }

  test("a crashed stage leaves a failed event and re-raises") {
    val wh = Files.createTempDirectory("stage_fail").toString
    val p = new ChurnPipeline(spark, s"$wh/lake")
    // silver with no bronze table underneath: the read throws
    intercept[IllegalStateException] { p.publishSilver("r1") }
    val lines = logLines(s"$wh/lake")
    assert(lines.exists(l => l.contains("\"stage\": \"silver\"") &&
      l.contains("\"status\": \"started\"")))
    val failed = lines.filter(l => l.contains("\"stage\": \"silver\"") &&
      l.contains("\"status\": \"failed\""))
    assert(failed.nonEmpty && failed.head.contains("\"error\""))
  }
}
