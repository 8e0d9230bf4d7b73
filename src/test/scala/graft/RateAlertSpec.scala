package graft

import graft.queries.Curation
import graft.streaming.EventStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Streaming rate-anomaly alerts (stream-static twin of q102): live
  * hourly counts scored against a batch-computed baseline must flag
  * exactly what the batch query flags when both see the same data.
  */
class RateAlertSpec extends AnyFunSuite with SparkSpec {

  test("streaming alerts equal the batch q102 rows on the same data") {
    val dir = java.nio.file.Files.createTempDirectory("rate_alert")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$Sf/events.parquet"),
      dir.resolve("events.parquet"))
    val batchEvents = graft.common.Tables.load(spark, Sf, "events")
    val baseline = Curation.typeStats(Curation.hourlyGrid(batchEvents))
    val q = EventStream.rateAnomalies(
      EventStream.readEvents(spark, dir.toString), baseline)
      .writeStream.format("memory").queryName("rate_alerts")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select(col("event_type"), col("hour_start"), col("n_events"),
        col("z_score"), col("is_anomaly"))
      .collect().map(_.toSeq).toSet
    val streamed = canon(spark.table("rate_alerts"))
    val batch = canon(
      SparkEntry.queries("q102_event_rate_anomaly")(spark, Sf))
    assert(streamed == batch)
    // and the data actually contains at least one anomaly to make the
    // parity meaningful
    assert(spark.table("rate_alerts").filter(col("is_anomaly")).count() > 0)
  }
}
