package graft

import graft.streaming.EventStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Streaming latest-value state (EventStream.latestValues) must
  * converge to the batch carry-forward: after draining a time-split
  * multi-batch stream, each user's final update equals the last event
  * value the batch LOCF panel (q144) carries on its final day —
  * including users whose latest event arrived in an EARLIER micro-batch
  * (only carried state can get those right).
  */
class LocfStreamSpec extends AnyFunSuite with SparkSpec {

  test("final streamed latest-value per user equals the batch panel's last day") {
    val session = spark
    import session.implicits._

    val ev = graft.common.Tables.load(spark, Sf, "events").cache()
    try {
      val mid = ev.select(
        percentile_approx(unix_micros(col("ts")), lit(0.5), lit(1000)))
        .head().getLong(0)
      val dir = java.nio.file.Files.createTempDirectory("locf_parity")
      ev.filter(unix_micros(col("ts")) <= mid).coalesce(1)
        .write.parquet(dir.resolve("f1").toString)
      ev.filter(unix_micros(col("ts")) > mid).coalesce(1)
        .write.parquet(dir.resolve("f2").toString)
      val staged = java.nio.file.Files.createTempDirectory("locf_in")
      def stage(sub: String, name: String, mtime: Long): Unit = {
        val src = java.nio.file.Files.list(dir.resolve(sub))
          .filter(_.toString.endsWith(".parquet")).findFirst().get()
        val dst = staged.resolve(name)
        java.nio.file.Files.copy(src, dst)
        java.nio.file.Files.setLastModifiedTime(
          dst, java.nio.file.attribute.FileTime.fromMillis(mtime))
      }
      stage("f1", "part1.parquet", 1000000L)
      stage("f2", "part2.parquet", 2000000L)

      val sch = spark.read.parquet(staged.toString).schema
      val src = graft.common.Tables.normalizeEventTs(
        spark.readStream.schema(sch)
          .option("maxFilesPerTrigger", "1").parquet(staged.toString))
        .select("event_id", "ts", "user_id", "event_type", "value")
        .as[EventStream.Event]
      val q = EventStream.latestValues(src)
        .writeStream.format("memory").queryName("locf_parity")
        .outputMode("update").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()

      // the memory sink holds one row per (user, batch); each update
      // carries its own (as_of_micros, event_id) key, so the surviving
      // state is the max-key row per user — no sink-order assumptions
      val batches = spark.table("locf_parity")
      assert(batches.count() > ev.select("user_id").distinct().count(),
        "expected multiple micro-batches' updates in the sink")
      val finalStream = batches
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("user_id")
            .orderBy(col("as_of_micros").desc, col("event_id").desc)))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("cents"))

      val batchLatest = SparkEntry.queries("q144_locf_panel")(spark, Sf)
        .filter(col("day") === lit("2024-01-30").cast("date"))
        .select(col("user_id"), col("filled_cents").as("cents"))

      assert(finalStream.exceptAll(batchLatest).count() == 0)
      assert(batchLatest.exceptAll(finalStream).count() == 0)
    } finally ev.unpersist()
  }
}
