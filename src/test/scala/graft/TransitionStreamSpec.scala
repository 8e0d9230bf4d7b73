package graft

import graft.streaming.EventStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Streaming transition pairs (EventStream.transitionPairs) must emit
  * exactly the batch transition matrix (q117) — including the pairs
  * that straddle a micro-batch boundary, which only the carried
  * last-event state can produce.
  */
class TransitionStreamSpec extends AnyFunSuite with SparkSpec {

  test("stream over time-split files reproduces q117's pair counts") {
    val session = spark
    import session.implicits._

    val ev = graft.common.Tables.load(spark, Sf, "events").cache()
    try {
      val mid = ev.select(
        percentile_approx(unix_micros(col("ts")), lit(0.5), lit(1000)))
        .head().getLong(0)
      val dir = java.nio.file.Files.createTempDirectory("transition_parity")
      // two time-ordered files => at least two micro-batches with
      // maxFilesPerTrigger=1, so cross-batch state carry is exercised
      ev.filter(unix_micros(col("ts")) <= mid).coalesce(1)
        .write.parquet(dir.resolve("f1").toString)
      ev.filter(unix_micros(col("ts")) > mid).coalesce(1)
        .write.parquet(dir.resolve("f2").toString)
      val staged = java.nio.file.Files.createTempDirectory("transition_in")
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
      val q = EventStream.transitionPairs(src)
        .writeStream.format("memory").queryName("transition_parity")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()

      val streamed = spark.table("transition_parity")
        .groupBy("event_type", "next_type")
        .agg(count(lit(1)).cast("long").as("n_pairs"))
      val batch = SparkEntry.queries("q117_event_transitions")(spark, Sf)
        .select("event_type", "next_type", "n_pairs")
      assert(batch.count() > 0)
      assert(streamed.exceptAll(batch).count() == 0)
      assert(batch.exceptAll(streamed).count() == 0)
      // state carry actually fired: the stream saw >= 2 batches and the
      // total pair count still equals events - users (no boundary loss)
      val nPairs = spark.table("transition_parity").count()
      assert(nPairs ==
        ev.count() - ev.select("user_id").distinct().count())
    } finally ev.unpersist()
  }
}
