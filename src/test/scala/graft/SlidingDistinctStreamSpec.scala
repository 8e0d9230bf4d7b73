package graft

import graft.streaming.EventStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Streaming sliding-window distinct (EventStream.slidingDistinct)
  * must equal its batch twin window-for-window after draining a
  * multi-batch stream: the per-window HLL++ sketch state merges
  * across micro-batches, and the sketch is deterministic, so the
  * parity is EXACT — not a tolerance check. Also audits the estimates
  * against exact distinct counts at the q170 bound.
  */
class SlidingDistinctStreamSpec extends AnyFunSuite with SparkSpec {

  test("drained sliding-distinct stream equals the batch twin exactly") {
    val ev = graft.common.Tables.load(spark, Sf, "events").cache()
    try {
      // two micro-batches split at the median timestamp, so most
      // windows receive contributions from BOTH batches — the merge
      // path, not just per-batch aggregation, is what's under test
      val mid = ev.select(
        percentile_approx(unix_micros(col("ts")), lit(0.5), lit(1000)))
        .head().getLong(0)
      val staged = java.nio.file.Files.createTempDirectory("slide_in")
      def stage(df: org.apache.spark.sql.DataFrame, name: String,
          mtime: Long): Unit = {
        val tmp = java.nio.file.Files.createTempDirectory("slide_part")
        df.coalesce(1).write.parquet(tmp.resolve("d").toString)
        val src = java.nio.file.Files.list(tmp.resolve("d"))
          .filter(_.toString.endsWith(".parquet")).findFirst().get()
        val dst = staged.resolve(name)
        java.nio.file.Files.copy(src, dst)
        java.nio.file.Files.setLastModifiedTime(
          dst, java.nio.file.attribute.FileTime.fromMillis(mtime))
      }
      stage(ev.filter(unix_micros(col("ts")) <= mid), "p1.parquet", 1000000L)
      stage(ev.filter(unix_micros(col("ts")) > mid), "p2.parquet", 2000000L)

      val sch = spark.read.parquet(staged.toString).schema
      val src = graft.common.Tables.normalizeEventTs(
        spark.readStream.schema(sch)
          .option("maxFilesPerTrigger", "1").parquet(staged.toString))
      val q = EventStream.slidingDistinct(src)
        .writeStream.format("memory").queryName("slide_parity")
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()

      val streamed = spark.table("slide_parity").collect()
        .map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getLong(2)))
        .toSet
      val batch = EventStream.slidingDistinctBatch(ev).collect()
        .map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getLong(2)))
        .toSet
      assert(streamed == batch)
      assert(streamed.nonEmpty)

      // estimates stay within the q170 audit bound of the exact counts
      val exact = ev
        .groupBy(window(col("ts"), "7 days", "1 day"))
        .agg(count_distinct(col("user_id")).as("n"))
        .collect()
        .map(r => (r.getStruct(0).getTimestamp(0),
          r.getStruct(0).getTimestamp(1)) -> r.getLong(1))
        .toMap
      streamed.foreach { case (s, e, est) =>
        val ex = exact((s, e))
        assert(math.abs(est.toDouble - ex) <= 0.05 * ex + 1.0,
          s"window $s..$e est=$est exact=$ex")
      }
    } finally ev.unpersist()
  }
}
