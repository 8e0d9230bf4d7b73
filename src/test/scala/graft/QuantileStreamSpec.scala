package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.QuantileStream

/** Streaming quantile-MV maintenance: landed base-table files fold into
  * the batch-keyed histogram state log; the served percentiles equal
  * the one-shot q198 derivation bit-for-bit (integer state), and batch
  * replay (at-least-once delivery) is absorbed by the keyed idempotent
  * upsert.
  */
class QuantileStreamSpec extends AnyFunSuite with SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("AvailableNow drain serves the same percentiles as the one-shot recompute; re-drain is a no-op") {
    val src = tmp("qmv_src")
    val table = tmp("qmv_table")
    val ckpt = tmp("qmv_ckpt")
    val li = graft.common.Tables.load(spark, Sf, "lineitem")

    (0 until 3).foreach { i =>
      li.filter(pmod(col("l_orderkey"), lit(3)) === i)
        .coalesce(1).write.mode("append").parquet(src)
    }
    QuantileStream.refreshAvailable(spark, src, li.schema, table, ckpt)

    val served = QuantileStream.readQuantiles(spark, table)
      .collect().map(_.toString).sorted.toSeq
    val oneShot = graft.queries.Lakehouse.quantileRead(
      graft.queries.Lakehouse.quantilePartial(li))
      .collect().map(_.toString).sorted.toSeq
    assert(served == oneShot)

    // nothing new landed: a second drain must not change the answer
    QuantileStream.refreshAvailable(spark, src, li.schema, table, ckpt)
    assert(QuantileStream.readQuantiles(spark, table)
      .collect().map(_.toString).sorted.toSeq == oneShot)
  }

  test("replaying a batch with the same id is absorbed (exactly-once effect)") {
    val table = tmp("qmv_replay")
    val li = graft.common.Tables.load(spark, Sf, "lineitem")
    val batch = li.filter(pmod(col("l_orderkey"), lit(4)) === 1)
    QuantileStream.applyBatch(spark,
      li.filter(pmod(col("l_orderkey"), lit(4)) === 0),
      batchId = 0L, tableRoot = table)
    QuantileStream.applyBatch(spark, batch, batchId = 1L, tableRoot = table)
    val once = QuantileStream.readQuantiles(spark, table)
      .collect().map(_.toString).sorted.toSeq
    QuantileStream.applyBatch(spark, batch, batchId = 1L, tableRoot = table)
    val twice = QuantileStream.readQuantiles(spark, table)
      .collect().map(_.toString).sorted.toSeq
    assert(twice == once)

    // the state log is histogram-sized, not corpus-sized: per batch at
    // most |groups|·|buckets| rows regardless of batch row count
    val stateRows = graft.tables.ParquetTable(spark, table).read.count()
    val groups = 3L // l_returnflag domain
    val buckets = graft.tables.ParquetTable(spark, table).read
      .select("bucket").distinct().count()
    assert(stateRows <= 2 * groups * buckets)
  }
}
