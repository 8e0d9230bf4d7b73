package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.KmvStream

/** Streaming KMV maintenance: landed orders files fold into the
  * batch-keyed k-min state log; the served sketch equals q241's
  * whole-table sketch bit-for-bit (the KMV merge law), and batch
  * replay is absorbed by the keyed idempotent upsert.
  */
class KmvStreamSpec extends AnyFunSuite with SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def servedMap(table: String) =
    KmvStream.readSketch(spark, table).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap

  test("AvailableNow drain serves q241's sketch bit-for-bit; re-drain is a no-op") {
    val src = tmp("kmv_src")
    val table = tmp("kmv_table")
    val ckpt = tmp("kmv_ckpt")
    val orders = graft.common.Tables.load(spark, Sf, "orders")

    (0 until 3).foreach { i =>
      orders.filter(pmod(col("o_custkey"), lit(3)) === i)
        .coalesce(1).write.mode("append").parquet(src)
    }
    KmvStream.refreshAvailable(spark, src, orders.schema, table, ckpt)

    val served = servedMap(table)
    val batch = SparkEntry.queries("q241_kmv_distinct")(spark, Sf)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3),
        r.getDouble(4))).toMap
    assert(served == batch,
      s"streamed sketch diverged:\n$served\nvs\n$batch")

    // nothing new landed: a second drain must not change the answer
    KmvStream.refreshAvailable(spark, src, orders.schema, table, ckpt)
    assert(servedMap(table) == batch)
  }

  test("replaying a batch id is absorbed, and state stays sketch-sized") {
    val table = tmp("kmv_replay")
    val orders = graft.common.Tables.load(spark, Sf, "orders")
    val b0 = orders.filter(pmod(col("o_custkey"), lit(2)) === 0)
    val b1 = orders.filter(pmod(col("o_custkey"), lit(2)) === 1)
    KmvStream.applyBatch(spark, b0, batchId = 0L, tableRoot = table)
    KmvStream.applyBatch(spark, b1, batchId = 1L, tableRoot = table)
    val once = servedMap(table)
    KmvStream.applyBatch(spark, b1, batchId = 1L, tableRoot = table)
    assert(servedMap(table) == once)

    // per batch at most |scopes|·k state rows regardless of batch size
    val stateRows = graft.tables.ParquetTable(spark, table).read.count()
    assert(stateRows <= 2L * 5L * graft.queries.Sketches.KmvK)

    // growth only refines: adding the second half can only move each
    // scope's k-th min DOWN (more hashes compete for the k slots)
    val halfTable = tmp("kmv_half")
    KmvStream.applyBatch(spark, b0, batchId = 0L, tableRoot = halfTable)
    val half = servedMap(halfTable)
    once.foreach { case (scope, (_, kth, _)) =>
      half.get(scope).foreach { case (_, kthHalf, _) =>
        assert(kth <= kthHalf, s"$scope k-th min rose on growth")
      }
    }
  }
}
