package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Lakehouse
import graft.streaming.MvStream

/** Streaming MV maintenance: landed base-table files fold into the
  * batch-keyed partial-state log; the served MV equals the one-shot
  * recompute, and batch replay (at-least-once delivery) is absorbed by
  * the keyed idempotent upsert.
  */
class MvStreamSpec extends AnyFunSuite with SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("AvailableNow drain serves the same MV as a one-shot recompute; re-drain is a no-op") {
    val src = tmp("mv_src")
    val table = tmp("mv_table")
    val ckpt = tmp("mv_ckpt")
    val li = graft.common.Tables.load(spark, Sf, "lineitem")

    // land the base table as 3 file batches
    (0 until 3).foreach { i =>
      li.filter(pmod(col("l_orderkey"), lit(3)) === i)
        .coalesce(1).write.mode("append").parquet(src)
    }
    MvStream.refreshAvailable(spark, src, li.schema, table, ckpt)

    val served = MvStream.readMv(spark, table)
      .collect().map(_.toString).sorted.toSeq
    val oneShot = Lakehouse.mvRead(Lakehouse.mvPartial(li))
      .collect().map(_.toString).sorted.toSeq
    assert(served == oneShot)

    // nothing new landed: a second drain must not change the MV
    MvStream.refreshAvailable(spark, src, li.schema, table, ckpt)
    assert(MvStream.readMv(spark, table)
      .collect().map(_.toString).sorted.toSeq == oneShot)

    // late-landing files fold in incrementally (no reprocessing of the
    // already-absorbed batches: the state log only gains new batch keys)
    val before = graft.tables.ParquetTable(spark, table).read
      .select("batch_key").distinct().count()
    li.filter(pmod(col("l_orderkey"), lit(3)) === 0)
      .withColumn("l_quantity", col("l_quantity") * 2)
      .coalesce(1).write.mode("append").parquet(src)
    MvStream.refreshAvailable(spark, src, li.schema, table, ckpt)
    val after = graft.tables.ParquetTable(spark, table).read
      .select("batch_key").distinct().count()
    assert(after == before + 1)
  }

  test("replaying a batch with the same id is absorbed (exactly-once effect)") {
    val table = tmp("mv_replay")
    val li = graft.common.Tables.load(spark, Sf, "lineitem")
    val batch = li.filter(pmod(col("l_orderkey"), lit(4)) === 1)
    MvStream.applyBatch(spark, li.filter(pmod(col("l_orderkey"), lit(4)) === 0),
      batchId = 0L, tableRoot = table)
    MvStream.applyBatch(spark, batch, batchId = 1L, tableRoot = table)
    val once = MvStream.readMv(spark, table)
      .collect().map(_.toString).sorted.toSeq
    // crash-replay: the same batch id + rows arrive again
    MvStream.applyBatch(spark, batch, batchId = 1L, tableRoot = table)
    val twice = MvStream.readMv(spark, table)
      .collect().map(_.toString).sorted.toSeq
    assert(twice == once)
  }
}
