package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.ChangeFeedStream
import graft.tables.ParquetTable

/** Streaming change-feed publication: tailing the manifest commit log
  * publishes, per commit, exactly the rows `changesBetween` derives for
  * that (predecessor, version) pair — batch parity transition by
  * transition — and replayed batches are absorbed by the keyed upsert.
  */
class ChangeFeedStreamSpec extends AnyFunSuite with SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def rowSet(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("AvailableNow drain publishes every commit's diff with batch parity; re-drain is a no-op") {
    import spark.implicits._
    val tableRoot = tmp("cf_table")
    val feedRoot = tmp("cf_feed")
    val ckpt = tmp("cf_ckpt")

    // three commits: base, keyed merge (update 1-5 + insert 101-103),
    // delete 36-40 — the LakehouseSpec state machine
    val t = ParquetTable(spark, tableRoot, statsColumns = Seq("id"))
    val base = (1L to 40L).map(i => (i, i.toDouble)).toDF("id", "price")
      .repartitionByRange(4, col("id"))
    val v1 = t.overwrite(base)
    val upserts = ((1L to 5L).map(i => (i, i + 0.5)) ++
      (101L to 103L).map(i => (i, i.toDouble))).toDF("id", "price")
    val v2 = t.merge(upserts, keys = Seq("id"))
    val v3 = t.delete(col("id").between(36L, 40L)).get

    ChangeFeedStream.publishAvailable(spark, tableRoot, feedRoot,
      keys = Seq("id"), compare = Seq("price"), checkpointDir = ckpt)
    val feed = ChangeFeedStream.readFeed(spark, feedRoot)

    // genesis commit: every base row is an insert from the empty table
    val genesis = feed.filter(col("to_version") === v1)
    assert(genesis.count() == 40L)
    assert(rowSet(genesis.select("change_type")) == Set("[insert]"))
    assert(rowSet(genesis.select("from_version")) ==
      Set(s"[${ChangeFeedStream.GenesisFrom}]"))

    // each subsequent transition equals the batch changesBetween for
    // exactly that (predecessor, version) pair
    Seq(v1 -> v2, v2 -> v3).foreach { case (p, v) =>
      val streamed = feed.filter(col("to_version") === v)
        .drop("from_version", "to_version")
      val batch = t.changesBetween(p, v, Seq("id"), Seq("price"))
      assert(rowSet(streamed) == rowSet(batch),
        s"transition $p -> $v diverges from batch changesBetween")
    }

    // nothing new committed: a second drain publishes nothing new
    val before = rowSet(feed)
    ChangeFeedStream.publishAvailable(spark, tableRoot, feedRoot,
      Seq("id"), Seq("price"), ckpt)
    assert(rowSet(ChangeFeedStream.readFeed(spark, feedRoot)) == before)

    // a NEW commit after the drain publishes incrementally on the next
    val v4 = t.merge(Seq((200L, 0.5)).toDF("id", "price"), Seq("id"))
    ChangeFeedStream.publishAvailable(spark, tableRoot, feedRoot,
      Seq("id"), Seq("price"), ckpt)
    val tail = ChangeFeedStream.readFeed(spark, feedRoot)
      .filter(col("to_version") === v4)
    assert(rowSet(tail.drop("from_version", "to_version")) ==
      rowSet(t.changesBetween(v3, v4, Seq("id"), Seq("price"))))
  }

  test("replaying a manifest batch is absorbed (exactly-once effect)") {
    import spark.implicits._
    val tableRoot = tmp("cf_replay_table")
    val feedRoot = tmp("cf_replay_feed")
    val t = ParquetTable(spark, tableRoot)
    t.overwrite((1L to 8L).map(i => (i, i.toDouble)).toDF("id", "price"))
    t.merge(Seq((3L, 9.9)).toDF("id", "price"), Seq("id"))

    // the announcement batch a file-source micro-batch would carry:
    // the manifest lines, attributed to their files
    val manifests = spark.read.text(s"$tableRoot/m")
    ChangeFeedStream.applyBatch(spark, manifests, tableRoot, feedRoot,
      Seq("id"), Seq("price"))
    val once = rowSet(ChangeFeedStream.readFeed(spark, feedRoot))
    assert(once.nonEmpty)
    // crash-replay: the same announcements arrive again — keyed merge
    // re-writes identical rows onto themselves
    ChangeFeedStream.applyBatch(spark, manifests, tableRoot, feedRoot,
      Seq("id"), Seq("price"))
    assert(rowSet(ChangeFeedStream.readFeed(spark, feedRoot)) == once)
  }
}
