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

  test("a late commit is published by a later batch and the chain repaired") {
    import spark.implicits._
    val tableRoot = tmp("cf_late_table")
    val feedRoot = tmp("cf_late_feed")
    val t = ParquetTable(spark, tableRoot)
    val v1 = t.overwrite((1L to 10L).map(i => (i, i.toDouble)).toDF("id", "price"))
    val v2 = t.merge(Seq((3L, 30.0), (11L, 11.0)).toDF("id", "price"), Seq("id"))
    val v3 = t.merge(Seq((5L, 50.0)).toDF("id", "price"), Seq("id"))

    // simulate v2's _COMMITTED record still in flight when the batch
    // fires: hide its log line (v3 stays committed via the pointer)
    val log = java.nio.file.Paths.get(tableRoot, "_COMMITTED")
    val lines = new String(Files.readAllBytes(log))
      .split("\n").filter(_.nonEmpty)
    Files.writeString(log,
      // log lines carry op/ts metadata since round-15: match the
      // leading version field, not the whole line
      lines.filterNot(_.split("\t")(0).trim == v2.toString)
        .mkString("", "\n", "\n"))

    val manifests = spark.read.text(s"$tableRoot/m")
    ChangeFeedStream.applyBatch(spark, manifests, tableRoot, feedRoot,
      Seq("id"), Seq("price"))
    val pairs1 = rowSet(ChangeFeedStream.readFeed(spark, feedRoot)
      .select("from_version", "to_version").distinct())
    // the grace window expired with v2 unresolved: the feed holds the
    // skip-level transition, NOT a silent hole followed by v3-on-v2
    assert(pairs1 == Set(s"[${ChangeFeedStream.GenesisFrom},$v1]", s"[$v1,$v3]"))

    // the record lands (slow writer, not a crash) — a later batch,
    // here a replay of the same announcements, must publish v2 AND
    // re-diff v3 against it so the chain walks every transition
    Files.writeString(log, s"$v2\n",
      java.nio.file.StandardOpenOption.APPEND)
    ChangeFeedStream.applyBatch(spark, manifests, tableRoot, feedRoot,
      Seq("id"), Seq("price"))
    val feed = ChangeFeedStream.readFeed(spark, feedRoot)
    val pairs2 = rowSet(feed.select("from_version", "to_version").distinct())
    assert(pairs2 == Set(s"[${ChangeFeedStream.GenesisFrom},$v1]",
      s"[$v1,$v2]", s"[$v2,$v3]"),
      "stale skip-level rows must be replaced, late commit published")
    Seq(v1 -> v2, v2 -> v3).foreach { case (p, v) =>
      val streamed = feed.filter(col("to_version") === v)
        .drop("from_version", "to_version")
      assert(rowSet(streamed) ==
        rowSet(t.changesBetween(p, v, Seq("id"), Seq("price"))),
        s"transition $p -> $v diverges from batch changesBetween")
    }
  }

  test("an interrupted chain repair retries until the corrected pair is recorded") {
    import spark.implicits._
    val tableRoot = tmp("cf_crash_table")
    val feedRoot = tmp("cf_crash_feed")
    val t = ParquetTable(spark, tableRoot)
    val v1 = t.overwrite((1L to 10L).map(i => (i, i.toDouble)).toDF("id", "price"))
    val v2 = t.merge(Seq((3L, 30.0)).toDF("id", "price"), Seq("id"))
    val v3 = t.merge(Seq((5L, 50.0)).toDF("id", "price"), Seq("id"))
    val log = java.nio.file.Paths.get(tableRoot, "_COMMITTED")
    val lines = new String(Files.readAllBytes(log)).split("\n").filter(_.nonEmpty)
    Files.writeString(log,
      // log lines carry op/ts metadata since round-15: match the
      // leading version field, not the whole line
      lines.filterNot(_.split("\t")(0).trim == v2.toString)
        .mkString("", "\n", "\n"))
    val manifests = spark.read.text(s"$tableRoot/m")
    ChangeFeedStream.applyBatch(spark, manifests, tableRoot, feedRoot,
      Seq("id"), Seq("price"))
    Files.writeString(log, s"$v2\n", java.nio.file.StandardOpenOption.APPEND)
    ChangeFeedStream.applyBatch(spark, manifests, tableRoot, feedRoot,
      Seq("id"), Seq("price"))

    // simulate a crash BETWEEN the repair's delete and its merge: v3's
    // corrected rows are gone from the feed and the corrected (v2, v3)
    // pair was never recorded — only the stale (v1, v3) line remains.
    // Deriving repairs from "published this batch" would never retry
    // (v2's own publication is already recorded, so the work list is
    // empty); the standing invariant must retry it.
    val pub = java.nio.file.Paths.get(feedRoot, "_PUBLISHED")
    val pubLines = new String(Files.readAllBytes(pub)).split("\n")
      .filter(_.nonEmpty)
    Files.writeString(pub,
      pubLines.filterNot(_.trim == s"$v2,$v3").mkString("", "\n", "\n"))
    ParquetTable(spark, feedRoot).delete(col("to_version") === v3)

    ChangeFeedStream.applyBatch(spark, manifests, tableRoot, feedRoot,
      Seq("id"), Seq("price"))
    val feed = ChangeFeedStream.readFeed(spark, feedRoot)
    assert(rowSet(feed.select("from_version", "to_version").distinct())
      .contains(s"[$v2,$v3]"), "interrupted repair never retried")
    assert(rowSet(feed.filter(col("to_version") === v3)
        .drop("from_version", "to_version")) ==
      rowSet(t.changesBetween(v2, v3, Seq("id"), Seq("price"))),
      "v3's transition rows were lost to the interrupted repair")
    assert(ChangeFeedStream.publishedPairs(feedRoot).contains((v2, v3)))
  }

  test("a late record with no new manifests is published by the post-drain reconcile") {
    import spark.implicits._
    val tableRoot = tmp("cf_nodrain_table")
    val feedRoot = tmp("cf_nodrain_feed")
    val ckpt = tmp("cf_nodrain_ckpt")
    val t = ParquetTable(spark, tableRoot)
    val v1 = t.overwrite((1L to 6L).map(i => (i, i.toDouble)).toDF("id", "price"))
    val v2 = t.merge(Seq((2L, 20.0)).toDF("id", "price"), Seq("id"))
    val v3 = t.merge(Seq((4L, 40.0)).toDF("id", "price"), Seq("id"))
    val log = java.nio.file.Paths.get(tableRoot, "_COMMITTED")
    val lines = new String(Files.readAllBytes(log)).split("\n").filter(_.nonEmpty)
    Files.writeString(log,
      // log lines carry op/ts metadata since round-15: match the
      // leading version field, not the whole line
      lines.filterNot(_.split("\t")(0).trim == v2.toString)
        .mkString("", "\n", "\n"))
    // first drain consumes ALL manifest files; v2 unresolved -> skip-level
    ChangeFeedStream.publishAvailable(spark, tableRoot, feedRoot,
      Seq("id"), Seq("price"), ckpt)
    // v2's record lands AFTER the drain. No commit follows, so no new
    // manifest file exists: a second drain fires zero micro-batches and
    // only the direct post-drain reconciliation can publish v2
    Files.writeString(log, s"$v2\n", java.nio.file.StandardOpenOption.APPEND)
    ChangeFeedStream.publishAvailable(spark, tableRoot, feedRoot,
      Seq("id"), Seq("price"), ckpt)
    val pairs = rowSet(ChangeFeedStream.readFeed(spark, feedRoot)
      .select("from_version", "to_version").distinct())
    assert(pairs == Set(s"[${ChangeFeedStream.GenesisFrom},$v1]",
      s"[$v1,$v2]", s"[$v2,$v3]"),
      s"late commit stayed unpublished without a new manifest: $pairs")
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
