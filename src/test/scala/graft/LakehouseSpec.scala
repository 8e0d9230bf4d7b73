package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.ChangeFeed
import graft.tables.ParquetTable

/** Table-layer lakehouse maintenance: predicate DELETE (copy-on-write,
  * file-pruned), manifest-diff change feeds, and incremental MV refresh
  * through the versioned table. The in-plan q105/q106 registry forms are
  * oracle-checked by the driver; these specs pin the REAL table-layer
  * wiring those queries stand in for.
  */
class LakehouseSpec extends AnyFunSuite with SparkSpec {

  private def tmp(): String =
    Files.createTempDirectory("graft_lakehouse").toString

  private def rows(pairs: (Long, Double)*): DataFrame = {
    import spark.implicits._
    pairs.toDF("id", "price")
  }

  private def byId(df: DataFrame): Map[Long, Double] =
    df.collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("price")).toMap

  test("delete removes matching rows, keeps null-predicate rows, rewrites only touched files") {
    val t = ParquetTable(spark, tmp(), statsColumns = Seq("id"))
    // two files with disjoint id ranges via range-partitioned write
    import spark.implicits._
    val base = (1L to 100L).map(i => (i, i.toDouble)).toDF("id", "price")
      .repartitionByRange(2, col("id"))
    t.overwrite(base)
    val before = t.currentFiles
    assert(before.size == 2)

    // predicate true only in the low file; null for one row (price null
    // semantics checked separately below)
    val v = t.delete(col("id") <= 10)
    assert(v.isDefined)
    val after = t.currentFiles
    // the high-range file survives by reference (same physical path)
    assert(before.toSet.intersect(after.toSet).size == 1)
    val remaining = t.read.select("id").collect().map(_.getLong(0)).toSet
    assert(remaining == (11L to 100L).toSet)

    // no-match delete commits nothing
    assert(t.delete(col("id") < 0).isEmpty)

    // null predicate keeps the row (SQL DELETE: only true deletes)
    val t2 = ParquetTable(spark, tmp())
    t2.overwrite(rows(1L -> 1.0, 2L -> 2.0))
    val nullPred = when(col("id") === 1L, lit(null).cast("boolean"))
      .otherwise(col("id") === 2L)
    t2.delete(nullPred)
    assert(byId(t2.read).keySet == Set(1L))
  }

  test("changesBetween classifies insert/update/delete from the manifest diff") {
    val t = ParquetTable(spark, tmp(), statsColumns = Seq("id"))
    import spark.implicits._
    val base = (1L to 40L).map(i => (i, i.toDouble)).toDF("id", "price")
      .repartitionByRange(4, col("id"))
    val v1 = t.overwrite(base)

    // update ids 1-5 (one low file), insert 101-103
    val upserts = ((1L to 5L).map(i => (i, i + 0.5)) ++
      (101L to 103L).map(i => (i, i.toDouble))).toDF("id", "price")
    t.merge(upserts, keys = Seq("id"))
    // delete ids 36-40 (one high file; leaves the 101-103 inserts alone)
    val v3 = t.delete(col("id").between(36L, 40L)).get

    val diff = t.changesBetween(v1, v3, keys = Seq("id"),
      compare = Seq("price"))
    val byType = diff.collect().groupBy(_.getAs[String]("change_type"))
      .view.mapValues(_.map(_.getAs[Long]("id")).toSet).toMap
    assert(byType("insert") == (101L to 103L).toSet)
    assert(byType("delete") == (36L to 40L).toSet)
    assert(byType("update") == (1L to 5L).toSet)
    val upd = diff.filter(col("change_type") === "update")
      .select("id", "old_price", "new_price").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
    assert(upd == (1L to 5L).map(i => (i, i.toDouble, i + 0.5)).toSet)

    // same version to itself: empty feed
    assert(t.changesBetween(v3, v3, Seq("id"), Seq("price")).isEmpty)

    // uncommitted version is rejected
    intercept[IllegalArgumentException] {
      t.changesBetween(v1, 9999L, Seq("id"), Seq("price"))
    }
  }

  test("changesBetween reads only the manifest symmetric difference") {
    val t = ParquetTable(spark, tmp(), statsColumns = Seq("id"))
    import spark.implicits._
    val base = (1L to 100L).map(i => (i, i.toDouble)).toDF("id", "price")
      .repartitionByRange(10, col("id"))
    val v1 = t.overwrite(base)
    // touch one key → merge rewrites exactly one file
    val v2 = t.merge(Seq((50L, 99.9)).toDF("id", "price"), Seq("id"))
    val diff = t.changesBetween(v1, v2, Seq("id"), Seq("price"))
    // the only change surfaces...
    assert(byId(diff.select(col("id"), col("new_price").as("price"))) ==
      Map(50L -> 99.9))
    // ...and the diff's inputs were one old file + one new file, i.e.
    // ~10 rows per side, not the full 100-row snapshots. Observable via
    // the plan: the union of scanned files in the diff must exclude the
    // 9 files shared by both manifests.
    val shared = t.readVersion(v1).inputFiles.toSet
      .intersect(t.readVersion(v2).inputFiles.toSet)
    assert(shared.size == 9)
    assert(diff.inputFiles.toSet.intersect(shared).isEmpty)
  }

  test("snapshotDiff treats present-with-null and absent distinctly") {
    import spark.implicits._
    val o = Seq((1L, Some(1.0)), (2L, None), (3L, Some(3.0)))
      .toDF("id", "price")
    val n = Seq((2L, None: Option[Double]), (3L, Some(3.5))).toDF("id", "price")
    val d = ChangeFeed.snapshotDiff(o, n, Seq("id"), Seq("price"))
      .collect().map(r => r.getAs[Long]("id") ->
        r.getAs[String]("change_type")).toMap
    // id 2: null price on both sides → unchanged (null-safe compare)
    assert(d == Map(1L -> "delete", 3L -> "update"))
  }

  test("MV fold is invariant to batch count and order, equals one-shot state") {
    import graft.queries.Lakehouse
    val li = graft.common.Tables.load(spark, Sf, "lineitem")
    def fold(splits: Seq[DataFrame]): Set[String] =
      Lakehouse.mvRead(splits.map(Lakehouse.mvPartial).reduce(Lakehouse.mvMerge))
        .collect().map(_.toString).toSet
    val oneShot = fold(Seq(li))
    val byFour = (0 until 4).map(i => li.filter(pmod(col("l_orderkey"), lit(4)) === i))
    assert(fold(byFour) == oneShot)
    assert(fold(byFour.reverse) == oneShot)
    val byEight = (0 until 8).map(i => li.filter(pmod(col("l_orderkey"), lit(8)) === i))
    assert(fold(byEight) == oneShot)
  }

  test("CDC-driven MV refresh: change-feed fold equals full recompute, retractions are lossless") {
    import graft.queries.Lakehouse
    import org.apache.spark.sql.expressions.Window
    val liRaw = graft.common.Tables.load(spark, Sf, "lineitem")
    // (l_orderkey, l_linenumber) is NOT unique in the synthetic data
    // (6000 rows / 4599 distinct pairs) and snapshotDiff requires a
    // unique key — derive a deterministic surrogate: hash of all
    // columns + an occurrence index among exact-duplicate rows
    // (identical rows are interchangeable, so the keyed row SET is
    // well-defined no matter how ties land)
    val occ = Window.partitionBy(liRaw.columns.map(col): _*).orderBy(lit(1))
    val li = liRaw.withColumn("row_key", xxhash64(
      concat_ws("|", liRaw.columns.map(c => col(c).cast("string")): _*),
      row_number().over(occ).cast("string")))
    assert(li.select("row_key").distinct().count() == li.count())
    val keys = Seq("row_key")
    // v1 drops every 3rd row, v2 drops every 7th and bumps quantity on
    // every 5th order — the feed carries all three change types
    val v1 = li.filter(pmod(col("row_key"), lit(3)) =!= 0)
    val v2 = li.filter(pmod(col("row_key"), lit(7)) =!= 0)
      .withColumn("l_quantity",
        when(pmod(col("l_orderkey"), lit(5)) === 0, col("l_quantity") + 1.0)
          .otherwise(col("l_quantity")))
    val changes = ChangeFeed.snapshotDiff(v1, v2, keys, Lakehouse.MvInputCols)
    val types = changes.select("change_type").distinct()
      .collect().map(_.getString(0)).toSet
    assert(types == Set("insert", "update", "delete"))

    val refreshed = Lakehouse.mvCdcRefresh(Lakehouse.mvPartial(v1), changes)
    val direct = Lakehouse.mvPartial(v2)
    assert(Lakehouse.mvRead(refreshed).collect().map(_.toString).sorted.toSeq ==
      Lakehouse.mvRead(direct).collect().map(_.toString).sorted.toSeq)

    // retraction losslessness: applying a feed and then its inverse
    // restores the original state bitwise
    val inverse = ChangeFeed.snapshotDiff(v2, v1, keys, Lakehouse.MvInputCols)
    val roundTrip = Lakehouse.mvCdcRefresh(refreshed, inverse)
    assert(Lakehouse.mvRead(roundTrip).collect().map(_.toString).sorted.toSeq ==
      Lakehouse.mvRead(Lakehouse.mvPartial(v1)).collect().map(_.toString).sorted.toSeq)

    // a fully-retracted group vanishes instead of lingering at zero
    import spark.implicits._
    val tiny = Seq(("A", "X", 1L, 2, 3.0, 10.0), ("B", "Y", 2L, 1, 1.0, 5.0))
      .toDF("l_returnflag", "l_linestatus", "l_orderkey", "l_linenumber",
        "l_quantity", "l_extendedprice")
    val gone = ChangeFeed.snapshotDiff(tiny,
      tiny.filter(col("l_returnflag") =!= "A"),
      Seq("l_orderkey", "l_linenumber"), Lakehouse.MvInputCols)
    val after = Lakehouse.mvCdcRefresh(Lakehouse.mvPartial(tiny), gone)
    assert(after.select("l_returnflag").collect().map(_.getString(0)).toSeq
      == Seq("B"))
  }

  test("MV refresh through ParquetTable.merge rewrites only changed groups' state") {
    import graft.queries.Lakehouse
    val li = graft.common.Tables.load(spark, Sf, "lineitem")
    val t = ParquetTable(spark, tmp())
    val batches = (0 until 4).map(i =>
      li.filter(pmod(col("l_orderkey"), lit(4)) === i))
    batches.foreach { b =>
      val partial = Lakehouse.mvPartial(b)
      if (!t.exists) t.overwrite(partial)
      else {
        // merge-refresh: fold ONLY the touched groups' standing state
        // with the batch partial, then upsert those rows
        val touched = t.read.join(
          partial.select("l_returnflag", "l_linestatus"),
          Seq("l_returnflag", "l_linestatus"), "left_semi")
        t.merge(Lakehouse.mvMerge(touched, partial),
          keys = Seq("l_returnflag", "l_linestatus"))
      }
    }
    val viaTable = Lakehouse.mvRead(t.read).collect().map(_.toString).toSet
    val oneShot = Lakehouse.mvRead(Lakehouse.mvPartial(li))
      .collect().map(_.toString).toSet
    assert(viaTable == oneShot)
  }
}
