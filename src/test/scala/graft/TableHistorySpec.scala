package graft

import graft.tables.ParquetTable
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** RESTORE + DESCRIBE HISTORY for the versioned table layer (round-15):
  * the operational undo and the per-commit audit trail Delta users run
  * daily. Restore publishes a NEW commit whose manifest is the target
  * version's verbatim (files by reference, zero data copied); history
  * derives from the committed log's per-line op/ts/file-count metadata
  * and survives vacuum for retained versions.
  */
class TableHistorySpec extends AnyFunSuite with SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-hist").toString + "/t"

  private def rows(t: ParquetTable): Map[Int, String] =
    t.read.collect().map(r => r.getInt(0) -> r.getString(1)).toMap

  test("every write records its op; history reads newest first") {
    import spark.implicits._
    val t = ParquetTable(spark, tmp())
    t.overwrite(Seq((1, "a")).toDF("k", "v"))
    t.append(Seq((2, "b")).toDF("k", "v"))
    t.merge(Seq((2, "B")).toDF("k", "v"), keys = Seq("k"))
    t.delete(col("k") === 1)
    t.compact(1)
    val h = t.history
    assert(h.map(_.version) == h.map(_.version).sorted.reverse)
    assert(h.map(_.op) ==
      Seq("compact", "delete", "merge", "append", "overwrite"),
      s"got ${h.map(_.op)}")
    assert(h.forall(_.tsMillis > 0L))
    assert(h.forall(_.nFiles > 0L))
  }

  test("restore undoes a bad delete: zero data copied, history append-only") {
    import spark.implicits._
    val t = ParquetTable(spark, tmp())
    val v1 = t.overwrite(Seq((1, "a"), (2, "b")).toDF("k", "v"))
    t.append(Seq((3, "c")).toDF("k", "v")) // v2: the good state
    val good = t.latestVersion.get
    val goodFiles = t.currentFiles.toSet
    t.delete(col("k") <= 2) // the bad delete: wipes most of the table
    assert(rows(t) == Map(3 -> "c"))
    def dataNodes(): Long = {
      val w = java.nio.file.Files.walk(
        java.nio.file.Paths.get(t.rootPath, "d"))
      try w.count() finally w.close()
    }
    val dataBefore = dataNodes()
    val nv = t.restore(good)
    assert(rows(t) == Map(1 -> "a", 2 -> "b", 3 -> "c"),
      "restore must resurrect the good version's rows")
    assert(t.currentFiles.toSet == goodFiles,
      "restore references the SAME files — no data copy")
    assert(dataNodes() == dataBefore, "restore must write no data")
    // history is append-only: the bad version stays readable
    assert(t.history.head.op == s"restore(v=$good)")
    assert(t.latestVersion.contains(nv) && nv > good)
    assert(t.readVersion(v1).count() == 2, "time travel intact")
    // writes continue cleanly on top of the restored state
    t.append(Seq((4, "d")).toDF("k", "v"))
    assert(rows(t).keySet == Set(1, 2, 3, 4))
  }

  test("restore keeps the restored version's own schema under evolution") {
    import spark.implicits._
    val t = ParquetTable(spark, tmp())
    t.overwrite(Seq((1, "a")).toDF("k", "v"))
    val narrow = t.latestVersion.get
    t.append(Seq((2, "b", 9L)).toDF("k", "v", "w"), mergeSchema = true)
    assert(t.read.columns.toSeq == Seq("k", "v", "w"))
    t.restore(narrow)
    assert(t.read.columns.toSeq == Seq("k", "v"),
      "restoring a pre-evolution version restores its schema")
    intercept[ParquetTable.RestoreTargetVacuumedException] { t.restore(999L) }
  }

  test("restore-after-vacuum refuses loudly BEFORE flipping the pointer") {
    // round-16 (VERDICT r15 task 5): restore(v) of a version whose
    // manifest/files vacuum already reclaimed must throw a named error
    // up front — Delta only errors later, at read time, leaving the
    // table's CURRENT version unreadable
    import spark.implicits._
    val t = ParquetTable(spark, tmp())
    t.overwrite(Seq((1, "a")).toDF("k", "v"))
    val old = t.latestVersion.get
    t.merge(Seq((1, "A"), (2, "b")).toDF("k", "v"), keys = Seq("k"))
    val retained = t.latestVersion.get
    t.merge(Seq((3, "c")).toDF("k", "v"), keys = Seq("k"))
    val cur = t.latestVersion.get
    t.vacuum(keepLast = 2, olderThanMs = 0L) // reclaims `old` only
    val e = intercept[ParquetTable.RestoreTargetVacuumedException] {
      t.restore(old)
    }
    assert(e.getMessage.contains("RESTORE refused"))
    assert(t.latestVersion.contains(cur),
      "a refused restore must not move the pointer")
    assert(rows(t) == Map(1 -> "A", 2 -> "b", 3 -> "c"),
      "the current version must stay fully readable after the refusal")
    // a RETAINED version still restores normally
    val nv = t.restore(retained)
    assert(nv > cur && rows(t) == Map(1 -> "A", 2 -> "b"))
  }

  test("restore refuses when a referenced data file vanished out-of-band") {
    // defense in depth: even with the manifest and log intact, a data
    // file reclaimed outside the vacuum protocol (manual cleanup, a
    // partial historical sweep) must refuse before the pointer flips
    import spark.implicits._
    val t = ParquetTable(spark, tmp())
    t.overwrite(Seq((1, "a")).toDF("k", "v"))
    val v1 = t.latestVersion.get
    val v1Files = t.currentFiles
    // the merge TOUCHES v1's file (key 1 matches), so the new current
    // version rewrites it — only v1's manifest still references it
    t.merge(Seq((1, "A"), (2, "b")).toDF("k", "v"), keys = Seq("k"))
    assert(!t.currentFiles.exists(v1Files.contains))
    java.nio.file.Files.delete(java.nio.file.Paths.get(v1Files.head))
    val e = intercept[ParquetTable.RestoreTargetVacuumedException] {
      t.restore(v1)
    }
    assert(e.getMessage.contains("reclaimed"))
    assert(rows(t) == Map(1 -> "A", 2 -> "b"),
      "current version unaffected by the refused restore")
  }

  test("vacuum preserves surviving versions' history metadata") {
    import spark.implicits._
    val t = ParquetTable(spark, tmp())
    t.overwrite(Seq((1, "a")).toDF("k", "v"))
    t.merge(Seq((2, "b")).toDF("k", "v"), keys = Seq("k"))
    t.merge(Seq((3, "c")).toDF("k", "v"), keys = Seq("k"))
    t.vacuum(keepLast = 2, olderThanMs = 0L)
    val h = t.history
    assert(h.map(_.op) == Seq("merge", "merge"),
      s"retained commits keep their recorded ops, got ${h.map(_.op)}")
    assert(h.forall(_.tsMillis > 0L))
  }

  test("TableMain --restore and --history drive the same paths") {
    import spark.implicits._
    val root = tmp()
    val t = ParquetTable(spark, root)
    t.overwrite(Seq((1, "a")).toDF("k", "v"))
    val good = t.latestVersion.get
    t.delete(col("k") === 1)
    graft.pipeline.cli.TableMain.main(Array(
      "--table", root, "--restore", good.toString, "--history", "true"))
    val t2 = ParquetTable(spark, root)
    assert(rows(t2) == Map(1 -> "a"))
    assert(t2.history.head.op == s"restore(v=$good)")
  }
}
