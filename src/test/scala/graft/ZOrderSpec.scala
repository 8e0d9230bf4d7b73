package graft

import graft.operators.ZOrder
import graft.tables.ParquetTable
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order layout clustering: the Morton-key arithmetic, the table
  * layer's z-ordered rewrite, and the point of it all — a 2-D box probe
  * that opens ~1 file after the rewrite where the hash layout scanned
  * every file. (The key arithmetic itself is also oracle-checked end to
  * end by q95.)
  */
class ZOrderSpec extends AnyFunSuite with SparkSpec {

  private def tmp(): String = Files.createTempDirectory("zorder").toString

  test("interleave places bucket j's bit i at position i*d+j") {
    import spark.implicits._
    // x=5 (0101), y=3 (0011): bits land at positions
    // x0→0, y0→1, x1→2, y1→3, x2→4 ... = 1+2+0+8+16 = 27
    val r = Seq((5, 3)).toDF("x", "y")
      .select(ZOrder.interleave(Seq(col("x"), col("y")), 4).as("z"))
      .collect()(0).getLong(0)
    assert(r == 27L)
    // 3 dimensions: x=1,y=1,z=1 → bits at 0,1,2 = 7
    val r3 = Seq((1, 1, 1)).toDF("a", "b", "c")
      .select(ZOrder.interleave(
        Seq(col("a"), col("b"), col("c")), 2).as("z"))
      .collect()(0).getLong(0)
    assert(r3 == 7L)
  }

  test("zkey right-shift bucketing fits wide ranges into the bit budget") {
    import spark.implicits._
    // range [0, 1023] into 4 bits: span bits = 10, shift = 6; 640>>6 = 10
    val z = Seq((640L, 0L)).toDF("x", "y")
      .select(ZOrder.zkey(Seq(col("x"), col("y")),
        Seq(0L, 0L), Seq(1023L, 1023L), 4).as("z"))
      .collect()(0).getLong(0)
    // bucket_x=10 (1010) at even positions (bits 1,3 → z bits 2,6),
    // bucket_y=0: 4 + 64 = 68
    assert(z == 68L)
  }

  test("z-ordered rewrite prunes a 2-D box probe; hash layout cannot") {
    import spark.implicits._
    val t = ParquetTable(spark, s"${tmp()}/t", Seq("x", "y"))
    // 64×64 grid in row-major input order; round-robin into 16 files
    // spreads every file across the full (x, y) range
    val grid = (0 until 4096).map(i => (i % 64L, i / 64L, i.toLong))
      .toDF("x", "y", "payload")
    t.overwrite(grid.repartition(16))
    assert(t.currentFiles.size == 16)

    val box = Seq(("x", 0L, 7L), ("y", 0L, 7L))
    val expected = (0 until 8).flatMap(x =>
      (0 until 8).map(y => (x.toLong, y.toLong))).toSet

    val hashRows = t.readBox(box)
      .select("x", "y").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(hashRows.toSet == expected && hashRows.length == 64)
    val scannedHash = t.lastBoxScannedFiles.size
    assert(scannedHash == 16,
      s"hash layout should leave every file a candidate, got $scannedHash")

    t.compactZOrdered(16, Seq("x", "y"))
    val zRows = t.readBox(box)
      .select("x", "y").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(zRows.toSet == expected && zRows.length == 64)
    val scannedZ = t.lastBoxScannedFiles.size
    // the box is one z-range [0,63]; range boundaries come from sampling
    // so a straddling file or two may survive, but the win must be large
    assert(scannedZ <= 3,
      s"z-ordered layout should prune to ~1 file, scanned $scannedZ")
  }

  test("TableMain CLI drives the z-ordered rewrite + vacuum") {
    import spark.implicits._
    val root = s"${tmp()}/t"
    val t = ParquetTable(spark, root, Seq("x", "y"))
    t.overwrite((0 until 4096).map(i => (i % 64L, i / 64L, i.toLong))
      .toDF("x", "y", "payload").repartition(16))
    graft.pipeline.cli.TableMain.main(Array(
      "--table", root, "--stats", "x,y",
      "--cluster", "x,y", "--target_files", "16",
      "--vacuum", "1", "--vacuum_age_hours", "0"))
    val t2 = ParquetTable(spark, root, Seq("x", "y"))
    t2.readBox(Seq(("x", 0L, 7L), ("y", 0L, 7L))).count()
    assert(t2.lastBoxScannedFiles.size <= 3)
    // vacuum reclaimed superseded data; the rewrite stays fully readable
    assert(t2.read.count() == 4096L)
  }

  test("packBins mirrors q203's arithmetic: exclusive-cum div target") {
    import graft.queries.Layout
    // sizes 60,60,60 at target 100: cum_excl 0,60,120 -> bins 0,0,1
    assert(Layout.packBins(Seq(60L, 60L, 60L), 100L) ==
      Seq((0L, 2, 120L, 0), (1L, 1, 60L, 0)))
    // "small" = under target/4 (q203's n_small_inputs)
    assert(Layout.packBins(Seq(10L, 90L, 30L), 100L) ==
      Seq((0L, 2, 100L, 1), (1L, 1, 30L, 0)))
    // one oversized input still lands in exactly one bin
    assert(Layout.packBins(Seq(500L), 100L) == Seq((0L, 1, 500L, 0)))
    assert(Layout.packBins(Nil, 100L).isEmpty)
  }

  test("--maintain packs a merge-fragmented table back to plan and vacuums") {
    import spark.implicits._
    val root = s"${tmp()}/t"
    val t = ParquetTable(spark, root)
    t.overwrite((0 until 512).map(i => (i, s"v$i")).toDF("k", "v")
      .repartition(4))
    // merge churn: each keyed upsert rewrites touched files into a new
    // small data dir — the fragmentation a table service repairs
    (0 until 6).foreach { i =>
      t.merge(Seq((i * 7, s"m$i")).toDF("k", "v"), keys = Seq("k"))
    }
    val fragmented = t.currentFiles.size
    assert(fragmented > 4, s"expected churned layout, got $fragmented files")
    val rowsBefore = t.read.orderBy("k").collect().toSeq
    // plan target well above the table's total bytes -> 1 planned bin
    graft.pipeline.cli.TableMain.main(Array(
      "--table", root, "--maintain", (64L * 1024 * 1024).toString,
      "--retain", "2", "--vacuum_age_hours", "0"))
    val t2 = ParquetTable(spark, root)
    assert(t2.currentFiles.size == 1,
      s"maintain should pack to the planned single bin, got ${t2.currentFiles.size}")
    assert(t2.read.orderBy("k").collect().toSeq == rowsBefore)
    // retention applied: only the newest versions survive the pass
    assert(t2.committedVersions.size <= 2)
    // a table already within policy is NOT rewritten (no maintenance churn)
    val vBefore = t2.latestVersion
    graft.pipeline.cli.TableMain.main(Array(
      "--table", root, "--maintain", (64L * 1024 * 1024).toString))
    assert(ParquetTable(spark, root).latestVersion == vBefore,
      "no-op maintenance must not commit a new version")
  }

  test("--maintain with a cluster hint restores data skipping") {
    import spark.implicits._
    val root = s"${tmp()}/t"
    val t = ParquetTable(spark, root, Seq("x", "y"))
    t.overwrite((0 until 4096).map(i => (i % 64L, i / 64L, i.toLong))
      .toDF("x", "y", "payload").repartition(16))
    (0 until 5).foreach { i =>
      t.merge(Seq((i.toLong, i.toLong, 9999L)).toDF("x", "y", "payload"),
        keys = Seq("x", "y"))
    }
    // target sized so the plan lands on a multi-file layout
    val total = t.currentFiles.map(f =>
      java.nio.file.Files.size(java.nio.file.Paths.get(f))).sum
    graft.pipeline.cli.TableMain.main(Array(
      "--table", root, "--stats", "x,y",
      "--maintain", math.max(1L, total / 16).toString,
      "--cluster", "x,y", "--retain", "1"))
    val t2 = ParquetTable(spark, root, Seq("x", "y"))
    assert(t2.read.count() == 4096L)
    t2.readBox(Seq(("x", 0L, 7L), ("y", 0L, 7L))).count()
    // z-ordered rewrite: the small box prunes to a corner of the layout
    assert(t2.lastBoxScannedFiles.size <= 3,
      s"clustered maintain should restore pruning, scanned ${t2.lastBoxScannedFiles.size}")
  }

  test("--maintain --partition_by rewrites THROUGH the k=v layout") {
    import spark.implicits._
    val root = s"${tmp()}/t"
    val t = ParquetTable(spark, root)
    t.overwrite((0 until 256).map(i => (i % 4, i, s"v$i"))
      .toDF("p", "k", "v").repartition(8), partitionBy = Seq("p"))
    (0 until 5).foreach { i =>
      t.merge(Seq((i % 4, i * 13, s"m$i")).toDF("p", "k", "v"),
        keys = Seq("k"), partitionBy = Seq("p"))
    }
    assert(t.currentFiles.exists(_.contains("/p=")))
    graft.pipeline.cli.TableMain.main(Array(
      "--table", root, "--maintain", (64L * 1024 * 1024).toString,
      "--partition_by", "p", "--retain", "1"))
    val t2 = ParquetTable(spark, root)
    // the rewrite kept every file under the k=v partition dirs — a
    // plain compact would flatten the layout and kill partition pruning
    assert(t2.currentFiles.nonEmpty &&
      t2.currentFiles.forall(_.contains("/p=")),
      s"layout flattened: ${t2.currentFiles.take(3)}")
    assert(t2.read.count() == 256) // merges updated existing keys
    // partition pruning still works on the maintained layout
    val plan = t2.read.filter(org.apache.spark.sql.functions.col("p") === 1)
      .queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[.*p#\\d+".r.findFirstIn(plan).nonEmpty, plan)
  }

  test("readBox on a statless table scans everything but stays exact") {
    import spark.implicits._
    val t = ParquetTable(spark, s"${tmp()}/t") // no statsColumns
    t.overwrite((0 until 100).map(i => (i.toLong, i.toLong))
      .toDF("x", "v").repartition(4))
    val got = t.readBox(Seq(("x", 10L, 19L))).select("x")
      .collect().map(_.getLong(0)).sorted
    assert(got.toSeq == (10L to 19L))
    assert(t.lastBoxScannedFiles.size == 4)
  }
}
