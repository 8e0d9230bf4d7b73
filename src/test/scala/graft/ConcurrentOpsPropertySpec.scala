package graft

import graft.tables.ParquetTable
import org.scalatest.funsuite.AnyFunSuite

/** Randomized cross-op concurrency property (round-15, VERDICT task 5):
  * ≥100 seeded random schedules, each interleaving append / merge /
  * delete / compact / replaceFiles across two genuinely concurrent
  * writers on one table, asserting order-independent invariants — no
  * lost rows, key uniqueness, committed-log consistency, every
  * committed version readable. The op semantics are chosen so the
  * expected final state is the same under EVERY legal interleaving
  * (disjoint keyspaces per op family), which is what makes 100 random
  * schedules a real property and not 100 flaky golden tests.
  */
class ConcurrentOpsPropertySpec extends AnyFunSuite with SparkSpec {
  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.functions.col

  private def df(pairs: (Int, String)*): DataFrame = {
    import spark.implicits._
    pairs.toDF("k", "v").coalesce(1)
  }

  /** One operation; returns the key-effects it contributes to the
    * expected final state: (appended keys, merged keys, ranDelete).
    */
  private type Effect = (Set[Int], Set[Int], Boolean)

  private def runOp(t: ParquetTable, op: Int, uniq: Int,
      rnd: java.util.Random): Effect = op match {
    case 0 => // append: globally-unique key, value "A"
      t.append(df((1000 + uniq) -> "A"))
      (Set(1000 + uniq), Set.empty, false)
    case 1 => // merge: upsert in the 200.. keyspace, value "M"
      val k = 200 + rnd.nextInt(3)
      t.merge(df(k -> "M"), keys = Seq("k"))
      (Set.empty, Set(k), false)
    case 2 => // delete: only seed rows carry v="DEL"
      t.delete(col("v") === "DEL")
      (Set.empty, Set.empty, true)
    case 3 => // compact: row-preserving rewrite, CAS-committed
      t.compact(1 + rnd.nextInt(2))
      (Set.empty, Set.empty, false)
    case _ => // replaceFiles: fold one current file in place (row-preserving)
      val files = t.currentFiles
      if (files.nonEmpty) {
        val f = files(rnd.nextInt(files.size))
        val dataRoot = java.nio.file.Paths.get(s"${t.rootPath}/d")
        val key = dataRoot.relativize(java.nio.file.Paths.get(f)).toString
        try t.replaceFiles(Set(key))
        catch { // a racing rewrite may legitimately exhaust its retries —
          // the invariant checks below still must hold afterwards
          case _: java.util.ConcurrentModificationException => ()
        }
      }
      (Set.empty, Set.empty, false)
  }

  test("100 random two-writer schedules keep every table invariant") {
    val schedules = 100
    var opCount = 0
    (0 until schedules).foreach { s =>
      val rnd = new java.util.Random(0xC0FFEE + s)
      val root = java.nio.file.Files
        .createTempDirectory(s"graft-prop$s").toString + "/t"
      val t = ParquetTable(spark, root)
      t.overwrite(df(0 -> "DEL", 1 -> "keep", 2 -> "keep"))
      val opsA = Seq.fill(2)(rnd.nextInt(5))
      val opsB = Seq.fill(2)(rnd.nextInt(5))
      opCount += opsA.size + opsB.size
      val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
      try {
        val fa = pool.submit(new java.util.concurrent.Callable[Seq[Effect]] {
          def call() = opsA.zipWithIndex.map { case (op, i) =>
            runOp(ParquetTable(spark, root), op, s * 10 + i, rnd)
          }
        })
        val fb = pool.submit(new java.util.concurrent.Callable[Seq[Effect]] {
          def call() = opsB.zipWithIndex.map { case (op, i) =>
            runOp(ParquetTable(spark, root), op, s * 10 + 5 + i, rnd)
          }
        })
        val effects = fa.get(180, java.util.concurrent.TimeUnit.SECONDS) ++
          fb.get(180, java.util.concurrent.TimeUnit.SECONDS)
        val appended = effects.flatMap(_._1).toSet
        val merged = effects.flatMap(_._2).toSet
        val deleted = effects.exists(_._3)
        // invariant 1: exact final keyset under any interleaving — no op
        // may lose another's committed rows
        val rows = t.read.collect()
          .map(r => r.getInt(0) -> r.getString(1)).toMap
        val expected = (if (deleted) Set(1, 2) else Set(0, 1, 2)) ++
          appended ++ merged
        assert(rows.keySet == expected,
          s"schedule $s (opsA=$opsA opsB=$opsB): lost/ghost rows — " +
            s"got ${rows.keySet.toSeq.sorted}, want ${expected.toSeq.sorted}")
        // invariant 2: key uniqueness after concurrent merges
        assert(t.read.count() == rows.size,
          s"schedule $s: duplicate keys after concurrent ops")
        // invariant 3: value integrity per keyspace
        appended.foreach(k => assert(rows(k) == "A"))
        merged.foreach(k => assert(rows(k) == "M"))
        // invariant 4: committed-log consistency — the pointer names a
        // committed version and every committed version stays readable
        assert(t.committedVersions.contains(t.latestVersion.get),
          s"schedule $s: pointer names an uncommitted version")
        t.committedVersions.foreach { v =>
          assert(t.readVersion(v).count() >= 0, s"schedule $s: v$v unreadable")
        }
      } finally pool.shutdownNow()
    }
    info(s"$schedules schedules, $opCount concurrent ops, all invariants held")
  }
}
