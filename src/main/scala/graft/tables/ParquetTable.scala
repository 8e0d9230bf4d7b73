package graft.tables

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Versioned-snapshot Parquet table: the engine's replacement for the
  * reference's Delta Lake layer (reference uses Delta append / overwrite /
  * MERGE at `src/ingestion/orders_to_bronze.py:276-282`,
  * `src/transformations/orders_bronze_to_silver.py:184-196`,
  * `src/features/customer_features_daily.py:269-284`; our jar set has no
  * Delta, and the pipeline only uses atomic publish + keyed upsert, so a
  * pointer-swapped snapshot layout preserves every behavior actually used).
  *
  * Layout:
  * {{{
  *   <root>/v=1/part-*.parquet
  *   <root>/v=2/...
  *   <root>/_LATEST          # contains "2"; written via temp + atomic move
  * }}}
  *
  * Crash safety: a partially-written `v=N+1` is invisible until the
  * `_LATEST` pointer flips (rename is atomic on POSIX); re-runs are
  * idempotent because writers always target a fresh version dir.
  * Single-writer by design (the reference's pipeline stages are serial OS
  * processes — SURVEY.md §3). Readers of `v=N` are never disturbed: old
  * versions are immutable (time travel comes for free via `readVersion`).
  *
  * At scale the merge is one `left_anti` shuffle join on the key columns +
  * a union write — the same I/O shape as Delta's copy-on-write MERGE
  * without the transaction-log machinery this pipeline never exercises.
  */
final class ParquetTable(spark: SparkSession, root: String) {

  private def pointerPath: Path = Paths.get(root, "_LATEST")
  private def committedLogPath: Path = Paths.get(root, "_COMMITTED")
  private def versionDir(v: Long): String = s"$root/v=$v"

  def exists: Boolean = Files.exists(pointerPath)

  def latestVersion: Option[Long] =
    if (!exists) None
    else Some(new String(Files.readAllBytes(pointerPath)).trim.toLong)

  /** The set of versions that were ever committed (pointer history log ∪
    * current pointer). The log line for a version is appended AFTER its
    * atomic pointer flip, so a crash between flip and append only loses
    * the log line — the pointer itself still marks the version committed;
    * the union covers that window. A version dir NOT in this set is an
    * uncommitted orphan (possibly partial) regardless of its number.
    */
  def committedVersions: Set[Long] = {
    val logged =
      if (!Files.exists(committedLogPath)) Set.empty[Long]
      else new String(Files.readAllBytes(committedLogPath))
        .split("\n").filter(_.nonEmpty).map(_.trim.toLong).toSet
    logged ++ latestVersion
  }

  def read: DataFrame = latestVersion match {
    case Some(v) => readVersion(v)
    case None => throw new IllegalStateException(s"table $root does not exist")
  }

  /** Time-travel read of an immutable historical version. Only versions
    * in the committed set are readable — any other `v=` dir is an
    * uncommitted orphan from a crashed writer (possibly partial), never
    * valid data.
    */
  def readVersion(v: Long): DataFrame = {
    if (!exists)
      throw new IllegalStateException(s"table $root does not exist")
    require(committedVersions.contains(v),
      s"version $v is not committed (committed=${committedVersions.toSeq.sorted})")
    spark.read.parquet(versionDir(v))
  }

  /** Atomically flip `_LATEST` to version v (write temp file + move),
    * then record v in the committed log.
    */
  private def commitPointer(v: Long): Unit = {
    Files.createDirectories(Paths.get(root))
    val tmp = Paths.get(root, s"._LATEST.tmp.$v")
    Files.write(tmp, v.toString.getBytes)
    Files.move(tmp, pointerPath, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    Files.writeString(committedLogPath, s"$v\n",
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
  }

  /** Next version = one past every version dir on disk, not just past the
    * pointer: a writer that crashed after writing `v=N+1` but before the
    * pointer flip leaves an orphan dir, and a rerun must skip over it
    * (orphans are invisible to readers and harmless; a fixed
    * `pointer + 1` would collide with the orphan and wedge the table).
    */
  private def nextVersion: Long = {
    val versioned = "v=(\\d+)".r
    val onDisk = Option(Paths.get(root).toFile.listFiles())
      .map(_.toSeq.collect { f =>
        f.getName match {
          case versioned(n) if f.isDirectory => n.toLong
        }
      })
      .getOrElse(Nil)
    (latestVersion.getOrElse(0L) +: onDisk).max + 1L
  }

  private def writeVersion(df: DataFrame, partitionBy: Seq[String]): Long = {
    val next = nextVersion
    val w = df.write.mode("errorifexists")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(versionDir(next))
    commitPointer(next)
    next
  }

  /** First publish or full replace (reference S5/S7 semantics). */
  def overwrite(df: DataFrame, partitionBy: Seq[String] = Nil): Long =
    writeVersion(df, partitionBy)

  /** Append-only write (reference S3/S4: bronze evidence log, audit log).
    * Implemented as union-into-next-version so readers see an atomic flip;
    * the scan of the previous version is a file-list union, not a rewrite
    * (Spark reads old parquet files; only the new rows are written twice —
    * acceptable for the audit-scale tables this is used for, and bronze
    * appends partition-prune by `ingest_date`).
    */
  def append(df: DataFrame, partitionBy: Seq[String] = Nil): Long =
    latestVersion match {
      case None => writeVersion(df, partitionBy)
      case Some(v) =>
        writeVersion(readVersion(v).unionByName(df), partitionBy)
    }

  /** Retention: keep the last `keepLast` COMMITTED versions (always
    * including the current one); delete every other version dir — older
    * committed history AND uncommitted orphans wherever their numbers
    * fall (an orphan may sit below the pointer after crash-then-recover,
    * so retention decisions must come from the committed log, not from
    * version arithmetic). The committed log is rewritten to the retained
    * set via temp + atomic move.
    */
  def vacuum(keepLast: Int = 2): Seq[Long] = {
    require(keepLast >= 1)
    val latest = latestVersion.getOrElse(return Nil)
    val retained = (committedVersions.toSeq.sorted.takeRight(keepLast)
      :+ latest).toSet
    val versioned = "v=(\\d+)".r
    val victims = Option(Paths.get(root).toFile.listFiles())
      .map(_.toSeq.collect { f =>
        f.getName match {
          case versioned(n) if f.isDirectory => n.toLong
        }
      }).getOrElse(Nil)
      .filterNot(retained.contains)
      .sorted
    victims.foreach { v =>
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete()
      }
      rm(Paths.get(versionDir(v)).toFile)
    }
    val tmp = Paths.get(root, "._COMMITTED.tmp")
    Files.writeString(tmp,
      committedVersions.intersect(retained).toSeq.sorted
        .map(v => s"$v\n").mkString)
    Files.move(tmp, committedLogPath, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    victims
  }

  /** Compaction: rewrite the current version into `targetFiles` output
    * files and commit it as a new version (Delta OPTIMIZE's role for
    * this layout). Merge/append churn accumulates small files; scans pay
    * per-file overhead, so long-lived tables compact periodically.
    * Readers are never disturbed — it's an ordinary pointer-flipped
    * publish of identical rows.
    */
  def compact(targetFiles: Int = 1): Long =
    writeVersion(read.coalesce(targetFiles), Nil)

  /** Keyed upsert — the reference's Delta MERGE
    * `whenMatchedUpdateAll.whenNotMatchedInsertAll`
    * (`orders_bronze_to_silver.py:184-192`): every target row whose key
    * appears in `source` is replaced by the source row; unmatched source
    * rows are inserted.
    */
  def merge(source: DataFrame, keys: Seq[String],
      partitionBy: Seq[String] = Nil): Long =
    latestVersion match {
      case None => writeVersion(source, partitionBy)
      case Some(v) =>
        val target = readVersion(v)
        val kept = target.join(source.select(keys.map(col): _*).distinct(),
          keys, "left_anti")
        writeVersion(kept.unionByName(source), partitionBy)
    }
}

object ParquetTable {
  def apply(spark: SparkSession, root: String): ParquetTable =
    new ParquetTable(spark, root)
}
