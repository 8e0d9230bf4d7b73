package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // args: <sfDir> <outDir> [comma-separated name filter] — the
    // optional third arg restricts the dump to the named queries for
    // fast local iteration; the driver always passes exactly two.
    val (sfDir, outDir) = (args(0), args(1))
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
      }
    // JSON escaping lives in one place (graft.common.JsonIO) — a tab or
    // CR in builder-authored SQL must not break the driver's json.load.
    // Pair-level derived oracles reference the engine's own emitted
    // rows through QueryDef.OutDirToken; resolve it to the absolute
    // output dir here so the DuckDB side reads the same files
    // regardless of its working directory.
    val absOut = new java.io.File(outDir).getAbsolutePath
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"),
      graft.common.JsonIO.render(
        SparkEntry.oracleSql
          .filter { case (k, _) => only.forall(_.contains(k)) }
          .map { case (k, v) =>
            k -> (v.replace(QueryDef.OutDirToken, absOut): Any) }))
    spark.stop()
  }
}
