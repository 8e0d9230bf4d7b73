package graft.common

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish parquet tables
  * (`/root/testdata/sf*`, see TESTDATA.md).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") loadEvents(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")

  /** Register every testdata table as a temp view so the whole corpus is
    * queryable through `spark.sql` (the SQL twin of the Column-API
    * surface; graft native functions register separately via
    * GraftFunctions.register).
    */
  def createViews(spark: SparkSession, sfDir: String): Unit =
    names.foreach { n =>
      load(spark, sfDir, n).createOrReplaceTempView(n)
    }

  /** The events table is written with TIMESTAMP(NANOS) which Spark has no
    * native type for; read nanos as long and convert to a micros
    * timestamp. The testdata's values are µs-exact (verified), so the
    * conversion is lossless and matches DuckDB's CAST(ts AS TIMESTAMP).
    */
  private def loadEvents(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions._
    spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
