package graft.common

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

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

  /** The events table's `ts` physical encoding is NOT under the engine's
    * control and has historically changed between source generations
    * (TIMESTAMP(NANOS) → timestamp[us]). Never hardcode it: read, then
    * branch on the schema that actually arrived — the same
    * infer-then-validate discipline as the bronze ingest (and the
    * reference's, orders_to_bronze.py:218,226). All encodings normalize
    * to one canonical TimestampType (session tz is UTC engine-wide, so
    * NTZ→TZ is value-preserving and matches DuckDB's TIMESTAMP).
    */
  private def loadEvents(spark: SparkSession, sfDir: String): DataFrame =
    loadEventsPath(spark, s"$sfDir/events.parquet")

  /** Path-addressed variant (streaming probe + fixture specs use it). */
  def loadEventsPath(spark: SparkSession, path: String): DataFrame = {
    val raw =
      try spark.read.parquet(path)
      catch {
        // TIMESTAMP(NANOS) has no native Spark type and fails the plain
        // read; only then opt into the legacy long-read and convert below.
        case e: Exception if e.getMessage != null &&
            e.getMessage.toLowerCase.contains("nanos") =>
          spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          spark.read.parquet(path)
      }
    EventsContract.validate(normalizeEventTs(raw), path)
  }

  /** Canonicalize whatever physical `ts` encoding arrived to
    * TimestampType. LongType = the legacy nanos-as-long read (values are
    * µs-exact, so `div 1000` is lossless); NTZ = micros without zone
    * (UTC session makes the cast value-preserving); TimestampType passes
    * through. Anything else is a contract violation with a message that
    * names the offending type — a regenerated source should fail loudly,
    * not as a mid-plan DATATYPE_MISMATCH fourteen queries deep.
    */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case Some(TimestampType) => df
      case Some(TimestampNTZType) =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case Some(other) => throw new IllegalArgumentException(
        s"events.ts: unsupported physical type ${other.sql} " +
          "(expected TIMESTAMP, TIMESTAMP_NTZ, or legacy nanos INT64)")
      case None => throw new IllegalArgumentException(
        "events: required column `ts` is missing " +
          s"(found: ${df.columns.mkString(", ")})")
    }
}

/** Name+type contract for the events source: the one testdata table the
  * engine reads schemaless from an external generator. Validated at load
  * so a regenerated source produces ONE actionable error naming the
  * drifted column, not a scatter of analysis failures downstream.
  */
object EventsContract {
  val required: Seq[(String, DataType)] = Seq(
    "event_id" -> LongType, "ts" -> TimestampType, "user_id" -> LongType,
    "event_type" -> StringType, "value" -> DoubleType)

  def validate(df: DataFrame, source: String): DataFrame = {
    val have = df.schema.map(f => f.name -> f.dataType).toMap
    val problems = required.flatMap { case (name, dt) =>
      have.get(name) match {
        case None => Some(s"missing column `$name` (want ${dt.sql})")
        case Some(got) if got != dt =>
          Some(s"column `$name` is ${got.sql}, want ${dt.sql}")
        case _ => None
      }
    }
    if (problems.nonEmpty) throw new IllegalArgumentException(
      s"events contract violated at $source: ${problems.mkString("; ")}")
    df
  }
}
