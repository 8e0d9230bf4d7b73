package graft

import graft.common.{EventsContract, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Source-schema drift guard (VERDICT r8 item 2). The events table is the
  * one source the engine reads from an external generator whose physical
  * `ts` encoding has changed between generations (TIMESTAMP(NANOS) →
  * timestamp[us]). This spec writes one fixture per encoding the loader
  * claims to support and asserts every one of them loads to the SAME
  * canonical schema and values — so the next regeneration either works
  * or fails THIS suite loudly, instead of killing fourteen queries with
  * a mid-plan DATATYPE_MISMATCH.
  */
class SourceSchemaDriftSpec extends AnyFunSuite with SparkSpec {

  // 2025-06-01T00:00:00Z and one second later, as epoch micros
  private val micros = Seq(1748736000000000L, 1748736001000000L)

  private def base(tsCol: DataFrame => DataFrame): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("drift").toString
    val df = micros.zipWithIndex.map { case (us, i) =>
      (i.toLong, us, 42L, "view", 1.5)
    }.toDF("event_id", "us", "user_id", "event_type", "value")
    tsCol(df).drop("us").write.mode("overwrite").parquet(dir)
    dir
  }

  private def canonical(df: DataFrame): (DataType, Seq[Long]) = (
    df.schema("ts").dataType,
    df.select(unix_micros(col("ts"))).collect().map(_.getLong(0)).sorted.toSeq)

  test("micros-timestamp encoding loads to canonical schema") {
    val dir = base(_.withColumn("ts", timestamp_micros(col("us"))))
    val (dt, vals) = canonical(Tables.loadEventsPath(spark, dir))
    assert(dt == TimestampType)
    assert(vals == micros)
  }

  test("micros-NTZ encoding loads to canonical schema") {
    // TimestampNTZType writes as parquet timestamp[us] with
    // isAdjustedToUTC=false — the shape the regenerated testdata has
    val dir = base(_.withColumn("ts",
      timestamp_micros(col("us")).cast(TimestampNTZType)))
    val (dt, vals) = canonical(Tables.loadEventsPath(spark, dir))
    assert(dt == TimestampType)
    assert(vals == micros)
  }

  test("legacy nanos-as-long encoding loads to canonical schema") {
    // TIMESTAMP(NANOS) arrives as LongType under the legacy conf; a plain
    // INT64 column exercises the identical LongType loader branch
    val dir = base(_.withColumn("ts", col("us") * 1000L))
    val (dt, vals) = canonical(Tables.loadEventsPath(spark, dir))
    assert(dt == TimestampType)
    assert(vals == micros)
  }

  test("all supported encodings agree value-for-value") {
    val a = canonical(Tables.loadEventsPath(spark,
      base(_.withColumn("ts", timestamp_micros(col("us"))))))._2
    val b = canonical(Tables.loadEventsPath(spark,
      base(_.withColumn("ts",
        timestamp_micros(col("us")).cast(TimestampNTZType)))))._2
    val c = canonical(Tables.loadEventsPath(spark,
      base(_.withColumn("ts", col("us") * 1000L))))._2
    assert(a == b && b == c)
  }

  test("an unsupported ts encoding fails with one actionable error") {
    val dir = base(_.withColumn("ts", lit("2025-06-01 00:00:00")))
    val ex = intercept[IllegalArgumentException] {
      Tables.loadEventsPath(spark, dir)
    }
    assert(ex.getMessage.contains("ts"))
    assert(ex.getMessage.toLowerCase.contains("string"))
  }

  test("a missing required column names itself in the contract error") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("drift").toString
    Seq((1L, 1748736000000000L)).toDF("event_id", "us")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
      .write.mode("overwrite").parquet(dir)
    val ex = intercept[IllegalArgumentException] {
      Tables.loadEventsPath(spark, dir)
    }
    assert(ex.getMessage.contains("user_id"))
  }

  test("streaming source normalizes a drifted encoding like the batch loader") {
    // long-encoded fixture through EventStream.readEvents: the stream
    // must surface the SAME canonical ts the batch loader produces
    val dir = base(_.withColumn("ts", col("us") * 1000L))
    val stream = graft.streaming.EventStream.readEvents(spark, dir)
    assert(stream.schema("ts").dataType == TimestampType)
    val q = stream.writeStream.format("memory").queryName("drift_stream")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("drift_stream")
      .select(unix_micros(col("ts"))).collect().map(_.getLong(0)).sorted.toSeq
    assert(got == micros)
  }

  test("embeddings loader normalizes float64 vectors down to the canonical float32") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("drift").toString
    Seq((1L, Seq(0.5d, 0.25d), 2L), (2L, Seq(1.0d, -1.0d), 3L))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(dir)
    val df = Tables.loadEmbeddingsPath(spark, dir)
    assert(df.schema("embedding").dataType match {
      case ArrayType(FloatType, _) => true; case _ => false
    })
    assert(df.schema("label").dataType == IntegerType)
    val v = df.orderBy("vec_id").select("embedding").collect()
      .map(_.getSeq[Float](0)).toSeq
    assert(v == Seq(Seq(0.5f, 0.25f), Seq(1.0f, -1.0f)))
  }

  test("documents loader widens int32 n_chars to the canonical long") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("drift").toString
    Seq((1L, "hello world", "en", "webA", 11))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(dir)
    val df = Tables.loadDocumentsPath(spark, dir)
    assert(df.schema("n_chars").dataType == LongType)
    assert(df.select("n_chars").head().getLong(0) == 11L)
  }

  test("an unsupported embedding element type fails with one actionable error") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("drift").toString
    Seq((1L, Seq("a", "b"), 2))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(dir)
    val ex = intercept[IllegalArgumentException] {
      Tables.loadEmbeddingsPath(spark, dir)
    }
    assert(ex.getMessage.contains("embedding"))
  }

  test("every testdata table loads with its canonical schema at sf0.001") {
    val sf = "/root/testdata/sf0.001"
    Tables.names.foreach { n =>
      val df = Tables.load(spark, sf, n)
      assert(df.limit(1).count() == 1, s"$n is empty")
    }
    // the events loader specifically must produce TimestampType
    val ev = Tables.load(spark, sf, "events")
    assert(ev.schema("ts").dataType == TimestampType)
    EventsContract.validate(ev, "sf0.001") // does not throw
  }
}
