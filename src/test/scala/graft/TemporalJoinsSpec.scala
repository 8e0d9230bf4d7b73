package graft

import graft.operators.TemporalJoins
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TemporalJoinsSpec extends AnyFunSuite with SparkSpec {

  test("asofBackward attaches the matched row atomically even with null fields") {
    import spark.implicits._
    val left = Seq((1L, 100L, "q"))
      .toDF("user_id", "ts", "tag")
      .withColumn("ts", timestamp_seconds(col("ts")))
    // r2 is the as-of match and carries a NULL campaign: the result must
    // NOT inherit r1's non-null campaign (phantom-row hazard)
    val right = Seq(
      (1L, 10L, 11L, Some("summer")),
      (1L, 20L, 12L, None: Option[String]))
      .toDF("user_id", "ts", "event_id", "campaign")
      .withColumn("ts", timestamp_seconds(col("ts")))

    val out = TemporalJoins.asofBackward(
      left, right, key = "user_id", leftTs = "ts", rightTs = "ts",
      payload = Seq("ts" -> "m_ts", "event_id" -> "m_id",
        "campaign" -> "m_campaign"),
      tieBreak = "event_id").collect()(0)

    assert(out.getAs[Long]("m_id") == 12L)
    assert(out.isNullAt(out.fieldIndex("m_campaign")),
      "campaign must be the matched row's NULL, not an older row's value")
  }

  test("asofBackward: no prior right row yields null payload, not a drop") {
    import spark.implicits._
    val left = Seq((7L, 100L), (8L, 100L))
      .toDF("user_id", "ts")
      .withColumn("ts", timestamp_seconds(col("ts")))
    val right = Seq((7L, 50L, 1L))
      .toDF("user_id", "ts", "event_id")
      .withColumn("ts", timestamp_seconds(col("ts")))
    val out = TemporalJoins.asofBackward(
      left, right, "user_id", "ts", "ts",
      payload = Seq("event_id" -> "m_id"), tieBreak = "event_id")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(r.fieldIndex("m_id"))) None else Some(r.getAs[Long]("m_id"))))
      .toMap
    assert(out == Map(7L -> Some(1L), 8L -> None))
  }

  test("asofBackward: equal timestamps count as 'at or before'") {
    import spark.implicits._
    val left = Seq((1L, 100L)).toDF("user_id", "ts")
      .withColumn("ts", timestamp_seconds(col("ts")))
    val right = Seq((1L, 100L, 5L), (1L, 100L, 9L))
      .toDF("user_id", "ts", "event_id")
      .withColumn("ts", timestamp_seconds(col("ts")))
    val out = TemporalJoins.asofBackward(
      left, right, "user_id", "ts", "ts",
      payload = Seq("event_id" -> "m_id"), tieBreak = "event_id")
      .collect()(0)
    assert(out.getAs[Long]("m_id") == 9L) // simultaneous + highest tie
  }
}
