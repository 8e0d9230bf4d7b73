package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Co-located join via bucketing: writing both join sides bucketed by the
  * join key lets the sort-merge join run with ZERO exchanges — the
  * pre-shuffle strategy for repeated big-big joins at 100 TB (pay the
  * shuffle once at write time, never at query time).
  */
class BucketedJoinSpec extends AnyFunSuite with SparkSpec {

  test("bucketed tables join without any Exchange in the plan") {
    val wh = java.nio.file.Files.createTempDirectory("buckets").toString
    // at this tiny SF Spark would broadcast; disable to expose the
    // co-located sort-merge path a big-big join would take
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
    val o = graft.common.Tables.load(spark, Sf, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val li = graft.common.Tables.load(spark, Sf, "lineitem")
      .select("l_orderkey", "l_quantity", "l_extendedprice")

    o.write.mode("overwrite").option("path", s"$wh/orders_b")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("orders_bucketed")
    li.write.mode("overwrite").option("path", s"$wh/lineitem_b")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("lineitem_bucketed")

    val joined = spark.table("orders_bucketed")
      .join(spark.table("lineitem_bucketed"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_custkey")
      .agg(sum(col("l_quantity")).as("qty"))

    // the join itself must be exchange-free (bucket-co-located); the
    // only allowed exchange is the final groupBy on o_custkey
    val plan = joined.queryExecution.executedPlan.toString
    val joinSection = plan.split("HashAggregate").last // below the agg
    assert(joinSection.contains("SortMergeJoin") ||
      joinSection.contains("ShuffledHashJoin"))
    assert(!joinSection.contains("Exchange"),
      s"join should be co-located, plan:\n$plan")

    // and the result equals the plain (shuffling) join
    val plain = o.join(li, col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_custkey").agg(sum(col("l_quantity")).as("qty"))
    assert(joined.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(joined).count() == 0)

    spark.sql("DROP TABLE IF EXISTS orders_bucketed")
    spark.sql("DROP TABLE IF EXISTS lineitem_bucketed")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }
}
