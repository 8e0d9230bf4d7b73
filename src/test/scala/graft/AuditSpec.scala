package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Key discovery (q148), referential integrity (q149), Benford screen
  * (q150).
  */
class AuditSpec extends AnyFunSuite with SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, Sf)

  test("q148 finds the real keys and rejects the non-keys") {
    val rows = run("q148_key_discovery").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getBoolean(5)).toMap
    assert(rows(("orders", "o_orderkey")))
    assert(rows(("customer", "c_custkey")))
    assert(!rows(("orders", "o_custkey"))) // customers order repeatedly
    assert(!rows(("lineitem", "l_orderkey")))
  }

  test("q148 uniqueness ratios are exact and bounded") {
    val df = run("q148_key_discovery")
    assert(df.filter(col("uniqueness") > 1.0 || col("uniqueness") <= 0.0)
      .count() == 0)
    assert(df.filter(col("is_key") &&
      col("n_distinct") =!= col("n_rows")).count() == 0)
  }

  test("q149 star-schema edges are intact on the generated data") {
    val df = run("q149_referential_integrity").cache()
    assert(df.count() == 7)
    assert(df.filter(!col("intact")).count() == 0)
    assert(df.filter(col("n_orphans") =!= 0L).count() == 0)
    // child row counts match the raw tables
    val li = graft.common.Tables.load(spark, Sf, "lineitem").count()
    assert(df.filter(col("fk_col") === "lineitem.l_orderkey")
      .head().getLong(2) == li)
    df.unpersist()
  }

  test("q149 detects planted orphans") {
    // run the same edge logic against a corrupted child frame
    val s = spark
    val orders = graft.common.Tables.load(spark, Sf, "orders")
    val maxCust = orders.agg(max("o_custkey")).head().getLong(0)
    val corrupted = orders.withColumn("o_custkey",
      when(col("o_orderkey") % 100 === 0, lit(maxCust + 1000000L))
        .otherwise(col("o_custkey")))
    val cust = graft.common.Tables.load(spark, Sf, "customer")
      .select(col("c_custkey").as("pk")).distinct()
    val orphans = corrupted.select(col("o_custkey").as("fk"))
      .join(broadcast(cust), col("fk") === col("pk"), "left")
      .filter(col("pk").isNull).count()
    assert(orphans == orders.filter(col("o_orderkey") % 100 === 0).count())
  }

  test("q150 covers all 9 digits with frequencies summing to 1") {
    val df = run("q150_benford_screen").cache()
    assert(df.select("digit").distinct().count() == 9)
    val s = df.agg(sum("observed_freq")).head().getDouble(0)
    assert(math.abs(s - 1.0) < 1e-9)
    assert(df.filter(col("abs_dev") < 0.0).count() == 0)
    // expectations are the Benford constants
    assert(math.abs(df.filter(col("digit") === 1)
      .head().getDouble(3) - 0.30103) < 1e-4)
    df.unpersist()
  }

  test("q183 duplicate-payment pairs match a brute-force local scan") {
    val got = run("q183_dup_payments").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    val p = graft.common.Tables.load(spark, Sf, "events")
      .filter(col("event_type") === "purchase")
      .select(col("user_id"),
        (graft.common.Exact.cents(col("value")) / 100L).cast("long"),
        col("event_id"), unix_timestamp(col("ts")))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val want = (for {
      a <- p; b <- p
      if a._1 == b._1 && a._2 == b._2 && a._3 < b._3 &&
        math.abs(b._4 - a._4) <= 86400L
    } yield (a._1, a._2, a._3, b._3, math.abs(b._4 - a._4))).toSet
    assert(got == want)
    assert(got.nonEmpty, "generator produced no same-dollar repeat " +
      "purchases within a day — screen has nothing to certify")
  }

  test("q185 sourcing histogram conserves parts and revenue; shares sum to 1") {
    val rows = run("q185_single_sourcing").collect()
    val perPart = graft.common.Tables.load(spark, Sf, "lineitem")
      .groupBy("l_partkey")
      .agg(countDistinct("l_suppkey").as("ns"),
        sum(graft.common.Exact.cents(col("l_extendedprice"))).as("r"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val hist = perPart.groupBy(_._1).map { case (k, v) =>
      k -> (v.length.toLong, v.map(_._2).sum)
    }
    assert(rows.length == hist.size)
    rows.foreach { r =>
      assert((r.getLong(1), r.getLong(2)) == hist(r.getLong(0)))
    }
    assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-12)
    assert(math.abs(rows.map(_.getDouble(4)).sum - 1.0) < 1e-12)
  }

  test("q186 realization audit conserves lines and bounds its rates") {
    val rows = run("q186_price_realization").collect()
    val nLines = graft.common.Tables.load(spark, Sf, "lineitem").count()
    assert(rows.map(_.getLong(1)).sum == nLines)
    rows.foreach { r =>
      assert(r.getLong(2) >= 0 && r.getLong(2) <= r.getLong(1))
      assert(r.getDouble(4) ==
        r.getLong(2).toDouble / r.getLong(1).toDouble)
      // a discount rate above 1 would mean negative realized revenue
      assert(r.getDouble(5) < 1.0)
    }
  }

  test("q187 z-screen: rates reconcile, z signs follow the rate gap") {
    val rows = run("q187_late_shipment_z").collect()
    val base = rows.head.getDouble(4)
    // the baseline is one corpus-wide number on every row
    assert(rows.forall(_.getDouble(4) == base))
    val totLate = rows.map(_.getLong(2)).sum
    val totLines = rows.map(_.getLong(1)).sum
    assert(base == totLate.toDouble / totLines.toDouble)
    rows.foreach { r =>
      assert(r.getDouble(3) == r.getLong(2).toDouble / r.getLong(1).toDouble)
      if (!r.isNullAt(5)) {
        assert((r.getDouble(5) > 0) == (r.getDouble(3) > base) ||
          r.getDouble(5) == 0.0)
        // recompute the one-sample z locally
        val want = (r.getDouble(3) - base) /
          math.sqrt(base * (1.0 - base) / r.getLong(1).toDouble)
        assert(r.getDouble(5) == want)
      }
    }
  }
}
