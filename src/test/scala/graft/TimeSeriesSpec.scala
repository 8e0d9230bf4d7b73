package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** LOCF panel (q144) and OHLC resample (q145): grid completeness,
  * carry-forward semantics, bar identities.
  */
class TimeSeriesSpec extends AnyFunSuite with SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, Sf)

  test("q144 panel is a complete user × day grid with conserved counts") {
    val df = run("q144_locf_panel").cache()
    val nUsers = graft.common.Tables.load(spark, Sf, "events")
      .select("user_id").distinct().count()
    assert(df.count() == nUsers * 30)
    val nEvents = graft.common.Tables.load(spark, Sf, "events").count()
    assert(df.agg(sum("n_events")).head().getLong(0) == nEvents)
    df.unpersist()
  }

  test("q144 filled value is constant across gap days and null only before first obs") {
    val df = run("q144_locf_panel").cache()
    // once a user has a value, it never goes back to null
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("day")
    val regressed = df
      .withColumn("prev", lag(col("filled_cents"), 1).over(w))
      .filter(col("prev").isNotNull && col("filled_cents").isNull)
      .count()
    assert(regressed == 0)
    // gap days (n_events = 0) carry the previous day's value verbatim
    val broken = df
      .withColumn("prev", lag(col("filled_cents"), 1).over(w))
      .filter(col("n_events") === 0 && col("prev").isNotNull &&
        col("filled_cents") =!= col("prev"))
      .count()
    assert(broken == 0)
    df.unpersist()
  }

  test("q145 bar identities: low ≤ open/close ≤ high, volume ≥ high") {
    val df = run("q145_ohlc_resample").cache()
    assert(df.count() > 0)
    assert(df.filter(
      col("low_cents") > col("open_cents") ||
        col("low_cents") > col("close_cents") ||
        col("high_cents") < col("open_cents") ||
        col("high_cents") < col("close_cents")).count() == 0)
    // single-event bars have open = close = high = low = volume
    assert(df.filter(col("n_events") === 1 &&
      (col("open_cents") =!= col("close_cents") ||
        col("volume_cents") =!= col("high_cents"))).count() == 0)
    df.unpersist()
  }

  test("q221 Theil-Sen: driver path matches a local recompute and the distributed path exactly") {
    val daily = graft.common.Tables.load(spark, Sf, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(graft.common.Exact.cents(col("o_totalprice"))).as("x"))
    // independent local recomputation of the pair-slope median
    val rows = daily
      .select(datediff(col("day"), lit("1970-01-01").cast("date")), col("x"))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    val slopes = (for {
      (di, xi) <- rows; (dj, xj) <- rows; if dj > di
    } yield (xj - xi).toDouble / (dj - di).toDouble).sorted
    val n = slopes.length.toLong
    val expected =
      (slopes(((n + 1) / 2).toInt - 1) + slopes(((n + 2) / 2).toInt - 1)) / 2.0
    val got = run("q221_theil_sen").collect()
    assert(got.length == 1)
    assert(got(0).getLong(0) == n)
    assert(got(0).getDouble(1) == expected, "driver path must be the exact median")
    // the distributed globalOrder path (cap forced below the spine)
    // must produce the BIT-IDENTICAL result
    val dist = graft.queries.TimeSeries
      .senSlope(spark, daily, driverSpineCap = 1L).collect()
    assert(dist.length == 1)
    assert(dist(0).getLong(0) == n)
    assert(dist(0).getDouble(1) == expected,
      "distributed path must equal the driver path bitwise")
  }

  test("q245 Hampel: medians match a local window recomputation and the gate is exact") {
    val daily = graft.common.Tables.load(spark, Sf, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(graft.common.Exact.cents(col("o_totalprice"))).as("r"))
      .collect()
      .map(r => (r.getDate(0).toLocalDate.toEpochDay, r.getLong(1)))
      .toMap
    def lowerMedian(xs: Seq[Long]): Long =
      xs.sorted.apply((xs.length + 1) / 2 - 1)
    val rows = run("q245_hampel_filter").collect()
    assert(rows.length == daily.size) // one row per observed day
    rows.foreach { r =>
      val d = r.getDate(0).toLocalDate.toEpochDay
      val win = (d - 7 to d + 7).flatMap(daily.get)
      assert(r.getLong(2) == win.length, s"n_window at $d")
      val med = lowerMedian(win)
      assert(r.getLong(3) == med, s"median at $d")
      val mad = lowerMedian(win.map(v => math.abs(v - med)))
      assert(r.getLong(4) == mad, s"MAD at $d")
      val flagged = math.abs(daily(d) - med) * 10000L > 44478L * mad
      assert(r.getBoolean(5) == flagged, s"flag at $d")
    }
  }

  test("q255 binseg split minimizes SSE over every candidate day") {
    val daily = graft.common.Tables.load(spark, Sf, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(graft.common.Exact.cents(col("o_totalprice"))).as("rc"))
      .collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1) / 100L))
      .sortBy(_._1.toEpochDay)
    val vs = daily.map(_._2)
    def sse(xs: Seq[Long]): Double = {
      val s = xs.sum.toDouble
      xs.map(_.toDouble).map(x => x * x).sum - s * s / xs.length
    }
    val costs = (1 until vs.length).map { k =>
      k -> (sse(vs.take(k)) + sse(vs.drop(k)))
    }
    val bestCost = costs.map(_._2).min
    val r = SparkEntry.queries("q255_binseg_changepoint")(spark, Sf).head()
    val k = r.getAs[Long]("n_l").toInt
    assert(r.getAs[Long]("n_r") == vs.length - k)
    assert(r.getDate(0).toLocalDate == daily(k - 1)._1,
      "split day must be the k-th observed day")
    assert(r.getAs[Long]("s_l") == vs.take(k).sum)
    // the exact integer argmin lands on (one of) the float-cost minima
    assert(math.abs((sse(vs.take(k)) + sse(vs.drop(k))) - bestCost) < 1e-6,
      s"split at $k not optimal")
    val reduction = sse(vs) - bestCost
    assert(math.abs(r.getAs[Double]("sse_reduction") - reduction) <
      1e-6 * math.max(reduction, 1.0))
    assert(r.getAs[Double]("mean_left") ==
      vs.take(k).sum.toDouble / k)
  }
}
