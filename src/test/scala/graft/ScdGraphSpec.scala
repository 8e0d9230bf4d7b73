package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SCD2 interval build (q139), integer PageRank (q140), and the Lloyd
  * k-means step (q141). Exact value parity is the driver's DuckDB
  * oracle; these pin structural invariants and conservation laws.
  */
class ScdGraphSpec extends AnyFunSuite with SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, Sf)

  // ---- q139 SCD2 ----

  test("q139 versions are contiguous per customer and exactly one is current") {
    val df = run("q139_scd2_history").cache()
    val perCust = df.groupBy("o_custkey").agg(
      count(lit(1)).as("n"), max("version").as("maxv"),
      sum(when(col("is_current"), 1L).otherwise(0L)).as("n_current"))
    assert(perCust.filter(col("n") =!= col("maxv")).count() == 0)
    assert(perCust.filter(col("n_current") =!= 1L).count() == 0)
    df.unpersist()
  }

  test("q139 intervals chain without gaps: valid_to equals next valid_from") {
    val df = run("q139_scd2_history")
    val joined = df.as("a").join(df.as("b"),
      col("a.o_custkey") === col("b.o_custkey") &&
        col("a.version") + 1 === col("b.version"))
    assert(joined.filter(col("a.valid_to") =!= col("b.valid_from")).count() == 0)
    // adjacent versions never carry the same priority (else no change)
    assert(joined.filter(
      col("a.o_orderpriority") === col("b.o_orderpriority")).count() == 0)
  }

  test("q139 every customer with orders has a history") {
    val nCust = graft.common.Tables.load(spark, Sf, "orders")
      .select("o_custkey").distinct().count()
    assert(run("q139_scd2_history")
      .select("o_custkey").distinct().count() == nCust)
  }

  // ---- q140 PageRank ----

  test("q140 ranks are positive and the graph is symmetric-degree sane") {
    val df = run("q140_pagerank").cache()
    assert(df.count() > 0)
    assert(df.filter(col("rank_micro") < 150000L).count() == 0)
    assert(df.filter(col("deg") < 1L).count() == 0)
    // rank mass stays near |V|·S: damping redistributes but integer
    // truncation only ever LOSES mass, never creates it
    val v = df.count()
    val mass = df.agg(sum("rank_micro")).head().getLong(0)
    assert(mass <= v * 1000000L, s"mass $mass exceeds |V|·S")
    assert(mass >= v * 150000L)
    df.unpersist()
  }

  test("q140 high-degree nodes accumulate rank (degree-rank correlation)") {
    val rows = run("q140_pagerank")
      .select(col("deg").cast("double"), col("rank_micro").cast("double"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    val n = rows.length.toDouble
    val (mx, my) = (rows.map(_._1).sum / n, rows.map(_._2).sum / n)
    val cov = rows.map { case (x, y) => (x - mx) * (y - my) }.sum
    assert(cov > 0, "rank should correlate positively with degree")
  }

  test("q140 is deterministic across partition counts") {
    val a = run("q140_pagerank").orderBy("part").collect().toSeq
    val sp = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val b = run("q140_pagerank").orderBy("part").collect().toSeq
      assert(a == b)
    } finally spark.conf.set("spark.sql.shuffle.partitions", sp)
  }

  // ---- q141 k-means step ----

  test("q141 conserves vectors and moves centroids") {
    val df = run("q141_kmeans_step").cache()
    assert(df.count() == 10)
    val total = df.agg(sum("n_assigned")).head().getLong(0)
    assert(total ==
      graft.common.Tables.load(spark, Sf, "embeddings").count())
    // with weak label clustering the E-step must reshuffle membership,
    // so at least one centroid moves
    assert(df.filter(col("l1_movement_milli") > 0).count() > 0)
    assert(df.filter(col("l1_movement_milli") < 0).count() == 0)
    df.unpersist()
  }

  // ---- q171 PIT lookup ----

  test("q171 every order matches exactly one version; audits are sane") {
    val df = run("q171_scd2_pit").cache()
    val nOrders = graft.common.Tables.load(spark, Sf, "orders").count()
    // interval tiling: the per-version counts partition the fact table
    assert(df.agg(sum("n_orders")).head().getLong(0) == nOrders)
    // each version row matched at least the order that opened it
    assert(df.filter(col("n_orders") < 1).count() == 0)
    assert(df.filter(col("n_matching") > col("n_orders")).count() == 0)
    // the opener order always self-matches, so every served version has
    // at least one matching fact — EXCEPT same-day flips, where a later
    // same-day version claims the whole day. Those are the only ones.
    val unmatched = df.filter(col("n_matching") === 0).count()
    val mismatchTotal = df.agg(sum(col("n_orders") - col("n_matching")))
      .head().getLong(0)
    assert(unmatched <= mismatchTotal)
    df.unpersist()
  }

  test("q182 transition rows normalize to 1 and conserve version changes") {
    val rows = run("q182_priority_transitions").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    // every version with a successor is exactly one transition
    val hist = run("q139_scd2_history")
    val expected = hist.filter(col("valid_to").isNotNull).count()
    assert(rows.map(_._3).sum == expected)
    // adjacent SCD2 versions differ by construction — no self loops
    assert(rows.forall(t => t._1 != t._2))
    rows.groupBy(_._1).foreach { case (from, ts) =>
      val total = ts.map(_._3).sum
      ts.foreach(t =>
        assert(t._4 == t._3.toDouble / total.toDouble, s"$from: $t"))
      assert(math.abs(ts.map(_._4).sum - 1.0) < 1e-12)
    }
  }

  test("q171 PIT result equals a brute-force local interval scan") {
    val orders = graft.common.Tables.load(spark, Sf, "orders")
      .select("o_custkey", "o_orderkey", "o_orderdate", "o_orderpriority")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getAs[java.time.LocalDateTime](2)
          .toEpochSecond(java.time.ZoneOffset.UTC), r.getString(3)))
    // local SCD2 build: change rows by (date, orderkey) per customer
    val hist = orders.groupBy(_._1).toSeq.flatMap { case (ck, os) =>
      val sorted = os.toSeq.sortBy(o => (o._3, o._2))
      val changes = sorted.zip(None +: sorted.map(o => Some(o._4)))
        .filter { case (o, prev) => !prev.contains(o._4) }.map(_._1)
      changes.zipWithIndex.map { case (c, i) =>
        val validTo =
          if (i + 1 < changes.length) Some(changes(i + 1)._3) else None
        (ck, i + 1L, c._4, c._3, validTo)
      }
    }
    val want = orders.flatMap { o =>
      hist.filter(h => h._1 == o._1 && h._4 <= o._3 &&
        h._5.forall(o._3 < _))
        .map(h => ((h._1, h._2, h._3), o._4 == h._3))
    }.groupBy(_._1).map { case (k, vs) =>
      (k._1, k._2, k._3, vs.length.toLong, vs.count(_._2).toLong)
    }.toSet
    val got = run("q171_scd2_pit").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got == want)
  }
}
