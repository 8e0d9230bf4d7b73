package graft

import org.scalatest.funsuite.AnyFunSuite

/** Scale-growth tripwire (round-14): measure the time exponent of five
  * known-linear query families across the committed testdata decade
  * (sf0.01 → sf0.1, 10× rows) and assert none has quietly gone
  * super-linear. Exponent = ln(t₁₀/t₁)/ln(10); a linear query on a
  * box with any fixed overhead reads < 1.0 (overhead amortizes), so
  * the 1.3 bound is a genuine alarm threshold, not a snug fit —
  * PLANS.md "growth" records the 1×-vs-10× measured values for the 10
  * most expensive queries (via tools.ScaleUp / tools.GrowthProbe);
  * this spec re-derives the protocol on every test run with no
  * generated data.
  *
  * Protocol (from GrowthProbe's measured failure modes): warm BOTH
  * scales off the clock (a base-only warmup read iteration-heavy
  * queries as faster at 10×), then min-of-2 per scale with alternating
  * order so residual warming biases both sides alike.
  */
class ScaleGrowthSpec extends AnyFunSuite with SparkSpec {

  private val Base = "/root/testdata/sf0.01"
  private val Big = "/root/testdata/sf0.1"

  /** Scan/agg/join families whose plans are one-pass over the fact
    * rows (no iteration count, no candidate blow-up) — the ones whose
    * exponent a plan regression would move first.
    */
  private val LinearFamilies = Seq(
    "q01_pruned_scan",      // filter+agg scan
    "q34_dedup_exact",      // hash groupBy over normalized text
    "q63_tfidf_terms",      // narrow TF pass + DF join + per-doc window
    "q151_gains_table",     // global-order prefix sums (n log n)
    "q161_rfm_segments")    // cube over the order history

  test("known-linear families stay sub-~1.3 exponent across the decade") {
    val byName = SparkEntry.registry.toMap
    def once(name: String, d: String): Double = {
      val t0 = System.nanoTime()
      byName(name).fn(spark, d).count()
      (System.nanoTime() - t0) / 1e9
    }
    LinearFamilies.foreach { n => once(n, Base); once(n, Big) } // warmup
    val exponents = LinearFamilies.map { n =>
      val b1 = once(n, Base); val s1 = once(n, Big)
      val b2 = once(n, Base); val s2 = once(n, Big)
      val e = math.log(math.min(s1, s2) / math.min(b1, b2)) / math.log(10.0)
      n -> e
    }
    info(exponents.map { case (n, e) => f"$n=$e%.2f" }.mkString(" "))
    exponents.foreach { case (n, e) =>
      assert(e <= 1.3,
        f"$n grew with exponent $e%.2f over a 10x decade — a plan " +
          "change has gone super-linear (see PLANS.md growth section)")
    }
  }

  test("filtered serve paths stay sub-linear WITH a live tombstone mask") {
    // round-15 stretch (VERDICT task 8): the delete/filtered
    // discipline — mask on the scan path, mask on the backstop — must
    // hold under scale, not just correctness. 50 live tombstones
    // (below the fold threshold: the codegen-InSet MASK path, the
    // serving steady state) ride on both scales while the exponent is
    // measured.
    import graft.tables.IndexStore
    val byName = SparkEntry.registry.toMap
    val qs = Seq("q273_ann_filtered" -> "ivf_index",
      "q274_ann_graph_filtered" -> "nsw_index")
    val tombs = (100L until 150L).toSeq
    def once(name: String, d: String): Double = {
      val t0 = System.nanoTime()
      byName(name).fn(spark, d).count()
      (System.nanoTime() - t0) / 1e9
    }
    try {
      qs.foreach { case (_, k) =>
        IndexStore.addTombstones(spark, k, Base, tombs)
        IndexStore.addTombstones(spark, k, Big, tombs)
      }
      qs.foreach { case (n, _) => once(n, Base); once(n, Big) } // warmup
      val exponents = qs.map { case (n, _) =>
        val b1 = once(n, Base); val s1 = once(n, Big)
        val b2 = once(n, Base); val s2 = once(n, Big)
        val e = math.log(math.min(s1, s2) / math.min(b1, b2)) / math.log(10.0)
        n -> e
      }
      info(exponents.map { case (n, e) => f"$n=$e%.2f" }.mkString(" "))
      exponents.foreach { case (n, e) =>
        assert(e <= 1.3,
          f"$n with a live tombstone mask grew with exponent $e%.2f — " +
            "the mask/fold discipline has gone super-linear")
      }
      // and the mask is genuinely LIVE while measured: no tombstoned id
      // is served at either scale
      qs.foreach { case (q, _) =>
        Seq(Base, Big).foreach { d =>
          val served = byName(q).fn(spark, d)
            .select("vec_id").collect().map(_.getLong(0)).toSet
          assert((served & tombs.toSet).isEmpty,
            s"$q at $d serves a tombstoned id under the live mask")
        }
      }
    } finally {
      qs.foreach { case (_, k) =>
        IndexStore.clearTombstones(k, Base)
        IndexStore.clearTombstones(k, Big)
      }
      // the graph-walk memo keys on the tombstone version, but drop
      // every session memo so no later suite can see a masked plan
      graft.common.Memos.clearAll()
    }
  }

  test("write path stays sub-~1.3: merge and compact across a 10x table") {
    // round-16 (VERDICT r15 task 8): GrowthProbe covers the SERVE
    // paths; this closes the scale story for the WRITE path. Two
    // tables built from the committed testdata decade — 10x the rows
    // AND 10x the files (one append per batch) — then the same merge
    // and compaction timed on each. Merge's cost model is
    // O(candidate files scanned + touched files rewritten + manifest);
    // compaction is one table rewrite — both must hold a sub-~1.3
    // exponent or copy-on-write has quietly gone super-linear.
    import graft.tables.ParquetTable
    import org.apache.spark.sql.functions.{col, pmod}
    def build(sf: String, batches: Int): ParquetTable = {
      val root = java.nio.file.Files
        .createTempDirectory("graft-wg").toString + "/t"
      val t = ParquetTable(spark, root, statsColumns = Seq("o_orderkey"))
      val orders = graft.common.Tables.load(spark, sf, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      (0 until batches).foreach { b =>
        t.append(orders.filter(
          pmod(col("o_orderkey"), org.apache.spark.sql.functions
            .lit(batches)) === b).coalesce(1))
      }
      t
    }
    def source(sf: String) = graft.common.Tables.load(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .filter(col("o_orderkey") < 2000)
      .withColumn("o_custkey", org.apache.spark.sql.functions.lit(-1L))
    val small = build(Base, 4)
    val big = build(Big, 40)
    def timeOf(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // warm both scales off the clock, then min-of-2 alternating
    small.merge(source(Base), keys = Seq("o_orderkey"))
    big.merge(source(Big), keys = Seq("o_orderkey"))
    val m1s = timeOf(small.merge(source(Base), keys = Seq("o_orderkey")))
    val m1b = timeOf(big.merge(source(Big), keys = Seq("o_orderkey")))
    val m2s = timeOf(small.merge(source(Base), keys = Seq("o_orderkey")))
    val m2b = timeOf(big.merge(source(Big), keys = Seq("o_orderkey")))
    val eMerge = math.log(math.min(m1b, m2b) / math.min(m1s, m2s)) /
      math.log(10.0)
    val c1s = timeOf(small.compact(2))
    val c1b = timeOf(big.compact(2))
    val c2s = timeOf(small.compact(2))
    val c2b = timeOf(big.compact(2))
    val eCompact = math.log(math.min(c1b, c2b) / math.min(c1s, c2s)) /
      math.log(10.0)
    info(f"merge=$eMerge%.2f compact=$eCompact%.2f")
    assert(eMerge <= 1.3,
      f"merge grew with exponent $eMerge%.2f over a 10x table")
    assert(eCompact <= 1.3,
      f"compact grew with exponent $eCompact%.2f over a 10x table")
    // the timed merges were real writes: the keyed rows were upserted
    assert(big.read.filter(col("o_orderkey") < 2000 &&
      col("o_custkey") =!= -1L).count() == 0)
  }
}
