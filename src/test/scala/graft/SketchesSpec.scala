package graft

import graft.queries.Sketches
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Frequency-sketch operators (q103 CMS audit, q104 Misra-Gries pruned
  * top-k): the classic guarantees, pinned on hand-built streams and on
  * the corpus against engine-internal exact references.
  */
class SketchesSpec extends AnyFunSuite with SparkSpec {

  private val SfDir = "/root/testdata/sf0.001"
  private def run(name: String) = SparkEntry.queries(name)(spark, SfDir)

  test("misraGries keeps every item with frequency > n/k") {
    // stream of 1000 items: "hot" appears 300x (> 1000/5), noise spread
    val hot = Seq.fill(300)("hot")
    val noise = (0 until 700).map(i => s"w${i % 350}")
    val stream = scala.util.Random.shuffle(hot ++ noise)
    val out = Sketches.misraGries(stream.iterator, k = 5).toMap
    assert(out.contains("hot"), s"heavy item evicted: $out")
    // MG counter is an underestimate, never an overestimate
    assert(out("hot") <= 300L)
  }

  test("misraGries never tracks more than k counters") {
    val stream = (0 until 10000).map(i => s"w$i")
    val out = Sketches.misraGries(stream.iterator, k = 7).toSeq
    assert(out.size <= 7)
  }

  test("q104 equals the unpruned exact top-20") {
    val got = run("q104_mg_topk").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val exact = graft.common.Tables.load(spark, SfDir, "documents")
      .select(explode(graft.functions.Text.words(col("text"))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("term").asc).limit(20).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == exact)
  }

  test("q103 estimates respect the epsilon-N bound on every row") {
    val rows = run("q103_cms_heavy_hitters").collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val (exact, cms, bound) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(r.getBoolean(4), s"row flagged out of bound: $r")
      assert(cms >= exact, s"CMS undercount: $r")
      assert(cms <= exact + bound, s"CMS overcount beyond bound: $r")
    }
  }

  test("q103 is deterministic (fixed sketch seed)") {
    val a = run("q103_cms_heavy_hitters").collect().map(_.toSeq).toSeq
    val b = run("q103_cms_heavy_hitters").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("q170 sliding windows match a local trailing-7d recomputation") {
    val rows = run("q170_sliding_hll").collect()
    val pairs = graft.common.Tables.load(spark, SfDir, "events")
      .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
      .collect()
      .map(r => (r.getDate(0).toLocalDate.toEpochDay, r.getLong(1)))
    val days = pairs.map(_._1).distinct.sorted
    assert(rows.length == days.length)
    rows.foreach { r =>
      val d = r.getDate(0).toLocalDate.toEpochDay
      val win = pairs.filter(p => p._1 >= d - 6 && p._1 <= d)
      assert(r.getLong(1) == win.map(_._1).distinct.length,
        s"n_days_present wrong at $d")
      assert(r.getLong(2) == win.map(_._2).distinct.length,
        s"exact_users wrong at $d")
      assert(r.getBoolean(4), s"window at $d out of bound: $r")
    }
  }

  test("q241 KMV: union sketch dominates, estimates track exact counts") {
    val rows = run("q241_kmv_distinct").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5)))
    assert(rows.length == 6) // 5 priorities + the merged union
    val (grps, union) = rows.partition(_._1 != "__union__")
    assert(union.length == 1)
    val u = union.head
    grps.foreach { case (g, nExact, nMins, kth, est, relErr) =>
      assert(nMins == math.min(64L, nExact), s"$g sketch size")
      // the union's k-th min can only be ≤ any group's (more values
      // compete for the k slots)
      assert(u._4 <= kth, s"union kth ${u._4} > $g kth $kth")
      assert(u._2 >= nExact, s"union exact below group $g")
      // KMV with k=64 has σ ≈ 13%; 0.5 is a 4σ sanity bound, and the
      // VALUE-level check is the DuckDB oracle, not this
      assert(math.abs(relErr) < 0.5, s"$g rel_err $relErr")
      assert(est > 0.0)
    }
    assert(math.abs(u._6) < 0.5, s"union rel_err ${u._6}")
  }

  test("q258 KMV catalog: rollup sketches obey the merge law against a local recompute") {
    // emitted column order: level, source, lang, n_mins, kth_hash, n_exact
    val rows = run("q258_kmv_catalog").collect()
      .map(r => ((r.getString(0), r.getString(1), r.getString(2)),
        (r.getLong(5), r.getLong(3), r.getLong(4))))
      .toMap
    // independent local recompute of every level's k-mins from the
    // distinct content-key sets
    val docs = graft.common.Tables.load(spark, Sf, "documents")
      .select(col("source"), col("lang"),
        expr("cast(conv(substring(sha2(" +
          "regexp_replace(lower(trim(text)), '\\\\s+', ' '), 256)" +
          ", 1, 15), 16, 10) as long)").as("k"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val P = 1000000007L
    val A = 2654435761L
    val seed = 424242L
    def h(k: Long) = ((k % P + seed % P) % P) * A % P
    val keyed = docs.map { case (s0, l0, k) => (s0, l0, h(k)) }.distinct
    def expect(level: String, grp: ((String, String, Long)) => (String, String)): Unit =
      keyed.map(t => grp(t) -> t._3).groupBy(_._1).foreach {
        case ((s0, l0), ms) =>
          val hs = ms.map(_._2).distinct.sorted
          val mins = hs.take(64)
          val (nExact, nMins, kth) = rows((level, s0, l0))
          assert(nExact == hs.length.toLong, s"$level/$s0/$l0 n_exact")
          assert(nMins == mins.length.toLong, s"$level/$s0/$l0 n_mins")
          assert(kth == mins.last, s"$level/$s0/$l0 kth_hash")
      }
    expect("cell", t => (t._1, t._2))
    expect("source", t => (t._1, "__all__"))
    expect("lang", t => ("__all__", t._2))
    expect("corpus", _ => ("__all__", "__all__"))
    // row count: cells + sources + langs + 1
    val nCells = keyed.map(t => (t._1, t._2)).distinct.size
    val nSrc = keyed.map(_._1).distinct.size
    val nLng = keyed.map(_._2).distinct.size
    assert(rows.size == nCells + nSrc + nLng + 1)
  }
}
