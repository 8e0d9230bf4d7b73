package graft

import graft.queries.Retrieval
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Retrieval + mixing operators: q115 BM25 top-k, q116 temperature mix.
  *
  * Both are pinned EXACTLY against local recomputation from the corpus
  * (bounded at sf0.001), not statistically — the engine contracts are
  * deterministic by design.
  */
class RetrievalSpec extends AnyFunSuite with SparkSpec {

  private val SfDir = "/root/testdata/sf0.001"
  private def run(name: String) = SparkEntry.queries(name)(spark, SfDir)

  // --- q115 BM25 ---

  private def corpusWords(): Seq[(Long, Seq[String])] =
    graft.common.Tables.load(spark, SfDir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map { r =>
        val w = r.getString(1).trim.toLowerCase
          .replaceAll("\\s+", " ").split(" ").toSeq
        r.getLong(0) -> w
      }.toSeq

  test("q115 integer evidence (tf, dl, df) matches local recomputation") {
    val docs = corpusWords()
    val emitted = run("q115_bm25_topk").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val localTf = docs.flatMap { case (id, w) =>
      w.groupBy(identity).map { case (t, g) => (t, id, g.size.toLong) }
    }.filter(t => Retrieval.QueryTerms.contains(t._1))
    val localDf = localTf.groupBy(_._1).map { case (t, g) => t -> g.size.toLong }
    val dl = docs.map { case (id, w) => id -> w.size.toLong }.toMap
    assert(emitted.nonEmpty)
    emitted.foreach { case ((term, id), (tf, d, df)) =>
      val lt = localTf.find(t => t._1 == term && t._2 == id)
      assert(lt.isDefined, s"phantom posting ($term, $id)")
      assert(tf == lt.get._3, s"tf mismatch ($term, $id)")
      assert(d == dl(id), s"dl mismatch ($term, $id)")
      assert(df == localDf(term), s"df mismatch ($term)")
    }
  }

  test("q115 emits exactly least(10, df) rows per term, ranks 1..k") {
    val df = run("q115_bm25_topk").cache()
    val perTerm = df.groupBy("term")
      .agg(count(lit(1)).as("c"), first("df").as("df"),
        min("rnk").as("mn"), max("rnk").as("mx"),
        countDistinct("rnk").as("nd"))
      .collect()
    assert(perTerm.length == Retrieval.QueryTerms.length)
    perTerm.foreach { r =>
      val expect = math.min(10L, r.getLong(2))
      assert(r.getLong(1) == expect, s"count for ${r.getString(0)}")
      assert(r.getInt(3) == 1 && r.getInt(4) == expect.toInt &&
        r.getLong(5) == expect, s"rank range for ${r.getString(0)}")
    }
    df.unpersist()
  }

  test("q115 rank order follows (score DESC, doc_id ASC)") {
    val rows = run("q115_bm25_topk")
      .orderBy(col("term"), col("rnk")).collect()
    rows.grouped(1).toSeq // no-op; keep rows materialized
    Retrieval.QueryTerms.foreach { term =>
      val tr = rows.filter(_.getString(0) == term).sortBy(_.getInt(6))
      tr.sliding(2).foreach {
        case Array(a, b) =>
          val (sa, sb) = (a.getDouble(5), b.getDouble(5))
          assert(sa > sb || (sa == sb && a.getLong(1) < b.getLong(1)),
            s"misordered ranks ${a.getInt(6)},${b.getInt(6)} for $term")
        case _ => ()
      }
    }
  }

  test("q115 is deterministic across executions") {
    val a = run("q115_bm25_topk").orderBy("term", "rnk")
      .collect().map(_.toSeq).toSeq
    val b = run("q115_bm25_topk").orderBy("term", "rnk")
      .collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  // --- q116 temperature mix ---

  // The portable-hash contract, re-stated independently of the engine
  // (pins the constants: P, Knuth multiplier, shift-then-multiply seed).
  private val P = 1000000007L
  private val A = 2654435761L
  private val MixSeed = 4242L
  private def u(id: Long): Long = ((id % P + MixSeed % P) % P) * A % P

  test("q116 per-stratum kept counts match exact local recomputation") {
    val docs = graft.common.Tables.load(spark, SfDir, "documents")
      .select(col("doc_id"), col("lang")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val counts = docs.groupBy(_._2).map { case (s, g) => s -> g.size.toLong }
    val nMin = counts.values.min
    val p2 = BigInt(P) * BigInt(P)
    val localKept = docs.groupBy(_._2).map { case (s, g) =>
      s -> g.count { case (id, _) =>
        BigInt(u(id)) * BigInt(u(id)) * BigInt(counts(s)) < p2 * BigInt(nMin)
      }.toLong
    }
    val emitted = run("q116_temperature_mix").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(emitted.keySet == counts.keySet)
    emitted.foreach { case (l, (nDocs, nKept)) =>
      assert(nDocs == counts(l), s"n_docs for $l")
      assert(nKept == localKept(l), s"n_kept for $l")
    }
  }

  test("q116 smallest stratum keeps everything and big strata shrink") {
    val rows = run("q116_temperature_mix").collect()
    val minRow = rows.minBy(_.getLong(1))
    assert(minRow.getLong(1) == minRow.getLong(2),
      "smallest stratum must keep all docs (r = 1)")
    assert(minRow.getDouble(3) == 1.0)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getLong(2) > 0, s"stratum ${r.getString(0)} emptied")
      assert(r.getDouble(4) > 0.0 && r.getDouble(4) <= 1.0)
    }
    // lang is genuinely skewed in the corpus (en ~40%): the largest
    // stratum must actually be downsampled, not passed through.
    val maxRow = rows.maxBy(_.getLong(1))
    assert(maxRow.getLong(1) > minRow.getLong(1), "corpus lost its skew")
    assert(maxRow.getLong(2) < maxRow.getLong(1),
      "largest stratum was not downsampled")
  }

  test("q116 is partition-count invariant") {
    val a = withShufflePartitions(3) {
      run("q116_temperature_mix").orderBy("lang")
        .collect().map(_.toSeq).toSeq
    }
    val b = withShufflePartitions(17) {
      run("q116_temperature_mix").orderBy("lang")
        .collect().map(_.toSeq).toSeq
    }
    assert(a == b)
  }

  private def withShufflePartitions[T](n: Int)(body: => T): T = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", n.toString)
    try body finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
