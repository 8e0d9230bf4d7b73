package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Winsorization audit (q146) and contrastive batch assembly (q147). */
class WinsorizeContrastiveSpec extends AnyFunSuite with SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, Sf)

  test("q146 bounds are ordered, clipping is ≈2%, and sums move toward the bounds") {
    val df = run("q146_winsorize").cache()
    assert(df.count() > 0)
    assert(df.filter(col("lo_cents") > col("hi_cents")).count() == 0)
    // clipped mass per side is < 2% of n (positional p01/p99 caps it)
    assert(df.filter(col("n_clipped_low") * 50 > col("n_events")).count() == 0)
    assert(df.filter(col("n_clipped_high") * 50 > col("n_events")).count() == 0)
    // winsorized sum is bounded by n·lo and n·hi
    assert(df.filter(
      col("sum_winsorized_cents") < col("n_events") * col("lo_cents") ||
        col("sum_winsorized_cents") > col("n_events") * col("hi_cents"))
      .count() == 0)
    df.unpersist()
  }

  test("q146 winsorized sum equals recomputed clip") {
    val df = run("q146_winsorize")
    val ev = graft.common.Tables.load(spark, Sf, "events")
      .select(col("event_type"),
        graft.common.Exact.cents(col("value")).as("cents"))
    val re = ev.join(df.select("event_type", "lo_cents", "hi_cents"),
      "event_type")
      .groupBy("event_type")
      .agg(sum(least(greatest(col("cents"), col("lo_cents")),
        col("hi_cents"))).as("re_sum"))
    assert(df.join(re, "event_type")
      .filter(col("sum_winsorized_cents") =!= col("re_sum")).count() == 0)
  }

  test("q147 emits the full role quota with correct label relations") {
    val df = run("q147_contrastive_batch").cache()
    // 20 anchors × (3 pos + 3 hard + 2 easy)
    assert(df.count() == 20L * 8L)
    assert(df.groupBy("anchor_id").count()
      .filter(col("count") =!= 8L).count() == 0)
    val emb = graft.common.Tables.load(spark, Sf, "embeddings")
      .select(col("vec_id").as("anchor_id"), col("label").as("a_label"))
    val j = df.join(emb, "anchor_id")
    assert(j.filter(col("role") === "pos" &&
      col("label") =!= col("a_label")).count() == 0)
    assert(j.filter(col("role").isin("hard_neg", "easy_neg") &&
      col("label") === col("a_label")).count() == 0)
    // a hard negative scores at least as high as any easy negative of
    // the same anchor would on average — sanity: hard rank-1 cosine ≥
    // that anchor's easy cosines
    val hard1 = df.filter(col("role") === "hard_neg" && col("rank") === 1)
      .select(col("anchor_id"), col("cosine").as("hc"))
    val easy = df.filter(col("role") === "easy_neg")
      .select(col("anchor_id"), col("cosine").as("ec"))
    assert(hard1.join(easy, "anchor_id").filter(col("ec") > col("hc"))
      .count() == 0)
    // no anchor appears as its own candidate
    assert(df.filter(col("vec_id") === col("anchor_id")).count() == 0)
    df.unpersist()
  }
}
