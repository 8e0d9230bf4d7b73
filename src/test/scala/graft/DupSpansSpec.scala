package graft

import graft.queries.DupSpans
import org.scalatest.funsuite.AnyFunSuite

/** Duplicate-span detection (q99): exact hand-computed coverage on a
  * planted corpus — shared contiguous spans, split spans, unique docs,
  * too-short docs, and case normalization.
  */
class DupSpansSpec extends AnyFunSuite with SparkSpec {

  test("hand-computed spans on a planted corpus") {
    import spark.implicits._
    // a 10-word phrase shared by docs 1 and 2 carries exactly 3 dup
    // 8-grams (10 - 8 + 1), contiguous in both; doc 1 carries it
    // case-mangled to pin the canonical-form normalization
    val phrase = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val a = "a1 a2 a3 a4 a5 a6 a7 a8" // an exactly-8-word span: 1 gram
    val b = "b1 b2 b3 b4 b5 b6 b7 b8"
    val docs = Seq(
      (1L, "ALPHA beta GAMMA delta epsilon zeta eta theta iota kappa u1 u2"),
      (2L, s"x1 x2 $phrase"),
      (3L, "one two three four five six seven"), // 7 words: no grams
      (4L, "v1 v2 v3 v4 v5 v6 v7 v8 v9"), // unique: zero dup coverage
      // docs 5/6 share spans A and B split by differing filler: two
      // dup positions with a gap — two runs of 1, never one run of 2
      (5L, s"$a f5x f5y $b"),
      (6L, s"$a f6x f6y $b")
    ).toDF("doc_id", "text")
    val out = DupSpans.spansFromDocs(docs).collect().map { r =>
      r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_grams"), r.getAs[Long]("n_dup_grams"),
          r.getAs[Double]("dup_frac"), r.getAs[Long]("max_dup_run")))
    }.toMap
    assert(out.keySet == Set(1L, 2L, 4L, 5L, 6L)) // doc 3 has no grams
    assert(out(1L) == ((5L, 3L, 0.6, 3L)))
    assert(out(2L) == ((5L, 3L, 0.6, 3L)))
    assert(out(4L) == ((2L, 0L, 0.0, 0L)))
    assert(out(5L) == ((11L, 2L, 2.0 / 11, 1L)))
    assert(out(6L) == ((11L, 2L, 2.0 / 11, 1L)))
  }

  test("q99 registry output is plausible at sf0.001") {
    val df = SparkEntry.queries("q99_dup_spans")(spark, Sf).cache()
    try {
      import org.apache.spark.sql.functions._
      assert(df.count() > 0)
      val bad = df.filter(col("n_dup_grams") > col("n_grams") ||
          col("max_dup_run") > col("n_dup_grams") ||
          col("dup_frac") < 0.0 || col("dup_frac") > 1.0 ||
          (col("n_dup_grams") > 0 && col("max_dup_run") < 1)).count()
      assert(bad == 0L)
      // the synthetic corpus has templated text: some doc shows overlap
      assert(df.filter(col("n_dup_grams") > 0).count() > 0)
    } finally df.unpersist()
  }
}
