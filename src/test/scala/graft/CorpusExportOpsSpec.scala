package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 corpus-export operators: PII-safe export (q129), hashed
  * classifier scoring (q130), threshold sweep (q131), curriculum stages
  * (q132), stratified holdout (q133), vocab contamination (q134),
  * embedding stats (q135–q137), onboarding paths (q138). Exact value
  * parity is the driver's DuckDB oracle; these pin the structural
  * invariants.
  */
class CorpusExportOpsSpec extends AnyFunSuite with SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, Sf)

  // ---- q129 PII export ----

  test("q129 masks every digit and pseudonyms are distinct") {
    val df = run("q129_pii_export").cache()
    assert(df.filter(col("masked_name").rlike("[0-9]")).count() == 0)
    assert(df.select("pseudonym").distinct().count() == df.count())
    // audit column counts exactly the digits in the SOURCE name (the
    // masked rendering can't be used directly: names carry a literal
    // '#' of their own)
    val src = graft.common.Tables.load(spark, Sf, "customer")
      .select(col("c_custkey"),
        (length(col("c_name")) -
          length(regexp_replace(col("c_name"), "[0-9]", "")))
          .cast("int").as("expect"))
    assert(df.join(src, "c_custkey")
      .filter(col("n_digits_redacted") =!= col("expect")).count() == 0)
    df.unpersist()
  }

  test("q129 pseudonym is key-stable (same key → same pseudonym)") {
    val a = run("q129_pii_export").select("c_custkey", "pseudonym")
    val b = run("q129_pii_export").select("c_custkey", "pseudonym")
    assert(a.except(b).count() == 0)
  }

  // ---- q130 hashed classifier ----

  test("q130 logit is the token-sum and keep matches its sign") {
    val df = run("q130_hashed_classifier").cache()
    assert(df.filter(col("keep") =!= (col("logit_milli") > 0L)).count() == 0)
    // mean is exactly logit/n
    assert(df.filter(abs(col("mean_logit_milli") -
      col("logit_milli").cast("double") / col("n_tokens").cast("double"))
      > 0.0).count() == 0)
    // weights span both signs over a real corpus
    assert(df.filter(col("logit_milli") > 0).count() > 0)
    assert(df.filter(col("logit_milli") < 0).count() > 0)
    df.unpersist()
  }

  // ---- q131 threshold sweep ----

  test("q131 retention curve is complete, monotone, and anchored") {
    val rows = run("q131_threshold_sweep")
      .orderBy("min_chars_threshold").collect()
    assert(rows.length == 12)
    val docs = rows.map(_.getLong(1))
    val nDocs = graft.common.Tables.load(spark, Sf, "documents").count()
    assert(docs.head == nDocs)                  // threshold 0 keeps all
    assert(docs.zip(docs.tail).forall { case (a, b) => a >= b })
    val frac = rows.map(_.getDouble(3))
    assert(math.abs(frac.head - 1.0) < 1e-12)
  }

  // ---- q132 curriculum ----

  test("q132 stages partition the corpus with balanced sizes and ordered difficulty") {
    val rows = run("q132_curriculum_stages").orderBy("stage").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 3L, 4L))
    val n = rows.map(_.getLong(1)).sum
    assert(n == graft.common.Tables.load(spark, Sf, "documents").count())
    assert(rows.map(_.getLong(1)).max - rows.map(_.getLong(1)).min <= 1)
    // easy→hard: each stage's max_chars ≤ next stage's min_chars
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(4) <= b.getLong(3),
        s"stage ${a.getLong(0)} overlaps ${b.getLong(0)}")
    }
  }

  // ---- q133 holdout ----

  test("q133 split fractions sum to 1 within each lang and cover 3 splits") {
    val df = run("q133_stratified_holdout").cache()
    val langs = df.select("lang").distinct().count()
    assert(df.groupBy("lang").agg(sum("frac_of_lang").as("s"))
      .filter(abs(col("s") - 1.0) > 1e-12).count() == 0)
    assert(df.select("split").distinct().count() == 3)
    // train dominates per lang
    val bad = df.groupBy("lang").pivot("split").sum("n_docs")
      .filter(col("train") <= col("val") || col("train") <= col("test"))
      .count()
    assert(bad == 0 && langs == 5)
    df.unpersist()
  }

  test("q133 split is growth-stable: membership survives subsetting") {
    // a doc's split hash depends only on doc_id, so recomputing over
    // any subset (an earlier corpus generation) must assign identically
    val docs = graft.common.Tables.load(spark, Sf, "documents")
    val u = graft.queries.Curation.shuffleKeyWith(col("doc_id"), 424242L) % 10L
    val full = docs.select(col("doc_id"), u.as("u"))
    val half = docs.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id"), u.as("u2"))
    assert(full.join(half, "doc_id")
      .filter(col("u") =!= col("u2")).count() == 0)
  }

  // ---- q134 vocab contamination ----

  test("q134 hit counts are bounded by token count and fractions are consistent") {
    val df = run("q134_vocab_contamination").cache()
    assert(df.count() ==
      graft.common.Tables.load(spark, Sf, "documents").count())
    assert(df.filter(col("own_hits") + col("foreign_hits") > col("n_tokens") * 5)
      .count() == 0) // a token can match at most one vocab entry per lang (5 langs)
    assert(df.filter(abs(col("foreign_frac") -
      col("foreign_hits").cast("double") / col("n_tokens").cast("double"))
      > 0.0).count() == 0)
    // the shared synthetic vocabulary guarantees cross-lang hits exist
    assert(df.filter(col("foreign_hits") > 0).count() > 0)
    df.unpersist()
  }

  // ---- q135–q137 embedding stats ----

  test("q135 extremes are internally consistent") {
    val df = run("q135_embedding_extremes").cache()
    assert(df.count() ==
      graft.common.Tables.load(spark, Sf, "embeddings").count())
    assert(df.filter(col("max_abs") <= 0.0 || col("max_abs") > 1.0).count() == 0)
    assert(df.filter(col("dom_dim") < 1 || col("dom_dim") > 64).count() == 0)
    // unit-norm vectors can have at most 16 coords with |x| ≥ 0.25
    assert(df.filter(col("n_hot") > 16).count() == 0)
    df.unpersist()
  }

  test("q136 centroid table covers labels × dims with exact counts") {
    val df = run("q136_label_centroids").cache()
    assert(df.count() == 10L * 64L)
    val emb = graft.common.Tables.load(spark, Sf, "embeddings")
    val sizes = emb.groupBy("label").count()
    assert(df.join(sizes, "label")
      .filter(col("n_vecs") =!= col("count")).count() == 0)
    // centroid_milli is the rounded mean of sum_q/n
    assert(df.filter(col("centroid_milli") =!=
      floor(col("sum_q").cast("double") / col("n_vecs").cast("double") + 0.5)
        .cast("long")).count() == 0)
    df.unpersist()
  }

  test("q137 purity matrix accounts for every vector") {
    val df = run("q137_centroid_purity").cache()
    val total = df.agg(sum("n_vecs")).head().getLong(0)
    assert(total ==
      graft.common.Tables.load(spark, Sf, "embeddings").count())
    // the synthetic labels carry real (if weak) cluster structure:
    // diagonal mass must beat the 10% random-assignment floor clearly
    // (36% at sf0.001 — checked offline against an independent
    // recomputation)
    val diag = df.filter(col("label") === col("assigned_label"))
      .agg(sum("n_vecs")).head().getLong(0)
    assert(diag * 5 > total, s"diagonal $diag of $total")
    df.unpersist()
  }

  // ---- q138 paths ----

  test("q138 paths have ≤ 8 hops and user counts add up") {
    val df = run("q138_event_paths").cache()
    val nUsers = graft.common.Tables.load(spark, Sf, "events")
      .select("user_id").distinct().count()
    assert(df.agg(sum("n_users")).head().getLong(0) == nUsers)
    assert(df.filter(size(split(col("path"), ">")) > 8).count() == 0)
    df.unpersist()
  }
}
