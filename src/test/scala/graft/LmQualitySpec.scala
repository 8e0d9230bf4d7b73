package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bigram-LM familiarity statistics (q93): structural invariants that
  * hold at any scale — exact value parity is the DuckDB oracle's job.
  */
class LmQualitySpec extends AnyFunSuite with SparkSpec {

  test("q93 invariants: corpus support bounds and ratio ranges") {
    val df = SparkEntry.queries("q93_lm_familiarity")(spark, Sf).cache()
    try {
      val n = df.count()
      assert(n == 500L) // one row per document, none dropped
      // a doc's own occurrences count toward the corpus LM, so every
      // bigram's corpus count >= its in-doc count: sum_c12 >= n_bigrams
      // (familiarity >= 1), min_c12 >= 1, and the unigram support of a
      // bigram's first word is at least the bigram's: sum_c1 >= sum_c12
      val bad = df.filter(col("n_bigrams").isNotNull &&
          (col("sum_c12") < col("n_bigrams") ||
            col("min_c12") < 1 ||
            col("sum_c1") < col("sum_c12") ||
            col("n_rare") > col("n_bigrams") ||
            col("familiarity") < 1.0 ||
            col("rare_ratio") < 0.0 || col("rare_ratio") > 1.0))
        .count()
      assert(bad == 0L)
      // the corpus is real text: familiarity must separate from the
      // rare floor somewhere (not all bigrams hapax)
      assert(df.filter(col("familiarity") > 1.0).count() > 0L)
    } finally df.unpersist()
  }
}
