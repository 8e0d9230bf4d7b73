package graft.queries

import graft.QueryDef
import graft.common.Tables.load
import graft.functions.Text._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Statistical-LM quality scoring over the `documents` table — the
  * CCNet/Gopher-style "how familiar is this text to the corpus" filter
  * a training-data pipeline runs to separate fluent text from gibberish,
  * boilerplate, and OCR noise. A full perplexity score needs `ln`, whose
  * last-ulp behavior differs between the JVM and DuckDB (measured: ~6%
  * of values differ bit-for-bit), so the emitted columns follow the
  * house integer-exact discipline instead: every statistic is an exact
  * integer sum over corpus bigram/unigram counts, plus two
  * single-division ratios of those exact integers (deterministic across
  * engines because both divide identical longs).
  *
  * Scale design: per-doc bigram multisets are counted LOCALLY inside a
  * typed mapPartitions pass (no one-row-per-token explode — same narrow
  * discipline as q63's TF pass), so the only wide ops are the two
  * corpus-LM aggregations (bigram + unigram, both map-side-combined),
  * the two LM joins on the n-gram key, and the final doc-keyed
  * aggregate. At 100 TB the LM tables are large but the joins are plain
  * shuffle hash joins on high-cardinality keys — no driver collect, no
  * broadcast of unbounded state.
  */
object LmQuality {

  /** A bigram is "rare" when the whole corpus contains it at most this
    * many times (hapax bigrams — the strongest gibberish signal: random
    * token soup is made almost entirely of corpus-unique bigrams).
    */
  private[graft] val RareAtMost = 1L

  /** (doc_id, bigram, w1, tf): each document's bigram multiset counted
    * in a per-doc hash map; w1 (the bigram's first word) rides along so
    * the unigram join needs no re-split downstream.
    */
  private def docBigrams(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    load(s, d, "documents")
      .select(col("doc_id"), words(col("text")).as("w"))
      .as[(Long, Seq[String])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, w) =>
          val counts = new java.util.LinkedHashMap[String, Long]()
          var i = 0
          while (i < w.length - 1) {
            counts.merge(w(i) + " " + w(i + 1), 1L, _ + _)
            i += 1
          }
          val it = counts.entrySet().iterator()
          new Iterator[(Long, String, Long)] {
            def hasNext = it.hasNext
            def next() = { val e = it.next(); (id, e.getKey, e.getValue) }
          }
        }
      }
      .toDF("doc_id", "bg", "tf")
  }

  /** (doc_id, term, tf) with local counting — the unigram LM's input. */
  private def docUnigrams(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    load(s, d, "documents")
      .select(col("doc_id"), words(col("text")).as("w"))
      .as[(Long, Seq[String])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, w) =>
          val counts = new java.util.LinkedHashMap[String, Long]()
          w.foreach(t => counts.merge(t, 1L, _ + _))
          val it = counts.entrySet().iterator()
          new Iterator[(Long, String, Long)] {
            def hasNext = it.hasNext
            def next() = { val e = it.next(); (id, e.getKey, e.getValue) }
          }
        }
      }
      .toDF("doc_id", "term", "tf")
  }

  /** Per-doc familiarity statistics against the corpus's own bigram LM:
    * n_bigrams (occurrences), sum_c12 / sum_c1 (summed corpus support of
    * the doc's bigrams / their first words), min_c12 (weakest bigram),
    * n_rare (occurrences of hapax bigrams), familiarity = sum_c12 /
    * n_bigrams, rare_ratio = n_rare / n_bigrams. Docs with fewer than
    * two words surface with null statistics rather than disappearing
    * (q89's convention).
    */
  private[graft] def lmFamiliarity(s: SparkSession, d: String): DataFrame = {
    val bg = docBigrams(s, d)
    val lm = bg.groupBy("bg").agg(sum("tf").as("c12"))
    val uni = docUnigrams(s, d).groupBy("term").agg(sum("tf").as("c1"))
    val scored = bg
      .join(lm, "bg")
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .join(uni.withColumnRenamed("term", "w1"), "w1")
    val agg = scored.groupBy("doc_id")
      .agg(
        sum(col("tf")).as("n_bigrams"),
        sum(col("tf") * col("c12")).as("sum_c12"),
        sum(col("tf") * col("c1")).as("sum_c1"),
        min(col("c12")).as("min_c12"),
        sum(when(col("c12") <= RareAtMost, col("tf")).otherwise(0L))
          .as("n_rare"))
      .withColumn("familiarity",
        col("sum_c12").cast("double") / col("n_bigrams"))
      .withColumn("rare_ratio",
        col("n_rare").cast("double") / col("n_bigrams"))
    load(s, d, "documents").select(col("doc_id"))
      .join(agg, Seq("doc_id"), "left")
  }

  // DuckDB mirrors of the Text.scala primitives (shared shape with
  // TextOps' oracles; RE2 needs the 'g' flag on regexp_replace).
  private val NormSql = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
  private val WordsSql = s"string_split($NormSql, ' ')"

  private val q93 = QueryDef(
    (s, d) => lmFamiliarity(s, d),
    Some(s"""WITH t AS (
              SELECT doc_id, $WordsSql AS w FROM documents
            ), occ AS (
              SELECT doc_id, unnest(
                [array_to_string(w[i:i+1], ' ')
                 for i in range(1, greatest(len(w), 1))]) AS bg
              FROM t
            ), dbg AS (
              SELECT doc_id, bg, count(*) AS tf FROM occ GROUP BY 1, 2
            ), lm AS (
              SELECT bg, sum(tf) AS c12 FROM dbg GROUP BY 1
            ), wocc AS (
              SELECT unnest(w) AS term FROM t
            ), uni AS (
              SELECT term, count(*) AS c1 FROM wocc GROUP BY 1
            ), agg AS (
              SELECT d.doc_id,
                CAST(sum(d.tf) AS BIGINT) AS n_bigrams,
                CAST(sum(d.tf * lm.c12) AS BIGINT) AS sum_c12,
                CAST(sum(d.tf * u.c1) AS BIGINT) AS sum_c1,
                CAST(min(lm.c12) AS BIGINT) AS min_c12,
                CAST(sum(CASE WHEN lm.c12 <= $RareAtMost THEN d.tf
                              ELSE 0 END) AS BIGINT) AS n_rare
              FROM dbg d
              JOIN lm USING (bg)
              JOIN uni u ON u.term = string_split(d.bg, ' ')[1]
              GROUP BY 1
            )
            SELECT doc.doc_id, a.n_bigrams, a.sum_c12, a.sum_c1,
              a.min_c12, a.n_rare,
              CAST(a.sum_c12 AS DOUBLE) / a.n_bigrams AS familiarity,
              CAST(a.n_rare AS DOUBLE) / a.n_bigrams AS rare_ratio
            FROM (SELECT doc_id FROM documents) doc
            LEFT JOIN agg a USING (doc_id)"""),
    "corpus bigram-LM familiarity statistics per doc [text-analysis,lm-quality]")

  def all: Seq[(String, QueryDef)] = Seq(
    "q93_lm_familiarity" -> q93)
}
