package graft.queries

import graft.QueryDef
import graft.common.Tables.load
import graft.functions.Text
import org.apache.spark.sql.functions._

/** Cross-lingual vocabulary analysis: detect documents whose token
  * stream leans on ANOTHER language's core vocabulary — the standard
  * audit for mislabeled-language and code-switched documents before a
  * per-language training mix is trusted.
  */
object VocabOps {

  private val TopK = 20

  private val NormSql =
    "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
  private val WordsSql = s"string_split($NormSql, ' ')"

  /** q134: per-document vocabulary contamination. Phase 1 builds each
    * language's top-20 core vocabulary from the corpus itself (term
    * occurrence counts, rank ties broken by term so the cut is total).
    * Phase 2 scores every document: how many of its token occurrences
    * sit in its OWN language's core vocab vs in any OTHER language's.
    * A high foreign fraction with a low own fraction is the
    * mislabeled-language signature.
    *
    * Scale: the vocab is |langs|·K rows — broadcast to the scoring
    * join, so phase 2 is one shuffle (the per-doc count agg). Phase 1
    * is a keyed (lang, term) agg with map-side combine + a per-lang
    * top-K window over |distinct terms| rows, the exchange the BM25/DF
    * family already proved out. Token explode never re-shuffles raw
    * text — only (doc_id, term) pairs.
    *
    * Float parity: hits and token counts are exact longs; the fraction
    * is one double division.
    */
  private val q134 = QueryDef(
    (s, d) => {
      val docs = load(s, d, "documents")
      val toks = docs.select(col("doc_id"), col("lang"),
        explode(Text.words(col("text"))).as("term"))
      val vocab = toks.groupBy(col("lang"), col("term"))
        .agg(count(lit(1)).as("n"))
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("lang")
            .orderBy(col("n").desc, col("term"))))
        .filter(col("rn") <= TopK)
        .select(col("lang").as("vlang"), col("term"))
      val hits = toks
        .join(broadcast(vocab), Seq("term"))
        .groupBy(col("doc_id"))
        .agg(
          sum(when(col("vlang") === col("lang"), 1L).otherwise(0L))
            .as("own_hits"),
          sum(when(col("vlang") =!= col("lang"), 1L).otherwise(0L))
            .as("foreign_hits"))
      docs.select(col("doc_id"), col("lang"),
        size(Text.words(col("text"))).cast("long").as("n_tokens"))
        .join(hits, Seq("doc_id"), "left")
        .select(col("doc_id"), col("lang"), col("n_tokens"),
          coalesce(col("own_hits"), lit(0L)).as("own_hits"),
          coalesce(col("foreign_hits"), lit(0L)).as("foreign_hits"))
        .withColumn("foreign_frac",
          col("foreign_hits").cast("double") / col("n_tokens").cast("double"))
    },
    Some(s"""WITH w AS (
              SELECT doc_id, lang, unnest($WordsSql) AS term FROM documents
            ), c AS (
              SELECT lang, term, CAST(count(*) AS BIGINT) AS n
              FROM w GROUP BY 1, 2
            ), v AS (
              SELECT lang AS vlang, term FROM (
                SELECT lang, term, ROW_NUMBER() OVER (
                  PARTITION BY lang ORDER BY n DESC, term) AS rn
                FROM c) WHERE rn <= $TopK
            ), h AS (
              SELECT w.doc_id,
                CAST(SUM(CASE WHEN v.vlang = w.lang THEN 1 ELSE 0 END)
                  AS BIGINT) AS own_hits,
                CAST(SUM(CASE WHEN v.vlang <> w.lang THEN 1 ELSE 0 END)
                  AS BIGINT) AS foreign_hits
              FROM w JOIN v ON w.term = v.term
              GROUP BY 1
            )
            SELECT d.doc_id, d.lang,
              CAST(len($WordsSql) AS BIGINT) AS n_tokens,
              coalesce(h.own_hits, 0) AS own_hits,
              coalesce(h.foreign_hits, 0) AS foreign_hits,
              CAST(coalesce(h.foreign_hits, 0) AS DOUBLE) /
                CAST(len($WordsSql) AS DOUBLE) AS foreign_frac
            FROM documents d LEFT JOIN h ON d.doc_id = h.doc_id"""),
    "cross-lingual vocab contamination: corpus-derived top-K vocab, broadcast score join [text-analysis]")

  def all: Seq[(String, QueryDef)] = Seq(
    "q134_vocab_contamination" -> q134)
}
