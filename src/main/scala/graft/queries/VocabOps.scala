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

  /** Head size for the Zipf fit: large enough that the log-log line is
    * meaningful, small enough that the ranked frame is trivially
    * bounded (the tail below rank ~500 is where Zipf breaks down on
    * real corpora anyway, so fitting the head is the standard recipe).
    */
  private val ZipfTopN = 500

  /** q222: Zipf's-law fit over the corpus term-frequency head — the
    * "is this corpus natural language" screen a pretraining-data audit
    * runs (natural text fits ln f ≈ a + s·ln r with s ≈ −1; scraped
    * boilerplate and template spam bend the line). OLS of ln(tf) on
    * ln(rank) over the top-[[ZipfTopN]] terms, reported with the exact
    * integer evidence (rank, term, tf) that anchors the fit.
    *
    * Scale: ONE (term) count fold ends the corpus-proportional work;
    * the head cut is `ORDER BY tf DESC, term LIMIT N` — a
    * TakeOrderedAndProject, never a global sort — and the rank window,
    * logs, and moment sums run on the ≤N-row head. The fit scalars
    * ride a 1-row broadcast back onto the head rows.
    *
    * Exactness: (rank, term, tf) are exact integers joined bit-exact
    * by the oracle; the fit columns depend on ln() and on the SUM
    * order of 500 doubles (addition is not associative and Spark's
    * partial-aggregate order is nondeterministic), so the derived
    * oracle recomputes them from the same integer evidence and admits
    * each within 1e-9 — the q167 tolerance-contract discipline.
    */
  private val q222 = QueryDef(
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("tf").desc, col("term").asc)
      val head = load(s, d, "documents")
        .select(explode(Text.words(col("text"))).as("term"))
        .groupBy(col("term"))
        .agg(count(lit(1)).as("tf"))
        .orderBy(col("tf").desc, col("term").asc)
        .limit(ZipfTopN)
        .withColumn("rank", row_number().over(w))
        .withColumn("lx", log(col("rank").cast("double")))
        .withColumn("ly", log(col("tf").cast("double")))
      val fit = head.agg(
          count(lit(1)).cast("double").as("m"),
          sum(col("lx")).as("sx"), sum(col("ly")).as("sy"),
          sum(col("lx") * col("ly")).as("sxy"),
          sum(col("lx") * col("lx")).as("sxx"),
          sum(col("ly") * col("ly")).as("syy"))
        .select(
          ((col("m") * col("sxy") - col("sx") * col("sy")) /
            (col("m") * col("sxx") - col("sx") * col("sx")))
            .as("zipf_slope"),
          ((col("sy") - ((col("m") * col("sxy") - col("sx") * col("sy")) /
            (col("m") * col("sxx") - col("sx") * col("sx"))) * col("sx")) /
            col("m")).as("intercept"),
          (((col("m") * col("sxy") - col("sx") * col("sy")) *
            (col("m") * col("sxy") - col("sx") * col("sy"))) /
            ((col("m") * col("sxx") - col("sx") * col("sx")) *
              (col("m") * col("syy") - col("sy") * col("sy"))))
            .as("r2"))
      head.select(col("rank"), col("term"), col("tf"))
        .crossJoin(broadcast(fit))
    },
    Some(s"""WITH w AS (
              SELECT unnest($WordsSql) AS term FROM documents
            ), c AS (
              SELECT term, CAST(count(*) AS BIGINT) AS tf
              FROM w GROUP BY 1
            ), head AS (
              SELECT term, tf FROM c ORDER BY tf DESC, term
              LIMIT $ZipfTopN
            ), r AS (
              SELECT term, tf,
                CAST(ROW_NUMBER() OVER (ORDER BY tf DESC, term)
                  AS INTEGER) AS rank
              FROM head
            ), f AS (
              SELECT CAST(COUNT(*) AS DOUBLE) AS m,
                SUM(ln(CAST(rank AS DOUBLE))) AS sx,
                SUM(ln(CAST(tf AS DOUBLE))) AS sy,
                SUM(ln(CAST(rank AS DOUBLE)) * ln(CAST(tf AS DOUBLE)))
                  AS sxy,
                SUM(ln(CAST(rank AS DOUBLE)) * ln(CAST(rank AS DOUBLE)))
                  AS sxx,
                SUM(ln(CAST(tf AS DOUBLE)) * ln(CAST(tf AS DOUBLE)))
                  AS syy
              FROM r
            ), ref AS (
              SELECT r.rank, r.term, r.tf,
                (m * sxy - sx * sy) / (m * sxx - sx * sx) AS slope,
                (sy - ((m * sxy - sx * sy) / (m * sxx - sx * sx)) * sx)
                  / m AS icept,
                ((m * sxy - sx * sy) * (m * sxy - sx * sy))
                  / ((m * sxx - sx * sx) * (m * syy - sy * sy)) AS rr
              FROM r CROSS JOIN f
            ), emitted AS (
              SELECT * FROM read_parquet(
                '${graft.QueryDef.OutDirToken}/q222_zipf_fit/*.parquet')
            )
            SELECT e.rank, e.term, e.tf, e.zipf_slope, e.intercept, e.r2
            FROM emitted e JOIN ref ON e.rank = ref.rank
              AND e.term = ref.term AND e.tf = ref.tf
            WHERE abs(e.zipf_slope - ref.slope) < 1e-9
              AND abs(e.intercept - ref.icept) < 1e-9
              AND abs(e.r2 - ref.rr) < 1e-9"""),
    "Zipf's-law log-log fit over the term-frequency head: exact " +
      "integer evidence + tolerance-admitted fit scalars [text-analysis]")

  /** q223: vocabulary coverage estimation — Chao1 species richness
    * ("how many word types exist that we have NOT yet seen") and the
    * Good-Turing unseen-mass estimate ("what probability mass the next
    * token puts on novel types"), the two standard answers to "is this
    * corpus big enough / still growing" before committing a tokenizer
    * vocabulary. Both need only the frequency-of-frequencies head:
    * Chao1 = V + f1(f1−1)/(2(f2+1)) (bias-corrected), GT unseen mass
    * = f1/N.
    *
    * Scale: ONE (term) count fold, then a scalar aggregate over the
    * |vocab|-row frame — nothing after the first exchange is
    * corpus-sized.
    *
    * Exactness: V, N, f1, f2 are exact integers; each estimate is one
    * fixed chain of integer→double casts, one division and (for
    * Chao1) one addition — identical IEEE ops in both engines, so the
    * oracle compares hash-exact with no tolerance contract.
    */
  private val q223 = QueryDef(
    (s, d) =>
      load(s, d, "documents")
        .select(explode(Text.words(col("text"))).as("term"))
        .groupBy(col("term"))
        .agg(count(lit(1)).as("tf"))
        .agg(
          count(lit(1)).cast("long").as("v_obs"),
          sum(col("tf")).cast("long").as("n_tokens"),
          sum(when(col("tf") === 1L, 1L).otherwise(0L)).cast("long")
            .as("f1"),
          sum(when(col("tf") === 2L, 1L).otherwise(0L)).cast("long")
            .as("f2"))
        .select(col("v_obs"), col("n_tokens"), col("f1"), col("f2"),
          (col("v_obs").cast("double") +
            (col("f1") * (col("f1") - 1L)).cast("double") /
              (lit(2L) * (col("f2") + 1L)).cast("double")).as("chao1"),
          (col("f1").cast("double") / col("n_tokens").cast("double"))
            .as("gt_unseen_mass")),
    Some(s"""WITH w AS (
              SELECT unnest($WordsSql) AS term FROM documents
            ), c AS (
              SELECT term, CAST(count(*) AS BIGINT) AS tf
              FROM w GROUP BY 1
            ), s AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS v_obs,
                CAST(SUM(tf) AS BIGINT) AS n_tokens,
                CAST(SUM(CASE WHEN tf = 1 THEN 1 ELSE 0 END) AS BIGINT)
                  AS f1,
                CAST(SUM(CASE WHEN tf = 2 THEN 1 ELSE 0 END) AS BIGINT)
                  AS f2
              FROM c
            )
            SELECT v_obs, n_tokens, f1, f2,
              CAST(v_obs AS DOUBLE)
                + CAST(f1 * (f1 - 1) AS DOUBLE)
                  / CAST(2 * (f2 + 1) AS DOUBLE) AS chao1,
              CAST(f1 AS DOUBLE) / CAST(n_tokens AS DOUBLE)
                AS gt_unseen_mass
            FROM s"""),
    "Chao1 + Good-Turing vocabulary-coverage estimate from the " +
      "frequency-of-frequencies fold [text-analysis]")

  def all: Seq[(String, QueryDef)] = Seq(
    "q134_vocab_contamination" -> q134,
    "q222_zipf_fit" -> q222,
    "q223_vocab_coverage" -> q223)
}
