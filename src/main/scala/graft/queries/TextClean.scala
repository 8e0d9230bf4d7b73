package graft.queries

import graft.QueryDef
import graft.common.Tables.load
import graft.functions.Text._
import org.apache.spark.sql.functions._

/** Text cleaning + corpus filtering — the compose-everything stage of a
  * training-data pipeline: markup strip, whitespace/unicode-ish
  * normalization, PII-shaped redaction, then the full clean-corpus
  * composition (dedup ∘ language filter ∘ quality filter) as ONE
  * declarative plan.
  */
object TextClean {

  private val NormSql = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"

  /** Cleaning battery: every transform is a codegen'd regexp over the
    * scan — pure map work at any scale. (The corpus has no real markup
    * or PII; the transforms are the operators, applied verbatim.)
    */
  private val q55 = QueryDef(
    (s, d) =>
      load(s, d, "documents").select(
        col("doc_id"),
        // markup strip: remove <...> spans
        regexp_replace(col("text"), "<[^>]*>", " ").as("no_markup"),
        // PII-shaped redaction: email-like and long-digit-run tokens
        regexp_replace(
          regexp_replace(col("text"),
            "[A-Za-z0-9.]+@[A-Za-z0-9.]+", "<EMAIL>"),
          "[0-9]{6,}", "<NUM>").as("redacted"),
        // printable-ascii projection + whitespace collapse
        regexp_replace(
          regexp_replace(col("text"), "[^ -~]", ""),
          "\\s+", " ").as("ascii_clean"),
        length(col("text")).as("n_chars_raw")),
    Some("""SELECT doc_id,
              regexp_replace(text, '<[^>]*>', ' ', 'g') AS no_markup,
              regexp_replace(regexp_replace(text,
                '[A-Za-z0-9.]+@[A-Za-z0-9.]+', '<EMAIL>', 'g'),
                '[0-9]{6,}', '<NUM>', 'g') AS redacted,
              regexp_replace(regexp_replace(text, '[^ -~]', '', 'g'),
                '\s+', ' ', 'g') AS ascii_clean,
              CAST(length(text) AS INTEGER) AS n_chars_raw
            FROM documents"""),
    "cleaning battery: markup strip, PII redaction, ascii projection [text-analysis]")

  /** Clean-corpus composition: exact-dedup (keep min doc_id per content
    * hash) ∘ keep docs with >=20 words ∘ keep distinct-word ratio >=0.3.
    * One plan: the dedup window and the filters fuse into a single
    * shuffle on the content hash — the shape of a real corpus-prep job,
    * end-to-end oracle-checked.
    */
  private val q56 = QueryDef(
    (s, d) => {
      val w = words(col("text"))
      val docs = load(s, d, "documents").select(
        col("doc_id"), col("lang"),
        sha2(norm(col("text")), 256).as("content_hash"),
        size(w).as("n_words"),
        (size(array_distinct(w)).cast("double") / size(w))
          .as("distinct_ratio"))
      val keep = org.apache.spark.sql.expressions.Window
        .partitionBy(col("content_hash")).orderBy(col("doc_id").asc)
      docs
        .filter(col("n_words") >= 20 && col("distinct_ratio") >= 0.3)
        .withColumn("rn", row_number().over(keep))
        .filter(col("rn") === 1)
        .select("doc_id", "lang", "content_hash", "n_words", "distinct_ratio")
    },
    Some(s"""WITH scored AS (
              SELECT doc_id, lang,
                sha256($NormSql) AS content_hash,
                CAST(len(string_split($NormSql, ' ')) AS INTEGER) AS n_words,
                CAST(CAST(len(list_distinct(string_split($NormSql, ' '))) AS DOUBLE)
                     / len(string_split($NormSql, ' ')) AS DOUBLE) AS distinct_ratio
              FROM documents
            )
            SELECT doc_id, lang, content_hash, n_words, distinct_ratio
            FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY content_hash
                    ORDER BY doc_id ASC) AS rn
                  FROM scored
                  WHERE n_words >= 20 AND distinct_ratio >= 0.3)
            WHERE rn = 1"""),
    "clean-corpus composition: dedup + quality filters in one plan [dedup,text-analysis]")

  /** Stratified downsampling: per-language keep-fractions applied via a
    * deterministic key-mod predicate (not an RNG — reruns and retries
    * keep IDENTICAL rows, which a random sample cannot promise across
    * engines or executions; the trade is that doc_id must be
    * well-distributed, which a hash-mod variant fixes at scale).
    * Balances over-represented strata in one codegen'd filter.
    */
  private val q60 = QueryDef(
    (s, d) => {
      val keepPct = typedLit(Map(
        "en" -> 80, "zh" -> 40, "es" -> 40, "de" -> 60, "fr" -> 60))
      load(s, d, "documents")
        .withColumn("keep_pct", coalesce(keepPct(col("lang")), lit(20)))
        .filter(pmod(col("doc_id"), lit(100)) < col("keep_pct"))
        .select(col("doc_id"), col("lang"), col("keep_pct").cast("int"))
    },
    Some("""SELECT doc_id, lang, CAST(keep_pct AS INTEGER) AS keep_pct
            FROM (SELECT doc_id, lang,
                    CASE lang WHEN 'en' THEN 80 WHEN 'zh' THEN 40
                              WHEN 'es' THEN 40 WHEN 'de' THEN 60
                              WHEN 'fr' THEN 60 ELSE 20 END AS keep_pct
                  FROM documents)
            WHERE doc_id % 100 < keep_pct"""),
    "deterministic stratified downsample via key-mod [sampling]")

  /** Corpus mixing weights: per-language sampling weight that moves the
    * observed mix toward a uniform target share, upsampling capped at 4x
    * (the standard guard against repeating a tiny stratum into
    * memorization). The group table after aggregation has one row per
    * stratum, so the share/weight windows run over k rows — free at any
    * corpus size; the weights feed a weighted sampler (q60's key-mod
    * form or a trainer-side sampler) downstream.
    */
  private val q71 = QueryDef(
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val all = Window.partitionBy()
      load(s, d, "documents")
        .groupBy("lang").agg(count(lit(1)).as("n_docs"))
        .withColumn("total", sum("n_docs").over(all))
        .withColumn("k", count(lit(1)).over(all))
        .select(col("lang"), col("n_docs"),
          (col("n_docs").cast("double") / col("total"))
            .as("actual_share"),
          (lit(1.0) / col("k")).as("target_share"),
          least(
            (lit(1.0) / col("k")) /
              (col("n_docs").cast("double") / col("total")),
            lit(4.0)).as("sample_weight"))
    },
    Some("""WITH g AS (
              SELECT lang, count(*) AS n_docs FROM documents GROUP BY 1
            )
            SELECT lang, n_docs,
              CAST(n_docs AS DOUBLE) / sum(n_docs) OVER () AS actual_share,
              1.0 / count(*) OVER () AS target_share,
              least((1.0 / count(*) OVER ()) /
                    (CAST(n_docs AS DOUBLE) / sum(n_docs) OVER ()), 4.0)
                AS sample_weight
            FROM g"""),
    "per-language mixing weights toward a uniform target [sampling]")

  def all: Seq[(String, QueryDef)] = Seq(
    "q55_text_clean" -> q55,
    "q56_corpus_clean" -> q56,
    "q60_stratified_sample" -> q60,
    "q71_mix_weights" -> q71)
}
