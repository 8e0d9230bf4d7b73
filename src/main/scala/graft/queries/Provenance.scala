package graft.queries

import graft.QueryDef
import graft.common.Tables.load
import graft.functions.Text._
import org.apache.spark.sql.functions._

/** Provenance analytics over the `source` column — the audit every
  * multi-source training corpus runs before fixing mix weights: which
  * sources are worth keeping, upweighting, or dropping, and which pairs
  * of sources are feeding each other duplicated content.
  *
  * Both queries are single-aggregation plans over one `documents` scan
  * (source cardinality is tiny next to the corpus, so the aggregates
  * map-side combine and the final exchange moves one row per source or
  * source pair). All ratios are exact integer-count divisions so the
  * doubles hash-match the DuckDB mirrors.
  */
object Provenance {

  private val NormSql = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
  private val WordsSql = s"string_split($NormSql, ' ')"

  /** Per-source corpus quality report: volume, language spread, token
    * mass, and the two health ratios that drive source curation — the
    * quality-floor pass rate (q56's floor: >=20 words, distinct ratio
    * >=0.3) and the exact-duplicate rate (1 − distinct hashes / docs).
    * One shuffle on the source key with map-side partials.
    */
  private val q84 = QueryDef(
    (s, d) => {
      val w = words(col("text"))
      load(s, d, "documents")
        .select(col("source"), col("lang"),
          sha2(norm(col("text")), 256).as("content_hash"),
          size(w).as("n_words"),
          (size(w) >= 20 &&
            (size(array_distinct(w)).cast("double") / size(w)) >= 0.3)
            .as("passes"))
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          countDistinct(col("lang")).cast("long").as("n_langs"),
          sum(col("n_words")).cast("long").as("total_tokens"),
          (sum(col("n_words")).cast("double") / count(lit(1)))
            .as("avg_doc_tokens"),
          (sum(when(col("passes"), 1L).otherwise(0L)).cast("double") /
            count(lit(1))).as("quality_pass_rate"),
          (lit(1.0) - countDistinct(col("content_hash")).cast("double") /
            count(lit(1))).as("dup_rate"))
    },
    Some(s"""SELECT source,
              CAST(count(*) AS BIGINT) AS n_docs,
              CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
              CAST(sum(len($WordsSql)) AS BIGINT) AS total_tokens,
              CAST(sum(len($WordsSql)) AS DOUBLE) / count(*)
                AS avg_doc_tokens,
              CAST(sum(CASE WHEN len($WordsSql) >= 20 AND
                  CAST(len(list_distinct($WordsSql)) AS DOUBLE)
                    / len($WordsSql) >= 0.3
                THEN 1 ELSE 0 END) AS DOUBLE) / count(*)
                AS quality_pass_rate,
              1.0 - CAST(count(DISTINCT sha256($NormSql)) AS DOUBLE)
                / count(*) AS dup_rate
            FROM documents GROUP BY 1"""),
    "per-source corpus audit: volume/langs/tokens/quality/dup rate " +
      "[text-analysis,provenance]")

  /** Cross-source duplication: for every source pair, how many distinct
    * document fingerprints exist in BOTH — the signal that two crawls
    * overlap and one should be dropped or deduped against the other.
    * The fingerprint is the 32-word normalized prefix, not the full
    * content hash: crawl overlap shows up as near-copies (same article,
    * different boilerplate tail), and an exact-content key is blind to
    * them — on this corpus it matches nothing below sf0.1 while the
    * prefix key surfaces the planted near-dup families at every scale.
    * The plan collapses to one row per (fingerprint, source) first
    * (map-side combined), self-joins on the fingerprint — fan-out
    * bounded by sources² per fingerprint, with sources a small set —
    * and aggregates pairs. The corpus is never pair-expanded at the
    * document level.
    */
  private val PrefixWords = 32

  private val q85 = QueryDef(
    (s, d) => {
      val fp = sha2(
        concat_ws(" ", slice(words(col("text")), 1, PrefixWords)), 256)
      val bySource = load(s, d, "documents")
        .select(col("source"), fp.as("h"))
        .distinct()
      bySource.as("a").join(bySource.as("b"),
          col("a.h") === col("b.h") && col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("source_a"),
          col("b.source").as("source_b"))
        .agg(count(lit(1)).as("n_shared_fingerprints"))
    },
    Some(s"""WITH hs AS (
              SELECT DISTINCT source,
                sha256(array_to_string(
                  list_slice($WordsSql, 1, $PrefixWords), ' ')) AS h
              FROM documents
            )
            SELECT a.source AS source_a, b.source AS source_b,
              CAST(count(*) AS BIGINT) AS n_shared_fingerprints
            FROM hs a JOIN hs b ON a.h = b.h AND a.source < b.source
            GROUP BY 1, 2"""),
    "cross-source shared doc fingerprints (32-word prefix) per source " +
      "pair [dedup,provenance]")

  /** q126: leave-one-source-out ablation — for each source, what the
    * corpus mean doc length becomes if that source is dropped, and the
    * delta vs the overall mean. The cheap first-order answer to "which
    * source is dragging the mix" that a curation loop runs before any
    * expensive model-based valuation: a large positive delta means the
    * rest of the corpus is better off without it (on this metric).
    *
    * Scale: the ablation needs NO per-source rescan — one source-keyed
    * aggregate produces (n_s, Σ_s), the grand totals fold from that
    * tiny frame, and each source's leave-out mean is pure arithmetic on
    * (T − Σ_s)/(N − n_s). One data-sized exchange total, regardless of
    * source count.
    *
    * Float parity: integer counts/sums; each emitted double is a single
    * IEEE division or subtraction of identical exact operands — exact
    * oracle, no tolerance.
    */
  private val q126 = QueryDef(
    (s, d) => {
      val bySource = load(s, d, "documents")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"))
      val totals = bySource.agg(
        sum(col("n_docs")).as("n_total"),
        sum(col("sum_chars")).as("chars_total"))
      bySource.crossJoin(broadcast(totals))
        .withColumn("overall_mean",
          col("chars_total").cast("double") / col("n_total").cast("double"))
        .withColumn("mean_without",
          (col("chars_total") - col("sum_chars")).cast("double") /
            (col("n_total") - col("n_docs")).cast("double"))
        .withColumn("delta", col("mean_without") - col("overall_mean"))
        .select(col("source"), col("n_docs"), col("sum_chars"),
          col("mean_without"), col("overall_mean"), col("delta"))
    },
    Some("""WITH s AS (
              SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                CAST(SUM(n_chars) AS BIGINT) AS sum_chars
              FROM documents GROUP BY 1
            ), t AS (
              SELECT CAST(SUM(n_docs) AS BIGINT) AS n_total,
                CAST(SUM(sum_chars) AS BIGINT) AS chars_total
              FROM s
            )
            SELECT s.source, s.n_docs, s.sum_chars,
              CAST(t.chars_total - s.sum_chars AS DOUBLE) /
                CAST(t.n_total - s.n_docs AS DOUBLE) AS mean_without,
              CAST(t.chars_total AS DOUBLE) / CAST(t.n_total AS DOUBLE)
                AS overall_mean,
              CAST(t.chars_total - s.sum_chars AS DOUBLE) /
                CAST(t.n_total - s.n_docs AS DOUBLE) -
                CAST(t.chars_total AS DOUBLE) / CAST(t.n_total AS DOUBLE)
                AS delta
            FROM s, t"""),
    "leave-one-source-out ablation: no per-source rescan, exact arithmetic [provenance]")

  def all: Seq[(String, QueryDef)] = Seq(
    "q84_source_quality" -> q84,
    "q85_cross_source_dups" -> q85,
    "q126_source_ablation" -> q126)
}
