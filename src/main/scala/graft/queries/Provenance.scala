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

  /** q239: per-source language-mix divergence — the Jensen–Shannon
    * divergence between each source's language distribution and the
    * corpus-wide one, the "is this source feeding the mix something
    * different" screen that ranks sources for q116's mixing and flags
    * a crawl whose language profile silently shifted (q114's
    * chi-square watches TERMS over time; this watches LANGUAGES over
    * sources). JSD = ½·KL(p‖m) + ½·KL(q‖m) with m = (p+q)/2 — 0 =
    * identical mix, ln 2 = disjoint languages.
    *
    * Scale: ONE (source, lang) corpus fold; the source×lang grid
    * (both catalog-bounded domains), the marginals, and the ordered
    * fold all run on that bounded frame.
    *
    * Exactness: counts are exact integers the oracle re-derives
    * bit-identically; the KL terms carry the repo-wide ln contract —
    * the engine side accumulates in an ORDERED window fold (q181
    * discipline) and the derived oracle admits jsd within 1e-9 on
    * bit-exact (source, n_docs) evidence.
    */
  private val q239 = QueryDef(
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val cells = load(s, d, "documents")
        .groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).cast("long").as("c"))
      val langs = cells.groupBy(col("lang")).agg(sum(col("c")).as("gc"))
      val srcs = cells.groupBy(col("source")).agg(sum(col("c")).as("n_docs"))
      val tot = langs.agg(sum(col("gc")).as("n_total"))
      val grid = srcs.crossJoin(broadcast(langs.crossJoin(broadcast(tot))))
        .join(cells, Seq("source", "lang"), "left")
        .withColumn("c", coalesce(col("c"), lit(0L)))
      val p = col("c").cast("double") / col("n_docs").cast("double")
      val q = col("gc").cast("double") / col("n_total").cast("double")
      val m = (p + q) / lit(2.0)
      val term =
        when(col("c") > 0L, lit(0.5) * p * log(p / m)).otherwise(lit(0.0)) +
          lit(0.5) * q * log(q / m)
      val fold = Window.partitionBy(col("source"))
        .orderBy(col("lang").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid
        .withColumn("jsd_run", sum(term).over(fold))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("source")).orderBy(col("lang").desc)))
        .filter(col("rn") === 1)
        .select(col("source"), col("n_docs"), col("jsd_run").as("jsd"))
    },
    Some(s"""WITH cells AS (
              SELECT source, lang, CAST(count(*) AS BIGINT) AS c
              FROM documents GROUP BY 1, 2
            ), lg AS (
              SELECT lang, CAST(SUM(c) AS BIGINT) AS gc FROM cells
              GROUP BY 1
            ), sr AS (
              SELECT source, CAST(SUM(c) AS BIGINT) AS n_docs FROM cells
              GROUP BY 1
            ), t AS (SELECT CAST(SUM(gc) AS BIGINT) AS n_total FROM lg),
            grid AS (
              SELECT sr.source, sr.n_docs, lg.lang, lg.gc, t.n_total,
                COALESCE(ce.c, 0) AS c
              FROM sr CROSS JOIN lg CROSS JOIN t
              LEFT JOIN cells ce
                ON ce.source = sr.source AND ce.lang = lg.lang
            ), ref AS (
              SELECT source, CAST(MAX(n_docs) AS BIGINT) AS n_docs,
                SUM(
                  CASE WHEN c > 0 THEN
                    0.5 * (CAST(c AS DOUBLE) / n_docs)
                      * ln((CAST(c AS DOUBLE) / n_docs)
                          / (((CAST(c AS DOUBLE) / n_docs)
                              + (CAST(gc AS DOUBLE) / n_total)) / 2.0))
                  ELSE 0.0 END
                  + 0.5 * (CAST(gc AS DOUBLE) / n_total)
                    * ln((CAST(gc AS DOUBLE) / n_total)
                        / (((CAST(c AS DOUBLE) / n_docs)
                            + (CAST(gc AS DOUBLE) / n_total)) / 2.0)))
                  AS jsd
              FROM grid GROUP BY source
            ), emitted AS (
              SELECT * FROM read_parquet(
                '${graft.QueryDef.OutDirToken}/q239_source_lang_jsd/*.parquet')
            )
            SELECT e.source, e.n_docs, e.jsd
            FROM emitted e JOIN ref r ON e.source = r.source
              AND e.n_docs = r.n_docs
            WHERE abs(e.jsd - r.jsd) < 1e-9"""),
    "per-source language-mix Jensen-Shannon divergence vs the corpus: " +
      "bounded grid, ordered ln fold [provenance]")

  def all: Seq[(String, QueryDef)] = Seq(
    "q84_source_quality" -> q84,
    "q85_cross_source_dups" -> q85,
    "q126_source_ablation" -> q126,
    "q239_source_lang_jsd" -> q239)
}
