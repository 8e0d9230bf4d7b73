package graft.queries

import graft.QueryDef
import graft.common.Tables.load
import graft.functions.Text._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-document duplicate-SPAN detection over the `documents` table —
  * the substring-level dedup audit of a training-data pipeline (the
  * Lee et al. 2021 "Deduplicating Training Data Makes Language Models
  * Better" shape): find word n-grams that recur across distinct
  * documents and report, per document, how much of it is covered by
  * such shared spans and the longest contiguous run. Doc-LEVEL near-dup
  * (q35/q36/q37) misses templated boilerplate embedded in otherwise
  * unique pages; this operator is the span-granular complement, and its
  * dup_frac / max_dup_run columns are exactly the signals a curation
  * pipeline thresholds to strip memorization-prone repeated passages.
  *
  * Scale design: one narrow pass explodes positioned n-grams; the wide
  * ops are (1) a gram-keyed doc-frequency aggregate (map-side combined)
  * and (2) a gram-keyed join of positions against the dup-gram set,
  * then doc-keyed window + aggregates. The join build side is the
  * data-dependent dup-gram set — AQE picks broadcast when it is small
  * and a shuffle join when it is not, which is the right call at every
  * scale (the dup set of a 100 TB corpus is itself unbounded). Skewed
  * stop-phrase grams are handled by AQE skew-join splitting. The gram
  * STRING rides the shuffle (~8 words) so the DuckDB oracle can
  * re-derive doc frequencies exactly; at 100 TB the same plan keys on
  * xxhash64(gram) (8 bytes) as q35's gram pipeline already does —
  * a width knob, not a shape change.
  */
object DupSpans {

  /** Span width in words. Wide enough that a shared 8-gram is real
    * shared provenance (template, quote, mirror), not a common phrase.
    */
  private[graft] val SpanWords = 8

  /** A gram is a duplicate span when it appears in at least this many
    * DISTINCT documents (within-doc repetition is q70's operator).
    */
  private[graft] val MinDocFreq = 2

  /** Testable core over any (doc_id, text) frame. */
  private[graft] def spansFromDocs(docs: DataFrame): DataFrame = {
    val grams = docs
      .select(col("doc_id"), words(col("text")).as("w"))
      .select(col("doc_id"),
        posexplode(wordNgrams(col("w"), SpanWords)).as(Seq("i", "gram")))
      .select(col("doc_id"), (col("i") + 1).as("pos"), col("gram"))
    val dupGrams = grams.groupBy("gram")
      .agg(count_distinct(col("doc_id")).as("df"))
      .filter(col("df") >= MinDocFreq)
      .select("gram")
    val rn = row_number().over(
      Window.partitionBy("doc_id").orderBy("pos"))
    val runs = grams.join(dupGrams, "gram")
      .select(col("doc_id"), col("pos"))
      .withColumn("grp", col("pos") - rn)
      .groupBy("doc_id", "grp").agg(count(lit(1)).as("run"))
      .groupBy("doc_id")
      .agg(sum("run").as("dup_n"), max("run").as("run_max"))
    val nDup: Column = coalesce(col("dup_n"), lit(0L))
    grams.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
      .join(runs, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        nDup.as("n_dup_grams"),
        (nDup.cast("double") / col("n_grams")).as("dup_frac"),
        coalesce(col("run_max"), lit(0L)).as("max_dup_run"))
  }

  private[graft] def dupSpans(s: SparkSession, d: String): DataFrame =
    spansFromDocs(load(s, d, "documents").select("doc_id", "text"))

  private val NormSql = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"

  /** Full SQL oracle: DuckDB re-derives the positioned grams, the
    * cross-doc dup set, and the gaps-and-islands longest run from the
    * source corpus — every emitted cell independently recomputed.
    */
  private val q99 = QueryDef(
    (s, d) => dupSpans(s, d),
    Some(s"""WITH d AS (
              SELECT doc_id, $NormSql AS norm FROM documents
            ), t AS (
              SELECT doc_id, string_split(norm, ' ') AS w FROM d
            ), g AS (
              SELECT doc_id, unnest(
                [{'pos': i, 'g': array_to_string(w[i:i+${SpanWords - 1}], ' ')}
                 for i in range(1, len(w) - $SpanWords + 2)]) AS u
              FROM t
            ), p AS (
              SELECT doc_id, u.pos AS pos, u.g AS gram FROM g
            ), dup AS (
              SELECT gram FROM p GROUP BY gram
              HAVING count(DISTINCT doc_id) >= $MinDocFreq
            ), dp AS (
              SELECT doc_id, pos,
                pos - row_number() OVER (
                  PARTITION BY doc_id ORDER BY pos) AS grp
              FROM p WHERE gram IN (SELECT gram FROM dup)
            ), runs AS (
              SELECT doc_id, grp, count(*) AS run FROM dp GROUP BY 1, 2
            ), agg AS (
              SELECT doc_id, sum(run) AS n_dup, max(run) AS run_max
              FROM runs GROUP BY 1
            ), tot AS (
              SELECT doc_id, count(*) AS n_grams FROM p GROUP BY 1
            )
            SELECT t.doc_id, t.n_grams,
              CAST(coalesce(a.n_dup, 0) AS BIGINT) AS n_dup_grams,
              CAST(coalesce(a.n_dup, 0) AS DOUBLE) / t.n_grams
                AS dup_frac,
              CAST(coalesce(a.run_max, 0) AS BIGINT) AS max_dup_run
            FROM tot t LEFT JOIN agg a USING (doc_id)"""),
    s"per-doc coverage by cross-document duplicate $SpanWords-gram " +
      "spans [dedup,text-analysis]")

  def all: Seq[(String, QueryDef)] = Seq(
    "q99_dup_spans" -> q99)
}
