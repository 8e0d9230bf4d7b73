package graft.queries

import graft.QueryDef
import graft.common.Tables.load
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-shaping operators between cleaning and training: filter
  * calibration (threshold sweep), curriculum staging, and the
  * stratified train/val/test holdout. All decisions are integer
  * arithmetic or the seeded portable hash, so every query is exactly
  * oracle-checkable and reproducible run-over-run.
  */
object Curriculum {

  // ---- q131: filter-threshold retention sweep ----

  /** Sweep grid: min-length thresholds 0, 50, …, 550 chars. */
  private val BinWidth = 50L
  private val NBins = 12

  /** q131: for every candidate min-length threshold, the docs and chars
    * that survive `n_chars >= t` — the retention curve a pipeline owner
    * reads before picking the cutoff (the difference between "drop 2%
    * of chars" and "drop 40%" is this table).
    *
    * Scale: the naive rendering joins the corpus against the threshold
    * grid (|corpus|×12 rows). Instead the corpus folds ONCE into ≤12
    * histogram bins (map-side combined agg), and the sweep is a
    * 12-row suffix-sum window — corpus work is one pass regardless of
    * grid size. Empty bins are densified from an in-plan grid so the
    * curve has no holes.
    *
    * Float parity: counts/sums are exact longs; the two fractions are
    * single double divisions of exact integers.
    */
  private val q131 = QueryDef(
    (s, d) => {
      val docs = load(s, d, "documents")
      val binned = docs
        .groupBy(least(floor(col("n_chars") / BinWidth), lit(NBins - 1L))
          .cast("long").as("bin"))
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("n_chars"))
      val grid = s.range(NBins).select(col("id").as("bin"))
      val dense = grid.join(binned, Seq("bin"), "left")
        .select(col("bin"),
          coalesce(col("n_docs"), lit(0L)).as("n_docs"),
          coalesce(col("n_chars"), lit(0L)).as("n_chars"))
      val suffix = Window.orderBy(col("bin").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val total = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      dense.select(
        (col("bin") * BinWidth).as("min_chars_threshold"),
        sum("n_docs").over(suffix).as("docs_kept"),
        sum("n_chars").over(suffix).as("chars_kept"),
        (sum("n_docs").over(suffix).cast("double") /
          sum("n_docs").over(total).cast("double")).as("frac_docs"),
        (sum("n_chars").over(suffix).cast("double") /
          sum("n_chars").over(total).cast("double")).as("frac_chars"))
    },
    Some(s"""WITH b AS (
              SELECT least(CAST(floor(n_chars / $BinWidth) AS BIGINT),
                  ${NBins - 1}) AS bin,
                CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(n_chars) AS BIGINT) AS n_chars
              FROM documents GROUP BY 1
            ), g AS (
              SELECT unnest(range(0, $NBins)) AS bin
            ), dense AS (
              SELECT g.bin, coalesce(b.n_docs, 0) AS n_docs,
                coalesce(b.n_chars, 0) AS n_chars
              FROM g LEFT JOIN b ON g.bin = b.bin
            )
            SELECT bin * $BinWidth AS min_chars_threshold,
              CAST(SUM(n_docs) OVER w AS BIGINT) AS docs_kept,
              CAST(SUM(n_chars) OVER w AS BIGINT) AS chars_kept,
              CAST(SUM(n_docs) OVER w AS DOUBLE) /
                CAST(SUM(n_docs) OVER () AS DOUBLE) AS frac_docs,
              CAST(SUM(n_chars) OVER w AS DOUBLE) /
                CAST(SUM(n_chars) OVER () AS DOUBLE) AS frac_chars
            FROM dense
            WINDOW w AS (ORDER BY bin DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"""),
    "filter-threshold retention sweep: 1-pass histogram + 12-row suffix sum [curation]")

  // ---- q132: curriculum stages ----

  private val Stages = 5

  /** q132: curriculum staging — the corpus in easy→hard order (short
    * docs first), cut into 5 contiguous stages, with per-stage budget
    * stats. Training loops that warm up on short sequences consume
    * exactly this table as their schedule.
    *
    * Scale: stage assignment is position·k div N over the
    * range-partitioned global order (Curation.globalOrder — sampled
    * range boundaries, per-partition offsets; no one-partition window).
    * The oracle mirrors the arithmetic with ROW_NUMBER — same integer
    * division, so both engines draw identical stage boundaries.
    */
  private val q132 = QueryDef(
    (s, d) => {
      val docs = load(s, d, "documents").select(col("doc_id"), col("n_chars"))
      val ordered = Curation.globalOrder(
        docs, Seq(col("n_chars"), col("doc_id")))
      // one CHEAP count job off the raw scan (globalOrder preserves row
      // count, so counting `ordered` would execute the whole range-sort
      // + zipWithIndex lineage just to get the same number) — a COUNT()
      // OVER () window would be worse still: it collapses the corpus to
      // one partition, the exact anti-pattern globalOrder exists to avoid
      val n = docs.count()
      ordered
        .groupBy(expr(s"(position * $Stages) div ${n}L").cast("long")
          .as("stage"))
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").as("sum_chars"),
          min("n_chars").as("min_chars"),
          max("n_chars").as("max_chars"))
    },
    Some(s"""WITH o AS (
              SELECT doc_id, n_chars,
                ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) - 1 AS position,
                COUNT(*) OVER () AS n
              FROM documents
            )
            SELECT CAST((position * $Stages) // n AS BIGINT) AS stage,
              CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(n_chars) AS BIGINT) AS sum_chars,
              CAST(min(n_chars) AS BIGINT) AS min_chars,
              CAST(max(n_chars) AS BIGINT) AS max_chars
            FROM o GROUP BY 1"""),
    "curriculum stages: easy→hard global order div k, per-stage budgets [curation]")

  // ---- q133: stratified train/val/test holdout ----

  private val SplitSeed = 424242L

  /** q133: the deterministic 80/10/10 train/val/test holdout,
    * stratified per language — split membership is the seeded portable
    * hash of doc_id mod 10, so (a) a doc's split never changes as the
    * corpus grows (no renumbering leakage between refreshes), (b) both
    * engines assign identically, (c) per-stratum fractions concentrate
    * at 80/10/10 without any per-stratum pass.
    *
    * Scale: one map to tag splits, one keyed agg to |lang|×3 rows; the
    * within-lang fraction folds from a window over that tiny frame.
    */
  private val q133 = QueryDef(
    (s, d) => {
      val u = Curation.shuffleKeyWith(col("doc_id"), SplitSeed) % 10L
      val tagged = load(s, d, "documents").select(
        col("lang"), col("n_chars"),
        when(u < 8L, "train").when(u === 8L, "val").otherwise("test")
          .as("split"))
      val agg = tagged.groupBy(col("lang"), col("split"))
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
      val langW = Window.partitionBy("lang")
      agg.select(col("lang"), col("split"), col("n_docs"), col("sum_chars"),
        (col("n_docs").cast("double") /
          sum("n_docs").over(langW).cast("double")).as("frac_of_lang"))
    },
    Some {
      val u = s"(${Curation.shuffleKeySqlWith("doc_id", SplitSeed)}) % 10"
      s"""WITH t AS (
            SELECT lang, n_chars,
              CASE WHEN $u < 8 THEN 'train'
                   WHEN $u = 8 THEN 'val' ELSE 'test' END AS split
            FROM documents
          ), a AS (
            SELECT lang, split, CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(n_chars) AS BIGINT) AS sum_chars
            FROM t GROUP BY 1, 2
          )
          SELECT lang, split, n_docs, sum_chars,
            CAST(n_docs AS DOUBLE) /
              CAST(SUM(n_docs) OVER (PARTITION BY lang) AS DOUBLE)
              AS frac_of_lang
          FROM a"""
    },
    "stratified 80/10/10 holdout: growth-stable hash split, per-lang audit [curation]")

  def all: Seq[(String, QueryDef)] = Seq(
    "q131_threshold_sweep" -> q131,
    "q132_curriculum_stages" -> q132,
    "q133_stratified_holdout" -> q133)
}
