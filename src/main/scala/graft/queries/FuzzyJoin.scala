package graft.queries

import graft.QueryDef
import graft.common.Exact._
import graft.common.Tables.load
import org.apache.spark.sql.functions._

/** Blocked fuzzy matching over the part-name dictionary: edit-distance
  * entity resolution, the curation primitive behind catalog dedup /
  * alias detection. The expensive comparator (levenshtein) only ever
  * runs WITHIN a block — the all-pairs quadratic is never materialized.
  */
object FuzzyJoin {

  private val MaxDist = 4

  /** q121: near-duplicate part names (edit distance ≤ 4) within
    * same-last-token blocks.
    *
    * Scale: fuzzy matching runs on the NAME DICTIONARY, not the fact
    * table — distinct names grow sublinearly in the corpus (Heaps-ish),
    * and each name carries its occurrence count so matches map back to
    * row volume without rescanning. The block key (last token = the
    * head noun) turns the O(|dict|²) comparator space into
    * Σ C(block,2); the join is a hash join on the block key and the
    * comparator is codegen'd per surviving pair. At larger dictionaries
    * the same shape takes a second block key (length band) — the
    * blocking-key choice is the tuning knob, the plan is unchanged.
    *
    * Parity: levenshtein is integer-exact in both engines; counts are
    * longs. No floats at all.
    */
  private val q121 = QueryDef(
    (s, d) => {
      val names = load(s, d, "part")
        .groupBy(col("p_name"))
        .agg(lcountAll.as("n_parts"))
        .withColumn("block", element_at(split(col("p_name"), " "), -1))
      names.as("a")
        .join(names.as("b"),
          col("a.block") === col("b.block") &&
            col("a.p_name") < col("b.p_name"))
        .withColumn("dist", levenshtein(col("a.p_name"), col("b.p_name")))
        .filter(col("dist") <= MaxDist)
        .select(
          col("a.p_name").as("name_a"), col("b.p_name").as("name_b"),
          col("dist"),
          col("a.n_parts").as("n_parts_a"),
          col("b.n_parts").as("n_parts_b"))
    },
    Some(s"""WITH n AS (
              SELECT p_name, CAST(count(*) AS BIGINT) AS n_parts,
                string_split(p_name, ' ')[-1] AS block
              FROM part GROUP BY 1
            )
            SELECT a.p_name AS name_a, b.p_name AS name_b,
              CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS dist,
              a.n_parts AS n_parts_a, b.n_parts AS n_parts_b
            FROM n a JOIN n b ON a.block = b.block AND a.p_name < b.p_name
            WHERE levenshtein(a.p_name, b.p_name) <= $MaxDist"""),
    "blocked fuzzy name match: dictionary-level levenshtein, integer-exact [fuzzy]")

  /** q166: Jaro–Winkler alias detection over the same blocked name
    * dictionary — the normalized comparator (prefix-weighted, length-
    * free) next to q121's integer edit distance; the pair "cold widget"
    * / "old widget" scores 0.97 where levenshtein's 1 says little
    * about string length. Runs the engine's native `jaro_winkler`
    * codegen expression (functions.JaroWinkler), whose semantics are
    * bitwise-fuzzed against DuckDB's built-in.
    *
    * Scale: identical shape to q121 — dictionary-level blocked join,
    * comparator codegen'd per surviving pair, never an all-pairs scan.
    *
    * Parity: the 0.84 threshold sits ≥1.2e-3 from every pair value in
    * the generator's name dictionary (checked at all sfs), so the
    * row set cannot flip on float noise; the emitted jw itself is
    * tolerance-checked (1e-9) by the derived oracle against DuckDB's
    * native implementation.
    */
  private val JwThreshold = 0.84

  private val q166 = QueryDef(
    (s, d) => {
      graft.functions.GraftFunctions.register(s)
      val names = load(s, d, "part")
        .groupBy(col("p_name"))
        .agg(lcountAll.as("n_parts"))
        .withColumn("block", element_at(split(col("p_name"), " "), -1))
      names.as("a")
        .join(names.as("b"),
          col("a.block") === col("b.block") &&
            col("a.p_name") < col("b.p_name"))
        .withColumn("jw", graft.functions.GraftFunctions.jaroWinkler(
          col("a.p_name"), col("b.p_name")))
        .filter(col("jw") >= JwThreshold)
        .select(
          col("a.p_name").as("name_a"), col("b.p_name").as("name_b"),
          col("jw"),
          col("a.n_parts").as("n_parts_a"),
          col("b.n_parts").as("n_parts_b"))
    },
    Some(s"""WITH n AS (
              SELECT p_name, CAST(count(*) AS BIGINT) AS n_parts,
                string_split(p_name, ' ')[-1] AS block
              FROM part GROUP BY 1
            ), own AS (
              SELECT a.p_name AS name_a, b.p_name AS name_b,
                jaro_winkler_similarity(a.p_name, b.p_name) AS jw,
                a.n_parts AS n_parts_a, b.n_parts AS n_parts_b
              FROM n a JOIN n b ON a.block = b.block
                AND a.p_name < b.p_name
              WHERE jaro_winkler_similarity(a.p_name, b.p_name)
                >= $JwThreshold
            ), emitted AS (
              SELECT * FROM read_parquet(
                '${graft.QueryDef.OutDirToken}/q166_jw_name_match/*.parquet')
            )
            SELECT e.name_a, e.name_b, e.jw, e.n_parts_a, e.n_parts_b
            FROM emitted e JOIN own o
              ON e.name_a = o.name_a AND e.name_b = o.name_b
              AND e.n_parts_a = o.n_parts_a AND e.n_parts_b = o.n_parts_b
            WHERE abs(e.jw - o.jw) < 1e-9"""),
    "Jaro-Winkler alias detection: native codegen comparator, blocked join [fuzzy]")

  /** Min-label propagation rounds for q192. Alias clusters are tiny
    * chains (a handful of spelling variants), so a FIXED 3 rounds
    * reaches the component minimum within 3 hops — and fixed rounds
    * are a DEFINED semantics both engines compute identically even on
    * a pathological longer chain (q140's fixed-iteration precedent).
    */
  private val ErRounds = 3

  /** q192: entity resolution to GOLDEN RECORDS — the step after q121's
    * pairwise evidence: fuzzy matches become entity clusters, clusters
    * become one canonical row each (the MDM survivorship step). Match
    * edges are q121's integer-exact blocked levenshtein pairs (no
    * float threshold to flip); entities form by 3 rounds of min-label
    * propagation over the name dictionary; survivorship picks each
    * entity's REPRESENTATIVE spelling by the most-frequent-wins rule
    * (max occurrence count, ties to the lexicographic min) and folds
    * alias count + total row volume onto the canonical row.
    *
    * Scale: everything runs on the NAME DICTIONARY (sublinear in the
    * corpus), never the fact table: the blocked match join, three
    * |dict|-row label joins, one entity-partitioned survivorship
    * window over alias-sized groups. Each round localCheckpoints
    * (propagateComponents' lineage discipline): without the cut, round
    * t+1 references round t TWICE and the unrolled plan re-derives the
    * dictionary 2^rounds times — measured 37 parquet scans for 3
    * rounds; with it, one scan feeds one checkpointed frame per round.
    * All arithmetic is integer/string exact — direct oracle, no
    * tolerance.
    */
  private val q192 = QueryDef(
    (s, d) => {
      val names = load(s, d, "part")
        .groupBy(col("p_name"))
        .agg(lcountAll.as("n_parts"))
        .withColumn("block", element_at(split(col("p_name"), " "), -1))
        .localCheckpoint()
      val pairs = names.as("a")
        .join(names.as("b"),
          col("a.block") === col("b.block") &&
            col("a.p_name") < col("b.p_name") &&
            levenshtein(col("a.p_name"), col("b.p_name")) <= MaxDist)
        .select(col("a.p_name").as("x"), col("b.p_name").as("y"))
      val edges = pairs.unionByName(
        pairs.select(col("y").as("x"), col("x").as("y")))
        .localCheckpoint()
      var lbl = names.select(col("p_name").as("name"),
        col("p_name").as("lbl"))
      for (_ <- 1 to ErRounds) {
        lbl = lbl.select(col("name"), col("lbl"))
          .unionByName(edges
            .join(lbl, col("y") === col("name"))
            .select(col("x").as("name"), col("lbl")))
          .groupBy(col("name")).agg(min(col("lbl")).as("lbl"))
          .localCheckpoint()
      }
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lbl"))
        .orderBy(col("n_parts").desc, col("p_name").asc)
      names.join(lbl, col("p_name") === col("name"))
        .withColumn("rn", row_number().over(w))
        .groupBy(col("lbl").as("entity_name"))
        .agg(lcountAll.as("n_aliases"),
          sum("n_parts").as("n_parts_total"),
          max(when(col("rn") === 1, col("p_name"))).as("rep_name"),
          max(when(col("rn") === 1, col("n_parts"))).as("rep_n_parts"))
    },
    Some(s"""WITH n AS (
              SELECT p_name, CAST(count(*) AS BIGINT) AS n_parts,
                string_split(p_name, ' ')[-1] AS block
              FROM part GROUP BY 1
            ), p AS (
              SELECT a.p_name AS x, b.p_name AS y
              FROM n a JOIN n b ON a.block = b.block
                AND a.p_name < b.p_name
                AND levenshtein(a.p_name, b.p_name) <= $MaxDist
            ), e AS (
              SELECT x, y FROM p UNION ALL SELECT y AS x, x AS y FROM p
            ), l0 AS (
              SELECT p_name AS name, p_name AS lbl FROM n
            ), l1 AS (
              SELECT name, MIN(lbl) AS lbl FROM (
                SELECT name, lbl FROM l0
                UNION ALL
                SELECT e.x AS name, l0.lbl FROM e JOIN l0 ON l0.name = e.y)
              GROUP BY 1
            ), l2 AS (
              SELECT name, MIN(lbl) AS lbl FROM (
                SELECT name, lbl FROM l1
                UNION ALL
                SELECT e.x AS name, l1.lbl FROM e JOIN l1 ON l1.name = e.y)
              GROUP BY 1
            ), l3 AS (
              SELECT name, MIN(lbl) AS lbl FROM (
                SELECT name, lbl FROM l2
                UNION ALL
                SELECT e.x AS name, l2.lbl FROM e JOIN l2 ON l2.name = e.y)
              GROUP BY 1
            ), ranked AS (
              SELECT l3.lbl, n.p_name, n.n_parts,
                ROW_NUMBER() OVER (PARTITION BY l3.lbl
                  ORDER BY n.n_parts DESC, n.p_name ASC) AS rn
              FROM l3 JOIN n ON n.p_name = l3.name
            )
            SELECT lbl AS entity_name,
              CAST(count(*) AS BIGINT) AS n_aliases,
              CAST(SUM(n_parts) AS BIGINT) AS n_parts_total,
              MAX(CASE WHEN rn = 1 THEN p_name END) AS rep_name,
              MAX(CASE WHEN rn = 1 THEN n_parts END) AS rep_n_parts
            FROM ranked GROUP BY 1"""),
    "entity resolution: blocked match -> min-label clusters -> survivorship [fuzzy]")

  def all: Seq[(String, QueryDef)] = Seq(
    "q121_fuzzy_name_match" -> q121,
    "q166_jw_name_match" -> q166,
    "q192_entity_resolution" -> q192)
}
