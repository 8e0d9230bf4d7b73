package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives shared by the dedup / text-analysis operator families
  * (the scale-out extensions beyond the reference surface; see SURVEY.md
  * §7.5). Everything is built-in Catalyst expressions — higher-order array
  * functions, not UDFs — so the hot path stays inside whole-stage codegen
  * and pushes through to a 1000-executor plan unchanged.
  */
object Text {

  /** Canonical form: lowercase, trim, collapse runs of whitespace. */
  def norm(c: Column): Column =
    regexp_replace(lower(trim(c)), "\\s+", " ")

  /** Whitespace tokens of the canonical form. */
  def words(c: Column): Column = split(norm(c), " ")

  /** Word n-grams (space-joined) of the canonical form; empty array when
    * the doc has fewer than n words. `sequence` would produce a DESCENDING
    * range when stop < start, hence the explicit guard.
    */
  def wordNgrams(wordsCol: Column, n: Int): Column =
    when(size(wordsCol) >= n,
      transform(
        sequence(lit(1), size(wordsCol) - lit(n - 1)),
        i => concat_ws(" ", slice(wordsCol, i, lit(n)))))
      .otherwise(array())

  /** BPE-ish token pattern: letter runs, digit runs, single punctuation.
    * Restricted to ASCII classes so the Java and RE2 (DuckDB) regex
    * dialects agree.
    */
  val TokenPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  /** Stopword list used by quality scoring and language ID. */
  val StopwordsEn = Seq("the", "a", "of", "to", "and", "in", "is", "it", "for", "on")

  /** Language marker profiles for the n-gram/stopword language-ID
    * heuristic. Deterministic, tiny, broadcast-free (inlined constants).
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> StopwordsEn,
    "es" -> Seq("el", "la", "los", "las", "de", "que", "y", "en", "un", "una"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"))

  /** Count of array elements contained in a constant set (codegen'd
    * higher-order filter, no shuffle).
    */
  def countIn(arr: Column, set: Seq[String]): Column =
    size(filter(arr, x => x.isin(set: _*)))
}
