package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One entry in the engine's query surface.
  *
  * @param fn     builds the DataFrame against the parquet tables under a
  *               scale-factor dir (TESTDATA.md layout)
  * @param oracle equivalent ANSI SQL runnable by DuckDB over the same
  *               tables; None for ops not expressible in portable SQL
  *               (those get a weaker rows-only check from the driver)
  * @param doc    one-line description + SURVEY.md §2 operator ids covered
  */
final case class QueryDef(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

object QueryDef {

  /** Placeholder in oracle SQL for the absolute directory Verify wrote
    * the Spark results to. Verify substitutes the real path when it
    * dumps `oracle_sql.json`, so an oracle can re-read the engine's own
    * emitted rows with DuckDB's read_parquet over this token's path
    * and re-verify derived columns against the source tables — the
    * pair-level derived-oracle pattern for operators whose ROW SET is
    * algorithm-specific (ANN candidate sets) but whose emitted
    * arithmetic (exact cosines, top-k ordering, agreement counts) is
    * fully checkable.
    */
  val OutDirToken = "__SPARK_OUT__"
}
