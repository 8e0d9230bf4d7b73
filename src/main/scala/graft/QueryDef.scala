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
