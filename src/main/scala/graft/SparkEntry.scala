package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The query surface is assembled from per-domain registries
  * (`graft.queries.*`); each entry is a [[QueryDef]] carrying the Spark
  * DataFrame builder and, where expressible, the equivalent ANSI SQL the
  * driver runs through DuckDB as the correctness oracle.
  */
object SparkEntry {

  /** Ordered registry of every implemented operator query. */
  def registry: Seq[(String, QueryDef)] =
    _root_.graft.queries.Registry.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q03_agg_pricing")(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (n, q) => n -> q.fn }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    registry.collect { case (n, q) if q.oracle.isDefined => n -> q.oracle.get }
      .toMap
}
