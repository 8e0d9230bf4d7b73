package graft.queries

import graft.QueryDef
import graft.common.Tables.load
import graft.dq._

/** DQ checks exposed as a query (SURVEY.md §2.12): one scan computes every
  * violation count, then unpivots to (check_name, n_failed) rows.
  */
object Quality {
  private val q23 = QueryDef(
    (s, d) =>
      DqRunner.summaryDf(
        load(s, d, "orders"),
        Seq(
          NotNull(Seq("o_custkey")),
          NotNull(Seq("o_orderdate")),
          InSet("o_orderstatus", Seq("F", "O", "P")),
          UniqueKey(Seq("o_orderkey")),
          Predicate("nonneg_o_totalprice",
            org.apache.spark.sql.functions.col("o_totalprice") < 0))),
    Some("""SELECT 'not_null_o_custkey' AS check_name,
              CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_failed
            FROM orders
            UNION ALL
            SELECT 'not_null_o_orderdate',
              CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT)
            FROM orders
            UNION ALL
            SELECT 'in_set_o_orderstatus',
              CAST(SUM(CASE WHEN o_orderstatus IS NULL
                              OR o_orderstatus NOT IN ('F','O','P')
                            THEN 1 ELSE 0 END) AS BIGINT)
            FROM orders
            UNION ALL
            SELECT 'unique_o_orderkey',
              -- excess rows beyond one per key, where a NULL key forms its
              -- own group (matches Spark's countDistinct(struct(k)))
              CAST(COUNT(*) - COUNT(DISTINCT o_orderkey)
                   - (CASE WHEN COUNT(*) > COUNT(o_orderkey) THEN 1 ELSE 0 END)
                   AS BIGINT)
            FROM orders
            UNION ALL
            SELECT 'nonneg_o_totalprice',
              CAST(SUM(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END) AS BIGINT)
            FROM orders"""),
    "single-scan DQ summary: not_null/in_set/unique/range [D1-D5]")

  def all: Seq[(String, QueryDef)] = Seq("q23_dq_summary" -> q23)
}
