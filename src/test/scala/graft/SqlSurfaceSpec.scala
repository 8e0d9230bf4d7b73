package graft

import org.scalatest.funsuite.AnyFunSuite

/** The engine's SQL text surface: testdata views + native functions make
  * every capability reachable from spark.sql, not just the Column API.
  */
class SqlSurfaceSpec extends AnyFunSuite with SparkSpec {

  test("registered views + SQL text reproduce a Column-API query") {
    graft.common.Tables.createViews(spark, Sf)
    val sql = spark.sql(
      """SELECT c_mktsegment,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin)
    val api = SparkEntry.queries("q06_join_broadcast")(spark, Sf)
    assert(sql.exceptAll(api).count() == 0)
    assert(api.exceptAll(sql).count() == 0)
  }

  test("SQL can mix views with the native cosine_sim function") {
    graft.common.Tables.createViews(spark, Sf)
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT a.vec_id, cosine_sim(a.embedding, b.embedding) AS c
        |FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
        |LIMIT 20""".stripMargin).collect()
    assert(r.nonEmpty && r.forall(x => math.abs(x.getDouble(1)) <= 1.0 + 1e-12))
  }

  test("events view exposes converted microsecond timestamps to SQL") {
    graft.common.Tables.createViews(spark, Sf)
    val n = spark.sql(
      "SELECT count(*) FROM events WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'")
      .collect()(0).getLong(0)
    assert(n > 0)
  }
}
