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

  /** Values compare loosely across the two paths: numerics as
    * BigDecimal within 1e-9 relative (the SQL text may type a column
    * DECIMAL where the Column API produced DOUBLE), everything else by
    * string form.
    */
  private def sameValue(a: Any, b: Any): Boolean = (a, b) match {
    case (null, null) => true
    case (null, _) | (_, null) => false
    case (x: java.lang.Number, y: java.lang.Number) =>
      val (bx, by) = (BigDecimal(x.toString), BigDecimal(y.toString))
      bx == by || {
        val scale = bx.abs.max(by.abs)
        scale > 0 && ((bx - by).abs / scale) < BigDecimal("1e-9")
      }
    case (x, y) => String.valueOf(x) == String.valueOf(y)
  }

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] = {
    import org.apache.spark.sql.functions.col
    val cols = df.columns.sorted.toSeq
    df.select(cols.map(col): _*).collect().map(_.toSeq).toSeq
      .sortBy(_.map(String.valueOf).mkString(""))
  }

  test("oracle SQL strings double as Spark-SQL tests on the dual-dialect subset") {
    // The registry's DuckDB oracle strings are, for a large subset,
    // plain ANSI that Spark SQL also parses. Running THOSE through
    // spark.sql against the registered views and comparing with the
    // DataFrame path catches Spark-SQL/DataFrame divergence — the
    // engine testing its own SQL surface with strings it already
    // maintains. DuckDB-only dialect (read_parquet/derived oracles,
    // `//` integer division, list_* lambdas, strlen, HUGEINT casts)
    // fails to parse/analyze and is skipped — the skip is expected,
    // the floor below pins how much of the surface must stay dual.
    graft.common.Tables.createViews(spark, Sf)
    val candidates = SparkEntry.registry.collect {
      case (name, q)
          if q.oracle.exists(!_.contains(graft.QueryDef.OutDirToken)) =>
        name -> q
    }
    val mismatches = scala.collection.mutable.ArrayBuffer[String]()
    val matched = scala.collection.mutable.ArrayBuffer[String]()
    var dialectSkips = 0
    candidates.foreach { case (name, q) =>
      val parsed =
        try Some(spark.sql(q.oracle.get))
        catch { case _: Exception => dialectSkips += 1; None }
      parsed.foreach { viaSql =>
        try {
          val (s, a) = (canon(viaSql), canon(q.fn(spark, Sf)))
          val ok = s.size == a.size && s.zip(a).forall { case (r1, r2) =>
            r1.size == r2.size && r1.zip(r2).forall((sameValue _).tupled)
          }
          if (ok) matched += name
          else mismatches += s"$name: sql=${s.size} rows, api=${a.size} rows"
        } catch {
          case e: Exception => // parsed but evaluated differently = real signal
            mismatches += s"$name: ${e.getClass.getSimpleName} ${
              Option(e.getMessage).getOrElse("").take(120)}"
        }
      }
    }
    info(s"dual-dialect matched=${matched.size} " +
      s"dialect-skipped=$dialectSkips mismatched=${mismatches.size}")
    assert(mismatches.isEmpty,
      s"SQL path diverged from the DataFrame path:\n${mismatches.mkString("\n")}")
    // floor pinned from the measured dual subset — a drop means oracle
    // strings drifted out of the common dialect (or views broke)
    assert(matched.size >= 85,
      s"only ${matched.size} oracles ran dual-dialect; expected >= 85 " +
        "(measured 95 at round 14)")
    // representative core that must always stay dual-dialect — scan,
    // broadcast join, skew mitigation, lakehouse diff, iterative graph
    Seq("q01_pruned_scan", "q06_join_broadcast", "q124_salted_join",
        "q105_snapshot_diff", "q208_kcore").foreach { core =>
      assert(matched.contains(core), s"$core must stay SQL-runnable")
    }
  }

  test("events view exposes converted microsecond timestamps to SQL") {
    graft.common.Tables.createViews(spark, Sf)
    val n = spark.sql(
      "SELECT count(*) FROM events WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'")
      .collect()(0).getLong(0)
    assert(n > 0)
  }
}
