package graft.tools

/** Catalog CLI: prints every registered query with its coverage note and
  * whether it is oracle-checked. Usage: runMain graft.tools.ListQueries
  */
object ListQueries {
  def main(args: Array[String]): Unit = {
    val rows = graft.SparkEntry.registry
    println(f"${"query"}%-26s oracle  doc")
    rows.foreach { case (name, q) =>
      val oracle = if (q.oracle.isDefined) "yes" else "spec"
      println(f"$name%-26s $oracle%-7s ${q.doc}")
    }
    println(s"\n${rows.size} queries, " +
      s"${rows.count(_._2.oracle.isDefined)} with DuckDB oracles")
  }
}
