package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan-audit CLI: prints the formatted physical plan of one or more
  * registered queries against a scale-factor dir — the `.explain`
  * feedback loop PLANS.md entries are written from.
  *
  * Usage: runMain graft.tools.ExplainQuery <sfDir> <query>...
  */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val wanted = args.drop(1).toSet
    graft.SparkEntry.registry
      .filter { case (n, _) => wanted.isEmpty || wanted(n) }
      .foreach { case (name, q) =>
        println(s"\n===== $name =====")
        println(q.fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      }
    spark.stop()
  }
}
