package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway exploration main (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.01"
    Seq("q01_pruned_scan", "q06_join_broadcast", "q10_star_join",
      "q14_orderby_limit", "q24_churn_features", "q03_agg_pricing")
      .foreach { q =>
        println(s"######## $q")
        graft.SparkEntry.queries(q)(spark, sf).explain("formatted")
      }
    spark.stop()
  }
}
