package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway exploration main (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[dbg] $name: ${(System.nanoTime()-t0)/1e9}%.2fs rows=$n")
    }
    time("q24 features")(graft.queries.Churn.features(spark, sf).count())
    time("q25 labels")(graft.queries.Churn.labels(spark, sf).count())
    time("q26 snapshot")(graft.queries.Churn.snapshot(spark, sf).count())
    time("q26 again")(graft.queries.Churn.snapshot(spark, sf).count())
    graft.queries.Churn.snapshot(spark, sf).explain("formatted")
    spark.stop()
  }
}
