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
    Seq("q65_doc_chunks", "q66_dedup_incremental", "q67_sequence_packing")
      .foreach { n =>
        println(s"===== $n =====")
        graft.SparkEntry.queries(n)(spark, sf).explain("formatted")
      }
    spark.stop()
  }
}
