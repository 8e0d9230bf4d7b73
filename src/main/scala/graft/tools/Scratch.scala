package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway exploration main (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    // hamming distance of exact-jaccard near-dup pairs under simhash
    val exact = graft.SparkEntry.queries("q35_dedup_ngram_jaccard")(spark, sf)
      .select("d1", "d2")
    val sh = graft.queries.Dedup.simhashForDebug(spark, sf)
    val j = exact
      .join(sh.select(col("doc_id").as("d1"), col("simhash").as("h1")), "d1")
      .join(sh.select(col("doc_id").as("d2"), col("simhash").as("h2")), "d2")
      .select(col("d1"), col("d2"),
        bit_count(col("h1").bitwiseXOR(col("h2"))).as("hamming"))
    j.orderBy(col("hamming")).show(40, false)
    spark.stop()
  }
}
