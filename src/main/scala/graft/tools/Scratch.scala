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
    val sf = "/root/testdata/sf0.001"
    graft.common.Tables.createViews(spark, sf)
    graft.functions.GraftFunctions.register(spark)
    spark.sql(
      """SELECT c_mktsegment, count(*) AS n FROM orders
        |JOIN customer ON o_custkey = c_custkey GROUP BY 1 ORDER BY 1"""
        .stripMargin).show()
    spark.sql(
      """SELECT a.vec_id, round(cosine_sim(a.embedding, b.embedding), 4) c
        |FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
        |ORDER BY a.vec_id LIMIT 3""".stripMargin).show()
    spark.stop()
  }
}
