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
    import graft.queries.Similarity
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val exact = graft.SparkEntry.queries("q38_ann_bruteforce")(spark, sf)
        .select("query_id", "vec_id").collect()
        .groupBy(_.getLong(0)).map { case (q, rs) =>
          q -> rs.map(_.getLong(1)).toSet
        }
      def recall(k: Int, probe: Int): Double = {
        val cs = Similarity.trainKMeans(spark, sf, k, 4)
        val approx = Similarity.ivfTopK(spark, sf, cs, probe)
          .select("query_id", "vec_id").collect()
          .groupBy(_.getLong(0)).map { case (q, rs) =>
            q -> rs.map(_.getLong(1)).toSet
          }
        val rs = exact.map { case (q, ids) =>
          approx.get(q).map(a => (a & ids).size.toDouble / ids.size)
            .getOrElse(0.0)
        }
        rs.sum / rs.size
      }
      for ((k, p) <- Seq((16, 4), (16, 6), (32, 8), (32, 10), (64, 16)))
        println(s"$sf k=$k probe=$p scan=${p * 100 / k}% recall@10=" +
          f"${recall(k, p)}%.3f")
    }
    spark.stop()
  }
}
