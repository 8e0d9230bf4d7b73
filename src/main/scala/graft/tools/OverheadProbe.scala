package graft.tools

import org.apache.spark.sql.SparkSession

/** Micro-probe for the fixed per-query overheads the full-registry bench
  * pays ~276 times: parquet load (schema inference + listing), count()
  * round trip on a trivial plan, and a one-exchange groupBy. Guide §1:
  * know where the floor is before optimizing toward it.
  */
object OverheadProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(label: String, reps: Int)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime()
      (1 to reps).foreach(_ => f)
      println(f"$label%-52s ${(System.nanoTime() - t0) / 1e6 / reps}%8.1f ms/op")
    }
    import org.apache.spark.sql.functions._
    (1 to 10).foreach(_ => spark.range(0, 50000000L, 1, cpus.toInt)
      .selectExpr("sum(id*3+1)").collect())

    val li = s"$sfDir/lineitem.parquet"
    val schema = spark.read.parquet(li).schema
    t("read.parquet (schema inference)", 20) {
      spark.read.parquet(li)
    }
    t("read.schema(...).parquet (no inference)", 20) {
      spark.read.schema(schema).parquet(li)
    }
    t("inferred: count()", 20) {
      spark.read.parquet(li).count()
    }
    t("pinned schema: count()", 20) {
      spark.read.schema(schema).parquet(li).count()
    }
    t("pinned: filter+project count()", 20) {
      spark.read.schema(schema).parquet(li)
        .filter(col("l_quantity") > 10).select("l_orderkey").count()
    }
    t("pinned: one-exchange groupBy count()", 20) {
      spark.read.schema(schema).parquet(li)
        .groupBy("l_returnflag").agg(sum("l_quantity")).count()
    }
    t("pinned: one-exchange groupBy AQE off", 20) {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try spark.read.schema(schema).parquet(li)
        .groupBy("l_returnflag").agg(sum("l_quantity")).count()
      finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
    t("empty local count (action floor)", 20) {
      spark.range(0, 32, 1, 4).selectExpr("sum(id)").collect()
    }
    t("graft.common.Tables.load lineitem", 20) {
      graft.common.Tables.load(spark, sfDir, "lineitem")
    }
    t("Tables.load embeddings", 20) {
      graft.common.Tables.load(spark, sfDir, "embeddings")
    }
    t("Tables.load events (contract validate)", 20) {
      graft.common.Tables.load(spark, sfDir, "events")
    }
    spark.stop()
  }
}
