package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** CLI driver for the end-to-end churn slice (the reference's
  * `make slice` / e2e integration flow, one JVM): writes a 7-row raw
  * fixture, runs raw → bronze → silver → gold+labels ×3 → snapshot →
  * train → latest-features → score, printing one status line per stage.
  *
  * Usage: runMain graft.pipeline.RunSlice [warehouseDir]
  */
object RunSlice {
  def main(args: Array[String]): Unit = {
    val wh = args.headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("graft_slice").toString)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val rawPath = s"$wh/raw_orders"
    Seq(
      ("A1", "CUST_0001", "delivered", "2025-01-10 10:00:00"),
      ("B1", "CUST_0002", "delivered", "2025-01-20 12:00:00"),
      ("C1", "CUST_0003", "delivered", "2025-02-15 09:00:00"),
      ("A2", "CUST_0001", "delivered", "2025-03-10 11:00:00"),
      ("C2", "CUST_0003", "delivered", "2025-04-10 15:00:00"),
      ("A3", "CUST_0001", "delivered", "2025-05-10 08:30:00"),
      ("Z1", "CUST_9999", "delivered", "2025-06-15 00:00:00"))
      .toDF("order_id", "customer_id", "order_status",
        "order_purchase_timestamp")
      .withColumn("order_approved_at", lit(null).cast("string"))
      .withColumn("order_delivered_carrier_date", lit(null).cast("string"))
      .withColumn("order_delivered_customer_date", lit(null).cast("string"))
      .withColumn("order_estimated_delivery_date", lit(null).cast("string"))
      .write.mode("overwrite").parquet(rawPath)

    val p = new ChurnPipeline(spark, s"$wh/lake")
    val ing = p.ingestBronze(rawPath, "slice-run-1")
    println(s"[slice] bronze: rows=${ing.rowCount} skipped=${ing.skipped} fp=${ing.fingerprint}")
    val rerun = p.ingestBronze(rawPath, "slice-run-2")
    println(s"[slice] bronze rerun: skipped=${rerun.skipped} (idempotency gate)")

    val silver = p.publishSilver("slice-run-3")
    println(s"[slice] silver: rows=${silver.count()}")

    Seq("2025-01-31", "2025-02-28", "2025-03-31").foreach { d =>
      val g = p.publishGold(d, s"gold-$d")
      val l = p.publishLabels(d, s"labels-$d")
      println(s"[slice] as_of=$d gold=${g.count()} labels=${l.count()}")
    }

    val snap = p.publishTrainingSnapshot("slice-run-4")
    println(s"[slice] training snapshot: rows=${snap.count()}")

    val tr = graft.ml.ChurnTrainer.train(snap, validationFraction = 0.34)
    println(s"[slice] trained model_version=${tr.modelVersion} metrics=${tr.metrics.map { case (k, v) => f"$k=$v%.4f" }.mkString(" ")}")

    val latest = p.exportLatestFeatures()
    val scored = graft.ml.ChurnTrainer.score(tr.model, latest)
    scored.orderBy("customer_id").collect().foreach { r =>
      println(f"[slice] score customer=${r.getString(0)} p_churn=${r.getDouble(1)}%.4f")
    }
    println("[slice] OK")
    spark.stop()
  }
}
