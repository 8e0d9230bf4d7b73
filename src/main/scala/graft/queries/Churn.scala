package graft.queries

import graft.QueryDef
import graft.common.Tables.load
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's churn-analytics core (gold features, labels, training
  * snapshot) re-expressed over the testdata `orders` table at a fixed
  * point-in-time date.
  *
  * Reference semantics: `src/features/customer_features_daily.py:110-212`
  * (feature snapshot), `src/training/labels.py:140-199` (60-day churn
  * labels), `src/training/build_training_snapshot.py:143-161` (features ⋈
  * labels).
  *
  * Scale design: the reference builds five aggregation branches over the
  * point-in-time base and joins them back on customer_id — four extra
  * shuffles. Here the whole feature vector is computed with ONE hash
  * partitioning: the lag window and the groupBy share the customer_id key,
  * so Spark plans a single exchange; 30/90-day windows become conditional
  * aggregates instead of separate branch joins. At 100 TB that turns a
  * 5-shuffle DAG into a 1-shuffle DAG with identical results.
  */
object Churn {
  val AsOf = "2000-12-31" // inside the data range 1995-01-01..2001-08-01
  val HorizonDays = 60    // labels.py:121 — fixed 60-day churn horizon

  private def asOfCol: Column = lit(AsOf).cast("date")

  /** Gold feature snapshot (customer_features_daily.py:110-212). */
  def features(spark: SparkSession, sfDir: String): DataFrame = {
    val hist = load(spark, sfDir, "orders")
      .select(col("o_custkey").as("customer_id"), col("o_orderkey"),
        to_date(col("o_orderdate")).as("od"))
      .filter(col("od") <= asOfCol) // P4: point-in-time — never read the future

    val w = Window.partitionBy(col("customer_id"))
      .orderBy(col("od").asc, col("o_orderkey").asc)

    hist
      .withColumn("gap_days",
        datediff(col("od"), lag(col("od"), 1).over(w))) // W3
      .groupBy(col("customer_id"))
      .agg(
        datediff(asOfCol, max(col("od"))).as("recency_days"),
        countDistinct(when(col("od") >= date_sub(asOfCol, 29), col("o_orderkey")))
          .cast("long").as("orders_30d"),
        countDistinct(when(col("od") >= date_sub(asOfCol, 89), col("o_orderkey")))
          .cast("long").as("orders_90d"),
        countDistinct(col("o_orderkey")).cast("long").as("lifetime_orders"),
        datediff(asOfCol, min(col("od"))).as("customer_tenure_days"),
        coalesce(
          (sum(col("gap_days")).cast("double") / count(col("gap_days")))
            .cast("double"),
          lit(0.0)).as("avg_days_between_orders"))
  }

  private val featuresSql =
    s"""WITH gaps AS (
       |  SELECT o_custkey AS customer_id, o_orderkey, od,
       |         CAST(DATEDIFF('day',
       |           LAG(od) OVER (PARTITION BY o_custkey ORDER BY od ASC, o_orderkey ASC),
       |           od) AS INTEGER) AS gap_days
       |  FROM (SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS od
       |        FROM orders WHERE CAST(o_orderdate AS DATE) <= DATE '$AsOf')
       |)
       |SELECT customer_id,
       |  CAST(DATEDIFF('day', MAX(od), DATE '$AsOf') AS INTEGER) AS recency_days,
       |  CAST(COUNT(DISTINCT CASE WHEN od >= DATE '$AsOf' - 29 THEN o_orderkey END) AS BIGINT) AS orders_30d,
       |  CAST(COUNT(DISTINCT CASE WHEN od >= DATE '$AsOf' - 89 THEN o_orderkey END) AS BIGINT) AS orders_90d,
       |  CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS lifetime_orders,
       |  CAST(DATEDIFF('day', MIN(od), DATE '$AsOf') AS INTEGER) AS customer_tenure_days,
       |  COALESCE(CAST(CAST(SUM(gap_days) AS DOUBLE) / COUNT(gap_days) AS DOUBLE), 0.0) AS avg_days_between_orders
       |FROM gaps GROUP BY customer_id""".stripMargin

  /** 60-day churn labels (labels.py:140-199): label 1 iff a customer active
    * on or before as_of places no order in (as_of, as_of+60]. Faithful to
    * the reference's left-join-then-null-check shape (J3).
    */
  def labels(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = load(spark, sfDir, "orders")
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("od"))
    val eligible = orders.filter(col("od") <= asOfCol)
      .select(col("o_custkey").as("customer_id")).distinct()
    val future = orders
      .filter(col("od") > asOfCol &&
        col("od") <= date_add(asOfCol, HorizonDays))
      .select(col("o_custkey").as("future_customer_id")).distinct()
    eligible
      .join(future, col("customer_id") === col("future_customer_id"), "left")
      .select(
        col("customer_id"),
        asOfCol.as("as_of_date"),
        when(col("future_customer_id").isNull, lit(1)).otherwise(lit(0))
          .cast("int").as("churn_label"))
  }

  private val labelsSql =
    s"""SELECT e.customer_id, DATE '$AsOf' AS as_of_date,
       |  CAST(CASE WHEN f.future_customer_id IS NULL THEN 1 ELSE 0 END AS INTEGER) AS churn_label
       |FROM (SELECT DISTINCT o_custkey AS customer_id FROM orders
       |      WHERE CAST(o_orderdate AS DATE) <= DATE '$AsOf') e
       |LEFT JOIN (SELECT DISTINCT o_custkey AS future_customer_id FROM orders
       |      WHERE CAST(o_orderdate AS DATE) >  DATE '$AsOf'
       |        AND CAST(o_orderdate AS DATE) <= DATE '$AsOf' + $HorizonDays) f
       |  ON e.customer_id = f.future_customer_id""".stripMargin

  /** Training snapshot = features ⋈ labels on (customer_id, as_of_date)
    * (build_training_snapshot.py:154-161). Both sides hash-partition on
    * customer_id; at scale this is a co-partitioned sort-merge join.
    */
  def snapshot(spark: SparkSession, sfDir: String): DataFrame =
    features(spark, sfDir).join(
      labels(spark, sfDir), Seq("customer_id"), "inner")

  private val snapshotSql =
    s"""WITH gaps AS (
       |  SELECT o_custkey AS customer_id, o_orderkey, od,
       |         CAST(DATEDIFF('day',
       |           LAG(od) OVER (PARTITION BY o_custkey ORDER BY od ASC, o_orderkey ASC),
       |           od) AS INTEGER) AS gap_days
       |  FROM (SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS od
       |        FROM orders WHERE CAST(o_orderdate AS DATE) <= DATE '$AsOf')
       |), feat AS (
       |  SELECT customer_id,
       |    CAST(DATEDIFF('day', MAX(od), DATE '$AsOf') AS INTEGER) AS recency_days,
       |    CAST(COUNT(DISTINCT CASE WHEN od >= DATE '$AsOf' - 29 THEN o_orderkey END) AS BIGINT) AS orders_30d,
       |    CAST(COUNT(DISTINCT CASE WHEN od >= DATE '$AsOf' - 89 THEN o_orderkey END) AS BIGINT) AS orders_90d,
       |    CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS lifetime_orders,
       |    CAST(DATEDIFF('day', MIN(od), DATE '$AsOf') AS INTEGER) AS customer_tenure_days,
       |    COALESCE(CAST(CAST(SUM(gap_days) AS DOUBLE) / COUNT(gap_days) AS DOUBLE), 0.0) AS avg_days_between_orders
       |  FROM gaps GROUP BY customer_id
       |), lab AS (
       |  SELECT e.customer_id, DATE '$AsOf' AS as_of_date,
       |    CAST(CASE WHEN f.future_customer_id IS NULL THEN 1 ELSE 0 END AS INTEGER) AS churn_label
       |  FROM (SELECT DISTINCT o_custkey AS customer_id FROM orders
       |        WHERE CAST(o_orderdate AS DATE) <= DATE '$AsOf') e
       |  LEFT JOIN (SELECT DISTINCT o_custkey AS future_customer_id FROM orders
       |        WHERE CAST(o_orderdate AS DATE) >  DATE '$AsOf'
       |          AND CAST(o_orderdate AS DATE) <= DATE '$AsOf' + $HorizonDays) f
       |    ON e.customer_id = f.future_customer_id
       |)
       |SELECT feat.*, lab.as_of_date, lab.churn_label
       |FROM feat JOIN lab ON feat.customer_id = lab.customer_id""".stripMargin

  def all: Seq[(String, QueryDef)] = Seq(
    "q24_churn_features" -> QueryDef(features, Some(featuresSql),
      "gold customer feature snapshot, 1-shuffle plan [A1,A2,A3,W3,P4,P5,P13]"),
    "q25_churn_labels" -> QueryDef(labels, Some(labelsSql),
      "60-day churn labels via left join + null check [J3,P6]"),
    "q26_training_snapshot" -> QueryDef(snapshot, Some(snapshotSql),
      "features ⋈ labels training snapshot [J4]"))
}
