package graft.contracts

import graft.common.Versioning
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Layer contracts as code (reference `data/contracts` bronze/silver/gold
  * v1 JSON files): required columns + types + primary keys, with
  * enforcement helpers and stable contract hashes. The schema system is
  * fixed + externally contracted (SURVEY.md §1.3); hashes version the
  * contract so downstream stages can refuse drift (the trainer's
  * feature-version gate).
  */
final case class TableContract(
    name: String,
    version: Int,
    fields: Seq[(String, DataType)],
    primaryKey: Seq[String],
    allowExtraColumns: Boolean = true) {

  def contractHash: String =
    Versioning.schemaHash(fields.map { case (n, t) => n -> t.typeName })

  /** Validate a frame: required fields present with exact types; extras
    * rejected when the contract is closed.
    */
  def validate(df: DataFrame): Seq[String] = {
    val actual = df.schema.fields.map(f => f.name -> f.dataType).toMap
    val missing = fields.collect {
      case (n, _) if !actual.contains(n) => s"missing column: $n"
    }
    val wrongType = fields.collect {
      case (n, t) if actual.contains(n) && actual(n) != t =>
        s"column $n: expected ${t.typeName}, got ${actual(n).typeName}"
    }
    val extras =
      if (allowExtraColumns) Nil
      else df.schema.fieldNames.filterNot(fields.map(_._1).contains)
        .map(n => s"unexpected column: $n").toSeq
    missing ++ wrongType ++ extras
  }

  def enforce(df: DataFrame): Unit = {
    val violations = validate(df)
    if (violations.nonEmpty)
      throw new IllegalArgumentException(
        s"contract $name v$version violated: ${violations.mkString("; ")}")
  }
}

object Contracts {

  /** Bronze orders (reference `data/contracts/bronze/orders.v1.json`):
    * raw source columns, all strings, plus lineage stamps.
    */
  val bronzeOrders: TableContract = TableContract(
    name = "bronze/orders", version = 1,
    fields = Seq(
      "order_id" -> StringType, "customer_id" -> StringType,
      "order_status" -> StringType,
      "order_purchase_timestamp" -> StringType,
      "run_id" -> StringType, "ingest_ts" -> TimestampType,
      "ingest_date" -> DateType, "source_file" -> StringType,
      "source_fingerprint" -> StringType, "row_count" -> LongType,
      "schema_hash" -> StringType),
    primaryKey = Nil) // append-only evidence log: no PK

  /** Silver orders (`data/contracts/silver/orders.v1.json`): PK order_id. */
  val silverOrders: TableContract = TableContract(
    name = "silver/orders", version = 1,
    fields = Seq(
      "order_id" -> StringType, "customer_id" -> StringType,
      "order_purchase_ts" -> TimestampType, "order_status" -> StringType,
      "_bronze_run_id" -> StringType, "_bronze_ingest_ts" -> TimestampType,
      "_bronze_source_file" -> StringType,
      "_bronze_source_fingerprint" -> StringType,
      "_bronze_schema_hash" -> StringType,
      "_schema_version" -> StringType, "_silver_run_id" -> StringType,
      "_silver_ts" -> TimestampType),
    primaryKey = Seq("order_id"))

  /** Gold features (`data/contracts/gold/customer_features_daily.v1.json`):
    * PK (customer_id, as_of_date).
    */
  val goldCustomerFeaturesDaily: TableContract = TableContract(
    name = "gold/customer_features_daily", version = 1,
    fields = Seq(
      "customer_id" -> StringType, "as_of_date" -> DateType,
      "recency_days" -> IntegerType, "orders_30d" -> LongType,
      "orders_90d" -> LongType, "lifetime_orders" -> LongType,
      "customer_tenure_days" -> IntegerType,
      "avg_days_between_orders" -> DoubleType,
      "_snapshot_id" -> StringType, "_feature_version" -> StringType,
      "_gold_run_id" -> StringType, "_gold_ts" -> TimestampType),
    primaryKey = Seq("customer_id", "as_of_date"))
}
