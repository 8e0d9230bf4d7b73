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

  /** Stable identity hash over the full contract (name, version, field
    * list, primary key) — the value downstream version gates compare
    * (the reference re-hashes the contract JSON in
    * `train_stub.py:154-165` and refuses a mismatched snapshot). The
    * same contract loaded from its JSON artifact hashes identically to
    * the in-code value.
    */
  def identityHash: String = Versioning.stableHash(
    s"$name|v$version|" +
      fields.map { case (n, t) => s"$n:${t.typeName}" }.mkString(",") +
      s"|pk:${primaryKey.mkString(",")}")

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

/** Contract JSON artifacts (reference `data/contracts/bronze|silver|
  * gold/orders.v1.json` et al.): the contract is a standalone versioned
  * FILE that tools re-hash to refuse drift — not only a Scala value.
  * Format:
  * {{{
  * {"contract_name": "silver/orders", "contract_version": 1,
  *  "primary_key": ["order_id"], "allow_extra_columns": true,
  *  "columns": [{"name": "order_id", "type": "string"}, ...]}
  * }}}
  */
object ContractFile {
  import graft.common.Json

  private val typeFor: Map[String, DataType] = Map(
    "string" -> StringType, "long" -> LongType, "integer" -> IntegerType,
    "double" -> DoubleType, "timestamp" -> TimestampType,
    "date" -> DateType, "boolean" -> BooleanType, "binary" -> BinaryType)

  def load(path: String): TableContract = {
    val root = Json.obj(Json.parseFile(path))
    TableContract(
      name = Json.str(root("contract_name")),
      version = root("contract_version").asInstanceOf[Double].toInt,
      fields = Json.arr(root("columns")).map { c =>
        val m = Json.obj(c)
        val t = Json.str(m("type"))
        Json.str(m("name")) -> typeFor.getOrElse(t,
          throw new IllegalArgumentException(s"unknown contract type: $t"))
      },
      primaryKey = root.get("primary_key")
        .map(v => Json.arr(v).map(Json.str)).getOrElse(Nil),
      allowExtraColumns = root.get("allow_extra_columns")
        .forall(_.asInstanceOf[Boolean]))
  }

  /** The version-gate value of a contract artifact (reference
    * `hash_contract_json`, `train_stub.py:154`).
    */
  def hash(path: String): String = load(path).identityHash

  /** Emit the contract as its JSON artifact (keeps code and file forms
    * in lockstep — specs assert round-trip equality).
    */
  def write(contract: TableContract, path: String): Unit = {
    val cols = contract.fields.map { case (n, t) =>
      s"""    {"name": "${graft.common.JsonIO.escape(n)}", "type": "${t.typeName}"}"""
    }.mkString(",\n")
    val pk = contract.primaryKey
      .map(k => "\"" + graft.common.JsonIO.escape(k) + "\"").mkString(", ")
    val body =
      s"""{
         |  "contract_name": "${graft.common.JsonIO.escape(contract.name)}",
         |  "contract_version": ${contract.version},
         |  "primary_key": [$pk],
         |  "allow_extra_columns": ${contract.allowExtraColumns},
         |  "columns": [
         |$cols
         |  ]
         |}
         |""".stripMargin
    val p = java.nio.file.Paths.get(path)
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.writeString(p, body)
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
