package graft.dq

import graft.common.Json
import org.apache.spark.sql.functions.expr

/** Externalized DQ expectations (reference
  * `data/expectations/silver/orders.yml:5-33`, loaded by
  * `orders_bronze_to_silver.py --expectations`): check definitions are
  * CONFIG, not code — editing a severity or adding a check changes
  * gating without recompiling. JSON stands in for the reference's YAML
  * (no YAML parser in the jar set; same structure).
  *
  * Format:
  * {{{
  * { "dataset": "orders", "layer": "silver", "version": "v1",
  *   "checks": [
  *     {"name": "...", "type": "not_null", "columns": ["order_id"],
  *      "severity": "critical"},
  *     {"type": "unique",   "columns": ["order_id"], ...},
  *     {"type": "in_set",   "column": "order_status",
  *      "allowed": ["delivered", ...], ...},
  *     {"type": "predicate", "name": "...", "violated_when": "<sql>", ...}
  *   ] }
  * }}}
  */
object DqConfig {

  final case class Expectations(
      dataset: String, layer: String, version: String,
      checks: Seq[DqCheck])

  def load(path: String): Expectations = {
    val root = Json.obj(Json.parseFile(path))
    val checks = Json.arr(root("checks")).map(c => toCheck(Json.obj(c)))
    require(checks.nonEmpty, s"$path defines no checks")
    Expectations(
      dataset = Json.str(root.getOrElse("dataset", "")),
      layer = Json.str(root.getOrElse("layer", "")),
      version = Json.str(root.getOrElse("version", "")),
      checks = checks)
  }

  private def toCheck(c: Map[String, Any]): DqCheck = {
    val severity = c.get("severity").map(Json.str).getOrElse("critical")
    def columns: Seq[String] = Json.arr(c("columns")).map(Json.str)
    Json.str(c("type")) match {
      case "not_null" => NotNull(columns, severity)
      case "unique" => UniqueKey(columns, severity)
      case "in_set" => InSet(Json.str(c("column")),
        Json.arr(c("allowed")).map(Json.str), severity)
      case "predicate" => Predicate(Json.str(c("name")),
        expr(Json.str(c("violated_when"))), severity)
      case other =>
        throw new IllegalArgumentException(s"unknown DQ check type: $other")
    }
  }
}
