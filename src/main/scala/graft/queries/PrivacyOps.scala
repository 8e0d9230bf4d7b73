package graft.queries

import graft.QueryDef
import graft.common.Tables.load
import org.apache.spark.sql.functions._

/** Privacy-preserving export operators: the anonymization pass a
  * training-data pipeline applies to identity-bearing dimensions before
  * the rows may leave the governed zone. The reference keeps raw
  * customer keys through bronze→gold; a compliant training export needs
  * the PII-safe rendering of the same dimension.
  */
object PrivacyOps {

  /** Static salt of the keyed pseudonymization. A production deploy
    * injects this from a secret store; the pipeline's determinism
    * contract only needs it constant within one export.
    */
  private val Pepper = "graft-export-pepper"

  /** q129: PII-safe customer export — the three standard anonymization
    * primitives in one pass:
    *   - masking: every digit of the display name is replaced (the
    *     name's numeric tail IS the natural key);
    *   - keyed pseudonymization: md5(pepper ++ key) yields a join-stable
    *     surrogate that cannot be reversed without the pepper, so
    *     downstream tables can still co-group on the pseudonym;
    *   - generalization: the account balance coarsens to a $1000 band
    *     (k-anonymity style — the exact balance is quasi-identifying).
    *
    * Scale: a pure narrow projection — zero shuffle, whole-stage
    * codegen'd, saturates scan I/O at any corpus size. The digit-count
    * audit column exists so a DQ gate can assert nothing slipped
    * through (`n_digits_redacted = 0` rows are suspicious names).
    *
    * Float parity: floor(balance/1000) is one IEEE division + floor,
    * identical in both engines; everything else is integer/string.
    */
  private val q129 = QueryDef(
    (s, d) =>
      load(s, d, "customer").select(
        col("c_custkey"),
        regexp_replace(col("c_name"), "[0-9]", "#").as("masked_name"),
        md5(concat(lit(Pepper + "-"), col("c_custkey").cast("string")))
          .as("pseudonym"),
        (length(col("c_name")) -
          length(regexp_replace(col("c_name"), "[0-9]", "")))
          .cast("int").as("n_digits_redacted"),
        floor(col("c_acctbal") / 1000.0).cast("long").as("acctbal_band"),
        col("c_mktsegment")),
    Some(s"""SELECT c_custkey,
              regexp_replace(c_name, '[0-9]', '#', 'g') AS masked_name,
              md5(concat('$Pepper-', CAST(c_custkey AS VARCHAR)))
                AS pseudonym,
              CAST(length(c_name) -
                length(regexp_replace(c_name, '[0-9]', '', 'g')) AS INTEGER)
                AS n_digits_redacted,
              CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS acctbal_band,
              c_mktsegment
            FROM customer"""),
    "PII-safe export: digit masking, keyed md5 pseudonym, balance band [privacy]")

  def all: Seq[(String, QueryDef)] = Seq(
    "q129_pii_export" -> q129)
}
