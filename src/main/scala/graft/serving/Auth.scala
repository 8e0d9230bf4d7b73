package graft.serving

import graft.common.Versioning

/** Service-layer utilities from the reference's API tree (minus HTTP):
  * constant-time API-key comparison (`services/api/app/auth/api_key.py:
  * 17-28`), request-id assignment/propagation and privacy-preserving
  * customer-id log hashing (`services/api/app/observability/logging.py:
  * 34-35, 57-111`).
  */
object Auth {

  /** Constant-time equality — comparison time must not leak the length
    * of the matching prefix.
    */
  def constantTimeEquals(a: String, b: String): Boolean =
    java.security.MessageDigest.isEqual(
      a.getBytes("UTF-8"), b.getBytes("UTF-8"))

  /** Validate a presented API key against the configured one; empty
    * configured key means auth is unconfigured and everything is
    * rejected (fail closed).
    */
  def checkApiKey(presented: Option[String], configured: String): Boolean =
    configured.nonEmpty &&
      presented.exists(constantTimeEquals(_, configured))

  /** Propagate the caller's request id or mint a deterministic-format
    * one (UUID). */
  def requestId(incoming: Option[String]): String =
    incoming.filter(_.nonEmpty)
      .getOrElse(java.util.UUID.randomUUID().toString)

  /** 12-hex privacy-preserving customer-id hash for log lines — raw ids
    * never reach logs (`logging.py:34-35`).
    */
  def customerIdLogHash(customerId: String): String =
    Versioning.sha256Hex(customerId).take(12)
}
