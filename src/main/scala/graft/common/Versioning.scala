package graft.common

import java.security.MessageDigest

/** Deterministic short hashes for contracts / policies / snapshots
  * (reference `src/common/versioning.py:9-20` and the per-stage hash sites
  * in SURVEY.md §2.8). Canonical form = sorted-key `k=v` join — stable
  * across runs and JVMs; it does not need to equal the reference's Python
  * json.dumps bytes (self-consistent world).
  */
object Versioning {

  def sha256Hex(s: String): String =
    MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** 16-hex stable hash of a string payload. */
  def stableHash(payload: String): String = sha256Hex(payload).take(16)

  /** 16-hex stable hash of a key→value map (canonical: sorted keys). */
  def stableHash(obj: Map[String, String]): String =
    stableHash(obj.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }
      .mkString("|"))

  /** Contract hash: `name:type|name:type|...` in declared order
    * (reference `orders_to_bronze.py:63-65`).
    */
  def schemaHash(fields: Seq[(String, String)]): String =
    stableHash(fields.map { case (n, t) => s"$n:$t" }.mkString("|"))
}
