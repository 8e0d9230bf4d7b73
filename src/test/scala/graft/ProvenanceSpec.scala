package graft

import org.scalatest.funsuite.AnyFunSuite

/** Planted-provenance semantics for the per-source audit (q84) and
  * cross-source duplication (q85). Value parity with DuckDB is the
  * driver oracle's job; here the expected numbers are hand-computed.
  */
class ProvenanceSpec extends AnyFunSuite with SparkSpec {

  private def good(seed: Int): String =
    (1 to 25).map(i => s"p${seed}w$i").mkString(" ")

  /** 40 distinct words — long enough that the q85 fingerprint (32-word
    * prefix) ignores a differing tail.
    */
  private def long(seed: Int): String =
    (1 to 40).map(i => s"p${seed}w$i").mkString(" ")

  private lazy val dir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("prov").toString
    Seq(
      // source A: one good doc, one verbatim copy of it, one too-short
      (1L, good(1), "en", "A"),
      (2L, good(1), "en", "A"),
      (3L, "short doc here", "de", "A"),
      // source B: a copy of A's content (cross-source dup) + one unique
      (4L, good(1), "en", "B"),
      (5L, long(5), "fr", "B"),
      // source C: one unique good doc, plus a NEAR-copy of B's long
      // doc — same first 40 words, different boilerplate tail, so the
      // exact content hash differs but the 32-word prefix fingerprint
      // matches (the crawl-overlap shape q85 exists to catch)
      (6L, good(6), "en", "C"),
      (7L, long(5) + " copyright footer", "fr", "C"))
      .toDF("doc_id", "text", "lang", "source")
      .write.parquet(s"$d/documents.parquet")
    d
  }

  test("q84 per-source audit: volume, langs, quality and dup rates") {
    val rows = SparkEntry.queries("q84_source_quality")(spark, dir)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getDouble(5), r.getDouble(6))))
      .toMap
    // A: 3 docs, 2 langs, 25+25+3 tokens, pass 2/3, dup 1 - 2/3
    assert(rows("A") == ((3L, 2L, 53L, 53.0 / 3, 2.0 / 3, 1.0 - 2.0 / 3)))
    // B: both docs pass, both contents distinct within B
    assert(rows("B") == ((2L, 2L, 65L, 32.5, 1.0, 0.0)))
    // C: near-copy differs from long(5) at the content level, so C has
    // no internal dups either
    assert(rows("C") == ((2L, 2L, 67L, 33.5, 1.0, 0.0)))
  }

  test("q85 cross-source dups: exact A/B copy AND prefix near-dup B/C") {
    val pairs = SparkEntry.queries("q85_cross_source_dups")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    // good(1) lives in A (twice) and B (once): one shared fingerprint.
    // long(5) (B) and its tail-padded near-copy (C) share the 32-word
    // prefix fingerprint despite different exact contents.
    assert(pairs == Set(("A", "B", 1L), ("B", "C", 1L)))
  }
}
