package graft

import org.scalatest.funsuite.AnyFunSuite

/** Planted-provenance semantics for the per-source audit (q84) and
  * cross-source duplication (q85). Value parity with DuckDB is the
  * driver oracle's job; here the expected numbers are hand-computed.
  */
class ProvenanceSpec extends AnyFunSuite with SparkSpec {

  private def good(seed: Int): String =
    (1 to 25).map(i => s"p${seed}w$i").mkString(" ")

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
      (5L, good(5), "fr", "B"),
      // source C: one unique good doc
      (6L, good(6), "en", "C"))
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
    assert(rows("B") == ((2L, 2L, 50L, 25.0, 1.0, 0.0)))
    assert(rows("C") == ((1L, 1L, 25L, 25.0, 1.0, 0.0)))
  }

  test("q85 cross-source dups: only the A/B shared content surfaces") {
    val pairs = SparkEntry.queries("q85_cross_source_dups")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    // good(1) lives in A (twice) and B (once): ONE shared content, one
    // pair row; no pair involves C
    assert(pairs == Set(("A", "B", 1L)))
  }
}
