package graft.queries

import graft.QueryDef
import graft.common.Tables.load
import graft.functions.Text._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operator family over `documents`: exact, n-gram Jaccard,
  * MinHash+LSH, SimHash. (Embedding-cosine near-dup lives in Similarity.)
  *
  * Scale design notes per operator are on each query. The common building
  * block is the distinct word-5-gram set per document; at 100 TB the
  * gram self-join is the hazard, which is exactly what the MinHash-LSH
  * variant removes (candidates come from tiny band buckets instead of a
  * full gram join).
  */
object Dedup {

  private val NormSql = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
  private val WordsSql = s"string_split($NormSql, ' ')"
  /** DuckDB list comprehension producing the distinct word 5-grams
    * (shared with the clustering oracle in DedupClusters).
    */
  private[queries] val GramsOracleSql =
    s"""list_distinct([array_to_string(($WordsSql)[i:i+4], ' ')
        for i in range(1, greatest(len($WordsSql) - 3, 1))])"""
  private val GramsSql = GramsOracleSql

  /** Distinct (doc_id, gram) pairs — one shuffle-free projection+explode. */
  private def docGrams(spark: SparkSession, sfDir: String): DataFrame =
    load(spark, sfDir, "documents")
      .select(col("doc_id"),
        explode(array_distinct(wordNgrams(words(col("text")), 5))).as("gram"))

  /** Distinct (doc_id, gram-hash) pairs in one typed partition pass.
    * Catalyst's higher-order array functions (transform/slice/concat_ws)
    * are interpreted — building 5-grams that way costs seconds per
    * evaluation and a self-join evaluates its subtree per side. Here the
    * normalization + shingling + 64-bit FNV-1a hashing run as primitive
    * JVM code; downstream joins/aggregations only ever see (long, long)
    * rows. Gram identity is engine-internal (the oracle compares Jaccard
    * VALUES), so any deterministic 64-bit hash is sound; FNV-1a collision
    * odds at corpus scale are ~n²/2^65.
    */
  private def docGramHashes(spark: SparkSession, sfDir: String): DataFrame =
    docGramHashesFrom(spark, load(spark, sfDir, "documents"))

  /** Same, over an explicit documents frame (composition + specs). */
  private def docGramHashesFrom(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { rows =>
        rows.flatMap { case (id, text) =>
          val w = text.trim.toLowerCase(java.util.Locale.ROOT)
            .split("\\s+").filter(_.nonEmpty)
          if (w.length < 5) Iterator.empty
          else {
            val seen = scala.collection.mutable.HashSet.empty[Long]
            (0 to w.length - 5).iterator.flatMap { i =>
              var h = 0xcbf29ce484222325L // FNV-1a 64 offset basis
              var j = i
              while (j < i + 5) {
                val s = w(j)
                var k = 0
                while (k < s.length) {
                  h ^= s.charAt(k); h *= 0x100000001b3L; k += 1
                }
                h ^= ' '; h *= 0x100000001b3L
                j += 1
              }
              if (seen.add(h)) Iterator.single((id, h)) else Iterator.empty
            }
          }
        }
      }.toDF("doc_id", "h")
  }

  /** Exact dedup: hash-groupBy on the canonical content hash. One shuffle
    * on a 64-hex key; map-side partial aggregation collapses duplicates
    * before the exchange. The canonical survivor is min(doc_id).
    */
  private val q34 = QueryDef(
    (s, d) =>
      load(s, d, "documents")
        .groupBy(sha2(norm(col("text")), 256).as("content_hash"))
        .agg(min(col("doc_id")).as("keep_doc_id"),
          count(lit(1)).as("n_copies")),
    Some(s"""SELECT sha256($NormSql) AS content_hash,
              CAST(min(doc_id) AS BIGINT) AS keep_doc_id,
              CAST(count(*) AS BIGINT) AS n_copies
            FROM documents GROUP BY 1"""),
    "exact dedup via content-hash groupBy [dedup]")

  /** Candidate-generation document-frequency cap for the gram self-join:
    * a gram occurring in more than this many documents generates NO
    * candidate pairs, so the worst-case fan-out per gram is bounded at
    * cap²/2 regardless of boilerplate skew (an uncapped self-join on a
    * gram shared by 1M docs fans out ~10^12 pairs). 64 is far above any
    * df in this corpus (max observed df = 4 at sf0.1), so the capped
    * path is exactly the uncapped one at test scale — the cap exists to
    * make the 100 TB shape safe, and its effect is spec'd with planted
    * boilerplate (DedupSkewSpec).
    */
  private[graft] val DefaultMaxGramDf = 64L

  /** n-gram Jaccard near-dup: pairs with |G1 ∩ G2| / |G1 ∪ G2| >= 0.8 over
    * distinct word 5-grams. Two phases:
    *
    *  1. CANDIDATES from the gram self-join, restricted to grams with
    *     document frequency <= maxGramDf (the skew guard). The length
    *     prune (J >= 0.8 forces 0.8·|Gmax| <= |Gmin|) cuts unbalanced
    *     pairs before the pair expansion.
    *  2. EXACT verify: every candidate's Jaccard is computed on the FULL
    *     per-doc gram-hash sets (restricted to candidate docs first), so
    *     the cap affects candidate recall only — never the Jaccard value
    *     or the threshold decision. A qualifying pair is missed only if
    *     ALL its shared grams are boilerplate (df > cap); documents that
    *     are pure boilerplate dedup via q34's exact content hash anyway.
    */
  private[queries] def nearDupPairs(s: SparkSession, d: String,
      maxGramDf: Long = DefaultMaxGramDf): DataFrame =
    nearDupPairsFrom(s, load(s, d, "documents"), maxGramDf)

  private[graft] def nearDupPairsFrom(s: SparkSession, docs: DataFrame,
      maxGramDf: Long = DefaultMaxGramDf): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      // join on the 8-byte gram hash, not the ~25-char string: same
      // pairs (modulo negligible hash collisions), much cheaper to
      // compute, shuffle, and compare
      val g = docGramHashesFrom(s, docs)
      // one shuffle on doc_id yields BOTH per-doc gram counts (the
      // length prune + Jaccard denominators) and the full hash sets
      // (the exact-verify material)
      val sets = g.groupBy("doc_id")
        .agg(collect_set(col("h")).as("hs"), count(lit(1)).as("ng"))
      val n = sets.select(col("doc_id"), col("ng"))
      // phase 1 candidates: the gram df comes from a count-over-window
      // on the SAME h-partitioning the self-join needs — no separate
      // df-aggregate + join branch; the self-join's two sides reuse one
      // exchange. Sub-cap filter bounds per-gram fan-out at cap²/2.
      val withDf = g.withColumn("df",
        count(lit(1)).over(Window.partitionBy("h")))
      val ga = withDf.filter(col("df") <= maxGramDf)
        .join(broadcast(n), "doc_id")
      val candidates = ga.as("a")
        .join(ga.as("b"), col("a.h") === col("b.h") &&
          col("a.doc_id") < col("b.doc_id") &&
          col("a.ng") * 4 <= col("b.ng") * 5 &&
          col("b.ng") * 4 <= col("a.ng") * 5)
        .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .distinct()
      // phase 2: exact Jaccard on the full (uncapped) gram sets — the
      // candidate set is small, so it broadcasts into two hash joins
      // against `sets`
      candidates
        .join(sets.select(col("doc_id").as("d1"),
          col("hs").as("hs1"), col("ng").as("n1")), "d1")
        .join(sets.select(col("doc_id").as("d2"),
          col("hs").as("hs2"), col("ng").as("n2")), "d2")
        .select(col("d1"), col("d2"),
          (size(array_intersect(col("hs1"), col("hs2"))).cast("double") /
            (col("n1") + col("n2") -
              size(array_intersect(col("hs1"), col("hs2")))))
            .as("jaccard"))
        .filter(col("jaccard") >= 0.8)
  }

  private val q35 = QueryDef(
    (s, d) => nearDupPairs(s, d),
    Some(s"""WITH g AS (
              SELECT doc_id, unnest($GramsSql) AS gram FROM documents
            ), n AS (
              SELECT doc_id, count(*) AS ng FROM g GROUP BY 1
            ), pairs AS (
              SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS shared
              FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            )
            SELECT d1, d2,
              CAST(shared AS DOUBLE) / (n1.ng + n2.ng - shared) AS jaccard
            FROM pairs
            JOIN n n1 ON pairs.d1 = n1.doc_id
            JOIN n n2 ON pairs.d2 = n2.doc_id
            WHERE CAST(shared AS DOUBLE) / (n1.ng + n2.ng - shared) >= 0.8"""),
    "n-gram Jaccard near-dup pairs (threshold 0.8) [dedup]")

  // ---- MinHash + LSH ----
  // 64 permutations approximated by 64 seeded xxhash64 functions; 16 bands
  // of 4 rows. P[miss] at s=0.8 is (1-0.8^4)^16 ≈ 2e-4; at the planted
  // near-dup similarity (~0.99) it is ~0. Candidates come from band-bucket
  // groupBy (self-join on tiny buckets), never from a gram join — this is
  // the 100 TB path.
  private val NumHashes = 64
  private val BandRows = 4
  private val NumBands = NumHashes / BandRows

  /** Per-doc minhash signature (mh0..mh63) AND the gram-hash set, from
    * ONE aggregation over the exploded grams — a single shuffle on
    * doc_id. Each gram string is hashed ONCE (xxhash64); the 64
    * "permutations" re-hash that fixed 8-byte value with a
    * per-permutation seed — far cheaper than hashing the variable-length
    * gram 64 times, and overflow-free under ANSI mode (a mul-add mix
    * would throw).
    */
  private def signatures(g: DataFrame): DataFrame = {
    val aggs = (0 until NumHashes).map { i =>
      min(xxhash64(lit(i), col("h"))).as(s"mh$i")
    } :+ collect_set(col("h")).as("hs")
    g.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** (band_id, band_hash, doc_id) via posexplode of per-band hashes. */
  private def bandBuckets(sig: DataFrame): DataFrame = {
    val bands = (0 until NumBands).map { b =>
      xxhash64((0 until BandRows).map(r => col(s"mh${b * BandRows + r}")): _*)
    }
    sig.select(col("doc_id"), posexplode(array(bands: _*)))
      .toDF("doc_id", "band_id", "band_hash")
  }

  /** MinHash-LSH near-dup: LSH candidates, then exact-Jaccard verify at
    * the same 0.8 threshold — same output contract as q35, built without
    * the gram self-join. Exposed as the edge source for near-dup
    * clustering (q59): band buckets bound the fan-out by construction,
    * and the exact-verify step keeps only true >= 0.8 pairs (miss
    * probability (1-s⁴)¹⁶ ≈ 2e-4 at s = 0.8, ~0 at the planted ~0.99).
    */
  private[graft] def lshNearDupPairs(s: SparkSession, d: String): DataFrame = {
      // one shuffle: per-doc signature + gram-hash set. Not persisted:
      // the two consumers (band buckets, verification sets) each
      // re-evaluate one cheap aggregation, whereas persist() would pin
      // cached blocks for the session lifetime (no safe unpersist point
      // for a lazily-returned frame).
      val sig = signatures(docGramHashes(s, d))
      val buckets = bandBuckets(sig)
      val candidates = buckets.as("x")
        .join(buckets.as("y"),
          col("x.band_id") === col("y.band_id") &&
            col("x.band_hash") === col("y.band_hash") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
        .distinct()
      // exact-Jaccard verification on the hash sets: candidate count is
      // tiny, so both sides broadcast and the intersection is in-memory
      // array work — no re-join against the exploded gram table
      val sets = sig.select(col("doc_id"), col("hs"), size(col("hs")).as("ng"))
      candidates
        .join(broadcast(sets.select(col("doc_id").as("d1"),
          col("hs").as("hs1"), col("ng").as("n1"))), "d1")
        .join(broadcast(sets.select(col("doc_id").as("d2"),
          col("hs").as("hs2"), col("ng").as("n2"))), "d2")
        .select(col("d1"), col("d2"),
          size(array_intersect(col("hs1"), col("hs2"))).as("shared"),
          col("n1"), col("n2"))
        .select(col("d1"), col("d2"),
          (col("shared").cast("double") /
            (col("n1") + col("n2") - col("shared"))).as("jaccard"))
        .filter(col("jaccard") >= 0.8)
  }

  private val q36 = QueryDef(
    (s, d) => lshNearDupPairs(s, d),
    None, // LSH recall is probabilistic; verified against q35 in specs
    "MinHash(64)+LSH(16x4) near-dup, exact-verify at 0.8 [dedup]")

  // ---- SimHash ----
  /** 64-bit SimHash over word occurrences (weight = term frequency via
    * one row per occurrence). Near-dup = Hamming distance <= 3, candidates
    * via 4x16-bit chunk banding (pigeonhole: d<=3 => >=1 chunk equal).
    */
  private def simhashDf(s: SparkSession, d: String): DataFrame = {
    val tok = load(s, d, "documents")
      .select(col("doc_id"), explode(words(col("text"))).as("w"))
      .withColumn("h", xxhash64(col("w")))
    val bitSums = (0 until 64).map { j =>
      sum(when(col("h").bitwiseAND(lit(1L << j)) =!= 0L, 1).otherwise(-1))
        .as(s"s$j")
    }
    val perDoc = tok.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
    val sim = (0 until 64).map { j =>
      when(col(s"s$j") >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
    perDoc.select(col("doc_id"), sim.as("simhash"))
  }

  /** Exposed for diagnostics/specs. */
  def simhashForDebug(s: SparkSession, d: String): DataFrame = simhashDf(s, d)

  private val q37 = QueryDef(
    (s, d) => {
      val sh = simhashDf(s, d)
      val chunks = sh.select(col("doc_id"), col("simhash"),
        posexplode(array((0 until 4).map(c =>
          shiftrightunsigned(col("simhash"), c * 16)
            .bitwiseAND(lit(0xffffL))): _*)))
        .toDF("doc_id", "simhash", "chunk_id", "chunk")
      chunks.as("x")
        .join(chunks.as("y"),
          col("x.chunk_id") === col("y.chunk_id") &&
            col("x.chunk") === col("y.chunk") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"),
          bit_count(col("x.simhash").bitwiseXOR(col("y.simhash")))
            .as("hamming"))
        .distinct()
        .filter(col("hamming") <= 3)
    },
    None, // bit-level hash semantics not portable to the oracle; see specs
    "SimHash64 near-dup, Hamming<=3, chunk-banded candidates [dedup]")

  /** Incremental exact dedup: classify an incoming BATCH of documents
    * (doc_id ≡ 0 mod 5 — a stand-in for "today's crawl") against the
    * already-ingested CORPUS (the rest). Each batch doc is
    * `dup_of_corpus` (hash already in the corpus index),
    * `dup_in_batch` (first seen earlier in this same batch), or `new`;
    * `keep_doc_id` is the canonical survivor (corpus min-id, else batch
    * min-id). This is the shape every continuously-fed training corpus
    * needs: at 100 TB the corpus index (content_hash → min doc_id) is a
    * materialized table maintained across ingests — here it is derived
    * in-plan from the same scan, but the batch side only ever joins
    * against the ALREADY-AGGREGATED index (one row per distinct corpus
    * hash, map-side combined), never against corpus rows, and the
    * within-batch tie-break is a window over the (small) batch alone.
    * One shuffle each for the index, the join, and the batch window —
    * all on the 64-hex hash key.
    */
  /** Core of q66 over an explicit documents frame and batch predicate
    * (specs plant cross-split duplicates — the natural corpus has none).
    */
  private[graft] def incrementalExactFrom(docs: DataFrame,
      isBatch: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hashed = docs
      .select(col("doc_id"), sha2(norm(col("text")), 256).as("content_hash"),
        isBatch.as("is_batch"))
    val corpusIdx = hashed.filter(!col("is_batch"))
      .groupBy("content_hash").agg(min("doc_id").as("corpus_doc_id"))
    val byHash = Window.partitionBy("content_hash")
    hashed.filter(col("is_batch"))
      .withColumn("rn", row_number().over(byHash.orderBy("doc_id")))
      .withColumn("first_batch_id", min("doc_id").over(byHash))
      .join(corpusIdx, Seq("content_hash"), "left")
      .select(col("doc_id"), col("content_hash"),
        when(col("corpus_doc_id").isNotNull, "dup_of_corpus")
          .when(col("rn") > 1, "dup_in_batch")
          .otherwise("new").as("status"),
        coalesce(col("corpus_doc_id"), col("first_batch_id"))
          .as("keep_doc_id"))
  }

  private val q66 = QueryDef(
    (s, d) => incrementalExactFrom(load(s, d, "documents"),
      col("doc_id") % 5 === 0),
    Some(s"""WITH h AS (
              SELECT doc_id, sha256($NormSql) AS content_hash FROM documents
            ), ci AS (
              SELECT content_hash, min(doc_id) AS corpus_doc_id
              FROM h WHERE doc_id % 5 <> 0 GROUP BY 1
            ), b AS (
              SELECT doc_id, content_hash,
                ROW_NUMBER() OVER (PARTITION BY content_hash
                  ORDER BY doc_id) AS rn,
                MIN(doc_id) OVER (PARTITION BY content_hash) AS first_batch_id
              FROM h WHERE doc_id % 5 = 0
            )
            SELECT b.doc_id, b.content_hash,
              CASE WHEN ci.corpus_doc_id IS NOT NULL THEN 'dup_of_corpus'
                   WHEN b.rn > 1 THEN 'dup_in_batch'
                   ELSE 'new' END AS status,
              CAST(coalesce(ci.corpus_doc_id, b.first_batch_id) AS BIGINT)
                AS keep_doc_id
            FROM b LEFT JOIN ci USING (content_hash)"""),
    "incremental dedup: batch vs corpus index [dedup]")

  def all: Seq[(String, QueryDef)] = Seq(
    "q34_dedup_exact" -> q34,
    "q35_dedup_ngram_jaccard" -> q35,
    "q36_dedup_minhash_lsh" -> q36,
    "q37_dedup_simhash" -> q37,
    "q66_dedup_incremental" -> q66)
}
