package graft.queries

import graft.QueryDef
import graft.common.Tables.load
import graft.functions.Text._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operator family over `documents`: exact, n-gram Jaccard,
  * MinHash+LSH, SimHash, incremental batch-vs-corpus, and benchmark
  * decontamination. (Embedding-cosine near-dup lives in Similarity.)
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

  /** Distinct 64-bit FNV-1a hashes of a document's word 5-grams,
    * computed by a primitive JVM loop. Catalyst's higher-order array
    * functions (transform/slice/concat_ws) are interpreted — building
    * 5-grams that way costs seconds per evaluation and a self-join
    * evaluates its subtree per side. Gram identity is engine-internal
    * (the oracle compares Jaccard VALUES), so any deterministic 64-bit
    * hash is sound; FNV-1a collision odds at corpus scale are ~n²/2^65.
    * Returned sorted so every downstream float/array fold has one fixed
    * order.
    */
  private def shingleHashes(text: String): Array[Long] = {
    val w = text.trim.toLowerCase(java.util.Locale.ROOT)
      .split("\\s+").filter(_.nonEmpty)
    if (w.length < 5) Array.emptyLongArray
    else {
      val seen = scala.collection.mutable.HashSet.empty[Long]
      var i = 0
      while (i <= w.length - 5) {
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
        seen.add(h)
        i += 1
      }
      val out = seen.toArray
      java.util.Arrays.sort(out)
      out
    }
  }

  /** splitmix64 finalizer — full-avalanche mixing for hash-derived keys
    * (public-domain constant set). Used wherever a weak-avalanche base
    * hash (FNV) feeds bucketing bits.
    */
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Per-doc (sorted distinct gram hashes, gram count) in ONE narrow
    * pass — documents arrive one per row, so the per-doc "aggregation"
    * is a local loop, not a groupBy: the old shape shuffled one row per
    * gram into a doc_id exchange, which at 100 TB moves ~50x the corpus
    * token count through the network for no reason.
    */
  private def docGramSetsFrom(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { rows =>
        rows.flatMap { case (id, text) =>
          val hs = shingleHashes(text)
          if (hs.isEmpty) Iterator.empty
          else Iterator.single((id, hs, hs.length))
        }
      }.toDF("doc_id", "hs", "ng")
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
      // per-doc sets and counts come from the narrow shingling pass —
      // no doc_id shuffle; the only exchange left is the inverted-index
      // one (on the gram hash), which is inherent to candidate finding
      val sets = docGramSetsFrom(s, docs)
      // join on the 8-byte gram hash, not the ~25-char string: same
      // pairs (modulo negligible hash collisions), much cheaper to
      // compute, shuffle, and compare
      // the per-doc gram count rides along through the explode (8 bytes
      // per row into an exchange that happens anyway) — joining it back
      // by doc_id would either broadcast an O(corpus) count table or
      // re-shuffle the exploded grams
      val g = sets.select(col("doc_id"), explode(col("hs")).as("h"),
        col("ng"))
      // phase 1 candidates: the gram df comes from a count-over-window
      // on the SAME h-partitioning the self-join needs — no separate
      // df-aggregate + join branch; the self-join's two sides reuse one
      // exchange. Sub-cap filter bounds per-gram fan-out at cap²/2.
      val ga = g.withColumn("df",
          count(lit(1)).over(Window.partitionBy("h")))
        .filter(col("df") <= maxGramDf)
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

  /** Documents actually shingled by [[bandSetsFrom]] — the scan-counter
    * test hook IncrementalCorpusSpec uses to prove an appended batch
    * near-dups against the standing corpus WITHOUT re-shingling corpus
    * text (valid in local mode, where executor threads share the JVM).
    */
  private[graft] val shingledDocCount =
    new java.util.concurrent.atomic.AtomicLong(0L)

  /** Per-doc LSH band hashes AND the gram-hash set, from ONE narrow
    * typed pass — shingling, the 64 minhash "permutations", and the 16
    * band hashes are all local loops over the document row (the old
    * shape aggregated exploded grams through a doc_id exchange: one
    * shuffled row PER GRAM — pure waste at corpus scale). Each gram is
    * FNV-hashed once; permutation i re-mixes that fixed 8 bytes with a
    * per-permutation offset through the splitmix64 finalizer (full
    * avalanche, overflow-safe in plain JVM arithmetic), and each band
    * hash chains its 4 row minima through the same mixer.
    */
  private[graft] def bandSetsFrom(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { rows =>
        rows.flatMap { case (id, text) =>
          shingledDocCount.incrementAndGet()
          val hs = shingleHashes(text)
          if (hs.isEmpty) Iterator.empty
          else {
            val mins = Array.fill(NumHashes)(Long.MaxValue)
            var gi = 0
            while (gi < hs.length) {
              val h = hs(gi)
              var i = 0
              while (i < NumHashes) {
                // per-permutation tweak: odd multiplier keeps offsets
                // distinct; mix64 gives the avalanche
                val v = mix64(h ^ (i.toLong * 0xA24BAED4963EE407L))
                if (v < mins(i)) mins(i) = v
                i += 1
              }
              gi += 1
            }
            val bands = new Array[Long](NumBands)
            var b = 0
            while (b < NumBands) {
              var bh = 0L
              var r = 0
              while (r < BandRows) {
                bh = mix64(bh ^ mins(b * BandRows + r)); r += 1
              }
              bands(b) = bh
              b += 1
            }
            Iterator.single((id, bands, hs, hs.length))
          }
        }
      }.toDF("doc_id", "bands", "hs", "ng")
  }

  /** MinHash-LSH near-dup: LSH candidates, then exact-Jaccard verify at
    * the same 0.8 threshold — same output contract as q35, built without
    * the gram self-join. Exposed as the edge source for near-dup
    * clustering (q59): band buckets bound the fan-out by construction,
    * and the exact-verify step keeps only true >= 0.8 pairs (miss
    * probability (1-s⁴)¹⁶ ≈ 2e-4 at s = 0.8, ~0 at the planted ~0.99).
    */
  private[graft] def lshNearDupPairs(s: SparkSession, d: String): DataFrame =
    lshNearDupPairsOf(s, load(s, d, "documents"))

  /** The q36 pipeline against an arbitrary (doc_id, text) frame —
    * shared by the registry query and the corpus pipeline's near-dup
    * stage (which runs it on the exact-dedup survivors).
    */
  private[graft] def lshNearDupPairsOf(s: SparkSession, docs: DataFrame): DataFrame = {
      // the signature pass is a narrow map (no shuffle at all) — its two
      // consumers (band buckets, verification sets) each re-run the
      // shingling loop, which is cheaper than pinning a session-lifetime
      // cache for a lazily-returned frame
      val sig = bandSetsFrom(s, docs)
      val buckets = sig.select(col("doc_id"), posexplode(col("bands")))
        .toDF("doc_id", "band_id", "band_hash")
      val candidates = buckets.as("x")
        .join(buckets.as("y"),
          col("x.band_id") === col("y.band_id") &&
            col("x.band_hash") === col("y.band_hash") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
        .distinct()
      val sets = sig.select(col("doc_id"), col("hs"), col("ng"))
      verifyCandidates(sets, sets, candidates)
  }

  /** Exact-Jaccard verification of candidate (d1, d2) pairs whose two
    * sides' gram sets may come from DIFFERENT frames (d1 from
    * `aSets`, d2 from `bSets`; both (doc_id, hs, ng)) — the asymmetric
    * form the incremental corpus path needs (d1 = standing index rows,
    * d2 = batch signatures). The CANDIDATE side is the tiny one, so it
    * is what broadcasts — the per-doc gram sets (O(corpus) rows with
    * array payloads) stream through narrow broadcast joins and are
    * never shuffled or broadcast themselves. After the first join the
    * intermediate is still candidate-sized (now carrying hs1), so it
    * broadcasts into the second join too. Emits only true >= 0.8
    * pairs with their exact Jaccard.
    */
  private[graft] def verifyCandidates(aSets: DataFrame, bSets: DataFrame,
      candidates: DataFrame): DataFrame = {
      val withS1 = aSets.select(col("doc_id").as("d1"),
          col("hs").as("hs1"), col("ng").as("n1"))
        .join(broadcast(candidates), "d1")
      bSets.select(col("doc_id").as("d2"),
          col("hs").as("hs2"), col("ng").as("n2"))
        .join(broadcast(withS1), "d2")
        .select(col("d1"), col("d2"),
          size(array_intersect(col("hs1"), col("hs2"))).as("shared"),
          col("n1"), col("n2"))
        .select(col("d1"), col("d2"),
          (col("shared").cast("double") /
            (col("n1") + col("n2") - col("shared"))).as("jaccard"))
        .filter(col("jaccard") >= 0.8)
  }

  /** Greedy-by-id near-dup survivor selection over verified pairs
    * (d1 < d2): walk the pairs in victim-id order; d2 drops iff d1 is
    * still kept when its pair is reached. Because d1 < d2 always, every
    * d1's own status is settled before any pair naming d2 arrives, so
    * one sorted pass suffices. This is the ONLINE dedup contract — a
    * doc drops iff it near-dups an earlier KEPT doc — which is the
    * contract an append-only incremental corpus can maintain exactly:
    * connected-component keep-min semantics would let a LATE bridging
    * doc retroactively merge two standing clusters (and retract an
    * already-published survivor), which no online pipeline can honor.
    * Full rebuild and incremental ingest both apply this rule, which is
    * why IncrementalCorpusSpec can demand bit parity between them.
    */
  private[graft] def greedyNearDupDrops(
      pairs: Array[(Long, Long)]): Set[Long] = {
    val dropped = scala.collection.mutable.HashSet.empty[Long]
    pairs.sortBy(_._2).foreach { case (a, b) =>
      if (!dropped.contains(a)) dropped += b
    }
    dropped.toSet
  }

  /** q36's oracle is q35's: the LSH route verifies every candidate at
    * the same exact-Jaccard threshold, so FALSE POSITIVES are impossible
    * and the only way to diverge from the gram-join result is a missed
    * candidate. Candidate-miss probability is (1−s⁴)¹⁶ per true pair —
    * ~6.6e-5 at the threshold s = 0.8 and ~1e-23 at this corpus's
    * planted ~0.99 similarity — and both engine and data are
    * deterministic, so on the driver's fixed testdata the comparison is
    * stable: a hash mismatch here IS a real recall regression, which is
    * exactly what an oracle is for. ApproxOpsSpec asserts the same
    * pair-for-pair equality in-suite.
    */
  private val q36 = QueryDef(
    (s, d) => lshNearDupPairs(s, d),
    (q35.oracle), // same contract: exact >= 0.8 pairs with their Jaccard
    "MinHash(64)+LSH(16x4) near-dup, exact-verify at 0.8 [dedup]")

  // ---- SimHash ----
  /** 64-bit SimHash over word occurrences (weight = term frequency).
    * Near-dup = Hamming distance <= 3, candidates via 4x16-bit chunk
    * banding (pigeonhole: d<=3 => >=1 chunk equal). The signature is a
    * local loop per document row — tokenize, FNV-hash each word through
    * the splitmix64 finalizer (bit independence matters here: every
    * signature bit is one hash bit), accumulate the 64 +/-1 counters,
    * collapse to the sign bits. Zero shuffle (the old shape exploded one
    * row per token occurrence into a 64-column groupBy aggregate — a
    * token-count-sized exchange).
    */
  private def simhashDf(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    load(s, d, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text) =>
          val w = text.trim.toLowerCase(java.util.Locale.ROOT)
            .split("\\s+").filter(_.nonEmpty)
          val counts = new Array[Int](64)
          var i = 0
          while (i < w.length) {
            val s = w(i)
            var h = 0xcbf29ce484222325L
            var k = 0
            while (k < s.length) {
              h ^= s.charAt(k); h *= 0x100000001b3L; k += 1
            }
            val m = mix64(h)
            var j = 0
            while (j < 64) {
              if (((m >>> j) & 1L) != 0L) counts(j) += 1 else counts(j) -= 1
              j += 1
            }
            i += 1
          }
          var sim = 0L
          var j = 0
          while (j < 64) {
            if (counts(j) >= 0) sim |= (1L << j)
            j += 1
          }
          (id, sim)
        }
      }.toDF("doc_id", "simhash")
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
      val pairs = chunks.as("x")
        .join(chunks.as("y"),
          col("x.chunk_id") === col("y.chunk_id") &&
            col("x.chunk") === col("y.chunk") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"),
          bit_count(col("x.simhash").bitwiseXOR(col("y.simhash")))
            .as("hamming"))
        .distinct()
        .filter(col("hamming") <= 3)
      // exact word-SET Jaccard rides along per emitted pair — the
      // independently-recomputable similarity witness for the derived
      // oracle (the signature/Hamming arithmetic itself is not
      // portable; see the oracle note). Same broadcast discipline as
      // q35's verify step: the pair set is tiny, the word sets stream.
      val wsets = load(s, d, "documents")
        .select(col("doc_id"), array_distinct(words(col("text"))).as("w"))
      val withA = wsets
        .select(col("doc_id").as("d1"), col("w").as("w1"))
        .join(broadcast(pairs), "d1")
      wsets.select(col("doc_id").as("d2"), col("w").as("w2"))
        .join(broadcast(withA), "d2")
        .withColumn("shared", size(array_intersect(col("w1"), col("w2"))))
        .select(col("d1"), col("d2"), col("hamming"),
          (col("shared").cast("double") /
            (size(col("w1")) + size(col("w2")) - col("shared")))
            .as("jaccard"))
    },
    // Pair-level derived oracle: the 64-bit signature arithmetic
    // (FNV-1a over UTF-16 units + splitmix64, wrap-around multiply) is
    // NOT portable to DuckDB's overflow-checked BIGINT — so WHICH
    // pairs band together, and their Hamming distances, are echoed
    // from the emitted rows rather than recomputed. What IS
    // independently recomputed per emitted pair: that d1/d2 are real
    // documents (inner joins drop phantoms → rowcount mismatch) and
    // the exact word-set Jaccard the engine claims for them. Signature
    // semantics stay spec-verified (ApproxOpsSpec overlap floor vs
    // exact Jaccard pairs, determinism).
    Some(s"""WITH emitted AS (
              SELECT d1, d2, hamming
              FROM read_parquet('${graft.QueryDef.OutDirToken}/q37_dedup_simhash/*.parquet')
            ), ws AS (
              SELECT doc_id, list_distinct($WordsSql) AS w FROM documents
            )
            SELECT e.d1, e.d2, e.hamming,
              CAST(len(list_intersect(a.w, b.w)) AS DOUBLE)
                / (len(a.w) + len(b.w) - len(list_intersect(a.w, b.w)))
                AS jaccard
            FROM emitted e
            JOIN ws a ON a.doc_id = e.d1
            JOIN ws b ON b.doc_id = e.d2"""),
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
    val hashed = docs
      .select(col("doc_id"), sha2(norm(col("text")), 256).as("content_hash"),
        isBatch.as("is_batch"))
    val corpusIdx = hashed.filter(!col("is_batch"))
      .groupBy("content_hash").agg(min("doc_id").as("corpus_doc_id"))
    classifyAgainstIndex(
      hashed.filter(col("is_batch")).select("doc_id", "content_hash"),
      corpusIdx)
  }

  /** The batch side of the incremental classifier against an ALREADY
    * MATERIALIZED corpus hash index (content_hash → corpus_doc_id, one
    * row per distinct hash) — the production shape, where the index is
    * a standing table maintained across ingests rather than derived
    * in-plan (q66 derives it; `CorpusPipeline.runIncremental` loads it
    * from the previous run's output). Same output contract as q66.
    */
  private[graft] def classifyAgainstIndex(hashedBatch: DataFrame,
      corpusIdx: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byHash = Window.partitionBy("content_hash")
    hashedBatch
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

  /** Benchmark decontamination: for every training document, how many
    * of its distinct word 5-grams also occur in the BENCHMARK set
    * (doc_id ≡ 0 mod 50 — a stand-in for held-out eval suites). The
    * real-pipeline shape: benchmark suites are tiny, so their distinct
    * gram set broadcasts; training docs stream through the narrow
    * shingling pass, explode to (doc, gram-hash), and the overlap count
    * is a broadcast-join + per-doc aggregation — the corpus is scanned
    * once and never self-joined. Every training doc is reported (zero
    * overlap included): the output is the audit table a filter stage
    * consumes, not just the kill list.
    */
  /** Core of q69 over an explicit documents frame and benchmark
    * predicate (specs plant overlapping docs — the natural corpus
    * shares no 5-grams with its benchmark slice).
    */
  private[graft] def decontaminationFrom(s: SparkSession, docs: DataFrame,
      isBench: Column): DataFrame =
    contaminationAudit(s, docs.filter(!isBench),
      benchGramHashes(s, docs.filter(isBench)))

  /** The distinct 5-gram hash set of a benchmark slice — the tiny,
    * MATERIALIZABLE artifact a standing decontamination service keeps
    * (CorpusPipeline persists it as `bench_grams` so incremental runs
    * never rescan the corpus to rebuild it).
    */
  private[graft] def benchGramHashes(s: SparkSession,
      benchDocs: DataFrame): DataFrame =
    docGramSetsFrom(s, benchDocs)
      .select(explode(col("hs")).as("h")).distinct()

  /** Per-training-doc overlap audit against an explicit benchmark gram
    * set (col `h`: long) — q69's output contract.
    */
  private[graft] def contaminationAudit(s: SparkSession,
      trainDocs: DataFrame, benchGrams: DataFrame): DataFrame = {
    val train = docGramSetsFrom(s, trainDocs)
    val shared = train.select(col("doc_id"), explode(col("hs")).as("h"))
      .join(broadcast(benchGrams), "h")
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
    train.select(col("doc_id"), col("ng"))
      .join(shared, Seq("doc_id"), "left")
      .select(col("doc_id"), col("ng").as("n_grams"),
        coalesce(col("n_shared"), lit(0L)).cast("int").as("n_shared"),
        (coalesce(col("n_shared"), lit(0L)).cast("double") / col("ng"))
          .as("contamination_ratio"),
        coalesce(col("n_shared") >= 1, lit(false)).as("is_contaminated"))
  }

  private val q69 = QueryDef(
    (s, d) => decontaminationFrom(s, load(s, d, "documents"),
      col("doc_id") % 50 === 0),
    Some(s"""WITH gs AS (
              SELECT doc_id, unnest($GramsOracleSql) AS gram FROM documents
            ), bg AS (
              SELECT DISTINCT gram FROM gs WHERE doc_id % 50 = 0
            ), tr AS (
              SELECT doc_id, gram FROM gs WHERE doc_id % 50 <> 0
            ), ngr AS (
              SELECT doc_id, count(*) AS ng FROM tr GROUP BY 1
            ), sh AS (
              SELECT doc_id, count(*) AS n_shared
              FROM tr JOIN bg USING (gram) GROUP BY 1
            )
            SELECT ngr.doc_id, CAST(ngr.ng AS INTEGER) AS n_grams,
              CAST(coalesce(sh.n_shared, 0) AS INTEGER) AS n_shared,
              CAST(coalesce(sh.n_shared, 0) AS DOUBLE) / ngr.ng
                AS contamination_ratio,
              coalesce(sh.n_shared >= 1, false) AS is_contaminated
            FROM ngr LEFT JOIN sh ON ngr.doc_id = sh.doc_id"""),
    "benchmark decontamination: 5-gram overlap audit [dedup,text-analysis]")

  /** q248's containment threshold, compared as 10·shared ≥ 9·|inner|
    * in integers (no float in the decision).
    */
  private val ContainNum = 9L
  private val ContainDen = 10L

  /** q248: shingle CONTAINMENT dedup — pairs where ≥90% of the smaller
    * document's 5-gram set appears in the larger one (Broder's
    * containment coefficient C(A,B) = |A∩B|/|A|). The asymmetric
    * complement of q35's Jaccard: a snippet quoted inside a long page
    * scores near-zero Jaccard (the union is huge) but containment ~1 —
    * which is exactly the subset/quote duplication a crawl-corpus
    * pipeline must catch AFTER Jaccard dedup has removed the
    * same-length near-twins. Emits the directed pair (inner ⊆ outer,
    * inner = fewer distinct grams, ties by doc_id), both gram counts,
    * the shared count, and the exact coefficient.
    *
    * Scale: q35's exact machinery with the OPPOSITE length policy —
    * the df-capped gram self-join bounds per-gram fan-out at cap²/2
    * (the skew guard), but there is NO length-ratio prune: containment
    * pairs are precisely the unbalanced ones a Jaccard prune throws
    * away. The verify step computes |A∩B| on the full per-doc gram
    * sets (narrow shingling pass, no doc_id shuffle), so the cap
    * affects candidate recall only, never an emitted value. The cap
    * is part of the CONTRACT and the oracle mirrors it — a candidate
    * pair must share ≥1 sub-cap gram, so a snippet whose every gram
    * is corpus-wide boilerplate (df > cap) is out of scope BY DESIGN
    * on both sides (q35's exact-dup fallback does not cover that
    * class here, so leaving the cap engine-only would diverge from
    * the oracle the day such a snippet appears).
    *
    * Exactness: gram counts and the intersection are integers; the
    * threshold is an integer cross-multiplication; the coefficient is
    * the single terminal double division.
    */
  /** The directed emission + integer threshold shared by every
    * containment path — input rows carry `d1 < d2`, both full gram
    * sets (`hs1`/`hs2`) and counts (`n1`/`n2`). Direction is by gram
    * count (inner = fewer distinct grams, ties to the lower doc_id via
    * the `<=` on counts with d1 < d2); the threshold is the integer
    * cross-multiplication; the coefficient is the terminal division.
    */
  private def containmentEmit(joined: DataFrame): DataFrame =
    joined
      .select(
        when(col("n1") <= col("n2"), col("d1")).otherwise(col("d2"))
          .as("inner_doc"),
        when(col("n1") <= col("n2"), col("d2")).otherwise(col("d1"))
          .as("outer_doc"),
        least(col("n1"), col("n2")).cast("long").as("n_inner"),
        greatest(col("n1"), col("n2")).cast("long").as("n_outer"),
        size(array_intersect(col("hs1"), col("hs2"))).cast("long")
          .as("shared"))
      .filter(col("shared") * ContainDen >= col("n_inner") * ContainNum)
      .select(col("inner_doc"), col("outer_doc"), col("n_inner"),
        col("n_outer"), col("shared"),
        (col("shared").cast("double") / col("n_inner").cast("double"))
          .as("containment"))

  /** q248's machinery over an EXPLICIT per-doc gram-set frame
    * (doc_id, hs, ng): df-capped gram self-join for candidates, exact
    * full-set verify, [[containmentEmit]] contract. The registry query
    * feeds it raw documents; the corpus pipeline feeds it the near-dup
    * survivors' persisted `lsh_index` rows, so the standing
    * containment audit reuses the stored gram sets and re-shingles
    * nothing. See q248's scaladoc for the cap-as-contract argument.
    */
  private[graft] def containmentPairsOfSets(sets: DataFrame,
      maxGramDf: Long): DataFrame = {
    val g = sets.select(col("doc_id"), explode(col("hs")).as("h"))
    val ga = g.withColumn("df",
        count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("h")))
      .filter(col("df") <= maxGramDf)
    val candidates = ga.as("a")
      .join(ga.as("b"), col("a.h") === col("b.h") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
    containmentEmit(
      candidates
        .join(sets.select(col("doc_id").as("d1"),
          col("hs").as("hs1"), col("ng").as("n1")), "d1")
        .join(sets.select(col("doc_id").as("d2"),
          col("hs").as("hs2"), col("ng").as("n2")), "d2"))
  }

  /** Containment verify for candidate pairs whose two sides come from
    * DIFFERENT set frames (d1 from `aSets`, d2 from `bSets`) — the
    * incremental corpus form, where d1 is a standing survivor and d2 a
    * batch survivor (append-only ids guarantee d1 < d2). Broadcast
    * discipline = [[verifyCandidates]]: the candidate side broadcasts
    * through two narrow joins, the per-doc gram sets stream and are
    * never shuffled. Emission contract identical to q248's.
    */
  private[graft] def containmentVerifyAsym(aSets: DataFrame,
      bSets: DataFrame, candidates: DataFrame): DataFrame = {
    val withA = aSets.select(col("doc_id").as("d1"),
        col("hs").as("hs1"), col("ng").as("n1"))
      .join(broadcast(candidates), "d1")
    containmentEmit(
      bSets.select(col("doc_id").as("d2"),
          col("hs").as("hs2"), col("ng").as("n2"))
        .join(broadcast(withA), "d2"))
  }

  /** Grams whose document frequency over `sets` exceeds the cap — the
    * standing BOILERPLATE set the incremental tombstone pass checks
    * pair validity against (a pair stays emitted iff at least one of
    * its shared grams is NOT in this set). Small by construction:
    * only corpus-wide boilerplate crosses a df cap.
    */
  private[graft] def overCapGrams(sets: DataFrame,
      maxGramDf: Long): DataFrame =
    sets.select(explode(col("hs")).as("h"))
      .groupBy("h").agg(count(lit(1)).as("df"))
      .filter(col("df") > maxGramDf)
      .select("h")

  private val q248 = QueryDef(
    (s, d) => containmentPairsOfSets(
      docGramSetsFrom(s, load(s, d, "documents")), DefaultMaxGramDf),
    Some(s"""WITH g AS (
              SELECT doc_id, unnest($GramsSql) AS gram FROM documents
            ), n AS (
              SELECT doc_id, CAST(count(*) AS BIGINT) AS ng
              FROM g GROUP BY 1
            ), capped AS (
              -- the df cap is part of the CONTRACT, mirrored here:
              -- candidates must share at least one sub-cap gram, so
              -- pure-boilerplate containment (every shared gram in
              -- > $DefaultMaxGramDf docs) is out of scope by design
              -- on BOTH sides, not silently missed by one
              SELECT doc_id, gram FROM g
              WHERE gram IN (SELECT gram FROM g GROUP BY gram
                             HAVING count(*) <= $DefaultMaxGramDf)
            ), cand AS (
              SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
              FROM capped a JOIN capped b ON a.gram = b.gram
                AND a.doc_id < b.doc_id
            ), pairs AS (
              SELECT a.doc_id AS d1, b.doc_id AS d2,
                CAST(count(*) AS BIGINT) AS shared
              FROM g a JOIN g b ON a.gram = b.gram
                AND a.doc_id < b.doc_id
              JOIN cand ON cand.d1 = a.doc_id AND cand.d2 = b.doc_id
              GROUP BY 1, 2
            ), dir AS (
              SELECT
                CASE WHEN n1.ng <= n2.ng THEN d1 ELSE d2 END AS inner_doc,
                CASE WHEN n1.ng <= n2.ng THEN d2 ELSE d1 END AS outer_doc,
                LEAST(n1.ng, n2.ng) AS n_inner,
                GREATEST(n1.ng, n2.ng) AS n_outer,
                shared
              FROM pairs
              JOIN n n1 ON pairs.d1 = n1.doc_id
              JOIN n n2 ON pairs.d2 = n2.doc_id
            )
            SELECT inner_doc, outer_doc, n_inner, n_outer, shared,
              CAST(shared AS DOUBLE) / CAST(n_inner AS DOUBLE)
                AS containment
            FROM dir
            WHERE shared * $ContainDen >= n_inner * $ContainNum"""),
    "directed shingle-containment dedup (C >= 0.9): df-capped " +
      "candidates, exact set verify, integer threshold [dedup]")

  /** q260's near-dup cosine threshold (q40/q62's 0.95 contract) and
    * the per-cluster successor fan-out of the chained candidate scan.
    */
  private val SemTheta = 0.95
  private val SemChain = 3

  /** q260: SemDeDup — semantic dedup by cluster-then-neighbor-scan
    * (Abbas et al. 2023): embeddings assign to their nearest integer
    * centroid (q137's E-step, broadcast centroids, exact integer d2),
    * and WITHIN each cluster a vector is a duplicate iff one of its
    * [[SemChain]] successors in the centroid-similarity order is
    * ≥ [[SemTheta]] cosine-similar. The keep side of each adjacent
    * duplicate run is its least-centroid-similar member — the paper's
    * keep-farthest-from-centroid rule, which preserves the cluster's
    * diversity rather than its mode. Every row EMITS its most-similar
    * chained successor and that cosine (nn_succ/nn_cos) — the audit
    * columns a curator tunes θ against (this corpus's embeddings top
    * out at cosine ~0.6, so at the family's 0.95 contract everything
    * is kept and the oracle's teeth are the per-row nn values, not
    * the flag).
    *
    * Scale: the all-pairs-within-cluster scan of the paper is
    * corpus²/k — dead at 100 TB with bounded k. This is the engine's
    * standard SORTED-ADJACENCY rendering (the GraphAnn seed/chain and
    * q35 df-cap discipline): near-dups of a cluster sit adjacent in
    * the centroid-cosine order, so comparing each member with C
    * successors is O(rows·C) pair work after one cluster-keyed
    * exchange — and the candidate contract (successors in a pinned
    * deterministic order) is exactly SQL-mirrorable, so the oracle
    * re-derives every emitted row instead of trusting the engine.
    *
    * Determinism: assignment d2 is exact-integer (ties to the lower
    * label); c_cos and the pair cosines are the family's fixed
    * sequential double expression (bit-identical cross-engine — the
    * q38 ordering discipline), with vec_id tie-breaks.
    */
  private val q260 = QueryDef(
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val cent = EmbeddingStats.centroidsMilli(s, d)
        .groupBy("clabel")
        .agg(transform(
          array_sort(collect_list(struct(col("dim"), col("cm")))),
          _.getField("cm")).as("cent"))
      val vecs = load(s, d, "embeddings").select(col("vec_id"),
        col("embedding").cast("array<double>").as("e"))
        .withColumn("q", transform(col("e"), EmbeddingStats.qmilli(_)))
      val d2 = vecs.crossJoin(broadcast(cent))
        .select(col("vec_id"), col("e"), col("clabel"),
          transform(col("cent"), _.cast("double")).as("cd"),
          aggregate(
            zip_with(col("q"), col("cent"), (a, b) => (a - b) * (a - b)),
            lit(0L), (acc, x) => acc + x).as("d2"))
      val wA = Window.partitionBy("vec_id").orderBy(col("d2"), col("clabel"))
      val assigned = d2.withColumn("rn", row_number().over(wA))
        .filter(col("rn") === 1)
        .select(col("vec_id"), col("e"), col("clabel"),
          Similarity.cosine(col("e"), col("cd")).as("c_cos"))
      val wC = Window.partitionBy("clabel")
        .orderBy(col("c_cos").desc, col("vec_id").asc)
      val leads = (1 to SemChain).foldLeft(assigned) { (f, i) =>
        f.withColumn(s"nv$i", lead(col("vec_id"), i).over(wC))
          .withColumn(s"ne$i", lead(col("e"), i).over(wC))
      }
      val cs = (1 to SemChain).map(i =>
        Similarity.cosine(col("e"), col(s"ne$i")))
      // the MOST-similar chained successor is always emitted (the audit
      // column a curator reads even when nothing crosses θ); both
      // engines skip nulls in greatest() and break exact-cosine ties by
      // the same fixed case order
      val bestCos = greatest(cs: _*)
      val bestSucc = coalesce((1 to SemChain).map(i =>
        when(cs(i - 1) === bestCos, col(s"nv$i"))): _*)
      leads.select(col("vec_id"), col("clabel").cast("long").as("cluster"),
          col("c_cos"), bestSucc.as("nn_succ"), bestCos.as("nn_cos"),
          coalesce(bestCos < SemTheta, lit(true)).as("kept"))
    },
    Some {
      val theta = SemTheta
      s"""WITH q AS (${EmbeddingStats.CoordsSql}),
          c AS (
            SELECT label AS clabel, dim,
              CAST(floor(CAST(SUM(qv) AS DOUBLE) /
                CAST(count(*) AS DOUBLE) + 0.5) AS BIGINT) AS cm
            FROM q GROUP BY 1, 2
          ), cl AS (
            SELECT clabel, list(cm ORDER BY dim) AS cent FROM c GROUP BY 1
          ), dist AS (
            SELECT q.vec_id, c.clabel,
              CAST(SUM((q.qv - c.cm) * (q.qv - c.cm)) AS BIGINT) AS d2
            FROM q JOIN c ON q.dim = c.dim GROUP BY 1, 2
          ), best AS (
            SELECT vec_id, clabel, ROW_NUMBER() OVER (
              PARTITION BY vec_id ORDER BY d2, clabel) AS rn
            FROM dist
          ), a AS (
            SELECT b.vec_id, b.clabel, e.embedding,
              ${Similarity.cosineSql("e.embedding", "cl.cent")} AS c_cos
            FROM best b
            JOIN embeddings e USING (vec_id)
            JOIN cl ON cl.clabel = b.clabel
            WHERE b.rn = 1
          ), w AS (
            SELECT vec_id, clabel, c_cos, embedding,
              lead(vec_id, 1) OVER win AS nv1,
              lead(embedding, 1) OVER win AS ne1,
              lead(vec_id, 2) OVER win AS nv2,
              lead(embedding, 2) OVER win AS ne2,
              lead(vec_id, 3) OVER win AS nv3,
              lead(embedding, 3) OVER win AS ne3
            FROM a
            WINDOW win AS (PARTITION BY clabel
              ORDER BY c_cos DESC, vec_id ASC)
          ), x AS (
            SELECT vec_id, CAST(clabel AS BIGINT) AS cluster, c_cos,
              nv1, nv2, nv3,
              ${Similarity.cosineSql("embedding", "ne1")} AS cs1,
              ${Similarity.cosineSql("embedding", "ne2")} AS cs2,
              ${Similarity.cosineSql("embedding", "ne3")} AS cs3
            FROM w
          ), y AS (
            SELECT vec_id, cluster, c_cos,
              greatest(cs1, cs2, cs3) AS nn_cos,
              CASE WHEN cs1 = greatest(cs1, cs2, cs3) THEN nv1
                   WHEN cs2 = greatest(cs1, cs2, cs3) THEN nv2
                   WHEN cs3 = greatest(cs1, cs2, cs3) THEN nv3
              END AS nn_succ
            FROM x
          )
          SELECT vec_id, cluster, c_cos, nn_succ, nn_cos,
            COALESCE(nn_cos < $theta, TRUE) AS kept
          FROM y"""
    },
    "SemDeDup: nearest-centroid clusters + chained-successor cosine " +
      s"dedup at 0.95, keep-farthest-from-centroid [dedup,embedding]")

  def all: Seq[(String, QueryDef)] = Seq(
    "q34_dedup_exact" -> q34,
    "q35_dedup_ngram_jaccard" -> q35,
    "q248_containment_dedup" -> q248,
    "q260_semdedup" -> q260,
    "q36_dedup_minhash_lsh" -> q36,
    "q37_dedup_simhash" -> q37,
    "q66_dedup_incremental" -> q66,
    "q69_decontamination" -> q69)
}
