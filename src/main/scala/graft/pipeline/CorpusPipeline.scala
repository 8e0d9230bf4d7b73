package graft.pipeline

import graft.common.JsonIO
import graft.functions.Text._
import graft.queries.{Dedup, Packing, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-corpus preparation: the extension battery composed end to
  * end — quality filter → exact dedup → benchmark decontamination →
  * context-window chunking → next-fit packing — writing the packed
  * corpus plus a JSON stats sidecar (the same sidecar discipline as the
  * churn pipeline's stages, S14).
  *
  * Every stage is one of the already-verified operators applied to the
  * previous stage's frame, so the whole run is a handful of narrow
  * passes plus the operators' own keyed exchanges; nothing here adds a
  * driver loop or an extra corpus scan. The counts in the summary are
  * computed from the two materialized outputs plus three bounded
  * aggregates — the intermediate frames are never collected.
  *
  * Stage thresholds mirror the oracle-checked query battery: the
  * quality floor is q56's (>=20 words, distinct ratio >=0.3), the
  * survivor rule is q34/q56's min-doc_id-per-hash, decontamination is
  * q69's any-shared-5-gram flag against the benchmark slice, chunking
  * is q65's 64/48 windows, packing is q67's next-fit at 512 tokens.
  */
object CorpusPipeline {

  final case class Summary(
      nInput: Long, nAfterQuality: Long, nAfterDedup: Long,
      nAfterNearDup: Long, nAfterDecontam: Long, nChunks: Long,
      nPacks: Long, packedTokens: Long)

  /** What an incremental run did, plus the TOTAL corpus [[Summary]]
    * after it — bit-identical to what a full rebuild over the union
    * would report (IncrementalCorpusSpec asserts it). `skipped` marks a
    * replay of an already-committed streaming batch (the ingest ledger
    * recognized the batch id): nothing was written, the summary echoes
    * the standing sidecar.
    */
  final case class IncrementalResult(
      summary: Summary, nBatch: Long, nBatchQuality: Long,
      nNewDocs: Long, nNearDup: Long, repackedGroups: Seq[Long],
      skipped: Boolean = false, nContainmentPairs: Long = 0L)

  /** Sidecar key prefix of the streaming ingest ledger: one flat entry
    * per checkpoint (`ingest_last_batch:<checkpoint>` → last committed
    * batch id), written ATOMICALLY WITH the stats commit so a replayed
    * foreachBatch can be recognized — keyed per checkpoint because
    * Structured Streaming batch ids restart from 0 under a fresh
    * checkpoint against the same standing corpus.
    */
  private val LedgerPrefix = "ingest_last_batch:"

  private[pipeline] val MinWords = 20
  private[pipeline] val MinDistinctRatio = 0.3

  /** The q56 quality floor as a predicate (shared by the full and
    * incremental paths so the funnel counts stay additive).
    */
  private def passesQuality: org.apache.spark.sql.Column = {
    val w = words(col("text"))
    size(w) >= MinWords &&
      (size(array_distinct(w)).cast("double") / size(w)) >= MinDistinctRatio
  }

  /** Near-dup survivor selection under the ONLINE greedy contract
    * (see [[Dedup.greedyNearDupDrops]]): verified >= 0.8 MinHash-LSH
    * pairs over `docs`, walked greedily by id; returns the surviving
    * frame. The verified-pair collect is BOUNDED by the corpus's true
    * near-dup mass (exact-verify emits only real >= 0.8 pairs; the
    * band buckets bound candidate fan-out — the q36 argument), the
    * same edge list q59's clustering materializes.
    */
  private[graft] def nearDupSurvivors(s: SparkSession,
      docs: DataFrame): DataFrame = {
    val pairs = Dedup.lshNearDupPairsOf(s, docs)
      .select(col("d1"), col("d2")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    dropById(s, docs, Dedup.greedyNearDupDrops(pairs))
  }

  /** Anti-join `docs` against a driver-side drop set (bounded — the
    * near-dup victims). An `isin` literal list would inline the whole
    * set into the plan; the anti-join keeps it a broadcast relation.
    */
  private def dropById(s: SparkSession, docs: DataFrame,
      drops: Set[Long]): DataFrame = {
    import s.implicits._
    if (drops.isEmpty) docs
    else docs.join(
      broadcast(drops.toSeq.toDF("doc_id")), Seq("doc_id"), "left_anti")
  }

  /** Curation drops reach the persisted ANN indexes' takedown path
    * AUTOMATICALLY (round-15, closing the r14 gap where a curated-out
    * doc stayed servable from ANN until someone ran `IndexMain
    * --tombstone`): every doc the pass drops as an exact duplicate,
    * near-duplicate, or benchmark contamination is tombstoned against
    * all four index kinds in the same pass — probes mask immediately
    * with no rebuild; the threshold fold removes the rows physically
    * later. doc_id ≡ vec_id (the embeddings are the documents'
    * vectors). Only NEW ids are appended (one bounded read of the live
    * set per kind), so replays are idempotent. QUALITY-floor rejects
    * are deliberately NOT tombstoned: they are training-export
    * membership decisions, not "this content must never serve"
    * decisions — the dedup/decontamination drops are. Failures
    * propagate: a drop that silently doesn't reach the serve path is
    * the exact compliance bug this wiring exists to kill.
    */
  private[graft] def tombstoneCurationDrops(s: SparkSession, d: String,
      drops: Set[Long]): Unit = {
    if (drops.isEmpty) return
    import graft.tables.IndexStore
    Seq("ivf_index", "lsh_index", "pq_index", "nsw_index").foreach { kind =>
      val live = IndexStore.tombstoneIds(s, kind, d).toSet
      val fresh = (drops -- live).toSeq.sorted
      if (fresh.nonEmpty) IndexStore.addTombstones(s, kind, d, fresh)
    }
  }

  /** Bounded drop-set collect: the ids of `before` missing from
    * `after` (anti-join then collect — bounded by the drop mass, never
    * the corpus).
    */
  private def droppedIds(before: DataFrame, after: DataFrame): Set[Long] =
    before.select("doc_id")
      .join(after.select("doc_id"), Seq("doc_id"), "left_anti")
      .collect().map(_.getLong(0)).toSet

  /** Quality floor + exact dedup in one plan (q56's composition). */
  private[graft] def cleanDocs(docs: DataFrame): DataFrame = {
    val keep = Window.partitionBy(col("content_hash"))
      .orderBy(col("doc_id").asc)
    docs
      .select(col("doc_id"), col("text"),
        sha2(norm(col("text")), 256).as("content_hash"))
      .filter(passesQuality)
      .withColumn("rn", row_number().over(keep))
      .filter(col("rn") === 1)
      .select("doc_id", "text")
  }

  /** Drop cleaned survivors sharing any 5-gram with the benchmark slice
    * (q69's audit; the benchmark docs themselves are also excluded from
    * the training output by construction).
    *
    * The benchmark gram set is built from the RAW benchmark slice, not
    * the cleaned frame: a benchmark doc dropped by the quality floor, or
    * deduped away because a verbatim training copy holds the smaller
    * doc_id, would otherwise contribute no grams — and that copy (the
    * strongest contamination this stage exists to remove) would pass.
    * Only the training side comes from the cleaned frame.
    *
    * The keep rule is an ANTI-join against the contaminated ids (plus
    * the explicit benchmark exclusion), not an inner join against the
    * uncontaminated ones: the audit emits no row for a doc with zero
    * 5-grams (under 5 words), and an inner join would silently drop such
    * docs. Unreachable via [[cleanDocs]] (MinWords = 20 ≫ 5), but this
    * helper takes arbitrary frames — a gram-less doc shares nothing with
    * the benchmark and must be KEPT.
    */
  private[graft] def decontaminate(s: SparkSession, raw: DataFrame,
      cleaned: DataFrame,
      isBench: org.apache.spark.sql.Column): DataFrame =
    decontaminateWithGrams(s,
      Dedup.benchGramHashes(s, raw.filter(isBench).select("doc_id", "text")),
      cleaned, isBench)

  /** Same keep rule against an explicit (typically persisted) benchmark
    * gram-hash set — the form the incremental path uses so it never
    * rescans the corpus to rebuild the benchmark grams.
    */
  private[graft] def decontaminateWithGrams(s: SparkSession,
      benchGrams: DataFrame, cleaned: DataFrame,
      isBench: org.apache.spark.sql.Column): DataFrame = {
    val train = cleaned.filter(!isBench)
    train.join(
      Dedup.contaminationAudit(s, train.select("doc_id", "text"), benchGrams)
        .filter(col("is_contaminated"))
        .select("doc_id"),
      Seq("doc_id"), "left_anti")
  }

  /** Run the full preparation against a testdata dir, writing
    * `chunks` + `packed` parquet and `corpus_stats.json` under outDir.
    * Benchmark slice: doc_id ≡ 0 mod 50 (q69's convention).
    */
  def run(spark: SparkSession, sfDir: String, outDir: String,
      containCap: Long = graft.queries.Dedup.DefaultMaxGramDf): Summary = {
    val docs = graft.common.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val nInput = docs.count()

    val cleaned = cleanDocs(docs)
    // quality floor alone (pre-dedup), for the funnel stats
    val nQuality = docs.filter(passesQuality).count()
    val nDedup = cleaned.count()

    // the standing corpus hash index (content_hash → surviving doc_id):
    // what runIncremental classifies the next batch against. Built from
    // the EXACT-dedup survivors (pre-near-dup) deliberately: a later
    // verbatim copy of a near-dup-dropped doc must still classify as
    // dup_of_corpus, exactly as a full rebuild's min-id rule would
    // drop it at the exact stage
    cleaned
      .select(sha2(norm(col("text")), 256).as("content_hash"),
        col("doc_id"))
      .write.mode("overwrite").parquet(s"$outDir/hash_index")

    // near-dup stage (greedy-by-id MinHash-LSH) + its standing index:
    // the band/gram signatures of every near-dup SURVIVOR (benchmark
    // docs included — they participate in the greedy walk, so the
    // incremental path must see them as potential droppers), which is
    // all an appended batch needs to near-dup against the corpus
    // without re-shingling a single corpus row
    // three consumers below (count, index signatures, decontaminate);
    // localCheckpoint spills MEMORY_AND_DISK, so this is the in-session
    // stand-in for what a 100 TB run does anyway — materialize the
    // survivor frame (as this pipeline already does for chunks/packed)
    // instead of re-running the quality+dedup+near-dup plan per reader
    val nearPairs = Dedup.lshNearDupPairsOf(spark, cleaned)
      .select(col("d1"), col("d2")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nearDrops = Dedup.greedyNearDupDrops(nearPairs)
    val nearKept = dropById(spark, cleaned, nearDrops).localCheckpoint()
    val nNearDup = nearKept.count()
    Dedup.bandSetsFrom(spark, nearKept)
      .write.mode("overwrite").parquet(s"$outDir/lsh_index")

    // the standing CONTAINMENT audit (q248's directed subset/quote
    // contract over the near-dup survivors) plus the two artifacts its
    // incremental maintenance needs: the pair table itself and the
    // over-cap (boilerplate) gram set. Both derive from the
    // just-written lsh_index, so the stored gram sets are reused and
    // not a single survivor is re-shingled
    val survivorSets = spark.read.parquet(s"$outDir/lsh_index")
      .select(col("doc_id"), col("hs"), col("ng"))
    Dedup.containmentPairsOfSets(survivorSets, containCap)
      .write.mode("overwrite").parquet(s"$outDir/containment_pairs")
    Dedup.overCapGrams(survivorSets, containCap)
      .write.mode("overwrite").parquet(s"$outDir/overcap_grams")
    val nContainment =
      spark.read.parquet(s"$outDir/containment_pairs").count()

    // the benchmark gram set is the second standing artifact: tiny
    // (distinct 5-gram hashes of the benchmark slice), and the ONLY
    // thing an incremental run would otherwise have to rescan the
    // corpus for — the `doc_id % 50` membership predicate does not
    // push down to parquet, so rebuilding it is a full-table read
    val isBench = col("doc_id") % 50 === 0
    Dedup.benchGramHashes(spark, docs.filter(isBench))
      .write.mode("overwrite").parquet(s"$outDir/bench_grams")

    val training = decontaminateWithGrams(spark,
      spark.read.parquet(s"$outDir/bench_grams"), nearKept, isBench)

    // auto-tombstone the curation drops against the ANN indexes:
    // exact-dup drops (quality-passing docs deduped away), near-dup
    // drops (greedy walk victims), contamination drops (bench-gram
    // sharers). Each set is drop-mass-bounded.
    val exactDrops = droppedIds(docs.filter(passesQuality), cleaned)
    val contamDrops = droppedIds(nearKept.filter(!isBench), training)
    tombstoneCurationDrops(spark, sfDir,
      exactDrops ++ nearDrops ++ contamDrops)

    val chunks = TextOps.chunkDocs(spark, training)
    chunks.write.mode("overwrite").parquet(s"$outDir/chunks")

    val packed = Packing.packChunks(
      spark.read.parquet(s"$outDir/chunks"))
    packed.write.mode("overwrite").parquet(s"$outDir/packed")

    val packedRead = spark.read.parquet(s"$outDir/packed")
    val nDecontam = packedRead.select("doc_id").distinct().count()
    val nChunks = packedRead.count()
    val packStats = packedRead
      .agg(count_distinct(struct(col("pack_group"), col("pack_seq")))
          .as("n_packs"),
        sum(col("n_tokens")).as("tok"))
      .collect()(0)
    val summary = Summary(nInput, nQuality, nDedup, nNearDup, nDecontam,
      nChunks, packStats.getLong(0), packStats.getLong(1))

    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    writeStats(outDir, summary,
      docs.agg(max(col("doc_id"))).collect()(0).getLong(0),
      containCap, nContainment, datasetDir = Some(sfDir))
    summary
  }

  /** Stats sidecar. `max_doc_id` rides along so the incremental path
    * can enforce append-only ids without reading the corpus; `ledger`
    * entries ([[LedgerPrefix]]) commit in the SAME atomic write — the
    * sidecar write IS the incremental commit point, so a batch is
    * either fully committed (stats + ledger agree) or fully replayable.
    */
  private def writeStats(outDir: String, summary: Summary,
      maxDocId: Long, containCap: Long, nContainmentPairs: Long,
      ledger: Map[String, Long] = Map.empty,
      datasetDir: Option[String] = None): Unit =
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/corpus_stats.json"),
      JsonIO.render(
        // the source dataset dir keys the ANN indexes' tombstone
        // tables, so incremental batches (which never see the corpus)
        // can still route their curation drops to the right indexes
        datasetDir.fold(Map.empty[String, Any])(d =>
          Map("dataset_dir" -> d)) ++
        Map(
        "n_input" -> summary.nInput,
        "n_after_quality" -> summary.nAfterQuality,
        "n_after_dedup" -> summary.nAfterDedup,
        "n_after_neardup" -> summary.nAfterNearDup,
        "n_after_decontam" -> summary.nAfterDecontam,
        "n_chunks" -> summary.nChunks,
        "n_packs" -> summary.nPacks,
        "packed_tokens" -> summary.packedTokens,
        "max_doc_id" -> maxDocId,
        "chunk_len" -> TextOps.ChunkLen,
        "chunk_stride" -> TextOps.ChunkStride,
        "pack_budget" -> Packing.PackBudget,
        // the cap is part of the containment CONTRACT (q248): the
        // incremental path must generate candidates under the SAME cap
        // the standing pair table was built with, so it rides in the
        // sidecar rather than being re-defaulted per run
        "containment_df_cap" -> containCap,
        "n_containment_pairs" -> nContainmentPairs) ++
        ledger.map { case (k, v) => (LedgerPrefix + k) -> (v: Any) }))

  /** Incremental run: process ONLY a new batch of documents against an
    * existing [[run]] output, producing the same final corpus a full
    * rebuild over (corpus ∪ batch) would — WITHOUT reading the corpus
    * at all. Everything the batch needs is in the standing artifacts a
    * [[run]] leaves behind: the content-hash index, the benchmark gram
    * set, and `max_doc_id` in the stats sidecar. The production shape
    * for a continuously ingested corpus:
    *
    *  1. the batch is quality-filtered and in-batch deduped
    *     ([[cleanDocs]], batch-sized);
    *  2. survivors are classified against the STANDING hash index
    *     (`hash_index`, maintained by [[run]] and appended here) via
    *     q66's classifier — `dup_of_corpus` docs drop without touching
    *     a single corpus row;
    *  3. genuinely new docs are decontaminated against the PERSISTED
    *     benchmark gram set (`bench_grams` — rebuilding it from raw
    *     docs would be a full corpus scan, because the benchmark
    *     membership predicate does not push down to parquet);
    *  4. their chunks append, and ONLY the doc_id-range pack groups the
    *     batch touches are repacked (group packing is independent and
    *     deterministic per group, so repacking the affected groups
    *     reproduces the full rebuild bit-for-bit). Untouched groups'
    *     packed rows are carried over as-is — with a partitioned
    *     layout this carry-over becomes dynamic partition overwrite
    *     and touches nothing.
    *
    * Two preconditions, both checked: batch ids continue AFTER the
    * corpus's recorded `max_doc_id` (append-only ingest — the min-id
    * survivor rule would otherwise need old rows rewritten), and the
    * batch adds no benchmark docs (existing corpus docs would need
    * retroactive decontamination — that is a rebuild by definition).
    *
    * CRASH SAFETY (the streaming contract): `foreachBatch` is
    * at-least-once — the stream checkpoint commits only after the
    * batch function returns, so a crash mid-run REPLAYS the batch.
    * Two mechanisms make the replay harmless:
    *
    *  - every write below is an idempotent OVERWRITE, not an append:
    *    the batch's chunk and hash-index files land under
    *    deterministic names keyed by the batch's min doc id
    *    ([[idempotentIngestWrite]]), and the packed swap is already a
    *    recompute-from-chunks overwrite — so a replay after a partial
    *    run rewrites the same files instead of duplicating rows;
    *  - the stats sidecar (whose funnel prefix is ADDITIVE and must
    *    not double-count) is the single commit point, and in stream
    *    mode it carries the ingest ledger: a replay AFTER the commit
    *    is recognized by `batchId <= ledger(checkpoint)` and skipped
    *    wholesale (returned with `skipped = true`) BEFORE the
    *    append-only precondition could wedge the stream.
    *
    * CLI mode (no `ledgerKey`) keeps the strict behavior: re-running a
    * committed batch fails the append-only require loudly — there a
    * duplicate submission is user error, not a delivery semantic.
    */
  def runIncremental(spark: SparkSession, outDir: String,
      batch: DataFrame, ledgerKey: Option[String] = None,
      batchId: Option[Long] = None): IncrementalResult = {
    import spark.implicits._
    val isBench = col("doc_id") % 50 === 0
    val batchDocs = batch.select(col("doc_id"), col("text"))

    val prev = graft.common.Json.obj(
      graft.common.Json.parseFile(s"$outDir/corpus_stats.json"))
    def prevN(k: String): Long =
      prev(k).asInstanceOf[Double].toLong
    val prevLedger: Map[String, Long] = prev.collect {
      case (k, v) if k.startsWith(LedgerPrefix) =>
        k.stripPrefix(LedgerPrefix) -> v.asInstanceOf[Double].toLong
    }

    // replay of an already-committed streaming batch: recognize and
    // skip before any precondition or write
    val committed = ledgerKey.flatMap(prevLedger.get)
    if (batchId.isDefined && committed.exists(_ >= batchId.get)) {
      val standing = Summary(
        prevN("n_input"), prevN("n_after_quality"),
        prevN("n_after_dedup"), prevN("n_after_neardup"),
        prevN("n_after_decontam"),
        prevN("n_chunks"), prevN("n_packs"), prevN("packed_tokens"))
      return IncrementalResult(standing, 0L, 0L, 0L, 0L, Nil,
        skipped = true,
        nContainmentPairs =
          prev.get("n_containment_pairs")
            .fold(0L)(_.asInstanceOf[Double].toLong))
    }

    require(batchDocs.filter(isBench).limit(1).count() == 0,
      "incremental mode cannot extend the benchmark slice — new " +
        "benchmark docs require a full rebuild (existing corpus docs " +
        "would need retroactive decontamination)")
    val maxOld = prevN("max_doc_id")
    val minBatch = batchDocs.agg(min(col("doc_id"))).collect()(0).getLong(0)
    require(minBatch > maxOld,
      s"incremental mode expects append-only ids: batch starts at " +
        s"$minBatch but the corpus already reaches $maxOld")

    val nBatch = batchDocs.count()
    val nBatchQuality = batchDocs.filter(passesQuality).count()

    // 1-2: clean the batch, then drop everything the standing index
    // already holds (classifier joins one batch-sized frame against the
    // aggregated index — never corpus rows). The <= maxOld filter pins
    // "standing" to the COMMITTED corpus: on a crash replay the batch's
    // own ingest file is already in the directory, and without the
    // filter the batch would classify as dup_of_corpus against itself
    val idx = spark.read.parquet(s"$outDir/hash_index")
      .filter(col("doc_id") <= maxOld)
    val cleanedBatch = cleanDocs(batchDocs)
    val hashedBatch = cleanedBatch.select(col("doc_id"),
      sha2(norm(col("text")), 256).as("content_hash"))
    val newHashes = graft.queries.Dedup.classifyAgainstIndex(hashedBatch,
        idx.select(col("content_hash"), col("doc_id").as("corpus_doc_id")))
      .filter(col("status") === "new")
      .select("doc_id", "content_hash")
    val newDocs = cleanedBatch.join(newHashes.select("doc_id"), "doc_id")
      // three consumers (count, signature pass, survivor anti-join)
      .localCheckpoint()
    val nNewDocs = newDocs.count()

    // 2b: near-dup the exact survivors against the STANDING corpus —
    // batch-sized signature pass only (Dedup.shingledDocCount pins that
    // no corpus text is re-shingled); candidates come from one band
    // join in which the BATCH side broadcasts and the persisted index
    // streams (at scale: one index scan per batch, ~1% of corpus bytes,
    // prunable further by bucketing the index on band_hash) — never a
    // corpus x corpus pair join. Standing ids precede batch ids
    // (append-only precondition), so standing-vs-batch pairs are
    // already (d1 < d2) and the greedy walk sees the standing doc as
    // the potential dropper, exactly as a full rebuild would.
    require(java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$outDir/lsh_index")),
      "standing corpus has no lsh_index (built before the near-dup " +
        "stage existed) — run a full rebuild to materialize it")
    require(prev.contains("containment_df_cap") &&
        java.nio.file.Files.exists(
          java.nio.file.Paths.get(s"$outDir/containment_pairs")) &&
        java.nio.file.Files.exists(
          java.nio.file.Paths.get(s"$outDir/overcap_grams")),
      "standing corpus has no containment artifacts (built before the " +
        "containment audit existed) — run a full rebuild to " +
        "materialize them")
    val containCap = prevN("containment_df_cap")
    val batchSig = graft.queries.Dedup.bandSetsFrom(spark, newDocs)
      .localCheckpoint()
    val batchBuckets = batchSig
      .select(col("doc_id"), posexplode(col("bands")))
      .toDF("doc_id", "band_id", "band_hash")
    // same <= maxOld pin as the hash index: a crash replay must not see
    // the batch's own leftover signatures as "standing" (they would
    // near-dup the batch against itself — and the vs-standing pair
    // orientation relies on standing ids preceding batch ids)
    val standing = spark.read.parquet(s"$outDir/lsh_index")
      .filter(col("doc_id") <= maxOld)
    val vsStanding = standing
      .select(col("doc_id"), posexplode(col("bands")))
      .toDF("doc_id", "band_id", "band_hash").as("x")
      .join(broadcast(batchBuckets.as("y")),
        col("x.band_id") === col("y.band_id") &&
          col("x.band_hash") === col("y.band_hash"))
      .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
      .distinct()
    val inBatch = batchBuckets.as("x")
      .join(batchBuckets.as("y"),
        col("x.band_id") === col("y.band_id") &&
          col("x.band_hash") === col("y.band_hash") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
      .distinct()
    val standingSets = standing.select(col("doc_id"), col("hs"), col("ng"))
    val batchSets = batchSig.select(col("doc_id"), col("hs"), col("ng"))
    // bounded collect: the batch's verified near-dup edges (true >= 0.8
    // pairs only — the nearDupSurvivors bound, batch-sized here)
    val nearPairs = graft.queries.Dedup
      .verifyCandidates(standingSets, batchSets, vsStanding)
      .unionByName(graft.queries.Dedup
        .verifyCandidates(batchSets, batchSets, inBatch))
      .select(col("d1"), col("d2")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nearNew = dropById(spark, newDocs,
      graft.queries.Dedup.greedyNearDupDrops(nearPairs))
      .localCheckpoint()
    val nNearNew = nearNew.count()
    // the batch survivors' signatures join the standing index
    // (idempotent, batch-keyed file)
    idempotentIngestWrite(spark,
      graft.queries.Dedup.bandSetsFrom(spark, nearNew),
      s"$outDir/lsh_index", minBatch)

    // 2c: CONTAINMENT audit maintenance under the CAP-STABLE contract:
    // after every batch, `containment_pairs` must equal a fresh q248
    // run over the survivor union with gram dfs computed on the FINAL
    // corpus. Dfs only grow under append-only ingest, so two
    // obligations per batch:
    //  (a) new candidates come only from grams under the cap in the
    //      POST-batch state — one standing-index scan restricted to the
    //      batch's grams (broadcast semi-join), never a corpus x corpus
    //      join, and zero re-shingling (the stored gram sets are the
    //      verify input);
    //  (b) standing pairs whose EVERY shared gram crossed the cap this
    //      batch are retracted (the tombstone pass): once all of a
    //      pair's witnesses are boilerplate, the pair is out of scope
    //      by the q248 contract on both engine and oracle sides.
    // Retraction is final — two fixed docs' shared gram set never
    // changes and dfs never shrink — which is why this greedy
    // maintenance reproduces the rebuild exactly (the alternative,
    // insertion-time dfs, would make the pair set depend on batch
    // order; see PLANS.md round-13 close).
    val nContainment = maintainContainment(spark, outDir, maxOld,
      minBatch, containCap)

    // 3: decontaminate against the persisted benchmark gram set
    val training = decontaminateWithGrams(spark,
      spark.read.parquet(s"$outDir/bench_grams"), nearNew, isBench)

    // auto-tombstone the batch's curation drops (exact dup-of-batch,
    // dup-of-corpus, near-dup victims, contamination) against the ANN
    // indexes of the standing corpus's recorded dataset. A pre-round-15
    // sidecar has no dataset_dir — those corpora predate the wiring and
    // keep the manual `IndexMain --tombstone` path.
    prev.get("dataset_dir").collect { case d: String => d }.foreach { d =>
      val exactDrops = droppedIds(batchDocs.filter(passesQuality), newDocs)
      val contamDrops = droppedIds(nearNew.filter(!isBench), training)
      tombstoneCurationDrops(spark, d,
        exactDrops ++ graft.queries.Dedup.greedyNearDupDrops(nearPairs) ++
          contamDrops)
    }

    // 4: append chunks (idempotent, batch-keyed file name), repack only
    // the touched groups
    val newChunks = TextOps.chunkDocs(spark, training)
    idempotentIngestWrite(spark, newChunks, s"$outDir/chunks", minBatch)
    val affected = newChunks
      .select(floor(col("doc_id") / Packing.GroupSize).as("g"))
      .distinct().as[Long].collect().sorted.toSeq
    if (affected.nonEmpty) {
      val groupOf = floor(col("doc_id") / Packing.GroupSize)
      val repacked = Packing.packChunks(
        spark.read.parquet(s"$outDir/chunks")
          .filter(groupOf.isin(affected: _*)))
      val carried = spark.read.parquet(s"$outDir/packed")
        .filter(!col("pack_group").isin(affected: _*))
      // the union reads the live packed dir → stage then swap
      carried.unionByName(repacked)
        .write.mode("overwrite").parquet(s"$outDir/packed_staging")
      swapDirs(spark, s"$outDir/packed_staging", s"$outDir/packed")
    }
    idempotentIngestWrite(spark,
      newHashes.select("content_hash", "doc_id"),
      s"$outDir/hash_index", minBatch)

    // funnel stats: additive prefix from the previous sidecar, suffix
    // recomputed from the materialized outputs (same code path as run)
    val packedRead = spark.read.parquet(s"$outDir/packed")
    val packStats = packedRead
      .agg(count_distinct(struct(col("pack_group"), col("pack_seq")))
          .as("n_packs"),
        sum(col("n_tokens")).as("tok"),
        count_distinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_rows"))
      .collect()(0)
    val summary = Summary(
      prevN("n_input") + nBatch,
      prevN("n_after_quality") + nBatchQuality,
      prevN("n_after_dedup") + nNewDocs,
      prevN("n_after_neardup") + nNearNew,
      packStats.getLong(2), packStats.getLong(3),
      packStats.getLong(0), packStats.getLong(1))
    val maxBatch = batchDocs.agg(max(col("doc_id"))).collect()(0).getLong(0)
    val ledger = (ledgerKey, batchId) match {
      case (Some(k), Some(b)) => prevLedger + (k -> b)
      case _ => prevLedger
    }
    writeStats(outDir, summary, math.max(maxOld, maxBatch), containCap,
      nContainment, ledger,
      // carry the source dataset key so every later batch keeps routing
      // its curation drops to the right indexes
      datasetDir = prev.get("dataset_dir").collect { case s: String => s })
    IncrementalResult(summary, nBatch, nBatchQuality, nNewDocs,
      nNearNew, affected, nContainmentPairs = nContainment)
  }

  /** The containment-audit maintenance pass of [[runIncremental]] (see
    * the 2c comment there for the cap-stable contract). Standing side =
    * lsh_index rows with doc_id <= `maxOld` (replay-safe: a crashed
    * attempt's own ingest file is already in the index directory);
    * batch side = the batch's just-committed ingest file read back, so
    * nothing is re-shingled. Returns the pair count after the swap.
    *
    * Replay idempotence: every input below is a deterministic function
    * of (standing rows <= maxOld, the batch file), EXCEPT `oldPairs`,
    * which after a post-swap crash already contains the batch's pairs
    * minus the retractions. That fixed point is preserved: batch pairs
    * were generated via an under-cap witness so the tombstone never
    * retracts them, re-retracting already-removed rows is a no-op, and
    * the final distinct() collapses the re-unioned batch pairs.
    */
  private def maintainContainment(spark: SparkSession, outDir: String,
      maxOld: Long, minBatch: Long, cap: Long): Long = {
    val allSets = spark.read.parquet(s"$outDir/lsh_index")
      .select(col("doc_id"), col("hs"), col("ng"))
    val standingSets = allSets.filter(col("doc_id") <= maxOld)
    val batchSets = spark.read.parquet(
        s"$outDir/lsh_index/ingest-$minBatch.parquet")
      .select(col("doc_id"), col("hs"), col("ng"))

    // gram dfs, batch grams only: batch postings are batch-sized; the
    // standing postings come from ONE index scan semi-joined (broadcast)
    // to the batch's gram set — never a corpus-wide gram aggregate
    val batchPost = batchSets
      .select(col("doc_id"), explode(col("hs")).as("h"))
    val batchDf = batchPost.groupBy("h").agg(count(lit(1)).as("bdf"))
    // two consumers (df aggregate, candidate join) — checkpoint so the
    // index scan runs once
    val standPost = standingSets
      .select(col("doc_id"), explode(col("hs")).as("h"))
      .join(broadcast(batchDf.select("h")), "h")
      .localCheckpoint()
    val standDf = standPost.groupBy("h").agg(count(lit(1)).as("sdf"))
    // three consumers (under-cap filter twice, crossing set)
    val gramState = batchDf.join(standDf, Seq("h"), "left")
      .select(col("h"), col("bdf"), coalesce(col("sdf"), lit(0L)).as("sdf"))
      .withColumn("ndf", col("bdf") + col("sdf"))
      .localCheckpoint()
    val underCap = gramState.filter(col("ndf") <= cap).select("h")

    // (a) new candidates via grams under the POST-batch cap: standing
    // ids precede batch ids (append-only), so vs-standing pairs are
    // already (d1 < d2)
    val bp = batchPost.join(broadcast(underCap), "h")
    val vsStand = standPost.as("x")
      .join(broadcast(bp).as("y"), col("x.h") === col("y.h"))
      .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
      .distinct()
    val inBatch = bp.as("x")
      .join(bp.as("y"), col("x.h") === col("y.h") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
      .distinct()
    val newPairs = Dedup
      .containmentVerifyAsym(standingSets, batchSets, vsStand)
      .unionByName(
        Dedup.containmentVerifyAsym(batchSets, batchSets, inBatch))

    // (b) tombstone: grams crossing the cap this batch — bounded by the
    // batch's distinct gram count, so the collect is batch-sized (the
    // near-dup pair-collect class)
    val crossing = gramState
      .filter(col("ndf") > cap && col("sdf") <= cap)
      .select("h").localCheckpoint() // batch-bounded rows
    val crossArr = crossing.collect().map(_.getLong(0))
    val oldPairs = spark.read.parquet(s"$outDir/containment_pairs")
    val keptOld =
      if (crossArr.isEmpty) oldPairs
      else {
        // affected = old pairs whose SHARED gram set touches a crossing
        // gram (any other pair's witnesses did not change category);
        // the pair table is small (true >= 0.9 pairs), so it broadcasts
        // through the set joins — verifyCandidates discipline. The
        // crossing grams stay a DATAFRAME and the touch test is
        // explode(sh) + broadcast semi-join on h — a literal-array
        // arrays_overlap would build a CreateArray expression tree the
        // size of the crossing set and evaluate O(|sh|x|crossing|) per
        // row, risking codegen fallback on a cap-boundary-heavy batch
        val withInner = allSets
          .select(col("doc_id").as("inner_doc"), col("hs").as("hs1"))
          .join(broadcast(oldPairs), "inner_doc")
        val affected = allSets
          .select(col("doc_id").as("outer_doc"), col("hs").as("hs2"))
          .join(broadcast(withInner), "outer_doc")
          .withColumn("sh", array_intersect(col("hs1"), col("hs2")))
          .withColumn("ch", explode(col("sh")))
          .join(broadcast(crossing.withColumnRenamed("h", "ch")),
            Seq("ch"), "left_semi")
          .select("inner_doc", "outer_doc", "sh")
          .distinct()
          .localCheckpoint()
        // a pair stays iff >= 1 shared gram remains under the cap in
        // the NEW state: overcap_new = standing overcap ∪ crossing
        val overcapNew = spark.read.parquet(s"$outDir/overcap_grams")
          .select("h")
          .unionByName(gramState
            .filter(col("ndf") > cap && col("sdf") <= cap).select("h"))
        val stillValid = affected
          .select(col("inner_doc"), col("outer_doc"),
            explode(col("sh")).as("h"))
          .join(overcapNew, Seq("h"), "left_anti")
          .select("inner_doc", "outer_doc").distinct()
        val retracted = affected.select("inner_doc", "outer_doc")
          .join(stillValid, Seq("inner_doc", "outer_doc"), "left_anti")
        oldPairs.join(broadcast(retracted),
          Seq("inner_doc", "outer_doc"), "left_anti")
      }

    // stage-then-swap (the plan reads the live pair table); distinct()
    // collapses a replayed batch's re-unioned pairs
    keptOld.unionByName(newPairs).distinct()
      .write.mode("overwrite")
      .parquet(s"$outDir/containment_pairs_staging")
    swapDirs(spark, s"$outDir/containment_pairs_staging",
      s"$outDir/containment_pairs")
    // the crossing grams join the standing overcap set (idempotent,
    // batch-keyed file; skipped when nothing crossed)
    if (crossArr.nonEmpty) {
      import spark.implicits._
      idempotentIngestWrite(spark, crossArr.toSeq.toDF("h"),
        s"$outDir/overcap_grams", minBatch)
    }
    spark.read.parquet(s"$outDir/containment_pairs").count()
  }

  /** Idempotent ingest append: the batch's rows land as ONE parquet
    * file under a deterministic name keyed by the batch's min doc id
    * (`ingest-<minId>.parquet` — unique per batch because ingest is
    * append-only, identical across replays of the SAME batch). A
    * replayed crash recovery overwrites the file instead of appending
    * a duplicate part file, which is what makes the whole incremental
    * run safe to re-execute before its sidecar commit. One file per
    * batch is the right granularity: batches are bounded, and a
    * partitioned production layout would make this a dynamic-partition
    * overwrite instead.
    */
  private def idempotentIngestWrite(spark: SparkSession, df: DataFrame,
      targetDir: String, batchMinId: Long): Unit = {
    val staging = s"$targetDir-staging-$batchMinId"
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    val conf = spark.sparkContext.hadoopConfiguration
    val st = new org.apache.hadoop.fs.Path(staging)
    val fs = st.getFileSystem(conf)
    val parts = fs.listStatus(st)
      .map(_.getPath).filter(_.getName.endsWith(".parquet"))
    require(parts.length == 1,
      s"idempotent ingest write: expected 1 part file, got ${parts.length}")
    val target = new org.apache.hadoop.fs.Path(
      s"$targetDir/ingest-$batchMinId.parquet")
    if (fs.exists(target)) fs.delete(target, false)
    require(fs.rename(parts(0), target),
      s"ingest write: rename ${parts(0)} -> $target failed")
    fs.delete(st, true)
    ()
  }

  /** Replace `target` with `staging` (both directories) — the local
    * stand-in for a dynamic-partition-overwrite commit.
    */
  private def swapDirs(spark: SparkSession, staging: String,
      target: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val st = new org.apache.hadoop.fs.Path(staging)
    val tg = new org.apache.hadoop.fs.Path(target)
    val fs = tg.getFileSystem(conf)
    fs.delete(tg, true)
    require(fs.rename(st, tg), s"swap failed: $staging -> $target")
  }
}
