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
      nAfterDecontam: Long, nChunks: Long, nPacks: Long,
      packedTokens: Long)

  private[pipeline] val MinWords = 20
  private[pipeline] val MinDistinctRatio = 0.3

  /** Quality floor + exact dedup in one plan (q56's composition). */
  private[graft] def cleanDocs(docs: DataFrame): DataFrame = {
    val w = words(col("text"))
    val keep = Window.partitionBy(col("content_hash"))
      .orderBy(col("doc_id").asc)
    docs
      .select(col("doc_id"), col("text"),
        sha2(norm(col("text")), 256).as("content_hash"),
        size(w).as("n_words"),
        (size(array_distinct(w)).cast("double") / size(w))
          .as("distinct_ratio"))
      .filter(col("n_words") >= MinWords &&
        col("distinct_ratio") >= MinDistinctRatio)
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
      isBench: org.apache.spark.sql.Column): DataFrame = {
    val audited = raw.filter(isBench).select("doc_id", "text")
      .unionByName(cleaned.filter(!isBench).select("doc_id", "text"))
    cleaned.filter(!isBench).join(
      Dedup.decontaminationFrom(s, audited, isBench)
        .filter(col("is_contaminated"))
        .select("doc_id"),
      Seq("doc_id"), "left_anti")
  }

  /** Run the full preparation against a testdata dir, writing
    * `chunks` + `packed` parquet and `corpus_stats.json` under outDir.
    * Benchmark slice: doc_id ≡ 0 mod 50 (q69's convention).
    */
  def run(spark: SparkSession, sfDir: String, outDir: String): Summary = {
    val docs = graft.common.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val nInput = docs.count()

    val cleaned = cleanDocs(docs)
    val nQuality = {
      // quality floor alone (pre-dedup), for the funnel stats
      val w = words(col("text"))
      docs.filter(size(w) >= MinWords &&
        (size(array_distinct(w)).cast("double") / size(w))
          >= MinDistinctRatio).count()
    }
    val nDedup = cleaned.count()

    val training =
      decontaminate(spark, docs, cleaned, col("doc_id") % 50 === 0)

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
    val summary = Summary(nInput, nQuality, nDedup, nDecontam,
      nChunks, packStats.getLong(0), packStats.getLong(1))

    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/corpus_stats.json"),
      JsonIO.render(Map(
        "n_input" -> summary.nInput,
        "n_after_quality" -> summary.nAfterQuality,
        "n_after_dedup" -> summary.nAfterDedup,
        "n_after_decontam" -> summary.nAfterDecontam,
        "n_chunks" -> summary.nChunks,
        "n_packs" -> summary.nPacks,
        "packed_tokens" -> summary.packedTokens,
        "chunk_len" -> TextOps.ChunkLen,
        "chunk_stride" -> TextOps.ChunkStride,
        "pack_budget" -> Packing.PackBudget)))
    summary
  }
}
