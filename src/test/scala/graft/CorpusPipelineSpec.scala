package graft

import graft.pipeline.CorpusPipeline
import graft.queries.Packing
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end corpus preparation: quality → dedup → decontaminate →
  * chunk → pack, against real testdata into a temp dir.
  */
class CorpusPipelineSpec extends AnyFunSuite with SparkSpec {

  private lazy val out =
    java.nio.file.Files.createTempDirectory("corpus").toString
  private lazy val summary = CorpusPipeline.run(spark, Sf, out)

  test("funnel counts are monotone and nothing is invented") {
    assert(summary.nInput > 0)
    assert(summary.nAfterQuality <= summary.nInput)
    assert(summary.nAfterDedup <= summary.nAfterQuality)
    assert(summary.nAfterDecontam <= summary.nAfterDedup)
    // every surviving doc chunks into >= 1 chunk
    assert(summary.nChunks >= summary.nAfterDecontam)
    assert(summary.nPacks > 0 && summary.nPacks <= summary.nChunks)
  }

  test("benchmark docs are excluded from the packed corpus") {
    val ids = spark.read.parquet(s"$out/packed")
      .select("doc_id").distinct().collect().map(_.getLong(0))
    assert(ids.nonEmpty && ids.forall(_ % 50 != 0))
  }

  test("packs respect the token budget (oversized singletons allowed)") {
    val bad = spark.read.parquet(s"$out/packed")
      .groupBy("pack_group", "pack_seq")
      .agg(sum("n_tokens").as("tok"), count(lit(1)).as("n"))
      .filter(col("tok") > Packing.PackBudget && col("n") > 1)
      .count()
    assert(bad == 0)
  }

  test("stats sidecar matches the summary") {
    val json = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/corpus_stats.json"))
    assert(json.contains(s""""n_chunks": ${summary.nChunks}""") ||
      json.contains(s""""n_chunks":${summary.nChunks}"""))
    assert(json.contains(summary.packedTokens.toString))
  }

  test("rerun overwrites cleanly and is deterministic") {
    val again = CorpusPipeline.run(spark, Sf, out)
    assert(again == summary)
  }
}
