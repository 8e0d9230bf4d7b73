package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Training-export curation operators (q100–q102): epoch shuffle,
  * exact-k stratified sampling, event-rate anomalies.
  */
class CurationSpec extends AnyFunSuite with SparkSpec {

  private val SfDir = "/root/testdata/sf0.001"
  private def run(name: String) = SparkEntry.queries(name)(spark, SfDir)

  test("q100 epoch shuffle assigns a contiguous 0-based permutation") {
    val df = run("q100_epoch_shuffle").cache()
    val n = df.count()
    // positions are exactly 0..n-1, each once
    val posCheck = df.agg(
      min("position").as("mn"), max("position").as("mx"),
      countDistinct("position").as("nd")).head()
    assert(posCheck.getLong(0) == 0L)
    assert(posCheck.getLong(1) == n - 1)
    assert(posCheck.getLong(2) == n)
    // position order IS the (shuffle_key, doc_id) order
    val misordered = df.as("a").join(df.as("b"),
      col("a.position") === col("b.position") - 1)
      .filter(col("a.shuffle_key") > col("b.shuffle_key") ||
        (col("a.shuffle_key") === col("b.shuffle_key") &&
          col("a.doc_id") > col("b.doc_id")))
      .count()
    assert(misordered == 0)
    df.unpersist()
  }

  test("q100 is deterministic across executions") {
    val a = run("q100_epoch_shuffle").orderBy("position")
      .collect().map(_.toSeq).toSeq
    val b = run("q100_epoch_shuffle").orderBy("position")
      .collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("q100 actually permutes (not identity order)") {
    val df = run("q100_epoch_shuffle")
    // if position tracked doc_id order, the shuffle did nothing
    val inversions = df.filter(col("position") =!= col("doc_id")).count()
    assert(inversions > 0)
  }

  test("q101 takes exactly min(K, stratum size) per stratum") {
    val docs = graft.common.Tables.load(spark, SfDir, "documents")
    val sizes = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = run("q101_stratified_exact_k")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sampled.keySet == sizes.keySet)
    sampled.foreach { case (lang, got) =>
      assert(got == math.min(50L, sizes(lang)), s"stratum $lang")
    }
  }

  test("q101 sample is deterministic and rank-consistent") {
    val a = run("q101_stratified_exact_k").orderBy("lang", "sample_rank")
      .collect().map(_.toSeq).toSeq
    val b = run("q101_stratified_exact_k").orderBy("lang", "sample_rank")
      .collect().map(_.toSeq).toSeq
    assert(a == b)
    // ranks within each stratum are 1..k with no gaps
    val bad = run("q101_stratified_exact_k")
      .groupBy("lang").agg(count(lit(1)).as("n"),
        max("sample_rank").as("mx"), min("sample_rank").as("mn"))
      .filter(col("mx") =!= col("n") || col("mn") =!= 1).count()
    assert(bad == 0)
  }

  test("q102 z-scores sum to ~zero within each event type") {
    val perType = run("q102_event_rate_anomaly")
      .groupBy("event_type").agg(sum("z_score").as("sz"),
        count(lit(1)).as("n_hours")).collect()
    assert(perType.nonEmpty)
    perType.foreach { r =>
      assert(math.abs(r.getDouble(1)) < 1e-6,
        s"type ${r.getString(0)}: z-sum ${r.getDouble(1)}")
    }
  }

  test("q102 flags exactly the |z| > 2 rows") {
    val df = run("q102_event_rate_anomaly")
    val mismatch = df.filter(
      (abs(col("z_score")) > 2.0) =!= col("is_anomaly")).count()
    assert(mismatch == 0)
    // covers the full hourly grid: rows = distinct (type, hour) pairs
    val hourly = graft.common.Tables.load(spark, SfDir, "events")
      .select(date_trunc("hour", col("ts")), col("event_type"))
      .distinct().count()
    assert(df.count() == hourly)
  }

  test("epochShards balances round-robin shards and preserves the epoch order") {
    val docs = graft.common.Tables.load(spark, SfDir, "documents")
    val n = docs.count()
    val sharded = graft.queries.Curation.epochShards(docs, seed = 7L, numShards = 8)
      .cache()
    // balanced to +/-1 by construction
    val sizes = sharded.groupBy("shard").count().collect().map(_.getLong(1))
    assert(sizes.length == 8 && sizes.sum == n)
    assert(sizes.max - sizes.min <= 1)
    // every doc exactly once
    assert(sharded.select("doc_id").distinct().count() == n)
    sharded.unpersist()
  }

  test("different seeds give different epoch orders") {
    val docs = graft.common.Tables.load(spark, SfDir, "documents")
    def order(seed: Long) = graft.queries.Curation.epochOrder(docs, seed)
      .orderBy("position").select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(order(1L) != order(2L))
    assert(order(1L) == order(1L))
  }

  test("q100 plan has no single-partition global window") {
    val plan = run("q100_epoch_shuffle").queryExecution.executedPlan.toString
    // the scalable rank must come from range partitioning, not a Window
    // over an empty partition spec (which collapses to one partition)
    assert(!plan.contains("Window"), s"unexpected window in plan:\n$plan")
  }
}
