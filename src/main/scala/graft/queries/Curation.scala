package graft.queries

import graft.QueryDef
import graft.common.Tables.load
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Training-export curation operators: the ordering/sampling/monitoring
  * steps between a cleaned corpus and a training run.
  *
  * All randomness is an affine modular hash of the row key — a SEEDED,
  * engine-portable permutation (both engines evaluate the same integer
  * arithmetic), so every "random" choice here is reproducible run-over-
  * run and auditable by the DuckDB oracle. Intermediates are kept under
  * 2^62: the multiplier is applied to `doc_id % P`, never raw ids, so a
  * 100 TB corpus with 10^12 ids cannot overflow i64 (DuckDB would raise
  * on overflow where Spark wraps — the reduction keeps both engines in
  * defined territory).
  */
object Curation {

  /** Modulus (prime) and multiplier (Knuth 2654435761) of the shuffle
    * hash; epoch seed is the additive constant.
    */
  private val P = 1000000007L
  private val A = 2654435761L
  private val Seed = 12345L

  /** The seed shifts the id BEFORE the multiplicative mix — an additive
    * constant after the multiply would shift every key uniformly and
    * (barring wraparound) leave the ORDER unchanged, i.e. every seed
    * would produce the same permutation. Shift-then-multiply makes each
    * seed a genuinely different total order (CurationSpec pins it).
    */
  private def shuffleKeyWith(id: org.apache.spark.sql.Column, seed: Long) =
    ((id % P + seed % P) % P) * A % P

  private def shuffleKey(id: org.apache.spark.sql.Column) =
    shuffleKeyWith(id, Seed)

  private def shuffleKeySql(id: String) =
    s"(($id % $P + ${Seed % P}) % $P) * $A % $P"

  /** q100: deterministic epoch shuffle — the global training-data order
    * for one epoch. Every doc gets a seeded hash key and its 0-based
    * POSITION in the key's total order; an exporter streams position
    * ranges to shards.
    *
    * Scale: the naive rendering (ROW_NUMBER over a global ORDER BY) is a
    * single-partition window — dead at 100 TB. This computes the same
    * rank the scalable way: range-repartition on the key (Spark's sort
    * machinery: sampled range boundaries, so partitions are balanced),
    * sort within partitions, then assign contiguous indices from
    * per-partition offsets (`zipWithIndex`: one count job over partition
    * sizes + one map — the only driver state is one Long per partition).
    * RDD use is deliberate: this is genuine per-partition imperative
    * logic with no Catalyst equivalent that avoids the one-partition
    * window.
    */
  /** The epoch order of a keyed frame: seeded hash key + global 0-based
    * position via range-repartition, in-partition sort, and
    * per-partition offset assignment. Shared by q100 and the shard
    * export; any frame with a unique long `doc_id` works.
    */
  private[graft] def epochOrder(docs: org.apache.spark.sql.DataFrame,
      seed: Long): org.apache.spark.sql.DataFrame = {
    val spark = docs.sparkSession
    val keyed = docs
      .select(col("doc_id"), shuffleKeyWith(col("doc_id"), seed).as("shuffle_key"))
    val sorted = keyed
      .repartitionByRange(col("shuffle_key"), col("doc_id"))
      .sortWithinPartitions("shuffle_key", "doc_id")
    val schema = sorted.schema.add("position", LongType, nullable = false)
    val indexed = sorted.rdd.zipWithIndex.map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ i)
    }
    spark.createDataFrame(indexed, schema)
  }

  /** Epoch shard assignment for a training export: every doc gets its
    * epoch position and a round-robin shard (position % numShards —
    * balanced to ±1 row by construction, no second shuffle). Writing
    * `partitionBy("shard")` yields numShards files whose within-shard
    * read order IS the epoch order; a new seed is a new epoch.
    */
  def epochShards(docs: org.apache.spark.sql.DataFrame, seed: Long,
      numShards: Int): org.apache.spark.sql.DataFrame =
    epochOrder(docs, seed)
      .withColumn("shard", (col("position") % numShards).cast("int"))

  private val q100 = QueryDef(
    (s, d) => epochOrder(load(s, d, "documents"), Seed),
    Some(s"""SELECT doc_id,
              ${shuffleKeySql("doc_id")} AS shuffle_key,
              CAST(ROW_NUMBER() OVER (
                ORDER BY ${shuffleKeySql("doc_id")}, doc_id) - 1 AS BIGINT)
                AS position
            FROM documents"""),
    "deterministic epoch shuffle: seeded hash order + scalable global rank [training-export]")

  /** q101: exact-k stratified sample — "exactly K docs per language",
    * chosen uniformly-without-replacement but reproducibly (hash order
    * stands in for random order). The fraction-based sampler (q60) gives
    * binomial stratum sizes; training mixes usually want exact quotas.
    *
    * Scale: one shuffle on the stratum key; within each stratum the
    * window ranks by hash. Strata are few (languages/sources), so the
    * per-stratum partition is the corpus/|strata| — for heavy-hitter
    * strata the same query runs after a cheap pre-filter on the hash
    * (keep key < K/|stratum| * margin * P), which bounds the ranked set
    * without changing the result; the direct form is kept here because
    * the oracle must mirror it exactly.
    */
  private val SampleK = 50
  private val q101 = QueryDef(
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val keyed = load(s, d, "documents")
        .select(col("doc_id"), col("lang"),
          shuffleKey(col("doc_id")).as("k"))
      keyed
        .withColumn("sample_rank", row_number().over(
          Window.partitionBy("lang").orderBy(col("k"), col("doc_id"))))
        .filter(col("sample_rank") <= SampleK)
        .select(col("doc_id"), col("lang"), col("sample_rank"))
    },
    Some(s"""WITH keyed AS (
              SELECT doc_id, lang, ${shuffleKeySql("doc_id")} AS k
              FROM documents),
            r AS (
              SELECT doc_id, lang,
                CAST(ROW_NUMBER() OVER (
                  PARTITION BY lang ORDER BY k, doc_id) AS INTEGER)
                  AS sample_rank
              FROM keyed)
            SELECT doc_id, lang, sample_rank FROM r
            WHERE sample_rank <= $SampleK"""),
    "exact-k per-stratum sample: seeded hash order, reproducible quotas [sampling]")

  /** q102: event-rate anomaly detection — per event type, z-score each
    * hourly count against that type's own hourly distribution and flag
    * |z| > 2. The ingest-monitoring query a pipeline runs before
    * trusting a day's data.
    *
    * Determinism discipline: mean/variance come from INTEGER sums
    * (n, Σx, Σx²) with the final double arithmetic written in the
    * identical expression order on both engines — never stddev_samp(),
    * whose internal accumulation order is engine-specific. Zero/negative
    * variance (all-equal counts, or FP cancellation) pins z to 0.0 on
    * both sides.
    *
    * Scale: two map-side-combined aggregations (hours × types, then
    * types) and a broadcast join of the per-type stats back onto the
    * hourly grid — no shuffle of raw events beyond the first agg.
    */
  /** Per-type hourly counts of a batch events frame. */
  private[graft] def hourlyGrid(events: org.apache.spark.sql.DataFrame) =
    events
      .groupBy(date_trunc("hour", col("ts")).as("hour_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"))

  /** Per-type integer-sum baseline stats (n, Σx, Σx²) over an hourly
    * grid — the mergeable state the z-score derives from.
    */
  private[graft] def typeStats(hourly: org.apache.spark.sql.DataFrame) =
    hourly.groupBy("event_type").agg(
      count(lit(1)).as("n_hours"),
      sum("n_events").as("sum_n"),
      sum(col("n_events") * col("n_events")).as("sum_n2"))

  /** The z-score expression over (n_events, n_hours, sum_n, sum_n2)
    * columns — shared verbatim by the batch query and the streaming
    * alert path so both flag identically.
    */
  private[graft] def zScore: org.apache.spark.sql.Column = {
    val mean = col("sum_n").cast("double") / col("n_hours")
    val varS = (col("sum_n2").cast("double") -
      col("sum_n").cast("double") * col("sum_n") / col("n_hours")) /
      (col("n_hours") - 1)
    when(col("n_hours") <= 1 || varS <= 0.0, 0.0)
      .otherwise((col("n_events").cast("double") - mean) / sqrt(varS))
  }

  private val q102 = QueryDef(
    (s, d) => {
      val hourly = hourlyGrid(load(s, d, "events"))
      val z = zScore
      hourly.join(broadcast(typeStats(hourly)), "event_type")
        .select(col("event_type"), col("hour_start"), col("n_events"),
          z.as("z_score"), (abs(z) > 2.0).as("is_anomaly"))
    },
    Some("""WITH hourly AS (
              SELECT date_trunc('hour', ts) AS hour_start, event_type,
                COUNT(*) AS n_events
              FROM events GROUP BY 1, 2),
            stats AS (
              SELECT event_type, COUNT(*) AS n_hours,
                SUM(n_events) AS sum_n, SUM(n_events * n_events) AS sum_n2
              FROM hourly GROUP BY 1)
            SELECT h.event_type, h.hour_start,
              CAST(h.n_events AS BIGINT) AS n_events,
              CASE WHEN s.n_hours <= 1 OR
                (CAST(s.sum_n2 AS DOUBLE) -
                 CAST(s.sum_n AS DOUBLE) * s.sum_n / s.n_hours) /
                (s.n_hours - 1) <= 0.0 THEN 0.0
              ELSE (CAST(h.n_events AS DOUBLE) -
                    CAST(s.sum_n AS DOUBLE) / s.n_hours) /
                sqrt((CAST(s.sum_n2 AS DOUBLE) -
                      CAST(s.sum_n AS DOUBLE) * s.sum_n / s.n_hours) /
                     (s.n_hours - 1)) END AS z_score,
              abs(CASE WHEN s.n_hours <= 1 OR
                (CAST(s.sum_n2 AS DOUBLE) -
                 CAST(s.sum_n AS DOUBLE) * s.sum_n / s.n_hours) /
                (s.n_hours - 1) <= 0.0 THEN 0.0
              ELSE (CAST(h.n_events AS DOUBLE) -
                    CAST(s.sum_n AS DOUBLE) / s.n_hours) /
                sqrt((CAST(s.sum_n2 AS DOUBLE) -
                      CAST(s.sum_n AS DOUBLE) * s.sum_n / s.n_hours) /
                     (s.n_hours - 1)) END) > 2.0 AS is_anomaly
            FROM hourly h JOIN stats s USING (event_type)"""),
    "event-rate anomaly: integer-sum z-scores per type/hour [monitoring]")

  /** q109: sequence-length bucketing — the batch-shape audit a training
    * exporter runs before fixing pad-to-length buckets. Every doc lands
    * in the smallest power-of-two bucket that holds its whitespace token
    * count; per bucket the query reports docs, real tokens, and the
    * padding the bucket would add (bucket_len − n_tokens summed), i.e.
    * the compute wasted at that bucket granularity. All integer
    * arithmetic except the final waste fraction (one int/int double
    * division — deterministic across engines).
    *
    * Scale: one narrow map over the corpus then a ≤|buckets|-row agg —
    * map-side combined, effectively shuffle-free at any table size.
    */
  private val SeqBuckets = Seq(16, 32, 64, 128)
  private val q109 = QueryDef(
    (s, d) => {
      import graft.functions.Text
      val n = size(Text.words(col("text")))
      val bucket = SeqBuckets.reverse.tail.foldLeft(
        lit(SeqBuckets.last)) { (acc, b) =>
        when(n <= b, b).otherwise(acc)
      }
      load(s, d, "documents")
        .select(bucket.as("seq_bucket"), n.as("n_tokens"))
        .groupBy("seq_bucket")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_tokens").as("total_tokens"),
          sum(col("seq_bucket") - col("n_tokens")).as("total_padding"))
        .withColumn("pad_frac",
          col("total_padding").cast("double") /
            (col("seq_bucket").cast("double") * col("n_docs")))
    },
    Some {
      val words =
        "len(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '))"
      val bucket = s"""CASE WHEN $words <= 16 THEN 16
                WHEN $words <= 32 THEN 32
                WHEN $words <= 64 THEN 64
                ELSE 128 END"""
      s"""WITH b AS (
            SELECT $bucket AS seq_bucket, CAST($words AS BIGINT) AS n_tokens
            FROM documents)
          SELECT seq_bucket,
            CAST(count(*) AS BIGINT) AS n_docs,
            CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
            CAST(SUM(seq_bucket - n_tokens) AS BIGINT) AS total_padding,
            CAST(SUM(seq_bucket - n_tokens) AS DOUBLE) /
              (seq_bucket * CAST(count(*) AS DOUBLE)) AS pad_frac
          FROM b GROUP BY 1"""
    },
    "sequence-length buckets: power-of-two pad buckets + waste audit [training-export]")

  val all: Seq[(String, QueryDef)] = Seq(
    "q100_epoch_shuffle" -> q100,
    "q101_stratified_exact_k" -> q101,
    "q102_event_rate_anomaly" -> q102,
    "q109_seqlen_buckets" -> q109)
}
