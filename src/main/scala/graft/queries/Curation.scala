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
  /** The hash modulus, exposed for estimators that need the key range
    * (q241's KMV distinct estimate scales the k-th minimum by P). The
    * multiplier A is coprime to the prime P, so the keyed hash is a
    * BIJECTION on [0, P) — k-min order statistics over it behave as a
    * uniform random permutation, which is exactly the KMV assumption.
    */
  private[graft] def hashMod: Long = P

  private[graft] def shuffleKeyWith(id: org.apache.spark.sql.Column, seed: Long) =
    ((id % P + seed % P) % P) * A % P

  private def shuffleKey(id: org.apache.spark.sql.Column) =
    shuffleKeyWith(id, Seed)

  private def shuffleKeySql(id: String) =
    shuffleKeySqlWith(id, Seed)

  private[graft] def shuffleKeySqlWith(id: String, seed: Long) =
    s"(($id % $P + ${seed % P}) % $P) * $A % $P"

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
      seed: Long): org.apache.spark.sql.DataFrame =
    globalOrder(
      docs.select(col("doc_id"),
        shuffleKeyWith(col("doc_id"), seed).as("shuffle_key")),
      Seq(col("shuffle_key"), col("doc_id")))

  /** Global 0-based position of every row under a total order — the
    * scalable replacement for a one-partition `ROW_NUMBER() OVER
    * (ORDER BY ...)` window: range-repartition on the sort columns
    * (sampled boundaries → balanced partitions), sort within
    * partitions, then assign contiguous indices from per-partition
    * offsets (`zipWithIndex`: one count job over partition sizes + one
    * map; driver state is one Long per partition). The sort columns
    * must form a total order (include a unique tiebreaker) or the
    * assignment within ties is partition-dependent.
    */
  private[graft] def globalOrder(df: org.apache.spark.sql.DataFrame,
      sortCols: Seq[org.apache.spark.sql.Column])
      : org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
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

  /** q111: weight-proportional Bernoulli sampling — include each doc
    * with probability min(1, K·wᵢ/W) (weight = n_chars: char-budget
    * sampling, expected K docs), decided by the seeded portable hash so
    * the draw is reproducible and ORACLE-CHECKABLE: u < p·P with u the
    * integer hash, p the double inclusion probability — both engines
    * evaluate the identical expression, so the sample is the same row
    * set every run, everywhere.
    *
    * Scale: one tiny total-weight aggregate broadcast back over a
    * narrow scan — no shuffle of the corpus, no sort, no state. (Exact-k
    * weighted reservoirs need a top-k by u^(1/w) — float-order
    * sensitive; the Bernoulli form is what survives an engine-portable
    * determinism contract.)
    */
  private val WSeed = 777L
  private val WTargetK = 100
  private val q111 = QueryDef(
    (s, d) => {
      val docs = load(s, d, "documents").select(col("doc_id"), col("n_chars"))
      val w = docs.agg(sum("n_chars").as("w_total"))
      docs.crossJoin(broadcast(w))
        .withColumn("u", shuffleKeyWith(col("doc_id"), WSeed))
        .withColumn("p_include",
          least(lit(1.0), lit(WTargetK.toDouble) * col("n_chars") / col("w_total")))
        .filter(col("u") < col("p_include") * P)
        .select("doc_id", "n_chars", "p_include")
    },
    Some(s"""WITH w AS (
              SELECT CAST(SUM(n_chars) AS BIGINT) AS w_total FROM documents)
            SELECT doc_id, n_chars,
              least(1.0, $WTargetK.0 * n_chars / w_total) AS p_include
            FROM documents, w
            WHERE ${shuffleKeySqlWith("doc_id", WSeed)} <
              least(1.0, $WTargetK.0 * n_chars / w_total) * $P"""),
    "weighted Bernoulli sample: seeded hash draw vs char-budget probability [sampling]")

  /** q112: quantile normalization of a per-doc signal (n_chars as the
    * quality proxy): each doc's percentile within its language stratum
    * AND its global percentile — the "same scale across strata"
    * transform a mixing stage applies before cross-source thresholds.
    *
    * Scale: the per-stratum percentile is a bounded-cardinality window
    * (strata are few). The GLOBAL percentile deliberately avoids the
    * one-partition `OVER (ORDER BY ...)` window: it reuses the
    * range-repartitioned global-position primitive (q100's machinery)
    * and derives percent_rank as position/(N−1) — exact integers into
    * one double division, so it matches the window definition bitwise.
    */
  private val q112 = QueryDef(
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = load(s, d, "documents").select("doc_id", "lang", "n_chars")
      val n = docs.count() // one job; denominator of the global rank
      val withLang = docs.withColumn("lang_pr", percent_rank().over(
        Window.partitionBy("lang").orderBy(col("n_chars"), col("doc_id"))))
      globalOrder(withLang, Seq(col("n_chars"), col("doc_id")))
        .withColumn("global_pr",
          col("position").cast("double") / lit(n - 1).cast("double"))
        .select("doc_id", "lang", "n_chars", "lang_pr", "global_pr")
    },
    Some("""SELECT doc_id, lang, n_chars,
              CAST(PERCENT_RANK() OVER (
                PARTITION BY lang ORDER BY n_chars, doc_id) AS DOUBLE)
                AS lang_pr,
              CAST(PERCENT_RANK() OVER (
                ORDER BY n_chars, doc_id) AS DOUBLE) AS global_pr
            FROM documents"""),
    "quantile normalization: per-stratum + scalable global percentiles [curation]")

  /** q116: temperature-flattened source mixing (α = 1/2, i.e. T = 2 in
    * the n^(1/T) convention) — downsample each language stratum
    * so post-sampling counts are ∝ √n_s, the standard multilingual
    * rebalancing step before training export (the corpus's `source`
    * key is deliberately uniform in the testdata; `lang` carries the
    * real skew, en ≈ 40%). Per-stratum keep rate is
    * r_s = √(n_min / n_s): expected kept = √(n_s · n_min) ∝ √n_s, and
    * the smallest source keeps everything (r = 1).
    *
    * The per-doc draw is the seeded portable hash u ∈ [0, P); accept
    * iff u/P < r_s, evaluated WITHOUT floats by squaring both sides:
    * u²·n_s < P²·n_min. u² and P² fit i64 (u < P ≈ 1e9 → u² ≈ 1e18);
    * the cross-products run in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB)
    * so a 100 TB corpus (n_s up to 1e12 → products ≈ 1e30) stays exact —
    * both engines make the identical integer decision on every row.
    *
    * Scale: per-source counts are a tiny agg broadcast back over a
    * narrow (doc_id, source) scan; the accept test is a map-side
    * integer compare; the summary re-aggregates on the same bounded
    * source key. No corpus shuffle, no sort, no driver state.
    */
  private val MixSeed = 4242L
  private val q116 = QueryDef(
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = load(s, d, "documents").select(col("doc_id"), col("lang"))
      // n_min folds into the counts frame via a global window — the
      // frame is one row PER STRATUM (bounded), so the single-partition
      // window is free and the corpus isn't re-scanned for the min.
      val counts = docs.groupBy("lang").agg(count(lit(1)).as("n_docs"))
        .withColumn("n_min", min("n_docs").over(Window.partitionBy(lit(0))))
      val u = shuffleKeyWith(col("doc_id"), MixSeed)
      docs.join(broadcast(counts), "lang")
        .withColumn("u", u)
        .withColumn("keep",
          ((col("u") * col("u")).cast("decimal(38,0)") * col("n_docs") <
            lit(P * P).cast("decimal(38,0)") * col("n_min")).cast("long"))
        .groupBy("lang", "n_docs", "n_min")
        .agg(sum("keep").as("n_kept"))
        .select(col("lang"), col("n_docs"), col("n_kept"),
          (col("n_kept").cast("double") / col("n_docs").cast("double"))
            .as("kept_frac"),
          sqrt(col("n_min").cast("double") / col("n_docs").cast("double"))
            .as("target_frac"))
    },
    Some(s"""WITH counts AS (
              SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
              FROM documents GROUP BY 1
            ), m AS (
              SELECT MIN(n_docs) AS n_min FROM counts
            ), dec AS (
              SELECT d.lang, c.n_docs, m.n_min,
                ${shuffleKeySqlWith("d.doc_id", MixSeed)} AS u
              FROM documents d JOIN counts c ON d.lang = c.lang, m
            ), agg AS (
              SELECT lang, n_docs, n_min,
                CAST(SUM(CASE WHEN CAST(u * u AS HUGEINT) * n_docs <
                  CAST(${P * P} AS HUGEINT) * n_min THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_kept
              FROM dec GROUP BY 1, 2, 3
            )
            SELECT lang, n_docs, n_kept,
              CAST(n_kept AS DOUBLE) / CAST(n_docs AS DOUBLE) AS kept_frac,
              sqrt(CAST(n_min AS DOUBLE) / CAST(n_docs AS DOUBLE))
                AS target_frac
            FROM agg"""),
    "temperature mixing: √n source rebalance, exact integer draws [sampling]")

  private val NumFolds = 5

  /** q125: GROUP k-fold assignment — cross-validation folds keyed on the
    * CUSTOMER, not the order, so every row of one customer lands in one
    * fold and fold-held-out evaluation cannot leak a customer's history
    * into training (the group-CV discipline any user-level model needs).
    * fold = seeded portable hash of o_custkey mod k: leakage-free BY
    * CONSTRUCTION (a pure function of the group key), reproducible
    * run-over-run, and rebalancing follows the hash's uniformity.
    *
    * Scale: one aggregate over (fold) after a per-row integer hash —
    * map-side combined to k rows; the distinct-customer count per fold
    * rides the same exchange as a two-level aggregate. No join, no
    * assignment table materialized (the assignment is recomputable from
    * the key anywhere, which is the point).
    */
  private val q125 = QueryDef(
    (s, d) => {
      val assigned = load(s, d, "orders")
        .withColumn("fold",
          (shuffleKey(col("o_custkey")) % NumFolds).cast("int"))
      assigned
        .groupBy(col("fold"))
        .agg(
          countDistinct(col("o_custkey")).cast("long").as("n_customers"),
          graft.common.Exact.lcountAll.as("n_orders"),
          graft.common.Exact.dsum(col("o_totalprice")).as("sum_totalprice"))
    },
    Some(s"""SELECT CAST(${shuffleKeySql("o_custkey")} % $NumFolds
                AS INTEGER) AS fold,
              CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
              CAST(COUNT(*) AS BIGINT) AS n_orders,
              CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                AS sum_totalprice
            FROM orders GROUP BY 1"""),
    "group k-fold CV assignment: leakage-free by construction [training-export]")

  /** Total training-sample budget q228 apportions across sources. */
  private val SampleBudget = 1000000L

  /** q228: largest-remainder (Hamilton) apportionment of a fixed
    * training-sample budget across corpus sources — the EXACT-integer
    * allocation step downstream of q116's temperature weights: given
    * "draw [[SampleBudget]] examples proportional to source size",
    * floor quotas leave budget − Σfloor slots unassigned, and Hamilton
    * assigns each leftover slot to the largest fractional remainders
    * (ties broken by source name). The output allocation sums to
    * EXACTLY the budget — the conservation property that makes per-
    * source sampling plans composable (a round-to-nearest scheme can
    * over- or under-shoot by |sources|/2 slots).
    *
    * Scale: one source-keyed corpus count fold ends the corpus-
    * proportional work; quotas, remainders, and the remainder-rank
    * window all run on the |sources|-frame (source is a bounded
    * catalog domain), with the 1-row total riding a broadcast attach.
    * budget·n_docs stays in i64 while n_docs < 9.2e12 (budget 1e6);
    * beyond that the fold would move to DECIMAL(38,0) — documented
    * rather than paid, since a source catalog is bounded far below it.
    *
    * Exactness: pure integer `div`/`%` arithmetic plus one share
    * division — hash-exact oracle.
    */
  private val q228 = QueryDef(
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val counts = load(s, d, "documents")
        .groupBy(col("source"))
        .agg(graft.common.Exact.lcountAll.as("n_docs"))
      val tot = counts.agg(sum(col("n_docs")).as("n_total"))
      val allRows = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      counts.crossJoin(broadcast(tot))
        .withColumn("base", expr(s"($SampleBudget * n_docs) div n_total"))
        .withColumn("rem", expr(s"($SampleBudget * n_docs) % n_total"))
        .withColumn("rk", row_number().over(
          Window.orderBy(col("rem").desc, col("source").asc)))
        .withColumn("n_leftover",
          lit(SampleBudget) - sum(col("base")).over(allRows))
        .select(col("source"), col("n_docs"), col("base"), col("rem"),
          (col("rk") <= col("n_leftover")).cast("long").as("extra"),
          (col("base") + (col("rk") <= col("n_leftover")).cast("long"))
            .as("alloc"),
          (col("n_docs").cast("double") / col("n_total").cast("double"))
            .as("doc_share"))
    },
    Some(s"""WITH c AS (
              SELECT source, CAST(count(*) AS BIGINT) AS n_docs
              FROM documents GROUP BY 1
            ), t AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS n_total FROM c),
            q AS (
              SELECT source, n_docs,
                ($SampleBudget * n_docs) // n_total AS base,
                ($SampleBudget * n_docs) % n_total AS rem,
                CAST(n_docs AS DOUBLE) / CAST(n_total AS DOUBLE)
                  AS doc_share
              FROM c, t
            ), r AS (
              SELECT *, ROW_NUMBER() OVER (ORDER BY rem DESC, source)
                  AS rk,
                $SampleBudget - SUM(base) OVER () AS n_leftover
              FROM q
            )
            SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
              CAST(base AS BIGINT) AS base, CAST(rem AS BIGINT) AS rem,
              CAST(rk <= n_leftover AS BIGINT) AS extra,
              CAST(base + CAST(rk <= n_leftover AS BIGINT) AS BIGINT)
                AS alloc,
              doc_share
            FROM r"""),
    "largest-remainder sample-budget apportionment: exact integer " +
      "conservation [training-export]")

  val all: Seq[(String, QueryDef)] = Seq(
    "q100_epoch_shuffle" -> q100,
    "q101_stratified_exact_k" -> q101,
    "q102_event_rate_anomaly" -> q102,
    "q109_seqlen_buckets" -> q109,
    "q111_weighted_sample" -> q111,
    "q112_quantile_norm" -> q112,
    "q116_temperature_mix" -> q116,
    "q125_group_kfold" -> q125,
    "q228_sample_apportionment" -> q228)
}
