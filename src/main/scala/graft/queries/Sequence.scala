package graft.queries

import graft.QueryDef
import graft.common.Exact._
import graft.common.Tables.load
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Sequence analytics over the `events` table: the first-order Markov
  * transition matrix (which event_type follows which) and time-decayed
  * engagement scoring (the recency-weighted activity feature a churn /
  * ranking model consumes). Both are training-data extensions beyond the
  * reference's batch event surface (SURVEY.md §2.9 note): transition
  * matrices drive session-model features and anomaly baselines;
  * exponential decay is the standard freshness prior for user-level
  * features.
  */
object Sequence {

  /** q117: first-order transition counts + conditional probabilities.
    *
    * Scale: lead() needs each user's events ordered — ONE shuffle on
    * user_id (hash-partitioned; a user's history fits an executor by
    * construction, there is no global sort). The pair aggregate is
    * map-side combined down to |types|² rows before its exchange, and
    * the from-state total is a window over the already-tiny pair frame.
    * Nothing here grows with the corpus except the first shuffle, which
    * any per-user operator pays.
    *
    * Float parity: p_transition is ONE long/long division of identical
    * integers — IEEE-exact in both engines, no tolerance needed.
    */
  private val q117 = QueryDef(
    (s, d) => {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      load(s, d, "events")
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("next_type", lead(col("event_type"), 1).over(byUser))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type"), col("next_type"))
        .agg(lcountAll.as("n_pairs"))
        .withColumn("from_total",
          sum(col("n_pairs")).over(Window.partitionBy(col("event_type"))))
        .withColumn("p_transition", col("n_pairs") / col("from_total"))
    },
    Some("""WITH seq AS (
              SELECT event_type,
                LEAD(event_type) OVER (PARTITION BY user_id
                  ORDER BY ts ASC, event_id ASC) AS next_type
              FROM events
            ), pairs AS (
              SELECT event_type, next_type,
                CAST(count(*) AS BIGINT) AS n_pairs
              FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2
            )
            SELECT event_type, next_type, n_pairs,
              CAST(SUM(n_pairs) OVER (PARTITION BY event_type) AS BIGINT)
                AS from_total,
              n_pairs / CAST(SUM(n_pairs) OVER (PARTITION BY event_type)
                AS BIGINT) AS p_transition
            FROM pairs"""),
    "event-type transition matrix: lead + pair counts, exact division [sequence]")

  /** ln(2)/30: 30-day half-life decay rate. The literal is spelled
    * identically in the Spark plan and the oracle SQL so both engines
    * parse the same double.
    */
  private val DecayRate = "0.023104906018664842"

  /** q118: exponential time-decay engagement per user — score =
    * Σ value·2^(−age/30d), age measured against the corpus watermark
    * (max ts), so the result is a pure function of the data.
    *
    * Scale: the watermark is a 1-row aggregate broadcast to the scan;
    * the decay term is per-row map work inside codegen; the per-user
    * aggregate map-side combines before the single user_id shuffle.
    * The decimal cast on the summed term makes the partial-aggregate
    * merge order-invariant (common.Exact discipline), so results are
    * identical on any cluster topology.
    *
    * Float parity: exp() is NOT bit-identical across engines, so this
    * uses the q110 tolerance-contract idiom — integer evidence
    * (n_events, last_ts) must match exactly and the decayed sum must
    * agree within 1e-6; a drifting row drops and fails the compare.
    */
  private val q118 = QueryDef(
    (s, d) => {
      val ev = load(s, d, "events")
      val ref = ev.agg(max(col("ts")).as("ref_ts"))
      ev.crossJoin(broadcast(ref))
        .withColumn("age_days",
          (unix_micros(col("ref_ts")) - unix_micros(col("ts")))
            .cast("double") / lit(86400000000.0))
        .withColumn("term",
          col("value") * exp(col("age_days") * lit(-DecayRate.toDouble)))
        .groupBy(col("user_id"))
        .agg(
          lcountAll.as("n_events"),
          max(col("ts")).as("last_ts"),
          sum(col("term").cast(DecimalType(27, 12))).cast("double")
            .as("decayed_value"))
    },
    Some(s"""WITH emitted AS (
              SELECT * FROM read_parquet(
                '${QueryDef.OutDirToken}/q118_time_decay/*.parquet')
            ), ref AS (
              SELECT epoch_us(max(ts)) AS ref_us FROM events
            ), agg AS (
              SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
                max(ts) AS last_ts,
                SUM(value * exp(-((ref_us - epoch_us(ts)) / 86400000000.0)
                  * $DecayRate)) AS dv
              FROM events, ref GROUP BY 1
            )
            SELECT e.user_id, e.n_events, e.last_ts, e.decayed_value
            FROM emitted e
            JOIN agg a ON e.user_id = a.user_id
              AND e.n_events = a.n_events AND e.last_ts = a.last_ts
            WHERE abs(e.decayed_value - a.dv) < 1e-6"""),
    "time-decay engagement: watermark broadcast, tolerance oracle [sequence]")

  /** Path prefix length: the classic "first N events" onboarding
    * window.
    */
  private val PathLen = 8

  /** q138: top onboarding paths — every user's first 8 event types
    * (chronological, event_id tiebreak) joined into a path string,
    * counted across users. Product analytics reads this as "what do new
    * users actually do"; sequence-model training reads it as the
    * empirical prefix distribution.
    *
    * Scale: the window filter caps state FIRST (row_number ≤ 8 over the
    * per-user order — one user_id shuffle, streaming rank, no buffered
    * history), so the collect_list that follows holds at most 8 tiny
    * structs per user no matter how active the user is. The path count
    * is a second (path) shuffle over one short row per user. Never
    * collect-then-slice: an unbounded user history inside one
    * collect_list is the OOM that kills per-user aggs at 100 TB.
    *
    * Exactness: strings and counts only.
    */
  private val q138 = QueryDef(
    (s, d) => {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      load(s, d, "events")
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("rn", row_number().over(byUser))
        .filter(col("rn") <= PathLen)
        .groupBy(col("user_id"))
        .agg(concat_ws(">",
          transform(array_sort(collect_list(struct(col("rn"), col("event_type")))),
            _.getField("event_type"))).as("path"))
        .groupBy(col("path"))
        .agg(lcountAll.as("n_users"))
    },
    Some(s"""WITH ranked AS (
              SELECT user_id, event_type, ROW_NUMBER() OVER (
                PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS rn
              FROM events
            ), paths AS (
              SELECT user_id,
                array_to_string(list(event_type ORDER BY rn), '>') AS path
              FROM ranked WHERE rn <= $PathLen GROUP BY 1
            )
            SELECT path, CAST(count(*) AS BIGINT) AS n_users
            FROM paths GROUP BY 1"""),
    "top onboarding paths: rank-capped prefix, bounded per-user state [sequence]")

  def all: Seq[(String, QueryDef)] = Seq(
    "q117_event_transitions" -> q117,
    "q118_time_decay" -> q118,
    "q138_event_paths" -> q138)
}
