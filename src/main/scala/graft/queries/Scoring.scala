package graft.queries

import graft.QueryDef
import graft.common.Tables.load
import graft.functions.Text
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Model-based document scoring with a hashed linear classifier — the
  * fastText-shaped quality filter most LLM corpus pipelines run between
  * heuristic cleaning and training export. Tokens hash into a small
  * bucket space, each bucket carries a weight, the document's logit is
  * the mean bucket weight. Here the weight table is a DETERMINISTIC
  * function of the bucket id (a stand-in for trained parameters — the
  * container has no model artifacts); the Spark plumbing (featurize →
  * fold → threshold) is exactly what a real weight vector needs, with
  * the weights arriving as a broadcast map instead of an arithmetic
  * expression.
  */
object Scoring {

  /** Feature space: 64 buckets; token → bucket via an arithmetic
    * "hash" both engines express identically (length and first-char
    * code point — a stand-in for murmur3, which the two engines don't
    * share). Weights are affine-modular mixes of the bucket id in
    * [-500, 500] milli-units.
    */
  private val Buckets = 64
  private val A = 2654435761L
  private val P = 1000000007L

  private def bucket(tok: Column): Column =
    (length(tok) * 31 + ascii(substring(tok, 1, 1))) % Buckets

  /** Integer milli-weight of one token — kept integral so the per-doc
    * sum is associativity-exact (a double fold would not be
    * partition-order-portable).
    */
  private def weightMilli(tok: Column): Column =
    (bucket(tok) + 1).cast("long") * A % P % 1001L - 500L

  private val bucketSql =
    "(length(t) * 31 + ascii(substr(t, 1, 1))) % 64"

  /** q130: hashed-classifier quality scores. Per doc: the exact integer
    * logit sum over tokens, the token count, the mean logit (one double
    * division — bitwise-portable), and the keep decision at logit > 0.
    *
    * Scale: zero shuffle — tokenize, transform, fold are all per-row
    * array expressions inside the scan projection; a 100 TB corpus
    * scores as a pure map job. The real-model variant broadcasts a
    * |buckets|-sized weight array and folds exactly the same way.
    *
    * Float parity: the fold is BIGINT (exact under any grouping); the
    * only float op is the final mean — single division, both engines
    * IEEE-identical.
    */
  private val q130 = QueryDef(
    (s, d) => {
      val ws = Text.words(col("text"))
      load(s, d, "documents").select(
        col("doc_id"), col("lang"),
        aggregate(transform(ws, weightMilli(_)), lit(0L), (a, x) => a + x)
          .as("logit_milli"),
        size(ws).cast("long").as("n_tokens"))
        .withColumn("mean_logit_milli",
          col("logit_milli").cast("double") / col("n_tokens").cast("double"))
        .withColumn("keep", col("logit_milli") > 0L)
    },
    Some(s"""WITH w AS (
              SELECT doc_id, lang,
                string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                  ' ') AS ws
              FROM documents
            )
            SELECT doc_id, lang,
              CAST(list_reduce(list_transform(ws,
                  t -> ($bucketSql + 1) * $A % $P % 1001 - 500),
                (a, b) -> a + b) AS BIGINT) AS logit_milli,
              CAST(len(ws) AS BIGINT) AS n_tokens,
              CAST(list_reduce(list_transform(ws,
                  t -> ($bucketSql + 1) * $A % $P % 1001 - 500),
                (a, b) -> a + b) AS DOUBLE) / CAST(len(ws) AS DOUBLE)
                AS mean_logit_milli,
              CAST(list_reduce(list_transform(ws,
                  t -> ($bucketSql + 1) * $A % $P % 1001 - 500),
                (a, b) -> a + b) AS BIGINT) > 0 AS keep
            FROM w"""),
    "hashed linear classifier: integer logit fold, zero shuffle [scoring]")

  def all: Seq[(String, QueryDef)] = Seq(
    "q130_hashed_classifier" -> q130)
}
