package graft.queries

import graft.QueryDef
import graft.common.Tables.load
import graft.functions.Text._
import org.apache.spark.sql.functions._

/** Sequence packing for training-batch assembly: assign documents to
  * fixed-token-budget packs so a trainer wastes minimal padding. The
  * packing discipline is NEXT-FIT over a deterministic document order —
  * the industry-standard compromise at corpus scale, because first-fit /
  * best-fit need random access to all open bins (driver state), while
  * next-fit is a single sequential pass.
  *
  * Global sequential passes don't scale, so packing is scoped to
  * doc_id-range groups of [[Packing.GroupSize]] documents: each group
  * packs independently, which is embarrassingly parallel and — because
  * the group bound is a constant — keeps per-task state O(1). The Spark
  * plan is the classic secondary-sort shape: one hash repartition on the
  * group key, an in-partition sort by (group, doc_id), and a streaming
  * mapPartitions that carries (pack, accumulated tokens) across rows and
  * resets at group boundaries. One shuffle total; no window, no driver
  * state, no per-group collect.
  */
object Packing {

  private val NormSql = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
  private val WordsSql = s"string_split($NormSql, ' ')"

  /** Token budget per pack (a stand-in for the trainer's context
    * length). A document longer than the budget becomes an oversized
    * singleton pack — next-fit's standard behavior; a real pipeline
    * chunks such docs first (q65) so the two operators compose.
    */
  private[graft] val PackBudget = 512L

  /** Documents per packing group (the parallelism/packing-quality
    * trade: larger groups pack tighter, smaller groups parallelize
    * further).
    */
  private[graft] val GroupSize = 50L

  /** Next-fit pack assignment: one row per document with its group,
    * pack ordinal within the group, and token count. pack_seq is dense
    * from 0 in doc_id order by construction. Shared by q67 (the
    * assignment) and q72 (the efficiency report).
    */
  private[graft] def packedDocs(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    load(s, d, "documents")
      .select(col("doc_id"),
        size(words(col("text"))).as("n_tokens"),
        floor(col("doc_id") / GroupSize).as("pack_group"))
      .repartition(col("pack_group"))
      .sortWithinPartitions(col("pack_group"), col("doc_id"))
      .as[(Long, Int, Long)]
      .mapPartitions { rows =>
        var group = Long.MinValue
        var pack = 0
        var acc = 0L
        rows.map { case (id, n, g) =>
          if (g != group) { group = g; pack = 0; acc = n.toLong }
          else if (acc + n > PackBudget) { pack += 1; acc = n.toLong }
          else acc += n
          (g, pack, id, n)
        }
      }
      .toDF("pack_group", "pack_seq", "doc_id", "n_tokens")
  }

  // next-fit is inherently sequential per group → the oracle is a
  // recursive CTE walking each group's doc order (depth <= GroupSize),
  // shared by the q67 and q72 mirrors
  private val PackCte =
    s"""WITH RECURSIVE t AS (
         SELECT doc_id, doc_id // $GroupSize AS pack_group,
           len($WordsSql) AS n_tokens,
           ROW_NUMBER() OVER (PARTITION BY doc_id // $GroupSize
             ORDER BY doc_id) AS rn
         FROM documents
       ), p AS (
         SELECT pack_group, rn, doc_id, n_tokens,
           0 AS pack_seq, n_tokens AS acc
         FROM t WHERE rn = 1
         UNION ALL
         SELECT t.pack_group, t.rn, t.doc_id, t.n_tokens,
           CASE WHEN p.acc + t.n_tokens > $PackBudget
                THEN p.pack_seq + 1 ELSE p.pack_seq END,
           CASE WHEN p.acc + t.n_tokens > $PackBudget
                THEN t.n_tokens ELSE p.acc + t.n_tokens END
         FROM t JOIN p
           ON t.pack_group = p.pack_group AND t.rn = p.rn + 1
       )"""

  private val q67 = QueryDef(
    (s, d) => packedDocs(s, d),
    Some(s"""$PackCte
            SELECT CAST(pack_group AS BIGINT) AS pack_group,
              CAST(pack_seq AS INTEGER) AS pack_seq,
              doc_id, CAST(n_tokens AS INTEGER) AS n_tokens
            FROM p"""),
    s"next-fit sequence packing, budget $PackBudget tok [text-analysis]")

  /** Packing-efficiency report: per pack, its document count, token
    * total, and fill fraction against the budget — the padding-waste
    * number a trainer capacity-plans with. One keyed aggregation over
    * the assignment (map-side combined); the oversized-singleton packs
    * surface as fill_frac > 1.
    */
  private val q72 = QueryDef(
    (s, d) => packedDocs(s, d)
      .groupBy("pack_group", "pack_seq")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("pack_tokens"))
      .withColumn("fill_frac",
        col("pack_tokens").cast("double") / lit(PackBudget.toDouble)),
    Some(s"""$PackCte
            SELECT CAST(pack_group AS BIGINT) AS pack_group,
              CAST(pack_seq AS INTEGER) AS pack_seq,
              CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(n_tokens) AS BIGINT) AS pack_tokens,
              CAST(sum(n_tokens) AS DOUBLE) / $PackBudget.0 AS fill_frac
            FROM p GROUP BY 1, 2"""),
    "packing efficiency: per-pack docs/tokens/fill [text-analysis]")

  /** Next-fit packing over CHUNK rows (doc_id, chunk_id, n_tokens) —
    * the corpus pipeline's pack stage: same secondary-sort shape as
    * [[packedDocs]], ordered by (doc_id, chunk_id) within doc_id-range
    * groups so a document's chunks stay contiguous in pack order.
    */
  private[graft] def packChunks(chunks: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val s = chunks.sparkSession
    import s.implicits._
    chunks
      .select(col("doc_id"), col("chunk_id"), col("n_tokens"),
        floor(col("doc_id") / GroupSize).as("pack_group"))
      .repartition(col("pack_group"))
      .sortWithinPartitions(col("pack_group"), col("doc_id"), col("chunk_id"))
      .as[(Long, Int, Int, Long)]
      .mapPartitions { rows =>
        var group = Long.MinValue
        var pack = 0
        var acc = 0L
        rows.map { case (id, cid, n, g) =>
          if (g != group) { group = g; pack = 0; acc = n.toLong }
          else if (acc + n > PackBudget) { pack += 1; acc = n.toLong }
          else acc += n
          (g, pack, id, cid, n)
        }
      }
      .toDF("pack_group", "pack_seq", "doc_id", "chunk_id", "n_tokens")
  }

  def all: Seq[(String, QueryDef)] = Seq(
    "q67_sequence_packing" -> q67,
    "q72_packing_efficiency" -> q72)
}
