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

  /** The token-true packs' oracle CTE: the same recursive next-fit
    * walk as [[PackCte]], but sourcing each document's token count
    * from q98's EMITTED BPE tokenization (the OutDirToken cross-read —
    * Verify dumps every query's parquet before any oracle runs), so
    * the oracle simultaneously re-derives the pack assignment AND
    * pins q256's n_tokens to q98's n_bpe_tokens per doc.
    */
  private def TokenPackCte =
    s"""WITH RECURSIVE q98 AS (
         SELECT doc_id, CAST(n_bpe_tokens AS BIGINT) AS n_tokens,
           doc_id // $GroupSize AS pack_group,
           ROW_NUMBER() OVER (PARTITION BY doc_id // $GroupSize
             ORDER BY doc_id) AS rn
         FROM read_parquet(
           '${graft.QueryDef.OutDirToken}/q98_bpe_tokenize/*.parquet')
       ), tp0 AS (
         SELECT pack_group, rn, doc_id, n_tokens,
           0 AS pack_seq, n_tokens AS acc
         FROM q98 WHERE rn = 1
         UNION ALL
         SELECT q.pack_group, q.rn, q.doc_id, q.n_tokens,
           CASE WHEN p.acc + q.n_tokens > $TokenPackBudget
                THEN p.pack_seq + 1 ELSE p.pack_seq END,
           CASE WHEN p.acc + q.n_tokens > $TokenPackBudget
                THEN q.n_tokens ELSE p.acc + q.n_tokens END
         FROM q98 q JOIN tp0 p
           ON q.pack_group = p.pack_group AND q.rn = p.rn + 1
       ), tp AS (
         SELECT CAST(pack_group AS BIGINT) AS pack_group,
           CAST(pack_seq AS INTEGER) AS pack_seq,
           doc_id, n_tokens
         FROM tp0
       )"""

  /** Token budget per pack for the BPE-TRUE packing (q256/q257). The
    * word-count packs (q67) stand in for a tokenizer; a trainer's real
    * budget is its context length in LEARNED tokens, and BPE emits
    * ~1.3-2 tokens per word on this corpus, so the token-true budget
    * is set at 2× the word budget to describe comparable pack shapes.
    */
  private[graft] val TokenPackBudget = 1024L

  /** q256: token-TRUE next-fit packing — q67's assignment with the
    * budget counted in the corpus-trained BPE tokenization (q98's
    * n_bpe_tokens) instead of whitespace words. Word counts are a
    * proxy; the trainer's context window truncates in learned tokens,
    * so a word-budgeted pack can silently overflow the real budget by
    * the corpus's tokens-per-word ratio. Same secondary-sort shape as
    * q67 (one hash shuffle on the group key, in-partition sort,
    * streaming next-fit); the token counts ride the memoized merge
    * table (one training per session, the q94/q98 memo), so the extra
    * cost over q67 is the per-doc encode map.
    *
    * Scale: identical to q67 — the encode is embarrassingly parallel
    * (broadcast merge ranks), packing is one shuffle of (doc_id,
    * count) pairs, per-task state O(1).
    */
  private val q256 = QueryDef(
    (s, d) => {
      import s.implicits._
      BpeVocab.tokenize(s, d)
        .select(col("doc_id"), col("n_bpe_tokens").as("n_tokens"),
          floor(col("doc_id") / GroupSize).as("pack_group"))
        .repartition(col("pack_group"))
        .sortWithinPartitions(col("pack_group"), col("doc_id"))
        .as[(Long, Long, Long)]
        .mapPartitions { rows =>
          var group = Long.MinValue
          var pack = 0
          var acc = 0L
          rows.map { case (id, n, g) =>
            if (g != group) { group = g; pack = 0; acc = n }
            else if (acc + n > TokenPackBudget) { pack += 1; acc = n }
            else acc += n
            (g, pack, id, n)
          }
        }
        .toDF("pack_group", "pack_seq", "doc_id", "n_tokens")
        .select(col("pack_group"), col("pack_seq").cast("int").as("pack_seq"),
          col("doc_id"), col("n_tokens"))
    },
    Some(s"""$TokenPackCte
            SELECT pack_group, pack_seq, doc_id, n_tokens FROM tp"""),
    s"token-TRUE next-fit packing: q67 with the budget in q98's BPE " +
      s"tokens ($TokenPackBudget tok) [text-analysis,tokenizer]")

  /** q257: the fill-efficiency report of the token-true packs — q72
    * recomputed against the real token budget: per pack, document
    * count, token total, and fill fraction. One keyed aggregation over
    * q256's assignment (map-side combined).
    */
  private val q257 = QueryDef(
    (s, d) => {
      import s.implicits._
      BpeVocab.tokenize(s, d)
        .select(col("doc_id"), col("n_bpe_tokens").as("n_tokens"),
          floor(col("doc_id") / GroupSize).as("pack_group"))
        .repartition(col("pack_group"))
        .sortWithinPartitions(col("pack_group"), col("doc_id"))
        .as[(Long, Long, Long)]
        .mapPartitions { rows =>
          var group = Long.MinValue
          var pack = 0
          var acc = 0L
          rows.map { case (id, n, g) =>
            if (g != group) { group = g; pack = 0; acc = n }
            else if (acc + n > TokenPackBudget) { pack += 1; acc = n }
            else acc += n
            (g, pack, id, n)
          }
        }
        .toDF("pack_group", "pack_seq", "doc_id", "n_tokens")
        .groupBy("pack_group", "pack_seq")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("pack_tokens"))
        .select(col("pack_group"),
          col("pack_seq").cast("int").as("pack_seq"),
          col("n_docs"), col("pack_tokens"),
          (col("pack_tokens").cast("double") /
            lit(TokenPackBudget.toDouble)).as("fill_frac"))
    },
    Some(s"""$TokenPackCte
            SELECT pack_group, pack_seq,
              CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(n_tokens) AS BIGINT) AS pack_tokens,
              CAST(sum(n_tokens) AS DOUBLE) / $TokenPackBudget.0 AS fill_frac
            FROM tp GROUP BY 1, 2"""),
    "token-true packing efficiency: per-pack docs/tokens/fill against " +
      "the BPE budget [text-analysis,tokenizer]")

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
    "q72_packing_efficiency" -> q72,
    "q256_token_packing" -> q256,
    "q257_token_packing_efficiency" -> q257)
}
