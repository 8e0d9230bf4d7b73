package graft.queries

import graft.QueryDef
import graft.common.Tables.load
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Contrastive training-batch assembly: for each anchor, the positives
  * (nearest same-label vectors), the HARD negatives (nearest
  * different-label vectors — the pairs that actually teach a metric
  * model), and hash-drawn easy negatives. This is the batch-builder
  * every embedding/retrieval fine-tune runs between the corpus and the
  * loss.
  */
object Contrastive {

  private val NPos = 3
  private val NHard = 3
  private val NEasy = 2
  private val EasySeed = 31337L

  /** q147: anchors are the fixed probe set (vec_id < 20, the family's
    * convention). One blocked broadcast of the 20 anchors scores every
    * corpus vector exactly (the q38 scan shape — at production scale
    * the q62 candidates-then-rerank front end slots in unchanged).
    * Positives and hard negatives are the per-anchor similarity top-k
    * WITHIN each label-agreement class; easy negatives draw by the
    * seeded portable hash of (anchor, vec) from the different-label
    * pool EXCLUDING the hard picks, so one batch never double-weights
    * a pair under two roles.
    *
    * Scale: anchors broadcast (never a corpus self-join), and the
    * scored frame shuffles ONCE on (anchor, label-agreement) — the
    * similarity rank serves pos and hard from that single exchange
    * (WindowGroupLimit caps sort state at k), and the easy draw is a
    * second sort over the SAME partitioning (no re-exchange: the
    * hard-pick filter doesn't move rows).
    *
    * Float parity: cosine is the per-row sequential-double fold (list
    * order, both engines identical); ranks tie-break on vec_id.
    */
  private val q147 = QueryDef(
    (s, d) => {
      val emb = load(s, d, "embeddings")
      val anchors = emb.filter(col("vec_id") < 20)
        .select(col("vec_id").as("anchor_id"),
          col("label").as("anchor_label"),
          col("embedding").as("a_emb"))
      val scored = emb
        .join(broadcast(anchors), col("vec_id") =!= col("anchor_id"))
        .select(col("anchor_id"), col("vec_id"), col("label"),
          (col("label") === col("anchor_label")).as("is_pos"),
          Similarity.fastCosine(s)(col("a_emb"), col("embedding"))
            .as("cosine"),
          Curation.shuffleKeyWith(
            col("anchor_id") * 1000003L + col("vec_id"), EasySeed).as("u"))
      val byClass = Window.partitionBy(col("anchor_id"), col("is_pos"))
      val ranked = scored.withColumn("simrank", row_number().over(
        byClass.orderBy(col("cosine").desc, col("vec_id").asc)))
      val pos = ranked.filter(col("is_pos") && col("simrank") <= NPos)
        .select(col("anchor_id"), lit("pos").as("role"),
          col("simrank").as("rank"), col("vec_id"), col("label"),
          col("cosine"))
      val hard = ranked.filter(!col("is_pos") && col("simrank") <= NHard)
        .select(col("anchor_id"), lit("hard_neg").as("role"),
          col("simrank").as("rank"), col("vec_id"), col("label"),
          col("cosine"))
      val easy = ranked.filter(!col("is_pos") && col("simrank") > NHard)
        .withColumn("rndrank", row_number().over(
          byClass.orderBy(col("u").asc, col("vec_id").asc)))
        .filter(col("rndrank") <= NEasy)
        .select(col("anchor_id"), lit("easy_neg").as("role"),
          col("rndrank").as("rank"), col("vec_id"), col("label"),
          col("cosine"))
      pos.unionByName(hard).unionByName(easy)
    },
    Some {
      val cos = Similarity.cosineSql("a.a_emb", "e.embedding")
      val u = Curation.shuffleKeySqlWith(
        "(a.anchor_id * 1000003 + e.vec_id)", EasySeed)
      s"""WITH a AS (
            SELECT vec_id AS anchor_id, label AS anchor_label,
              embedding AS a_emb
            FROM embeddings WHERE vec_id < 20
          ), scored AS (
            SELECT a.anchor_id, e.vec_id, e.label,
              e.label = a.anchor_label AS is_pos,
              $cos AS cosine, $u AS u
            FROM embeddings e JOIN a ON e.vec_id <> a.anchor_id
          ), ranked AS (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor_id, is_pos
                ORDER BY cosine DESC, vec_id ASC) AS simrank
            FROM scored
          ), easy_ranked AS (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor_id
                ORDER BY u ASC, vec_id ASC) AS rndrank
            FROM ranked WHERE NOT is_pos AND simrank > $NHard
          )
          SELECT anchor_id, 'pos' AS role,
            CAST(simrank AS INTEGER) AS rank, vec_id, label, cosine
          FROM ranked WHERE is_pos AND simrank <= $NPos
          UNION ALL
          SELECT anchor_id, 'hard_neg' AS role,
            CAST(simrank AS INTEGER) AS rank, vec_id, label, cosine
          FROM ranked WHERE NOT is_pos AND simrank <= $NHard
          UNION ALL
          SELECT anchor_id, 'easy_neg' AS role,
            CAST(rndrank AS INTEGER) AS rank, vec_id, label, cosine
          FROM easy_ranked WHERE rndrank <= $NEasy"""
    },
    "contrastive batch assembly: broadcast anchors, one class-keyed exchange, disjoint roles [contrastive]")

  def all: Seq[(String, QueryDef)] = Seq(
    "q147_contrastive_batch" -> q147)
}
