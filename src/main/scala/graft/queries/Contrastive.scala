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
    * the q62 candidates-then-rerank front end slots in unchanged);
    * per-anchor rank windows carve out positives and hard negatives by
    * label agreement, and easy negatives draw by the seeded portable
    * hash of (anchor, vec) — reproducible, label-disjoint, and
    * oracle-checkable.
    *
    * Scale: anchors broadcast (never a corpus self-join); the three
    * per-anchor top-k windows share ONE anchor-keyed exchange of
    * narrow (anchor, vec, cos, label) rows; WindowGroupLimit caps each
    * partition's sort state at k.
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
        .select(col("anchor_id"), col("anchor_label"), col("vec_id"),
          col("label"),
          Similarity.fastCosine(s)(col("a_emb"), col("embedding"))
            .as("cosine"),
          Curation.shuffleKeyWith(
            col("anchor_id") * 1000003L + col("vec_id"), EasySeed).as("u"))
      val byAnchor = Window.partitionBy(col("anchor_id"))
      val sim = byAnchor.orderBy(col("cosine").desc, col("vec_id").asc)
      val rnd = byAnchor.orderBy(col("u").asc, col("vec_id").asc)
      val pos = scored.filter(col("label") === col("anchor_label"))
        .withColumn("rank", row_number().over(sim))
        .filter(col("rank") <= NPos)
        .withColumn("role", lit("pos"))
      val hard = scored.filter(col("label") =!= col("anchor_label"))
        .withColumn("rank", row_number().over(sim))
        .filter(col("rank") <= NHard)
        .withColumn("role", lit("hard_neg"))
      val easy = scored.filter(col("label") =!= col("anchor_label"))
        .withColumn("rank", row_number().over(rnd))
        .filter(col("rank") <= NEasy)
        .withColumn("role", lit("easy_neg"))
      pos.unionByName(hard).unionByName(easy)
        .select(col("anchor_id"), col("role"), col("rank"), col("vec_id"),
          col("label"), col("cosine"))
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
            SELECT a.anchor_id, a.anchor_label, e.vec_id, e.label,
              $cos AS cosine, $u AS u
            FROM embeddings e JOIN a ON e.vec_id <> a.anchor_id
          ), pos AS (
            SELECT anchor_id, 'pos' AS role, rank, vec_id, label, cosine
            FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor_id
                    ORDER BY cosine DESC, vec_id ASC) AS rank
                  FROM scored WHERE label = anchor_label)
            WHERE rank <= $NPos
          ), hard AS (
            SELECT anchor_id, 'hard_neg' AS role, rank, vec_id, label, cosine
            FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor_id
                    ORDER BY cosine DESC, vec_id ASC) AS rank
                  FROM scored WHERE label <> anchor_label)
            WHERE rank <= $NHard
          ), easy AS (
            SELECT anchor_id, 'easy_neg' AS role, rank, vec_id, label, cosine
            FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY anchor_id
                    ORDER BY u ASC, vec_id ASC) AS rank
                  FROM scored WHERE label <> anchor_label)
            WHERE rank <= $NEasy
          )
          SELECT * FROM pos UNION ALL
          SELECT * FROM hard UNION ALL
          SELECT * FROM easy"""
    },
    "contrastive batch assembly: broadcast anchors, shared rank exchange, hash easies [contrastive]")

  def all: Seq[(String, QueryDef)] = Seq(
    "q147_contrastive_batch" -> q147)
}
