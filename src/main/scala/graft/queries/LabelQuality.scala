package graft.queries

import graft.QueryDef
import graft.common.Tables.load
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Label-quality auditing over the labeled `embeddings` table — the
  * confident-learning pass a labeled training set runs before the
  * labels are trusted: a vector whose nearest neighbors mostly carry a
  * DIFFERENT label is a likely annotation error (or an ambiguous
  * example worth routing to review).
  *
  * Two shapes, mirroring the exact/scale split of the ANN family:
  * q88 is the exact, oracle-checked audit over the fixed probe set
  * (q38's top-10 plan plus a label join and one aggregate); q89 is the
  * full-corpus scan on the candidates-then-rerank path (q62's
  * nomination front end, top-5 exact re-rank per vector) — every
  * vector gets a neighborhood agreement score and a suspect flag
  * without any per-query corpus scan.
  */
object LabelQuality {

  private val SuspectBelow = 0.5

  /** Exact neighborhood label agreement for the 20 probe vectors:
    * top-10 cosine neighbors (q38's plan — query side broadcast, one
    * codegen scan, per-query top-k window), each neighbor's label
    * compared to the query's. Fully deterministic and SQL-expressible,
    * so the whole audit — counts, ratio, flag — hash-checks against
    * the DuckDB mirror.
    */
  private val q88 = QueryDef(
    (s, d) => {
      val e = load(s, d, "embeddings")
      val q = e.filter(col("vec_id") < 20)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
          col("label").as("qlabel"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("score").desc, col("vec_id").asc)
      e.join(broadcast(q), col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("qlabel"),
          col("label").as("nlabel"), col("vec_id"),
          Similarity.fastCosine(s)(col("qv"), col("embedding")).as("score"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 10)
        .groupBy(col("query_id"), col("qlabel"))
        .agg(
          sum(when(col("nlabel") === col("qlabel"), 1L).otherwise(0L))
            .as("n_agree"),
          (sum(when(col("nlabel") === col("qlabel"), 1L).otherwise(0L))
            .cast("double") / count(lit(1))).as("agreement"))
        .withColumn("is_suspect", col("agreement") < SuspectBelow)
    },
    Some(s"""WITH q AS (
              SELECT vec_id AS query_id, embedding AS qv, label AS qlabel
              FROM embeddings WHERE vec_id < 20
            ), scored AS (
              SELECT q.query_id, q.qlabel, e.label AS nlabel, e.vec_id,
                ${Similarity.cosineSql("q.qv", "e.embedding")} AS score
              FROM embeddings e JOIN q ON e.vec_id <> q.query_id
            ), nn AS (
              SELECT * FROM (SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY query_id
                  ORDER BY score DESC, vec_id ASC) AS rn FROM scored)
              WHERE rn <= 10
            )
            SELECT query_id, qlabel,
              CAST(sum(CASE WHEN nlabel = qlabel THEN 1 ELSE 0 END)
                AS BIGINT) AS n_agree,
              CAST(sum(CASE WHEN nlabel = qlabel THEN 1 ELSE 0 END)
                AS DOUBLE) / count(*) AS agreement,
              CAST(sum(CASE WHEN nlabel = qlabel THEN 1 ELSE 0 END)
                AS DOUBLE) / count(*) < $SuspectBelow AS is_suspect
            FROM nn GROUP BY 1, 2"""),
    "exact 10-NN label agreement + suspect flag for the probe set " +
      "[label-quality,similarity]")

  /** Full-corpus label-noise scan: every vector's agreement with its
    * top-5 exact-scored CANDIDATE neighbors (LSH ∪ IVF-cell nomination
    * — q62's front end, no per-query corpus scan, no driver relay).
    * Approximate only in which neighbors are nominated; the scores and
    * the agreement arithmetic are exact. Vectors with no candidate
    * surface with null agreement and is_suspect = false rather than
    * silently disappearing (q62's convention).
    */
  private[graft] def labelNoiseScan(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val scored = Similarity.candidateScoredPairs(s, d)
    val w = Window.partitionBy(col("v1"))
      .orderBy(col("cos").desc, col("v2").asc)
    val lbl = load(s, d, "embeddings").select(col("vec_id"), col("label"))
    val agg = scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .join(lbl.select(col("vec_id").as("v1"), col("label").as("qlabel")), "v1")
      .join(lbl.select(col("vec_id").as("v2"), col("label").as("nlabel")), "v2")
      .groupBy(col("v1"), col("qlabel"))
      .agg(
        // canonical comma-joined STRING, not array<long>: the sorted id
        // list is the same information, but every downstream consumer —
        // including the verification driver's canonical row-sort, which
        // cannot order array cells — can hash/sort a scalar
        concat_ws(",", sort_array(collect_list(col("v2"))))
          .as("neighbor_ids"),
        count(lit(1)).as("n_neighbors"),
        sum(when(col("nlabel") === col("qlabel"), 1L).otherwise(0L))
          .as("n_agree"))
      .withColumn("agreement",
        col("n_agree").cast("double") / col("n_neighbors"))
    lbl.select(col("vec_id").as("v1"), col("label").as("qlabel"))
      .join(agg, Seq("v1", "qlabel"), "left")
      .select(col("v1").as("vec_id"), col("qlabel").as("label"),
        col("neighbor_ids"),
        col("n_neighbors"), col("n_agree"), col("agreement"),
        coalesce(col("agreement") < SuspectBelow, lit(false))
          .as("is_suspect"))
  }

  private val q89 = QueryDef(
    (s, d) => labelNoiseScan(s, d),
    // Pair-level derived oracle: WHICH neighbors got nominated is
    // algorithm-specific, but the emitted `neighbor_ids` (a sorted
    // comma-joined string, so the encoding is order-canonical AND
    // scalar) lets DuckDB re-run the entire agreement computation —
    // split and unnest the ids, join both sides' labels from
    // `embeddings`, recount n_agree/n_neighbors, re-derive the ratio
    // and the 0.5 suspect flag. A no-candidate vector must surface
    // with null neighbor_ids/counts and a false flag (q62's
    // convention); a miscounted agreement, a phantom neighbor id
    // (inner label join drops it → n_neighbors mismatch), or a flag
    // off the threshold all fail the hash compare. Nomination recall
    // is spec'd via the planted-flip test in LabelQualitySpec.
    Some(s"""WITH emitted AS (
              SELECT vec_id, neighbor_ids
              FROM read_parquet('${graft.QueryDef.OutDirToken}/q89_label_noise/*.parquet')
            ), lbl AS (
              SELECT vec_id, label FROM embeddings
            ), ex AS (
              SELECT vec_id,
                CAST(unnest(string_split(neighbor_ids, ',')) AS BIGINT) AS nid
              FROM emitted
            ), agg AS (
              SELECT x.vec_id,
                CAST(count(*) AS BIGINT) AS n_neighbors,
                CAST(sum(CASE WHEN nl.label = ql.label THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_agree
              FROM ex x
              JOIN lbl ql ON ql.vec_id = x.vec_id
              JOIN lbl nl ON nl.vec_id = x.nid
              GROUP BY 1
            )
            SELECT e.vec_id, ql.label, e.neighbor_ids,
              a.n_neighbors, a.n_agree,
              CAST(a.n_agree AS DOUBLE) / a.n_neighbors AS agreement,
              COALESCE(CAST(a.n_agree AS DOUBLE) / a.n_neighbors
                < $SuspectBelow, false) AS is_suspect
            FROM emitted e
            JOIN lbl ql ON ql.vec_id = e.vec_id
            LEFT JOIN agg a ON a.vec_id = e.vec_id"""),
    "full-corpus 5-NN label-noise scan on the candidates-then-rerank " +
      "path [label-quality,similarity]")

  def all: Seq[(String, QueryDef)] = Seq(
    "q88_label_agreement" -> q88,
    "q89_label_noise" -> q89)
}
