package graft.queries

import graft.QueryDef
import graft.common.Tables.load
import org.apache.spark.sql.functions._

/** Johnson-Lindenstrauss random projection over the `embeddings` table —
  * the dimensionality-reduction sketch a training pipeline uses to cheapen
  * downstream similarity work (64-dim float vectors → 8-dim, a ±1
  * projection matrix: Achlioptas 2001's database-friendly JL variant).
  * The matrix is SEEDED (splitmix64) and materialized as LITERALS in
  * both the Spark plan and the oracle SQL, so no cross-engine hash
  * arithmetic is needed; every projected coordinate is the same
  * left-to-right sequential-double sum in both engines (the cosineSql
  * discipline — ±1 multiplication is exact negation, so the terms are
  * bit-identical and so are the ordered partial sums).
  *
  * Scale: one narrow typed pass, zero shuffle — at 100 TB this is a
  * map-only job. The emitted jl_ratio (projected-norm² over its
  * expectation 8·norm²) is the operator's own quality audit: per-vector
  * it concentrates near 1, and ProjectionSpec pins the corpus mean.
  */
object Projection {

  private[graft] val InDims = 64
  private[graft] val OutDims = 8

  /** ±1 projection matrix from a fixed-seed splitmix64 stream
    * (deterministic across JVMs — no java.util.Random implementation
    * dependence). Indexed signs(i)(j): input dim i, output dim j.
    */
  private[graft] val Signs: Array[Array[Int]] = {
    var state = 0x9E3779B97F4A7C15L
    def next(): Long = {
      state += 0x9E3779B97F4A7C15L
      var z = state
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    Array.fill(InDims)(Array.fill(OutDims)(
      if ((next() & 1L) == 0L) 1 else -1))
  }

  /** One projected coordinate as oracle SQL: the sign column j as a
    * literal list, zipped with the embedding, left-folded in order.
    */
  private def projSql(j: Int): String = {
    val lits = (0 until InDims).map(i => Signs(i)(j))
      .mkString("[", ",", "]")
    s"""list_reduce(list_transform(list_zip(embedding, $lits),
        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)),
        (x,y) -> x + y)"""
  }

  private val Norm2Sql =
    """list_reduce(list_transform(embedding,
        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x,y) -> x + y)"""

  private val q96 = QueryDef(
    (s, d) => {
      import s.implicits._
      load(s, d, "embeddings")
        .select(col("vec_id"), col("embedding"))
        .as[(Long, Seq[Float])]
        .map { case (id, e) =>
          val p = new Array[Double](OutDims)
          var j = 0
          while (j < OutDims) {
            var sum = 0.0
            var i = 0
            while (i < InDims) { sum += e(i).toDouble * Signs(i)(j); i += 1 }
            p(j) = sum
            j += 1
          }
          var n2 = 0.0
          var i = 0
          while (i < InDims) { n2 += e(i).toDouble * e(i).toDouble; i += 1 }
          var pn2 = 0.0
          j = 0
          while (j < OutDims) { pn2 += p(j) * p(j); j += 1 }
          (id, p(0), p(1), p(2), p(3), p(4), p(5), p(6), p(7),
            n2, pn2,
            if (n2 > 0.0) Some(pn2 / (OutDims * n2)) else None)
        }
        .toDF("vec_id", "p0", "p1", "p2", "p3", "p4", "p5", "p6", "p7",
          "norm2", "proj_norm2", "jl_ratio")
    },
    Some {
      val ps = (0 until OutDims)
        .map(j => s"${projSql(j)} AS p$j").mkString(",\n                ")
      val pn2 = (0 until OutDims).map(j => s"p$j * p$j").mkString(" + ")
      s"""WITH k AS (
            SELECT vec_id,
                $ps,
                $Norm2Sql AS norm2
            FROM embeddings
          )
          SELECT vec_id, p0, p1, p2, p3, p4, p5, p6, p7, norm2,
            ($pn2) AS proj_norm2,
            CASE WHEN norm2 > 0 THEN ($pn2) / ($OutDims * norm2)
                 ELSE NULL END AS jl_ratio
          FROM k"""
    },
    s"JL ±1 random projection $InDims→$OutDims dims + norm-preservation " +
      "audit [similarity,embedding]")

  def all: Seq[(String, QueryDef)] = Seq(
    "q96_random_projection" -> q96)
}
