package graft.queries

import graft.QueryDef
import graft.common.Tables.load
import graft.operators.ZOrder
import org.apache.spark.sql.functions._

/** Z-order layout arithmetic over the `events` table — the verification
  * face of the table layer's multi-dimensional clustering
  * (`ParquetTable.compactZOrdered` / `readBox`): per event, the
  * (user, time) bucket ordinals and the interleaved Morton key the
  * layout write sorts by. Everything is exact integer arithmetic — a
  * min-max aggregate broadcast against the scan (no driver collect),
  * range-scaled `div` bucketing, and a shift/and/add bit interleave —
  * so the whole key derivation hash-checks against the DuckDB mirror.
  * The physical win (a 2-D box probe opening 1 of 16 files) is pinned
  * by ZOrderSpec on the table layer, where file layout is observable;
  * this query pins that the KEY both engines would cluster by is
  * bit-identical.
  *
  * Scale: one codegen'd narrow pass over the scan plus one 4-scalar
  * aggregate (at 100 TB the bounds would come from manifest stats for
  * free — the aggregate here keeps the query self-contained).
  */
object Layout {

  /** Bits per dimension (buckets = 2^4 = 16 per dimension, z < 256). */
  private[graft] val ZBits = 4
  private val B = 1 << ZBits

  /** The interleave mirrored as SQL text (DuckDB side): bucket j's bit i
    * at position i*2+j — exactly [[ZOrder.interleave]]'s layout.
    */
  private def interleaveSql(bu: String, bt: String): String =
    (0 until ZBits).flatMap { i =>
      Seq(s"((($bu >> $i) & 1) << ${2 * i})",
        s"((($bt >> $i) & 1) << ${2 * i + 1})")
    }.mkString(" + ")

  private val q95 = QueryDef(
    (s, d) => {
      val e = load(s, d, "events")
      val b = e.agg(
        min(col("user_id")).as("mnu"), max(col("user_id")).as("mxu"),
        min(unix_micros(col("ts"))).as("mnt"),
        max(unix_micros(col("ts"))).as("mxt"))
      // integral `div` (not double floor) keeps the bucket arithmetic
      // exact in both engines; the bounds row rides in as a broadcast
      e.crossJoin(broadcast(b))
        .withColumn("bucket_u",
          expr(s"CAST(((user_id - mnu) * $B) div (mxu - mnu + 1) AS INT)"))
        .withColumn("bucket_t",
          expr(s"CAST(((unix_micros(ts) - mnt) * $B) div (mxt - mnt + 1)" +
            " AS INT)"))
        .select(col("event_id"), col("bucket_u"), col("bucket_t"),
          ZOrder.interleave(Seq(col("bucket_u"), col("bucket_t")), ZBits)
            .cast("int").as("zkey"))
    },
    Some(s"""WITH b AS (
              SELECT min(user_id) AS mnu, max(user_id) AS mxu,
                min(epoch_us(ts)) AS mnt, max(epoch_us(ts)) AS mxt
              FROM events
            ), k AS (
              SELECT event_id,
                CAST(((user_id - mnu) * $B) // (mxu - mnu + 1)
                  AS INTEGER) AS bucket_u,
                CAST(((epoch_us(ts) - mnt) * $B) // (mxt - mnt + 1)
                  AS INTEGER) AS bucket_t
              FROM events, b
            )
            SELECT event_id, bucket_u, bucket_t,
              CAST(${interleaveSql("bucket_u", "bucket_t")} AS INTEGER)
                AS zkey
            FROM k"""),
    "z-order (Morton) clustering key over (user, time) [layout,table-layer]")

  def all: Seq[(String, QueryDef)] = Seq(
    "q95_zorder_key" -> q95)
}
