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

  /** Compaction target (128 KiB per output file at test scale — the
    * knob a deployment sets to its 128 MiB–1 GiB file-size goal), the
    * per-row storage overhead the size census charges beyond the
    * payload, and the small-file threshold (target/4).
    */
  private val CompactTarget = 131072L
  private val RowOverhead = 64L

  /** q203: compaction bin-packing plan — the OPTIMIZE/rewrite planner
    * every lakehouse table service runs. The per-day partitions of the
    * events table are size-censused (payload octets + fixed per-row
    * overhead), ordered by date, and greedily packed into consecutive
    * bins by `exclusive-running-total div target` — first-fit on the
    * ordered sequence, the algorithm behind Delta OPTIMIZE / Iceberg
    * binpack rewrites (consecutive packing preserves date clustering,
    * which random-fit would destroy). Output: one row per planned
    * output file with its input-partition count, byte total, date
    * range, and how many of its inputs were small files — the
    * before/after evidence a table service logs.
    *
    * Scale: the size census is one date-keyed fold (map-side combined
    * to |dates| rows); the running total is a window over the census
    * frame, whose row count is CALENDAR-bounded (days of history),
    * never corpus-proportional — the one place an unpartitioned window
    * is the right call (the q80 date-spine precedent). At 100 TB the
    * census rows come from manifest stats instead of a scan; the plan
    * arithmetic is unchanged.
    *
    * Exactness: pure integer arithmetic end to end (octet sums, div
    * binning, counts) — hash-exact cross-engine, no tolerance.
    */
  private val q203 = QueryDef(
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val census = load(s, d, "events")
        .groupBy(to_date(col("ts")).as("part_date"))
        .agg(sum(octet_length(col("props")).cast("long") + lit(RowOverhead))
          .as("bytes"))
      val w = Window.orderBy(col("part_date").asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      census
        .withColumn("cum_excl", coalesce(sum(col("bytes")).over(w), lit(0L)))
        .withColumn("bin", expr(s"cum_excl div $CompactTarget"))
        .groupBy(col("bin"))
        .agg(
          graft.common.Exact.lcountAll.as("n_partitions"),
          sum(col("bytes")).as("bin_bytes"),
          min(col("part_date")).as("from_date"),
          max(col("part_date")).as("to_date"),
          sum(when(col("bytes") < lit(CompactTarget / 4), 1L).otherwise(0L))
            .as("n_small_inputs"))
    },
    Some(s"""WITH census AS (
              SELECT CAST(ts AS DATE) AS part_date,
                CAST(SUM(strlen(props) + $RowOverhead) AS BIGINT)
                  AS bytes
              FROM events GROUP BY 1
            ), binned AS (
              SELECT part_date, bytes,
                COALESCE(CAST(SUM(bytes) OVER (ORDER BY part_date ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  AS BIGINT), 0) // $CompactTarget AS bin
              FROM census
            )
            SELECT CAST(bin AS BIGINT) AS bin,
              CAST(count(*) AS BIGINT) AS n_partitions,
              CAST(SUM(bytes) AS BIGINT) AS bin_bytes,
              MIN(part_date) AS from_date,
              MAX(part_date) AS to_date,
              CAST(SUM(CASE WHEN bytes < ${CompactTarget / 4}
                THEN 1 ELSE 0 END) AS BIGINT) AS n_small_inputs
            FROM binned GROUP BY 1"""),
    "compaction bin-packing plan: date-ordered first-fit, integer size census [layout]")

  def all: Seq[(String, QueryDef)] = Seq(
    "q95_zorder_key" -> q95,
    "q203_compaction_plan" -> q203)
}
