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

  /** q203's first-fit consecutive bin packing as a pure function —
    * exclusive-running-total div target over an ORDERED size census,
    * returning one row per planned output file: (bin, n_inputs,
    * bin_bytes, n_small_inputs) with "small" = under target/4, exactly
    * the q203 row shape. Shared by the `--maintain` CLI pass
    * (`TableMain`), which runs the same planner over a table's
    * manifest file census (driver-side strings + sizes, zero data
    * read) and applies the plan — so the planner the registry tests is
    * the planner maintenance executes.
    */
  private[graft] def packBins(sizes: Seq[Long],
      target: Long): Seq[(Long, Int, Long, Int)] = {
    require(target > 0)
    var cum = 0L
    val binned = sizes.map { b =>
      val bin = cum / target
      cum += b
      (bin, b)
    }
    binned.groupBy(_._1).toSeq.sortBy(_._1).map { case (bin, xs) =>
      (bin, xs.size, xs.map(_._2).sum, xs.count(_._2 < target / 4))
    }
  }

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

  /** Heavy keys surfaced by the skew profile. */
  private val SkewTopK = 20

  /** q207: join-key skew profile over `events.user_id` — the key every
    * per-user operator in this engine shuffles on. Emits the TopK
    * heaviest keys with their row share and the salt factor
    * (ceil(cnt/avg)) a skew-mitigation pass (operators.SkewJoin /
    * q124's salting) would replicate the build side by — the planning
    * evidence BEFORE a 100-TB shuffle keels over on one hot key,
    * where q124 is the mitigation and AQE skew-join the runtime
    * backstop.
    *
    * Scale: the key census is one map-side-combined fold; the TopK cut
    * is `orderBy.limit` → TakeOrderedAndProject (per-partition heaps +
    * driver merge of K rows, NEVER a global sort — the q14 contract);
    * the census stats ride onto the 20-row frame as a 1-row broadcast.
    *
    * Exactness: pure i64 (counts, ppm shares, div ratios); avg ≥ 1 by
    * construction (every censused key has ≥ 1 row), so no zero-divide
    * guard is needed.
    */
  private val q207 = QueryDef(
    (s, d) => {
      val counts = load(s, d, "events")
        .groupBy(col("user_id").as("key"))
        .agg(graft.common.Exact.lcountAll.as("cnt"))
      val stats = counts.agg(
        sum(col("cnt")).as("total_rows"),
        graft.common.Exact.lcountAll.as("n_keys"))
      counts.orderBy(col("cnt").desc, col("key").asc).limit(SkewTopK)
        .crossJoin(broadcast(stats))
        .withColumn("avg_per_key", expr("total_rows div n_keys"))
        .select(col("key"), col("cnt"), col("total_rows"), col("n_keys"),
          col("avg_per_key"),
          expr("(cnt * 1000000) div total_rows").as("share_ppm"),
          expr("cnt div avg_per_key").as("skew_x"),
          expr("(cnt + avg_per_key - 1) div avg_per_key").as("salt_factor"))
    },
    Some(s"""WITH c AS (
              SELECT user_id AS key, CAST(count(*) AS BIGINT) AS cnt
              FROM events GROUP BY 1
            ), st AS (
              SELECT CAST(SUM(cnt) AS BIGINT) AS total_rows,
                CAST(count(*) AS BIGINT) AS n_keys
              FROM c
            ), top AS (
              SELECT key, cnt FROM c
              ORDER BY cnt DESC, key ASC LIMIT $SkewTopK
            )
            SELECT t.key, t.cnt, st.total_rows, st.n_keys,
              CAST(st.total_rows // st.n_keys AS BIGINT) AS avg_per_key,
              CAST((t.cnt * 1000000) // st.total_rows AS BIGINT)
                AS share_ppm,
              CAST(t.cnt // (st.total_rows // st.n_keys) AS BIGINT)
                AS skew_x,
              CAST((t.cnt + st.total_rows // st.n_keys - 1) //
                (st.total_rows // st.n_keys) AS BIGINT) AS salt_factor
            FROM top t, st"""),
    "join-key skew profile: census fold, TakeOrdered cut, salt factors [layout]")

  def all: Seq[(String, QueryDef)] = Seq(
    "q95_zorder_key" -> q95,
    "q203_compaction_plan" -> q203,
    "q207_skew_profile" -> q207)
}
