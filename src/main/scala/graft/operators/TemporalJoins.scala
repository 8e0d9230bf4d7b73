package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks as built-ins (builder-brief
  * extension list: as-of join, range join), composed from existing
  * relational ops so Catalyst plans them — preference (a) from the
  * custom-operator ladder, no custom physical operator needed.
  */
object TemporalJoins {

  /** Backward as-of join: for every left row, attach the single latest
    * right row with the same key and `rightTs <= leftTs` (ties broken by
    * the highest `rightTs`, then highest tie-break column).
    *
    * Implementation is the scalable union trick — NOT a per-key loop and
    * NOT an inequality join: tag both sides, union, one window sorted by
    * (ts, side, tieBreak) per key, carry the right payload forward with
    * last_value(ignoreNulls), keep left rows. One shuffle + one sort,
    * linear in |L|+|R|; at 100 TB this is the same cost as any keyed
    * window, with none of the quadratic blowup an inequality join has.
    *
    * @param left      left rows
    * @param right     right rows
    * @param key       equi-key column name present on both sides
    * @param leftTs    left timestamp column name
    * @param rightTs   right timestamp column name
    * @param payload   right columns to attach (renamed as given)
    * @param tieBreak  right column ordering ties at equal rightTs
    */
  def asofBackward(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, payload: Seq[(String, String)],
      tieBreak: String): DataFrame = {
    val leftCols = left.columns.toSeq
    // the payload travels as ONE struct so the attached values always come
    // from the SAME right row — carrying columns independently with
    // last(ignoreNulls) would stitch a phantom row together whenever a
    // payload field is null in the matched row but set in an older one
    val payloadStruct = struct(payload.map { case (from, as) =>
      col(from).as(as)
    }: _*)
    val tieType = right.schema(tieBreak).dataType
    val taggedLeft = left.select(
      leftCols.map(col) ++ Seq(
        lit(null).cast(
          org.apache.spark.sql.types.StructType(payload.map { case (f, a) =>
            org.apache.spark.sql.types.StructField(
              a, right.schema(f).dataType, nullable = true)
          })).as("_payload"),
        col(leftTs).as("_ts"), lit(1).as("_side"),
        lit(null).cast(tieType).as("_tie")): _*)
    val taggedRight = right.select(
      leftCols.map { c =>
        if (c == key) col(key)
        else lit(null).cast(left.schema(c).dataType).as(c)
      } ++ Seq(payloadStruct.as("_payload"),
        col(rightTs).as("_ts"), lit(0).as("_side"),
        col(tieBreak).as("_tie")): _*)

    // right rows sort BEFORE left rows at equal ts: "at or before" includes
    // an exactly-simultaneous right row; _tie keeps its native type and
    // ordering (no lossy cast)
    val w = Window.partitionBy(col(key))
      .orderBy(col("_ts").asc, col("_side").asc, col("_tie").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = taggedLeft.unionByName(taggedRight)
      .withColumn("_payload", last(col("_payload"), ignoreNulls = true).over(w))
    payload.foldLeft(carried.filter(col("_side") === 1)) {
      case (df, (_, as)) => df.withColumn(as, col(s"_payload.$as"))
    }.drop("_ts", "_side", "_tie", "_payload")
  }

  /** Bucketed range join: pairs within `rangeSeconds` of each other,
    * without an inequality join. Each side maps to epoch buckets of
    * `rangeSeconds`; the right side additionally lands in both neighbor
    * buckets, so every true pair shares >=1 bucket; an exact range filter
    * removes the false candidates. Shuffle volume is 3x the input rows —
    * constant factor, never quadratic, and the bucket key shards evenly.
    */
  def rangeJoinCount(events: DataFrame, tsCol: String, idCol: String,
      rangeSeconds: Int): DataFrame = {
    // exact microsecond arithmetic: unix_timestamp() truncates to whole
    // seconds, which would admit pairs up to rangeSeconds+0.99s apart
    val rangeMicros = rangeSeconds * 1000000L
    val micros = unix_micros(col(tsCol))
    val bucket = (micros / rangeMicros).cast("long")
    val l = events.select(col(idCol).as("_lid"), micros.as("_lus"),
      bucket.as("_bkt"))
    val r = events.select(col(idCol).as("_rid"), micros.as("_rus"),
      bucket.as("_rbkt"))
      .withColumn("_bkt",
        explode(array(col("_rbkt") - 1, col("_rbkt"), col("_rbkt") + 1)))
      .drop("_rbkt")
    l.join(r, Seq("_bkt"))
      .filter(col("_lid") =!= col("_rid") &&
        abs(col("_lus") - col("_rus")) <= rangeMicros)
      .select(col("_lid"), col("_rid")).distinct() // bucket overlap dedupe
      .groupBy(col("_lid")).agg(count(lit(1)).as("n_neighbors"))
  }

  /** Directed windowed join: every (left, right) pair with the same key
    * and `leftTs <= rightTs <= leftTs + windowSeconds` — the batch form
    * of the stream-stream interval join (conversion attribution: right
    * = purchases, left = the views that may have caused them). Same
    * bucketing discipline as [[rangeJoinCount]] but one-directional, so
    * the right side explodes into only TWO buckets (its own and the
    * previous): shuffle volume is |L| + 2|R|, the exact microsecond
    * filter runs on bucket-colocated candidates only, and a pair can
    * match in at most one bucket copy (the left row's bucket is unique)
    * so no dedup pass is needed. Column names must be disjoint across
    * sides except `key`.
    */
  def directedWindowJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, windowSeconds: Long): DataFrame = {
    val w = windowSeconds * 1000000L
    val lm = unix_micros(col(leftTs))
    val rm = unix_micros(col(rightTs))
    val l = left.withColumn("_bkt", (lm / w).cast("long"))
    val r = right
      .withColumn("_rbkt", (rm / w).cast("long"))
      .withColumn("_bkt",
        explode(array(col("_rbkt") - 1, col("_rbkt"))))
      .drop("_rbkt")
    l.join(r, Seq(key, "_bkt"))
      .filter(rm >= lm && rm <= lm + w)
      .drop("_bkt")
  }

  /** Interval-overlap self-join: every unordered pair of intervals with
    * `a.st <= b.en && b.st <= a.en` (second-granularity, touching
    * endpoints count), found WITHOUT an inequality join. Input columns:
    * `id` (any orderable type — a struct gives lexicographic pair
    * ordering), `st`, `en` (epoch seconds, st <= en). Each interval
    * explodes to the `bucketSeconds` cells it covers (fan-out = interval
    * span / bucket, bounded for bounded spans); candidates share a cell,
    * dedup on the id pair, then the exact overlap filter and length
    * arithmetic run on the candidate set only. Candidate volume is
    * sum-of-cell-occupancy², sharded by the bucket key — never |T|².
    * Known skew mode: a globally hot cell (many concurrent intervals)
    * concentrates its occupancy² pairs in one task; the mitigation is
    * the salted-join pattern from operators.SkewJoin (replicate one
    * side across an id-hash salt inside the hot cell), applied when a
    * cell-occupancy profile (q61-style) flags hot cells.
    */
  def selfIntervalOverlap(intervals: DataFrame,
      bucketSeconds: Long = 3600L): DataFrame = {
    val b = intervals.withColumn("bkt",
      explode(sequence(
        floor(col("st") / bucketSeconds),
        floor(col("en") / bucketSeconds))))
    b.as("a").join(b.as("b"),
        col("a.bkt") === col("b.bkt") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        col("a.st").as("st1"), col("a.en").as("en1"),
        col("b.st").as("st2"), col("b.en").as("en2"))
      .distinct() // multi-cell co-occurrence dedupe
      .filter(col("st1") <= col("en2") && col("st2") <= col("en1"))
      .select(col("id1"), col("id2"),
        (least(col("en1"), col("en2")) - greatest(col("st1"), col("st2")))
          .as("overlap_seconds"))
  }
}
