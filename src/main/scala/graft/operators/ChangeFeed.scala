package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot differencing — the row-level change feed (CDC) between two
  * states of a keyed table. The reference's Delta layer exposes this as
  * Change Data Feed; the engine derives it from snapshots instead of a
  * logged change stream, so it works between ANY two keyed frames — two
  * table-layer versions (`ParquetTable.changesBetween` feeds it only the
  * manifest-diff files), a source extract vs. its previous load, or two
  * deterministic in-plan states (q105).
  *
  * Scale shape: ONE full-outer sort-merge join, both sides shuffled on
  * the key — no collect, no window. Unchanged rows are dropped post-join
  * with a null-safe column comparison (`<=>`), so the output is bounded
  * by the true change count. When the inputs come from
  * `changesBetween`'s manifest diff, the join inputs are already only
  * the REWRITTEN files' rows — the overwhelmingly common case where a
  * merge touched 0.1% of files joins 0.1% of the table.
  */
object ChangeFeed {

  /** Row-level diff of two keyed snapshots.
    *
    * @param oldSnap the earlier state (keys unique per row)
    * @param newSnap the later state (keys unique per row)
    * @param keys    join key columns (present in both)
    * @param compare value columns whose change makes a row an `update`
    * @return keys ++ (old_c, new_c per compare col) ++ change_type in
    *         {insert, update, delete}; rows equal on every compare col
    *         (null-safe) are omitted
    */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
      keys: Seq[String], compare: Seq[String]): DataFrame = {
    // lit(true) presence markers distinguish "row absent from that side"
    // from "row present with null values" after the full-outer join
    val o = oldSnap.select(
      keys.map(col) ++ compare.map(c => col(c).as(s"old_$c"))
        :+ lit(true).as("__old_p"): _*)
    val n = newSnap.select(
      keys.map(col) ++ compare.map(c => col(c).as(s"new_$c"))
        :+ lit(true).as("__new_p"): _*)
    val changed = compare
      .map(c => !(col(s"old_$c") <=> col(s"new_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    o.join(n, keys, "full_outer")
      .withColumn("change_type",
        when(col("__old_p").isNull, "insert")
          .when(col("__new_p").isNull, "delete")
          .when(changed, "update"))
      .filter(col("change_type").isNotNull)
      .drop("__old_p", "__new_p")
  }
}
