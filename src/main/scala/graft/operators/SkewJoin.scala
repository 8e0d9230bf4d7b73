package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation join utilities (SURVEY.md scale notes; the mechanism
  * behind "salting for skew" when AQE's runtime skew-split isn't enough —
  * e.g. one hot key dominating a shuffle join where the other side is too
  * big to broadcast).
  *
  * `saltedJoin` replicates the right side `saltFactor` times and sprays
  * the left side's hot keys across the replicas:
  * left gets salt = pmod(xxhash64(whole-row-ish entropy), saltFactor);
  * right is exploded with all salt values. Each (key, salt) partition then
  * holds ~1/saltFactor of the hot key's rows. Join semantics are
  * unchanged for inner/left joins on equi keys.
  */
object SkewJoin {

  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      joinType: String = "inner", saltFactor: Int = 8): DataFrame = {
    require(saltFactor > 0)
    // deterministic per-row spray: hash all left columns (monotonically_
    // increasing_id would break rerun determinism across partitionings)
    val leftSalted = left.withColumn("_salt",
      pmod(xxhash64(left.columns.map(col): _*), lit(saltFactor)).cast("int"))
    val rightSalted = right.withColumn("_salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    leftSalted.join(rightSalted, keys :+ "_salt", joinType).drop("_salt")
  }

  /** Top-N heavy-hitter keys of a would-be join column — the detection
    * step that decides between broadcast / salt / AQE-only. One pass,
    * partial-aggregated.
    */
  def heavyHitters(df: DataFrame, key: String, topN: Int = 20): DataFrame =
    df.groupBy(key).agg(count(lit(1)).as("n_rows"))
      .orderBy(col("n_rows").desc, col(key).asc)
      .limit(topN)
}
