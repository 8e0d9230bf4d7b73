package graft.queries

import graft.QueryDef
import graft.common.Tables.load
import org.apache.spark.sql.functions._

/** Robust outlier detection over `events.value` per event_type:
  * median/MAD z-scores (the heavy-tail-safe alternative to mean/stddev,
  * which a single spike corrupts). A curation primitive — the same
  * med/MAD gate filters anomalous quality scores, lengths, or loss
  * values before they reach a training mix.
  */
object Outliers {

  /** 1/Φ⁻¹(3/4): scales MAD to estimate σ under normality. Spelled once;
    * the oracle uses the identical literal so both engines parse the
    * same double.
    */
  private val MadToSigma = "1.4826"

  private val ZThreshold = "3.0"

  /** q120: |robust z| > 3 outliers.
    *
    * Scale: two grouped medians over the SAME event_type partitioning.
    * The group count is tiny (event types), so both median tables join
    * back as broadcasts and the fact table is scanned twice but never
    * shuffled on a data-sized key — exact medians need their group's
    * values together, which the broadcast-back pattern gets without
    * repartitioning the facts. (With high-cardinality groups the exact
    * median would become approx_percentile or a fixed-point rank pass;
    * at |groups| ≪ |rows| this shape is strictly cheaper.)
    *
    * Float parity: exact — median interpolation is (a+b)/2 in both
    * engines, abs/subtract/multiply/divide are single IEEE ops on
    * identical doubles; there is no multi-term float sum anywhere.
    */
  private val q120 = QueryDef(
    (s, d) => {
      val ev = load(s, d, "events")
        .select(col("event_id"), col("event_type"), col("value"))
      val med = ev.groupBy(col("event_type"))
        .agg(median(col("value")).as("med"))
      val dev = ev.join(broadcast(med), "event_type")
        .withColumn("adev", abs(col("value") - col("med")))
      val mad = dev.groupBy(col("event_type"))
        .agg(median(col("adev")).as("mad"))
      dev.join(broadcast(mad), "event_type")
        .filter(col("mad") > 0)
        .withColumn("robust_z",
          (col("value") - col("med")) /
            (lit(MadToSigma.toDouble) * col("mad")))
        .filter(abs(col("robust_z")) > lit(ZThreshold.toDouble))
        .select("event_id", "event_type", "value", "med", "mad", "robust_z")
    },
    Some(s"""WITH med AS (
              SELECT event_type, median(value) AS med
              FROM events GROUP BY 1
            ), dev AS (
              SELECT e.event_id, e.event_type, e.value, m.med,
                abs(e.value - m.med) AS adev
              FROM events e JOIN med m USING (event_type)
            ), mad AS (
              SELECT event_type, median(adev) AS mad
              FROM dev GROUP BY 1
            )
            SELECT d.event_id, d.event_type, d.value, d.med, m.mad,
              (d.value - d.med) / ($MadToSigma * m.mad) AS robust_z
            FROM dev d JOIN mad m USING (event_type)
            WHERE m.mad > 0
              AND abs((d.value - d.med) / ($MadToSigma * m.mad))
                > $ZThreshold"""),
    "median/MAD robust outliers: broadcast-back medians, exact float ops [outliers]")

  def all: Seq[(String, QueryDef)] = Seq(
    "q120_robust_outliers" -> q120)
}
