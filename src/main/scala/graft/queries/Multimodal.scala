package graft.queries

import graft.QueryDef
import graft.multimodal.Media
import org.apache.spark.sql.functions._

/** Multimodal plumbing exposed on the query surface. The metadata/bytes
  * path is oracle-checked (byte length + sha256 of the payload are
  * engine-independent); the stubbed decode + frame sampling are covered
  * by MultimodalSpec.
  */
object Multimodal {

  /** Binary-column metadata: payload size, content hash, typed meta. */
  private val q43 = QueryDef(
    (s, d) =>
      Media.mediaFromDocuments(s, d).toDF().select(
        col("media_id"), col("kind"),
        length(col("bytes")).as("n_bytes"),
        sha2(col("bytes"), 256).as("content_sha256"),
        col("width"), col("height"), col("duration_ms")),
    Some("""SELECT doc_id AS media_id,
              ['image','audio','video'][CAST(doc_id % 3 AS INTEGER) + 1] AS kind,
              CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
              sha256(text) AS content_sha256,
              CAST(doc_id % 8 * 160 + 320 AS INTEGER) AS width,
              CAST(doc_id % 8 * 90 + 180 AS INTEGER) AS height,
              CAST(n_chars * 40 AS BIGINT) AS duration_ms
            FROM documents"""),
    "binary media columns: payload size/hash + typed metadata [multimodal]")

  /** Feature extraction through the mapPartitions decode (real ImageIO
    * for decodable images, real AudioSystem for decodable audio,
    * byte-hash fallback otherwise), then a
    * relational aggregate over the typed output — proves the binary →
    * feature-vector → DataFrame round trip composes with the rest of the
    * engine. The aggregate is fully deterministic (counts, byte totals,
    * and the FeatureDim-wide vector width), so it IS oracle-checkable
    * even though individual feature values are engine-internal: the
    * oracle's literal dim asserts every row really produced a
    * FeatureDim-wide vector. Pixel-exact feature values are asserted in
    * MediaCodecSpec.
    */
  private val q44 = QueryDef(
    (s, d) => {
      val feats = Media.extractFeatures(Media.mediaFromDocuments(s, d))
      feats.toDF().groupBy("kind").agg(
        count(lit(1)).as("n_media"),
        sum(col("n_bytes")).cast("long").as("total_bytes"),
        countDistinct(col("media_id")).cast("long").as("n_distinct"),
        min(size(col("feature"))).as("min_dim"),
        max(size(col("feature"))).as("max_dim"))
    },
    Some(s"""SELECT ['image','audio','video'][CAST(doc_id % 3 AS INTEGER) + 1] AS kind,
              CAST(count(*) AS BIGINT) AS n_media,
              CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
              CAST(count(DISTINCT doc_id) AS BIGINT) AS n_distinct,
              CAST(${Media.FeatureDim} AS INTEGER) AS min_dim,
              CAST(${Media.FeatureDim} AS INTEGER) AS max_dim
            FROM documents GROUP BY 1"""),
    "feature extraction (ImageIO/AudioSystem decode + fallback) + agg " +
      "[multimodal]")

  /** Media decode health per source — the curation report that surfaces
    * a bad crawl (payloads the codecs reject) instead of letting it
    * silently hash-featurize: join the decode flags from the REAL codec
    * pass back to each document's source and aggregate the rate per
    * (source, kind). Runs over [[Media.mediaWithRealPayloads]], where
    * the id % 5 slice carries genuinely decodable generated payloads
    * (PNG / WAV / GFV1 frame container) — so the oracle can predict
    * every row's expected flag from the id rule while the engine earns
    * it by actually decoding: a broken codec, container parser, or
    * payload generator flips rates and fails the hash compare. Plan
    * shape: one narrow decode pass, a broadcast-sized source join, one
    * keyed aggregate with map-side partials.
    */
  private val q90 = QueryDef(
    (s, d) => {
      val feats = Media.extractFeatures(Media.mediaWithRealPayloads(s, d))
      val src = graft.common.Tables.load(s, d, "documents")
        .select(col("doc_id").as("media_id"), col("source"))
      feats.toDF().join(src, "media_id")
        .groupBy(col("source"), col("kind"))
        .agg(
          count(lit(1)).as("n_media"),
          sum(when(col("decoded"), 1L).otherwise(0L)).as("n_decoded"),
          (sum(when(col("decoded"), 1L).otherwise(0L)).cast("double") /
            count(lit(1))).as("decode_rate"),
          // channel-layout surfacing: the widest source layout the
          // decode pass saw, and how many rows' features are a
          // multi-channel MIXDOWN — a stereo crawl silently collapsing
          // to mono statistics shows up here, not in the feature values
          max(col("channels")).as("max_channels"),
          sum(when(col("channels") > 1, 1L).otherwise(0L))
            .as("n_mixdown"))
    },
    // oracle: generated WAVs are mono by construction, so decoded audio
    // rows carry channels=1 and everything else 0 — max_channels is 1
    // exactly for audio groups containing a decodable (id%5=0) row, and
    // n_mixdown is 0 everywhere; an engine that misparses the WAV
    // header (or starts reporting layouts it never decoded) breaks the
    // hash compare
    Some("""SELECT source,
              ['image','audio','video'][CAST(doc_id % 3 AS INTEGER) + 1] AS kind,
              CAST(count(*) AS BIGINT) AS n_media,
              CAST(sum(CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_decoded,
              CAST(sum(CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END)
                AS DOUBLE) / count(*) AS decode_rate,
              CAST(max(CASE WHEN doc_id % 5 = 0 AND doc_id % 3 = 1
                THEN 1 ELSE 0 END) AS INTEGER) AS max_channels,
              CAST(0 AS BIGINT) AS n_mixdown
            FROM documents GROUP BY 1, 2"""),
    "per-source media decode-health audit over real codec passes " +
      "[multimodal,provenance]")

  def all: Seq[(String, QueryDef)] = Seq(
    "q43_multimodal_meta" -> q43,
    "q44_multimodal_features" -> q44,
    "q90_media_decode_health" -> q90)
}
