package graft.queries

import graft.QueryDef
import graft.common.Tables.load
import org.apache.spark.sql.functions._

/** Privacy-preserving export operators: the anonymization pass a
  * training-data pipeline applies to identity-bearing dimensions before
  * the rows may leave the governed zone. The reference keeps raw
  * customer keys through bronze→gold; a compliant training export needs
  * the PII-safe rendering of the same dimension.
  */
object PrivacyOps {

  /** Static salt of the keyed pseudonymization. A production deploy
    * injects this from a secret store; the pipeline's determinism
    * contract only needs it constant within one export.
    */
  private val Pepper = "graft-export-pepper"

  /** q129: PII-safe customer export — the three standard anonymization
    * primitives in one pass:
    *   - masking: every digit of the display name is replaced (the
    *     name's numeric tail IS the natural key);
    *   - keyed pseudonymization: md5(pepper ++ key) yields a join-stable
    *     surrogate that cannot be reversed without the pepper, so
    *     downstream tables can still co-group on the pseudonym;
    *   - generalization: the account balance coarsens to a $1000 band
    *     (k-anonymity style — the exact balance is quasi-identifying).
    *
    * Scale: a pure narrow projection — zero shuffle, whole-stage
    * codegen'd, saturates scan I/O at any corpus size. The digit-count
    * audit column exists so a DQ gate can assert nothing slipped
    * through (`n_digits_redacted = 0` rows are suspicious names).
    *
    * Float parity: floor(balance/1000) is one IEEE division + floor,
    * identical in both engines; everything else is integer/string.
    */
  private val q129 = QueryDef(
    (s, d) =>
      load(s, d, "customer").select(
        col("c_custkey"),
        regexp_replace(col("c_name"), "[0-9]", "#").as("masked_name"),
        md5(concat(lit(Pepper + "-"), col("c_custkey").cast("string")))
          .as("pseudonym"),
        (length(col("c_name")) -
          length(regexp_replace(col("c_name"), "[0-9]", "")))
          .cast("int").as("n_digits_redacted"),
        floor(col("c_acctbal") / 1000.0).cast("long").as("acctbal_band"),
        col("c_mktsegment")),
    Some(s"""SELECT c_custkey,
              regexp_replace(c_name, '[0-9]', '#', 'g') AS masked_name,
              md5(concat('$Pepper-', CAST(c_custkey AS VARCHAR)))
                AS pseudonym,
              CAST(length(c_name) -
                length(regexp_replace(c_name, '[0-9]', '', 'g')) AS INTEGER)
                AS n_digits_redacted,
              CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS acctbal_band,
              c_mktsegment
            FROM customer"""),
    "PII-safe export: digit masking, keyed md5 pseudonym, balance band [privacy]")

  /** k-anonymity threshold of the q195 audit: equivalence classes
    * smaller than this re-identify their members.
    */
  private val KAnon = 5L

  /** q195: k-anonymity audit of q129's release schema — BEFORE an
    * export ships, measure how identifying its quasi-identifier
    * combination (nation, segment, $1000 balance band) actually is.
    * Rows group into equivalence classes on the QI tuple; the audit
    * reports the class-SIZE distribution: for each observed class
    * size, how many classes and rows sit at it, whether that size
    * violates k=$5, and the share of the release at that risk level.
    * `k_min` (the smallest class) rides along on every row — the one
    * number a privacy review asks for first.
    *
    * Scale: two nested aggregates — the QI fold touches the corpus
    * once (map-side combined), the size fold runs on the |classes|
    * frame; totals and k_min are window marginals over the ≤|sizes|
    * result frame itself (q185's trick). Entirely integer arithmetic
    * except two single divisions.
    */
  private val q195 = QueryDef(
    (s, d) => {
      val classes = load(s, d, "customer")
        .groupBy(col("c_nationkey"), col("c_mktsegment"),
          floor(col("c_acctbal") / 1000.0).cast("long").as("acctbal_band"))
        .agg(graft.common.Exact.lcountAll.as("class_size"))
      val bySize = classes.groupBy(col("class_size"))
        .agg(graft.common.Exact.lcountAll.as("n_classes"))
      val all = org.apache.spark.sql.expressions.Window.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
      bySize
        .withColumn("n_rows", col("class_size") * col("n_classes"))
        .withColumn("n_total", sum(col("n_rows")).over(all))
        .withColumn("k_min", min(col("class_size")).over(all))
        .select(col("class_size"), col("n_classes"), col("n_rows"),
          (col("class_size") < KAnon).as("violates_k"),
          (col("n_rows").cast("double") / col("n_total").cast("double"))
            .as("row_share"),
          col("k_min"))
    },
    Some(s"""WITH cls AS (
              SELECT c_nationkey, c_mktsegment,
                CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS acctbal_band,
                CAST(count(*) AS BIGINT) AS class_size
              FROM customer GROUP BY 1, 2, 3
            ), sz AS (
              SELECT class_size, CAST(count(*) AS BIGINT) AS n_classes
              FROM cls GROUP BY 1
            ), m AS (
              SELECT class_size, n_classes,
                class_size * n_classes AS n_rows,
                CAST(SUM(class_size * n_classes) OVER () AS BIGINT)
                  AS n_total,
                CAST(MIN(class_size) OVER () AS BIGINT) AS k_min
              FROM sz
            )
            SELECT class_size, n_classes, n_rows,
              class_size < $KAnon AS violates_k,
              CAST(n_rows AS DOUBLE) / CAST(n_total AS DOUBLE) AS row_share,
              k_min
            FROM m"""),
    "k-anonymity audit: QI equivalence-class size distribution + k_min [privacy]")

  /** l-diversity threshold of the q213 audit: an equivalence class
    * whose sensitive attribute takes fewer than this many distinct
    * values discloses the attribute even when k-anonymity holds.
    */
  private val LDiv = 3L

  /** q213: l-diversity audit — the attribute-disclosure complement of
    * q195's k-anonymity (Machanavajjhala et al., ICDE'06): a class of
    * 50 rows is 50-anonymous, but if all 50 share one market segment,
    * membership alone discloses the segment. Quasi-identifiers here
    * are (nation, $1000 balance band); the SENSITIVE attribute is the
    * market segment (deliberately moved out of q195's QI triple into
    * the protected role). Per class: size, distinct-l, the dominant
    * segment's share (the homogeneity-attack success rate), and the
    * l < $LDiv violation flag; `l_min` rides along as the headline.
    *
    * Scale: two nested keyed aggregates — the (QI, segment) fold
    * touches the corpus once map-side-combined; everything after runs
    * on the |classes·segments| frame. Integer evidence throughout;
    * the share is one long/long double division (q195's discipline —
    * entropy-l-diversity would add a transcendental for no audit
    * value).
    */
  private val q213 = QueryDef(
    (s, d) => {
      val cells = load(s, d, "customer")
        .groupBy(col("c_nationkey"),
          floor(col("c_acctbal") / 1000.0).cast("long").as("acctbal_band"),
          col("c_mktsegment"))
        .agg(graft.common.Exact.lcountAll.as("n_seg"))
      val all = org.apache.spark.sql.expressions.Window.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
      cells.groupBy(col("c_nationkey"), col("acctbal_band"))
        .agg(sum(col("n_seg")).as("class_size"),
          graft.common.Exact.lcountAll.as("l_distinct"),
          max(col("n_seg")).as("top_seg_rows"))
        .withColumn("l_min", min(col("l_distinct")).over(all))
        .select(col("c_nationkey"), col("acctbal_band"),
          col("class_size"), col("l_distinct"),
          (col("l_distinct") < LDiv).as("violates_l"),
          (col("top_seg_rows").cast("double") /
            col("class_size").cast("double")).as("top_seg_share"),
          col("l_min"))
    },
    Some(s"""WITH cells AS (
              SELECT c_nationkey,
                CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS acctbal_band,
                c_mktsegment, CAST(count(*) AS BIGINT) AS n_seg
              FROM customer GROUP BY 1, 2, 3
            ), cls AS (
              SELECT c_nationkey, acctbal_band,
                CAST(SUM(n_seg) AS BIGINT) AS class_size,
                CAST(count(*) AS BIGINT) AS l_distinct,
                CAST(MAX(n_seg) AS BIGINT) AS top_seg_rows
              FROM cells GROUP BY 1, 2
            )
            SELECT c_nationkey, acctbal_band, class_size, l_distinct,
              l_distinct < $LDiv AS violates_l,
              CAST(top_seg_rows AS DOUBLE) / CAST(class_size AS DOUBLE)
                AS top_seg_share,
              CAST(MIN(l_distinct) OVER () AS BIGINT) AS l_min
            FROM cls"""),
    "l-diversity audit: sensitive-attribute distinctness per QI class " +
      "+ homogeneity share [privacy]")

  /** t-closeness threshold of the q229 audit (Li et al., ICDE'07 use
    * 0.15–0.2 as the illustrative release bar).
    */
  private val TClose = 0.2

  /** q229: t-closeness audit — the distribution-disclosure member of
    * the release triad (q195 k-anonymity: classes big enough; q213
    * l-diversity: sensitive values varied enough; this: each class's
    * sensitive DISTRIBUTION close enough to the global one — a class
    * can be 50-anonymous and 3-diverse yet still reveal "balances here
    * skew high"). Quasi-identifiers are (nation, segment); the
    * sensitive attribute is the ORDERED $1000 balance band, so the
    * distance is the ordered-attribute Earth-Mover's Distance of Li et
    * al.: EMD = Σ_k |Σ_{i≤k}(p_i − q_i)| / (m−1) over the m global
    * band levels in value order.
    *
    * Scale: one (QI, band) corpus fold map-side combines everything;
    * the class × band grid is |nations·segments| × |bands| — both
    * factors value-domain-bounded (bands are floor(balance/1000) of a
    * model-bounded balance range), so the broadcast of the band
    * marginal and the per-class prefix windows are bounded work at any
    * corpus size.
    *
    * Exactness: the prefix difference is folded as the exact integer
    * numerator c_cum·N − C_cum·n_g over the common denominator n_g·N
    * (operands cast to DECIMAL(38,0) BEFORE the products so a 100 TB
    * corpus cannot overflow i64); the EMD is ONE terminal division of
    * that exact numerator sum by n_g·N·(m−1) — hash-exact, and the
    * violation flag compares identical doubles. The numerator is
    * EMITTED as a canonical decimal STRING (the q89 surface rule —
    * the driver's hash canonicalization handles STRING, not DECIMAL):
    * its bound m·n_g·N reaches ~2e19 > 2^63 at a 100 TB corpus
    * (n_g ≈ 1.2e8 per (nation, segment) class, N ≈ 1.5e10, m = 11
    * bands), so BIGINT would overflow exactly at the target scale.
    */
  private val q229 = QueryDef(
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
      val cells = load(s, d, "customer")
        .groupBy(col("c_nationkey"), col("c_mktsegment"),
          floor(col("c_acctbal") / 1000.0).cast("long").as("band"))
        .agg(graft.common.Exact.lcountAll.as("c"))
      val global = cells.groupBy(col("band"))
        .agg(sum(col("c")).as("gc"))
        .withColumn("n_total", sum(col("gc")).over(w.rowsBetween(
          w.unboundedPreceding, w.unboundedFollowing)))
        .withColumn("m_bands", count(lit(1)).over(w.rowsBetween(
          w.unboundedPreceding, w.unboundedFollowing)))
      val classes = cells.groupBy(col("c_nationkey"), col("c_mktsegment"))
        .agg(sum(col("c")).as("class_size"))
      val byClass = w.partitionBy(col("c_nationkey"), col("c_mktsegment"))
      val grid = classes.crossJoin(broadcast(global))
        .join(cells, Seq("c_nationkey", "c_mktsegment", "band"), "left")
        .withColumn("c", coalesce(col("c"), lit(0L)))
        .withColumn("c_cum",
          sum(col("c")).over(byClass.orderBy(col("band").asc)))
        .withColumn("gc_cum",
          sum(col("gc")).over(byClass.orderBy(col("band").asc)))
        .withColumn("pref_num",
          abs(col("c_cum").cast("decimal(38,0)") *
              col("n_total").cast("decimal(38,0)") -
            col("gc_cum").cast("decimal(38,0)") *
              col("class_size").cast("decimal(38,0)")))
      grid.groupBy(col("c_nationkey"), col("c_mktsegment"))
        .agg(max(col("class_size")).as("class_size"),
          max(col("m_bands")).as("m_bands"),
          max(col("n_total")).as("n_total"),
          sum(col("pref_num")).cast("decimal(38,0)").as("emd_num"))
        .withColumn("emd",
          col("emd_num").cast("double") /
            (col("class_size").cast("double") *
              col("n_total").cast("double") *
              (col("m_bands") - 1L).cast("double")))
        .select(col("c_nationkey"), col("c_mktsegment"),
          col("class_size"), col("m_bands"),
          col("emd_num").cast("string").as("emd_num"), col("emd"),
          (col("emd") > TClose).as("violates_t"),
          max(col("emd")).over(w.rowsBetween(
            w.unboundedPreceding, w.unboundedFollowing)).as("t_max"))
    },
    Some(s"""WITH cells AS (
              SELECT c_nationkey, c_mktsegment,
                CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS band,
                CAST(count(*) AS BIGINT) AS c
              FROM customer GROUP BY 1, 2, 3
            ), gmarg AS (
              SELECT band, CAST(SUM(c) AS BIGINT) AS gc,
                CAST(SUM(SUM(c)) OVER () AS BIGINT) AS n_total,
                CAST(COUNT(*) OVER () AS BIGINT) AS m_bands
              FROM cells GROUP BY 1
            ), cls AS (
              SELECT c_nationkey, c_mktsegment,
                CAST(SUM(c) AS BIGINT) AS class_size
              FROM cells GROUP BY 1, 2
            ), grid AS (
              SELECT cl.c_nationkey, cl.c_mktsegment, cl.class_size,
                g.band, g.gc, g.n_total, g.m_bands,
                COALESCE(ce.c, 0) AS c
              FROM cls cl CROSS JOIN gmarg g
              LEFT JOIN cells ce ON ce.c_nationkey = cl.c_nationkey
                AND ce.c_mktsegment = cl.c_mktsegment
                AND ce.band = g.band
            ), pref AS (
              SELECT c_nationkey, c_mktsegment, class_size, m_bands,
                n_total,
                abs(CAST(SUM(c) OVER cw AS HUGEINT) * n_total
                  - CAST(SUM(gc) OVER cw AS HUGEINT) * class_size)
                  AS pref_num
              FROM grid
              WINDOW cw AS (PARTITION BY c_nationkey, c_mktsegment
                ORDER BY band ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            ), agg AS (
              SELECT c_nationkey, c_mktsegment,
                CAST(MAX(class_size) AS BIGINT) AS class_size,
                CAST(MAX(m_bands) AS BIGINT) AS m_bands,
                CAST(MAX(n_total) AS BIGINT) AS n_total,
                SUM(pref_num) AS emd_num
              FROM pref GROUP BY 1, 2
            )
            SELECT c_nationkey, c_mktsegment, class_size, m_bands,
              CAST(emd_num AS VARCHAR) AS emd_num,
              CAST(emd_num AS DOUBLE) /
                (CAST(class_size AS DOUBLE) * CAST(n_total AS DOUBLE)
                 * CAST(m_bands - 1 AS DOUBLE)) AS emd,
              CAST(emd_num AS DOUBLE) /
                (CAST(class_size AS DOUBLE) * CAST(n_total AS DOUBLE)
                 * CAST(m_bands - 1 AS DOUBLE)) > $TClose AS violates_t,
              MAX(CAST(emd_num AS DOUBLE) /
                (CAST(class_size AS DOUBLE) * CAST(n_total AS DOUBLE)
                 * CAST(m_bands - 1 AS DOUBLE))) OVER () AS t_max
            FROM agg"""),
    "t-closeness audit: ordered-band EMD per QI class vs the global " +
      "distribution, exact integer numerators [privacy]")

  def all: Seq[(String, QueryDef)] = Seq(
    "q129_pii_export" -> q129,
    "q195_k_anonymity" -> q195,
    "q213_l_diversity" -> q213,
    "q229_t_closeness" -> q229)
}
