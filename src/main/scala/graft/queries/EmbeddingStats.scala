package graft.queries

import graft.QueryDef
import graft.common.Tables.load
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding-space monitoring operators: per-vector extreme-value
  * audits, per-label integer-quantized centroids, and the
  * centroid-assignment purity matrix — the checks a production vector
  * pipeline runs before trusting labels or committing a quantization
  * scheme.
  *
  * Numeric discipline: every cross-row accumulation happens in INTEGER
  * milli-units (vectors quantize to ⌊1000·x⌉ at the scan), so sums are
  * associativity-exact under any partitioning and the DuckDB oracle
  * reproduces them bit-for-bit. Doubles appear only in per-row folds in
  * list order and in single final divisions — both bitwise-portable.
  */
object EmbeddingStats {

  /** Quantization scale (milli-units). Sums of ⌊1000·x⌉ stay exact in
    * i64 up to ~9·10^15 ≈ 10^12 unit-norm vectors per (label, dim)
    * group — beyond that the centroid pass switches to DECIMAL(38,0),
    * same plan shape.
    */
  private val Scale = 1000.0

  private[queries] def qmilli(x: Column): Column =
    floor(x * Scale + 0.5).cast("long")

  /** q135: per-vector extreme-value audit — the largest |coordinate|,
    * how many coordinates are "hot" (|x| ≥ 0.25: for unit-norm vectors
    * at most 16 can be), and which dimension dominates. Feature-health
    * dashboards read this to catch dead/exploding dimensions and
    * vectors that collapsed onto one axis.
    *
    * Scale: pure narrow per-row array expressions — zero shuffle, a
    * map job at any corpus size.
    */
  private val q135 = QueryDef(
    (s, d) => {
      val absd = transform(col("embedding").cast("array<double>"), abs(_))
      load(s, d, "embeddings").select(
        col("vec_id"), col("label"),
        array_max(absd).as("max_abs"),
        size(filter(absd, _ >= 0.25)).cast("long").as("n_hot"),
        array_position(absd, array_max(absd)).cast("long").as("dom_dim"))
    },
    Some("""SELECT vec_id, label,
              list_reduce(list_transform(embedding,
                  x -> abs(CAST(x AS DOUBLE))),
                (a, b) -> CASE WHEN b > a THEN b ELSE a END) AS max_abs,
              CAST(len(list_filter(list_transform(embedding,
                  x -> abs(CAST(x AS DOUBLE))), v -> v >= 0.25))
                AS BIGINT) AS n_hot,
              CAST(list_position(list_transform(embedding,
                  x -> abs(CAST(x AS DOUBLE))),
                list_reduce(list_transform(embedding,
                    x -> abs(CAST(x AS DOUBLE))),
                  (a, b) -> CASE WHEN b > a THEN b ELSE a END))
                AS BIGINT) AS dom_dim
            FROM embeddings"""),
    "per-vector extremes: max|x|, hot dims, dominant axis — zero shuffle [embedding]")

  /** (vec_id, label, dim, qv): the corpus quantized to milli-units,
    * one row per coordinate. The posexplode fan-out (64× rows) carries
    * only 4 narrow columns — at 100 TB this is the standard
    * coordinate-exchange layout, partitioned by (label, dim) at the
    * agg with map-side combine collapsing it 500k:1 before shuffle.
    */
  private def coords(s: SparkSession, d: String): DataFrame =
    load(s, d, "embeddings")
      .select(col("vec_id"), col("label"),
        posexplode(col("embedding").cast("array<double>"))
          .as(Seq("dim", "x")))
      .select(col("vec_id"), col("label"), col("dim"), qmilli(col("x")).as("qv"))

  /** (clabel, dim, cm): per-label centroid in milli-units —
    * cm = ⌊sum_q/n⌉, one double division + floor on exact integers, so
    * both engines round to the identical integer centroid.
    */
  private[queries] def centroidsMilli(s: SparkSession, d: String): DataFrame =
    coords(s, d)
      .groupBy(col("label").as("clabel"), col("dim"))
      .agg(count(lit(1)).as("n"), sum("qv").as("sum_q"))
      .select(col("clabel"), col("dim"),
        floor(col("sum_q").cast("double") / col("n").cast("double") + 0.5)
          .cast("long").as("cm"))

  private[queries] val CoordsSql =
    """SELECT vec_id, label, dim - 1 AS dim,
         CAST(floor(CAST(embedding[dim] AS DOUBLE) * 1000.0 + 0.5)
           AS BIGINT) AS qv
       FROM (SELECT vec_id, label, embedding,
               unnest(generate_series(1, len(embedding))) AS dim
             FROM embeddings)"""

  /** q136: per-(label, dim) centroid table — n, exact integer
    * coordinate sum, the milli-unit centroid, and the double rendering.
    * |labels|·dim rows out; this is the model card's "where does each
    * class live" table and q137's input.
    */
  private val q136 = QueryDef(
    (s, d) =>
      coords(s, d)
        .groupBy(col("label"), col("dim"))
        .agg(count(lit(1)).as("n_vecs"), sum("qv").as("sum_q"))
        .select(col("label"), col("dim").cast("long").as("dim"),
          col("n_vecs"), col("sum_q"),
          floor(col("sum_q").cast("double") / col("n_vecs").cast("double")
            + 0.5).cast("long").as("centroid_milli"),
          (col("sum_q").cast("double") /
            (col("n_vecs").cast("double") * Scale)).as("centroid")),
    Some(s"""WITH q AS ($CoordsSql)
            SELECT label, dim, CAST(count(*) AS BIGINT) AS n_vecs,
              CAST(SUM(qv) AS BIGINT) AS sum_q,
              CAST(floor(CAST(SUM(qv) AS DOUBLE) /
                CAST(count(*) AS DOUBLE) + 0.5) AS BIGINT)
                AS centroid_milli,
              CAST(SUM(qv) AS DOUBLE) /
                (CAST(count(*) AS DOUBLE) * 1000.0) AS centroid
            FROM q GROUP BY 1, 2"""),
    "per-label quantized centroids: coordinate exchange, exact integer sums [embedding]")

  /** q137: centroid-assignment purity — every vector assigned to its
    * nearest label centroid (squared L2 in integer milli-space, ties to
    * the lower label), aggregated into the label×assigned confusion
    * matrix. Off-diagonal mass is the mislabeled/overlapping-class
    * signal that gates whether the labels are usable as training
    * supervision.
    *
    * Scale: centroids are |labels|·dim rows → pivoted to |labels|
    * arrays and BROADCAST; the distance pass is then a zero-shuffle map
    * (|labels| integer folds per vector) + one |labels|² agg. No
    * all-pairs, no driver loop; k-means' E-step at 100 TB is exactly
    * this plan.
    */
  private val q137 = QueryDef(
    (s, d) => {
      val cent = centroidsMilli(s, d)
        .groupBy("clabel")
        .agg(transform(
          array_sort(collect_list(struct(col("dim"), col("cm")))),
          _.getField("cm")).as("cent"))
      val quant = load(s, d, "embeddings").select(
        col("vec_id"), col("label"),
        transform(col("embedding").cast("array<double>"), qmilli(_)).as("q"))
      val d2 = quant.crossJoin(broadcast(cent))
        .select(col("vec_id"), col("label"), col("clabel"),
          aggregate(
            zip_with(col("q"), col("cent"), (a, b) => (a - b) * (a - b)),
            lit(0L), (acc, x) => acc + x).as("d2"))
      val w = Window.partitionBy("vec_id").orderBy(col("d2"), col("clabel"))
      d2.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .groupBy(col("label"), col("clabel").as("assigned_label"))
        .agg(count(lit(1)).as("n_vecs"), sum("d2").as("sum_d2"))
    },
    Some(s"""WITH q AS ($CoordsSql),
            c AS (
              SELECT label AS clabel, dim,
                CAST(floor(CAST(SUM(qv) AS DOUBLE) /
                  CAST(count(*) AS DOUBLE) + 0.5) AS BIGINT) AS cm
              FROM q GROUP BY 1, 2
            ), dist AS (
              SELECT q.vec_id, q.label, c.clabel,
                CAST(SUM((q.qv - c.cm) * (q.qv - c.cm)) AS BIGINT) AS d2
              FROM q JOIN c ON q.dim = c.dim
              GROUP BY 1, 2, 3
            ), best AS (
              SELECT vec_id, label, clabel, d2, ROW_NUMBER() OVER (
                PARTITION BY vec_id ORDER BY d2, clabel) AS rn
              FROM dist
            )
            SELECT label, clabel AS assigned_label,
              CAST(count(*) AS BIGINT) AS n_vecs,
              CAST(SUM(d2) AS BIGINT) AS sum_d2
            FROM best WHERE rn = 1 GROUP BY 1, 2"""),
    "centroid-assignment purity: broadcast centroids, integer L2, |labels|² matrix [embedding]")

  /** q141: one Lloyd (k-means) refinement step in integer space —
    * E-step: assign every vector to its nearest label centroid (q137's
    * broadcast integer-L2 pass); M-step: recompute each centroid from
    * its assigned vectors; report per-centroid assignment mass and L1
    * movement. Iterating this to convergence IS distributed k-means;
    * one step is the oracle-checkable unit (every step is exact
    * integer/single-division arithmetic, so both engines move every
    * centroid identically).
    *
    * Scale: E-step is the zero-shuffle broadcast fold; M-step is one
    * (assigned, dim) coordinate aggregate — the same two exchanges
    * Lloyd pays per iteration on any cluster. Centroids that win no
    * vectors keep their position (movement 0) via the left join — they
    * must not vanish mid-iteration.
    */
  private val q141 = QueryDef(
    (s, d) => {
      val cents = centroidsMilli(s, d)
      val centArr = cents
        .groupBy("clabel")
        .agg(transform(
          array_sort(collect_list(struct(col("dim"), col("cm")))),
          _.getField("cm")).as("cent"))
      val quant = load(s, d, "embeddings").select(
        col("vec_id"),
        transform(col("embedding").cast("array<double>"), qmilli(_)).as("q"))
      val w = Window.partitionBy("vec_id").orderBy(col("d2"), col("clabel"))
      val assigned = quant.crossJoin(broadcast(centArr))
        .select(col("vec_id"), col("clabel"), col("q"),
          aggregate(
            zip_with(col("q"), col("cent"), (a, b) => (a - b) * (a - b)),
            lit(0L), (acc, x) => acc + x).as("d2"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
      val newCents = assigned
        .select(col("clabel"), posexplode(col("q")).as(Seq("dim", "qv")))
        .groupBy(col("clabel"), col("dim"))
        .agg(count(lit(1)).as("n"), sum("qv").as("sum_q"))
        .select(col("clabel"), col("dim"),
          col("n"),
          floor(col("sum_q").cast("double") / col("n").cast("double") + 0.5)
            .cast("long").as("new_cm"))
      cents.join(newCents, Seq("clabel", "dim"), "left")
        .groupBy(col("clabel"))
        .agg(
          coalesce(max(col("n")), lit(0L)).as("n_assigned"),
          sum(abs(coalesce(col("new_cm"), col("cm")) - col("cm")))
            .as("l1_movement_milli"))
    },
    Some(s"""WITH q AS ($CoordsSql),
            c AS (
              SELECT label AS clabel, dim,
                CAST(floor(CAST(SUM(qv) AS DOUBLE) /
                  CAST(count(*) AS DOUBLE) + 0.5) AS BIGINT) AS cm
              FROM q GROUP BY 1, 2
            ), dist AS (
              SELECT q.vec_id, q.label, c.clabel,
                CAST(SUM((q.qv - c.cm) * (q.qv - c.cm)) AS BIGINT) AS d2
              FROM q JOIN c ON q.dim = c.dim
              GROUP BY 1, 2, 3
            ), best AS (
              SELECT vec_id, clabel FROM (
                SELECT vec_id, clabel, ROW_NUMBER() OVER (
                  PARTITION BY vec_id ORDER BY d2, clabel) AS rn
                FROM dist) WHERE rn = 1
            ), m AS (
              SELECT b.clabel, q.dim, CAST(count(*) AS BIGINT) AS n,
                CAST(floor(CAST(SUM(q.qv) AS DOUBLE) /
                  CAST(count(*) AS DOUBLE) + 0.5) AS BIGINT) AS new_cm
              FROM best b JOIN q ON q.vec_id = b.vec_id
              GROUP BY 1, 2
            )
            SELECT c.clabel,
              coalesce(MAX(m.n), 0) AS n_assigned,
              CAST(SUM(abs(coalesce(m.new_cm, c.cm) - c.cm)) AS BIGINT)
                AS l1_movement_milli
            FROM c LEFT JOIN m ON c.clabel = m.clabel AND c.dim = m.dim
            GROUP BY 1"""),
    "one integer Lloyd step: broadcast E-step, coordinate M-step, L1 movement [embedding]")

  /** q237: simplified-silhouette audit per label — for every vector,
    * a = distance to its OWN label centroid, b = distance to the
    * nearest OTHER centroid, s = (b−a)/max(a,b) ∈ [−1,1]; per label:
    * the mean silhouette and the count of NEGATIVE silhouettes
    * (vectors sitting closer to a foreign class — the individual
    * "this label looks wrong" flags q89 hunts pairwise). The standard
    * cluster-cohesion readout next to q137's hard-assignment purity,
    * in the simplified (centroid-distance) form — the full silhouette
    * needs all-pairs distances, which is exactly what a 100 TB plan
    * must never do.
    *
    * Scale: q137's plan shape — centroids broadcast (label is a
    * lint-recognized bounded domain), the distance pass is a
    * zero-shuffle map over |labels| integer folds per vector, then ONE
    * label-keyed aggregate.
    *
    * Exactness: squared distances are exact integers in milli-space;
    * a, b, and every s are identical IEEE doubles in both engines
    * (sqrt of exact integers + one fixed chain), so n_negative is
    * bit-stable; the per-label MEAN of corpus-many doubles is the one
    * order-dependent value, so the derived oracle re-derives it and
    * admits 1e-9 (summing in its own order) while every count joins
    * bit-exact.
    */
  private val q237 = QueryDef(
    (s, d) => {
      val cent = centroidsMilli(s, d)
        .groupBy("clabel")
        .agg(transform(
          array_sort(collect_list(struct(col("dim"), col("cm")))),
          _.getField("cm")).as("cent"))
      val quant = load(s, d, "embeddings").select(
        col("vec_id"), col("label"),
        transform(col("embedding").cast("array<double>"), qmilli(_)).as("q"))
      val d2 = quant.crossJoin(broadcast(cent))
        .select(col("vec_id"), col("label"), col("clabel"),
          aggregate(
            zip_with(col("q"), col("cent"), (a, b) => (a - b) * (a - b)),
            lit(0L), (acc, x) => acc + x).as("d2"))
      val sil = d2.groupBy(col("vec_id"), col("label"))
        .agg(
          min(when(col("clabel") === col("label"), col("d2"))).as("a2"),
          min(when(col("clabel") =!= col("label"), col("d2"))).as("b2"))
        .select(col("label"),
          ((sqrt(col("b2").cast("double")) - sqrt(col("a2").cast("double"))) /
            greatest(sqrt(col("a2").cast("double")),
              sqrt(col("b2").cast("double")))).as("s"))
      sil.groupBy(col("label"))
        .agg(graft.common.Exact.lcountAll.as("n_vecs"),
          sum(when(col("s") < 0.0, 1L).otherwise(0L)).cast("long")
            .as("n_negative"),
          avg(col("s")).as("mean_sil"))
    },
    Some(s"""WITH q AS ($CoordsSql),
            c AS (
              SELECT label AS clabel, dim,
                CAST(floor(CAST(SUM(qv) AS DOUBLE) /
                  CAST(count(*) AS DOUBLE) + 0.5) AS BIGINT) AS cm
              FROM q GROUP BY 1, 2
            ), dist AS (
              SELECT q.vec_id, q.label, c.clabel,
                CAST(SUM((q.qv - c.cm) * (q.qv - c.cm)) AS BIGINT) AS d2
              FROM q JOIN c ON q.dim = c.dim
              GROUP BY 1, 2, 3
            ), ab AS (
              SELECT vec_id, label,
                MIN(CASE WHEN clabel = label THEN d2 END) AS a2,
                MIN(CASE WHEN clabel <> label THEN d2 END) AS b2
              FROM dist GROUP BY 1, 2
            ), sil AS (
              SELECT label,
                (sqrt(CAST(b2 AS DOUBLE)) - sqrt(CAST(a2 AS DOUBLE)))
                  / greatest(sqrt(CAST(a2 AS DOUBLE)),
                             sqrt(CAST(b2 AS DOUBLE))) AS s
              FROM ab
            ), ref AS (
              SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
                CAST(SUM(CASE WHEN s < 0.0 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_negative,
                AVG(s) AS mean_sil
              FROM sil GROUP BY 1
            ), emitted AS (
              SELECT * FROM read_parquet(
                '${graft.QueryDef.OutDirToken}/q237_silhouette/*.parquet')
            )
            SELECT e.label, e.n_vecs, e.n_negative, e.mean_sil
            FROM emitted e JOIN ref r ON e.label = r.label
              AND e.n_vecs = r.n_vecs AND e.n_negative = r.n_negative
            WHERE abs(e.mean_sil - r.mean_sil) < 1e-9"""),
    "simplified-silhouette cohesion audit: broadcast centroids, exact " +
      "integer distances, 1e-9 mean contract [embedding]")

  /** q253's fixed-point scales and round count: components quantize at
    * Q (4 decimal places — the cents convention applied to unit-norm-
    * ish embedding space), the iterated vector carries VS scaled
    * units, and the power iteration runs a FIXED 6 rounds (the
    * q140/q200/q251 discipline — a convergence loop has data-dependent
    * round counts no cross-engine oracle can mirror).
    */
  private val PcaQ = 10000L
  private val PcaVScale = 1000000L
  private val PcaRounds = 6

  /** q253: exact-covariance PCA power iteration — the dominant
    * principal direction of the embedding cloud, with every cross-row
    * moment an INTEGER. The corpus-scale stage is the classic
    * distributed gram computation: each partition accumulates its own
    * dim×dim i64 product matrix in a local loop (a manual map-side
    * combine — emitting one row per (row, i, j) through a shuffle
    * would move 4096× the corpus), and the ≤4096·|partitions| partials
    * fold by key. Centering is exact via the q143 identity lifted to
    * matrix form: Gc = n·Σqqᵀ − (Σq)(Σq)ᵀ, so no float mean ever
    * touches the data. The folded matrix is dim²-BOUNDED and
    * corpus-invariant, so the 6-round iteration runs ON THE DRIVER in
    * BigInt (the PrefixSum/IVF-probe bounded-collect class — the
    * distributed rendering costs ~20 scheduler round-trips over
    * 64-row frames for microseconds of arithmetic): w = Gc·v,
    * rescaled to VS by v' = sign(w)·(|w|·VS div max|w|) — the
    * abs-before-div keeps the integer division identical across
    * engines (BigInt `/` truncates toward zero, DuckDB `//` floors;
    * they agree only on non-negatives).
    *
    * Output: one row per dimension with the scaled eigenvector
    * component (an exact integer) plus the shared Rayleigh quotient
    * λ = vᵀGc·v / vᵀv and its share of total variance λ·(vᵀv)⁻¹·...
    * — emitted as var_share = (vᵀGc·v)/(vᵀv·trace Gc), the fraction
    * of (quantized, n-scaled) variance the direction explains.
    * 128-bit evidence emits as canonical strings (the q214 rule).
    *
    * Bounds: |q| ≤ Q·max|x|; the distributed gram fold is i64 —
    * entries reach n·(Q·max|x|)², which for unit-scale embeddings
    * (|x| ≲ 1, Q = 10⁴) holds to n ≈ 9·10¹⁰ vectors; past that the
    * deployment lowers Q (Q = 10³ buys 100×) or moves the partial
    * fold to DECIMAL, same plan. The centered matrix and the
    * iteration run in driver BigInt — unbounded; DuckDB mirrors in
    * HUGEINT (~1.7e38, same 10¹⁰-vector envelope at Q = 10⁴).
    */
  private val q253 = QueryDef(
    (s, d) => {
      import s.implicits._
      val vecs = load(s, d, "embeddings")
        .select(col("embedding")).as[Array[Float]]
      // per-partition local gram + component-sum accumulation
      val partials = vecs.mapPartitions { it =>
        var dim = -1
        var gram: Array[Long] = null
        var sums: Array[Long] = null
        var qr: Array[Long] = null
        var n = 0L
        it.foreach { v =>
          if (dim < 0) {
            dim = v.length
            gram = new Array[Long](dim * dim)
            sums = new Array[Long](dim)
            qr = new Array[Long](dim)
          }
          n += 1
          var i = 0
          while (i < dim) {
            qr(i) = math.floor(v(i).toDouble * PcaQ + 0.5).toLong
            sums(i) += qr(i)
            i += 1
          }
          i = 0
          while (i < dim) {
            var j = 0
            while (j < dim) {
              gram(i * dim + j) += qr(i) * qr(j)
              j += 1
            }
            i += 1
          }
        }
        if (dim < 0) Iterator.empty
        else {
          val g = for (i <- 0 until dim; j <- 0 until dim)
            yield (i, j, gram(i * dim + j), if (j == 0) sums(i) else 0L,
              if (i == 0 && j == 0) n else 0L)
          g.iterator
        }
      }.toDF("i", "j", "g", "s_i", "nn")
      val folded = partials.groupBy(col("i"), col("j"))
        .agg(sum(col("g")).as("g"), sum(col("s_i")).as("s_part"),
          sum(col("nn")).as("n_part"))
      // the matrix is dim²-BOUNDED (4096 rows for 64-dim embeddings),
      // corpus-invariant — collect it and iterate ON THE DRIVER in
      // BigInt: the distributed rendering of the 6 rounds is ~20
      // scheduler round-trips over 64-row frames (measured 3.4 s of
      // pure overhead at sf0.1), while the exact driver loop is
      // microseconds. Bounded driver state, the PrefixSum/IVF-probe
      // class; the corpus-scale work stays in the ONE gram pass above.
      val rows = folded.collect()
      // empty embeddings table → empty gram collect; degrade to the
      // empty output frame (dim = 0 skips every loop below) instead of
      // throwing on max of an empty array
      val dim = if (rows.isEmpty) 0 else rows.map(_.getInt(0)).max + 1
      val g = Array.ofDim[Long](dim, dim)
      val sums = new Array[Long](dim)
      var n = 0L
      rows.foreach { r =>
        val (i, j) = (r.getInt(0), r.getInt(1))
        g(i)(j) = r.getLong(2)
        if (j == 0) sums(i) = r.getLong(3)
        if (i == 0 && j == 0) n = r.getLong(4)
      }
      // exact centered gram: Gc(i,j) = n·G(i,j) − S_i·S_j
      val gc = Array.tabulate(dim, dim)((i, j) =>
        BigInt(n) * BigInt(g(i)(j)) - BigInt(sums(i)) * BigInt(sums(j)))
      val vs = BigInt(PcaVScale)
      var v = Array.fill(dim)(vs)
      for (_ <- 1 to (if (dim > 0) PcaRounds else 0)) {
        val w = Array.tabulate(dim)(i =>
          (0 until dim).map(j => gc(i)(j) * v(j)).sum)
        val mx = w.map(_.abs).max
        // abs-first: BigInt / truncates toward zero, DuckDB // floors —
        // identical only on non-negative numerators
        v = w.map(x => ((x.abs * vs) / mx) * x.signum)
      }
      val vgv = (for (i <- 0 until dim; j <- 0 until dim)
        yield v(i) * gc(i)(j) * v(j)).sum
      val vtv = v.map(x => x * x).sum
      val trace = (0 until dim).map(i => gc(i)(i)).sum
      val out = (0 until dim).map { i =>
        (i.toLong, v(i).toLong, vgv.toString, vtv.toString,
          trace.toString,
          vgv.toDouble / vtv.toDouble,
          vgv.toDouble / (vtv.toDouble * trace.toDouble))
      }
      s.createDataFrame(out).toDF("dim", "v_scaled", "vgv", "vtv",
        "trace_gc", "rayleigh", "var_share")
    },
    Some {
      val rounds = (1 to PcaRounds).map { r =>
        val prev = if (r == 1) "v0" else s"v${r - 1}"
        s"""w$r AS (
              SELECT gc.i AS node, SUM(gc.gc * p.v) AS w
              FROM gc JOIN $prev p ON p.node = gc.j
              GROUP BY 1
            ), m$r AS (
              SELECT MAX(abs(w)) AS mx FROM w$r
            ), v$r AS (
              SELECT node,
                (CASE WHEN w < 0 THEN -1 ELSE 1 END)
                  * ((abs(w) * $PcaVScale) // mx) AS v
              FROM w$r, m$r
            )"""
      }.mkString(", ")
      s"""WITH qv AS (
            SELECT vec_id, i - 1 AS i,
              CAST(floor(CAST(embedding[i] AS DOUBLE) * $PcaQ + 0.5)
                AS BIGINT) AS q
            FROM embeddings,
              UNNEST(generate_series(1, len(embedding))) AS t(i)
          ), g AS (
            SELECT a.i, b.i AS j,
              CAST(SUM(a.q * b.q) AS BIGINT) AS g
            FROM qv a JOIN qv b ON a.vec_id = b.vec_id
            GROUP BY 1, 2
          ), sums AS (
            SELECT i, CAST(SUM(q) AS BIGINT) AS s FROM qv GROUP BY 1
          ), nn AS (
            SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings
          ), gc AS (
            SELECT g.i, g.j,
              CAST(nn.n AS HUGEINT) * g.g
                - CAST(si.s AS HUGEINT) * sj.s AS gc
            FROM g JOIN sums si ON si.i = g.i
            JOIN sums sj ON sj.i = g.j
            CROSS JOIN nn
          ), v0 AS (
            SELECT DISTINCT j AS node, CAST($PcaVScale AS HUGEINT) AS v
            FROM gc
          ), $rounds, ray AS (
            SELECT SUM(vi.v * gc.gc * vj.v) AS vgv
            FROM gc JOIN v$PcaRounds vi ON vi.node = gc.i
            JOIN v$PcaRounds vj ON vj.node = gc.j
          ), vv AS (
            SELECT SUM(v * v) AS vv FROM v$PcaRounds
          ), tr AS (
            SELECT SUM(gc) AS trace FROM gc WHERE i = j
          )
          SELECT CAST(f.node AS BIGINT) AS dim,
            CAST(f.v AS BIGINT) AS v_scaled,
            CAST(r.vgv AS VARCHAR) AS vgv,
            CAST(x.vv AS VARCHAR) AS vtv,
            CAST(t.trace AS VARCHAR) AS trace_gc,
            CAST(r.vgv AS DOUBLE) / CAST(x.vv AS DOUBLE) AS rayleigh,
            CAST(r.vgv AS DOUBLE)
              / (CAST(x.vv AS DOUBLE) * CAST(t.trace AS DOUBLE))
              AS var_share
          FROM v$PcaRounds f, ray r, vv x, tr t"""
    },
    "exact-covariance PCA power iteration: per-partition gram " +
      "accumulation, integer centering, fixed sign-safe rounds [embedding]")

  def all: Seq[(String, QueryDef)] = Seq(
    "q135_embedding_extremes" -> q135,
    "q136_label_centroids" -> q136,
    "q137_centroid_purity" -> q137,
    "q141_kmeans_step" -> q141,
    "q237_silhouette" -> q237,
    "q253_pca_power" -> q253)
}
