package graft.queries

import graft.QueryDef
import graft.common.Exact._
import graft.common.Tables.load
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics over the co-purchase graph: Pregel-style iterative
  * PageRank with INTEGER rank arithmetic, so every iteration is
  * bitwise-reproducible under any partitioning and the whole fixed-
  * iteration computation is exactly oracle-checkable (float PageRank
  * sums are partial-order-dependent and can't be hash-compared across
  * engines).
  */
object Graph {

  /** Rank scale (micro-units), damping 0.85 expressed as integer
    * ratios. contrib = r div deg; r' = 0.15·S + (85·Σcontrib) div 100.
    * Bounds: Σcontrib ≤ |V|·S, so 85·Σ fits i64 up to ~10^11 nodes.
    */
  private val S = 1000000L
  private val Iterations = 2
  private val MinSupport = 2

  /** Undirected co-purchase edges (support ≥ 2), both directions — the
    * same no-self-join per-order pair generation as q119: one orderkey
    * exchange collapses each order to its item array, pairs explode
    * locally, and the pair aggregate map-side combines.
    */
  private def edges(s: SparkSession, d: String): DataFrame = {
    val orders = load(s, d, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("parts"))
    // codegen'd C(n,2) expansion (two explodes + u<v), same pair set
    // as the former nested transform/slice HOF — see q119's note
    val pairs = orders
      .select(explode(col("parts")).as("u"), col("parts"))
      .select(col("u"), explode(col("parts")).as("v"))
      .filter(col("u") < col("v"))
      .groupBy(col("u"), col("v"))
      .agg(lcountAll.as("n"))
      .filter(col("n") >= MinSupport)
      .select(col("u"), col("v"))
    pairs.union(pairs.select(col("v").as("u"), col("u").as("v")))
  }

  /** q140: 2-iteration integer PageRank over the co-purchase graph.
    *
    * Scale: the classic Pregel rendering — per iteration, ranks join
    * edges on the source key (one hash exchange each side; the rank
    * frame is |V| narrow rows) and contributions aggregate map-side
    * into the destination. Iterations unroll statically into one plan;
    * every node has deg ≥ 1 by construction (no dangling-mass term).
    * AQE reuses the edge exchange across both iterations.
    *
    * Exactness: integer div throughout — both engines compute the
    * identical rank at every iteration; no tolerance anywhere.
    */
  /** Session memo of the cached degree-annotated edge list, keyed by
    * sf dir — repeat invocations (bench's min-of-2, the determinism
    * sweep) reuse ONE cached frame instead of stacking a fresh pinned
    * copy per run (the ANN family's served-index memo pattern).
    * BOUNDED: at most [[MemoCap]] corpora stay pinned — a multi-corpus
    * service sweeping dirs unpersists the least-recently-used frame on
    * overflow instead of accreting executor storage; `Memos.clearAll()`
    * (session teardown) releases everything.
    */
  private val MemoCap = 2
  private val edMemo = new graft.common.BoundedFrameMemo[DataFrame](
    MemoCap, _.unpersist())

  /** The cached degree-annotated edge list (both directions, deg =
    * undirected degree of `u`), materialized ONCE per sf dir and
    * hash-partitioned on the source key by its build — every PageRank
    * iteration, the triangle enumeration, and repeat bench invocations
    * scan the same in-memory frame (the GraphX edge-partition-reuse
    * shape; without it each use replans the whole pair generation).
    */
  private def degreeEdges(s: SparkSession, d: String): DataFrame =
    edMemo.getOrElseUpdate(d) {
      val e = edges(s, d)
      // the trailing keyed repartition makes the CACHED layout
      // scale-adaptive: AQE sizes the exchange by bytes (one partition
      // at test scale, many at corpus scale) and the key matches every
      // consumer's join/agg key. Without it the cache inherits the
      // union's 64 accidental micro-partitions, and each of the many
      // warm-path scans paid 64 near-empty tasks (measured: ~22 CPU-s
      // warm → ~1; guide §2.2 "fewer, larger partitions").
      e.join(e.groupBy(col("u")).agg(lcountAll.as("deg")), "u")
        .repartition(col("u"))
        .cache()
    }

  private val q140 = QueryDef(
    (s, d) => {
      val ed = degreeEdges(s, d)
      val deg = ed.groupBy(col("u")).agg(first(col("deg")).as("deg"))
      var ranks = deg.select(col("u").as("node"), lit(S).as("r"))
      for (_ <- 1 to Iterations) {
        ranks = ed
          .join(ranks.withColumnRenamed("node", "u"), "u")
          .select(col("v"), expr("r div deg").as("contrib"))
          .groupBy(col("v"))
          .agg(sum(col("contrib")).as("in_sum"))
          .select(col("v").as("node"),
            (lit(15L * S / 100L) + expr("(85 * in_sum) div 100")).as("r"))
      }
      ranks.join(deg.select(col("u").as("node"), col("deg")), "node")
        .select(col("node").as("part"), col("deg"), col("r").as("rank_micro"))
    },
    Some(s"""WITH i AS (
              SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
            ), pairs AS (
              SELECT a.l_partkey AS u, b.l_partkey AS v
              FROM i a JOIN i b ON a.l_orderkey = b.l_orderkey
                AND a.l_partkey < b.l_partkey
              GROUP BY 1, 2 HAVING count(*) >= $MinSupport
            ), e AS (
              SELECT u, v FROM pairs
              UNION ALL SELECT v AS u, u AS v FROM pairs
            ), d AS (
              SELECT u, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY 1
            ), r1 AS (
              SELECT e.v AS node,
                ${15L * S / 100L} +
                  CAST((85 * SUM($S // d.deg)) // 100 AS BIGINT) AS r
              FROM e JOIN d ON e.u = d.u GROUP BY e.v
            ), r2 AS (
              SELECT e.v AS node,
                ${15L * S / 100L} +
                  CAST((85 * SUM(r1.r // d.deg)) // 100 AS BIGINT) AS r
              FROM e JOIN d ON e.u = d.u JOIN r1 ON r1.node = e.u
              GROUP BY e.v
            )
            SELECT r2.node AS part, d.deg, r2.r AS rank_micro
            FROM r2 JOIN d ON r2.node = d.u"""),
    "integer PageRank, 2 Pregel iterations over co-purchase edges [graph]")

  /** q157: exact triangle counts + local clustering coefficient per
    * part over the same co-purchase graph. Triangles via degree-ordered
    * orientation — each undirected edge points from its (deg, id)-
    * smaller endpoint, so every triangle materializes as exactly one
    * wedge-close join and the wedge fan-out per node is bounded by
    * out-degree ≤ O(√m) instead of the raw degree (the classic
    * skew-proof triangle enumeration; a hub of degree 10⁶ would
    * otherwise spawn 10¹² wedges).
    *
    * Scale: reuses q140's cached degree-annotated edge frame (one
    * pair-generation pass serves both graph queries in a session); the
    * wedge join and the closing join are edge-keyed hash exchanges;
    * per-node counts fold map-side from exploded triangle corners.
    *
    * Exactness: all integers until the final single division per row —
    * clustering = 2·T / (deg·(deg−1)) — bit-identical cross-engine.
    */
  /** Session memo of (node-degree frame, oriented edge list), both
    * cached: the oriented frame is scanned THREE times by the triangle
    * self-joins — without materialization each scan replans the entire
    * pair-generation lineage (measured: 98 exchanges vs ≤8 cached),
    * which is the difference between a graph query and three full
    * corpus passes at 100 TB.
    */
  private val triMemo =
    new graft.common.BoundedFrameMemo[(DataFrame, DataFrame)](
      MemoCap, { case (deg, or) => deg.unpersist(); or.unpersist() })

  /** All Graph memos release through the session-memo registry. */
  graft.common.Memos.register("graph.frames") { () =>
    edMemo.clear(); triMemo.clear(); biMemo.clear()
  }

  private def orientedEdges(s: SparkSession, d: String)
      : (DataFrame, DataFrame) =
    triMemo.getOrElseUpdate(d) {
      val ed = degreeEdges(s, d)
      val deg = ed.groupBy(col("u"))
        .agg(first(col("deg")).as("deg")).cache()
      val und = ed.filter(col("u") < col("v"))
        .select(col("u"), col("v"))
      val or = und
        .join(deg.select(col("u"), col("deg").as("du")), "u")
        .join(deg.select(col("u").as("v"), col("deg").as("dv")), "v")
        .select(
          when(col("du") < col("dv") ||
            (col("du") === col("dv") && col("u") < col("v")),
            col("u")).otherwise(col("v")).as("src"),
          when(col("du") < col("dv") ||
            (col("du") === col("dv") && col("u") < col("v")),
            col("v")).otherwise(col("u")).as("dst"))
        .cache()
      (deg, or)
    }

  private val q157 = QueryDef(
    (s, d) => {
      val (deg, or) = orientedEdges(s, d)
      val tri = or.as("e1")
        .join(or.as("e2"), col("e1.dst") === col("e2.src"))
        .join(or.as("e3"),
          col("e3.src") === col("e1.src") && col("e3.dst") === col("e2.dst"))
        .select(col("e1.src").as("a"), col("e1.dst").as("b"),
          col("e2.dst").as("c"))
      val perNode = tri
        .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
        .groupBy(col("node")).agg(lcountAll.as("t"))
      deg.select(col("u").as("part"), col("deg"))
        .join(perNode.withColumnRenamed("node", "part"), Seq("part"), "left")
        .select(col("part"), col("deg"),
          coalesce(col("t"), lit(0L)).as("triangles"),
          when(col("deg") >= 2L,
            (lit(2L) * coalesce(col("t"), lit(0L))).cast("double") /
              (col("deg") * (col("deg") - 1L)).cast("double"))
            .otherwise(lit(0.0)).as("clustering"))
    },
    Some(s"""WITH i AS (
              SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
            ), pairs AS (
              SELECT a.l_partkey AS u, b.l_partkey AS v
              FROM i a JOIN i b ON a.l_orderkey = b.l_orderkey
                AND a.l_partkey < b.l_partkey
              GROUP BY 1, 2 HAVING count(*) >= $MinSupport
            ), deg AS (
              SELECT x, CAST(count(*) AS BIGINT) AS deg FROM (
                SELECT u AS x FROM pairs
                UNION ALL SELECT v AS x FROM pairs)
              GROUP BY 1
            ), o AS (
              SELECT
                CASE WHEN du.deg < dv.deg
                  OR (du.deg = dv.deg AND p.u < p.v)
                  THEN p.u ELSE p.v END AS src,
                CASE WHEN du.deg < dv.deg
                  OR (du.deg = dv.deg AND p.u < p.v)
                  THEN p.v ELSE p.u END AS dst
              FROM pairs p
              JOIN deg du ON p.u = du.x JOIN deg dv ON p.v = dv.x
            ), tri AS (
              SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
              FROM o e1
              JOIN o e2 ON e1.dst = e2.src
              JOIN o e3 ON e3.src = e1.src AND e3.dst = e2.dst
            ), pn AS (
              SELECT node, CAST(count(*) AS BIGINT) AS t FROM (
                SELECT a AS node FROM tri
                UNION ALL SELECT b AS node FROM tri
                UNION ALL SELECT c AS node FROM tri)
              GROUP BY 1
            )
            SELECT d.x AS part, d.deg,
              COALESCE(pn.t, 0) AS triangles,
              CASE WHEN d.deg >= 2
                THEN CAST(2 * COALESCE(pn.t, 0) AS DOUBLE) /
                  CAST(d.deg * (d.deg - 1) AS DOUBLE)
                ELSE 0.0 END AS clustering
            FROM deg d LEFT JOIN pn ON d.x = pn.node"""),
    "oriented triangle count + clustering coefficient per part [graph]")

  /** k-core threshold and the fixed peel-round count (the q140/q200
    * fixed-iteration discipline: unbounded peeling converges but its
    * round count is data-dependent, which a cross-engine oracle can't
    * mirror; R rounds of peeling is a defined, bit-checkable semantics
    * and in practice within a round or two of the fixpoint).
    */
  private val CoreK = 3
  private val PeelRounds = 3

  /** q208: k-core peel over the co-purchase graph — iteratively drop
    * nodes with fewer than K surviving neighbors, R rounds, and report
    * each node that still holds an edge with its original and residual
    * degree. The dense-substructure filter behind "which items sit in
    * a tightly co-bought cluster" (recommendation candidate pruning)
    * and the standard preprocessing cut before community detection.
    *
    * Scale: each round is a map-side-combined degree fold plus two
    * hash joins against a |V|-row survivor list, and the round's
    * shrinking edge frame MATERIALIZES (localCheckpoint) before the
    * next — the Pregel superstep discipline. Without the cut, each
    * round references its predecessor three times (degree fold + two
    * join sides), so the unrolled lineage grows ~3^R and the executed
    * plan re-derives the base edges dozens of times (measured: 112
    * embedded scans → 0; GraphX materializes supersteps for exactly
    * this reason). The base frame is the memoized cached edge list
    * shared by all four graph queries.
    *
    * Exactness: membership and degrees are pure integer set algebra.
    */
  private val q208 = QueryDef(
    (s, d) => {
      val base = degreeEdges(s, d)
      var e = base.select(col("u"), col("v"))
      for (_ <- 1 to PeelRounds) {
        val survivors = e.groupBy(col("u")).agg(lcountAll.as("deg"))
          .filter(col("deg") >= CoreK)
          .select(col("u"))
        e = e.join(survivors, "u")
          .join(survivors.select(col("u").as("v")), "v")
          .select(col("u"), col("v"))
          .localCheckpoint()
      }
      val deg0 = base.groupBy(col("u")).agg(first(col("deg")).as("deg0"))
      e.groupBy(col("u")).agg(lcountAll.as("deg_core"))
        .join(deg0, "u")
        .select(col("u").as("part"), col("deg0"), col("deg_core"))
    },
    Some(s"""WITH i AS (
              SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
            ), pairs AS (
              SELECT a.l_partkey AS u, b.l_partkey AS v
              FROM i a JOIN i b ON a.l_orderkey = b.l_orderkey
                AND a.l_partkey < b.l_partkey
              GROUP BY 1, 2 HAVING count(*) >= $MinSupport
            ), e0 AS (
              SELECT u, v FROM pairs
              UNION ALL SELECT v AS u, u AS v FROM pairs
            ), d0 AS (
              SELECT u, CAST(count(*) AS BIGINT) AS deg FROM e0 GROUP BY 1
            ), s1 AS (
              SELECT u FROM d0 WHERE deg >= $CoreK
            ), e1 AS (
              SELECT e.u, e.v FROM e0 e
              JOIN s1 a ON e.u = a.u JOIN s1 b ON e.v = b.u
            ), s2 AS (
              SELECT u FROM (SELECT u, count(*) AS deg FROM e1 GROUP BY 1)
              WHERE deg >= $CoreK
            ), e2 AS (
              SELECT e.u, e.v FROM e1 e
              JOIN s2 a ON e.u = a.u JOIN s2 b ON e.v = b.u
            ), s3 AS (
              SELECT u FROM (SELECT u, count(*) AS deg FROM e2 GROUP BY 1)
              WHERE deg >= $CoreK
            ), e3 AS (
              SELECT e.u, e.v FROM e2 e
              JOIN s3 a ON e.u = a.u JOIN s3 b ON e.v = b.u
            )
            SELECT e3.u AS part, d0.deg AS deg0,
              CAST(count(*) AS BIGINT) AS deg_core
            FROM e3 JOIN d0 ON e3.u = d0.u
            GROUP BY 1, 2"""),
    "k-core peel: fixed rounds over the memoized edge frame [graph]")

  /** q210: degree assortativity of the co-purchase graph — the Pearson
    * correlation of endpoint degrees over the directed edge list (each
    * undirected edge counted both ways, the standard convention). One
    * number that says whether hub items co-sell with hubs (r > 0,
    * rich-club catalog) or with the long tail (r < 0) — which decides
    * whether q124-style salting or q157's degree orientation is the
    * binding concern at scale.
    *
    * Scale: one |E| join attaches the destination degree to the
    * memoized edge frame, then a single map-side-combined 6-moment
    * fold to ONE row. Products stay i64 up to deg²·|E| ~ 2^63; the
    * cross-moment combination happens in DECIMAL(38,0) (the q176
    * discipline).
    *
    * Float parity: r needs sqrt, so the oracle is ref-driven derived:
    * the six integer moments must match bit-exactly, zero-variance
    * degenerates to NULL on the EXACT decimal guard (the q163
    * lesson), and r is admitted within 1e-12.
    */
  private val q210 = QueryDef(
    (s, d) => {
      import org.apache.spark.sql.types.DecimalType
      val dec = DecimalType(38, 0)
      val ed = degreeEdges(s, d)
      val degv = ed.groupBy(col("u")).agg(first(col("deg")).as("dv"))
        .withColumnRenamed("u", "v")
      val m = ed.join(degv, "v")
        .select(col("deg").as("x"), col("dv").as("y"))
        .agg(
          lcountAll.as("m"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"),
          sum(col("x") * col("y")).as("sxy"))
      val num = col("m").cast(dec) * col("sxy").cast(dec) -
        col("sx").cast(dec) * col("sy").cast(dec)
      val denx = col("m").cast(dec) * col("sxx").cast(dec) -
        col("sx").cast(dec) * col("sx").cast(dec)
      val deny = col("m").cast(dec) * col("syy").cast(dec) -
        col("sy").cast(dec) * col("sy").cast(dec)
      m.select(col("m"), col("sx"), col("sy"), col("sxx"), col("syy"),
        col("sxy"),
        when(denx === lit(0).cast(dec) || deny === lit(0).cast(dec),
          lit(null).cast("double"))
          .otherwise(num.cast("double") /
            sqrt(denx.cast("double") * deny.cast("double"))).as("r"))
    },
    Some(s"""WITH i AS (
              SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
            ), pairs AS (
              SELECT a.l_partkey AS u, b.l_partkey AS v
              FROM i a JOIN i b ON a.l_orderkey = b.l_orderkey
                AND a.l_partkey < b.l_partkey
              GROUP BY 1, 2 HAVING count(*) >= $MinSupport
            ), e AS (
              SELECT u, v FROM pairs
              UNION ALL SELECT v AS u, u AS v FROM pairs
            ), dg AS (
              SELECT u, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY 1
            ), xy AS (
              SELECT du.deg AS x, dv.deg AS y
              FROM e JOIN dg du ON e.u = du.u JOIN dg dv ON e.v = dv.u
            ), ref AS (
              SELECT CAST(count(*) AS BIGINT) AS m,
                CAST(SUM(x) AS BIGINT) AS sx,
                CAST(SUM(y) AS BIGINT) AS sy,
                CAST(SUM(x * x) AS BIGINT) AS sxx,
                CAST(SUM(y * y) AS BIGINT) AS syy,
                CAST(SUM(x * y) AS BIGINT) AS sxy,
                CAST(count(*) AS HUGEINT) * SUM(CAST(x AS HUGEINT) * y) -
                  SUM(CAST(x AS HUGEINT)) * SUM(CAST(y AS HUGEINT)) AS num,
                CAST(count(*) AS HUGEINT) * SUM(CAST(x AS HUGEINT) * x) -
                  SUM(CAST(x AS HUGEINT)) * SUM(CAST(x AS HUGEINT)) AS denx,
                CAST(count(*) AS HUGEINT) * SUM(CAST(y AS HUGEINT) * y) -
                  SUM(CAST(y AS HUGEINT)) * SUM(CAST(y AS HUGEINT)) AS deny
              FROM xy
            ), emitted AS (
              SELECT * FROM read_parquet(
                '${QueryDef.OutDirToken}/q210_degree_assortativity/*.parquet')
            )
            SELECT r.m, r.sx, r.sy, r.sxx, r.syy, r.sxy,
              CASE
                WHEN r.denx = 0 OR r.deny = 0 THEN
                  CASE WHEN e.r IS NULL THEN NULL ELSE -999.0 END
                WHEN abs(e.r - CAST(r.num AS DOUBLE) /
                    sqrt(CAST(r.denx AS DOUBLE) * CAST(r.deny AS DOUBLE)))
                  < 1e-12 THEN e.r
                ELSE -999.0 END AS r
            FROM ref r
            LEFT JOIN emitted e ON e.m = r.m AND e.sx = r.sx
              AND e.sy = r.sy AND e.sxx = r.sxx AND e.syy = r.syy
              AND e.sxy = r.sxy"""),
    "degree assortativity: exact 6-moment fold, ref-driven sqrt tolerance [graph]")

  /** q242's landmark count (one bit of a 64-bit mask each), hop
    * budget, and seed-selection hash seed.
    */
  private val BfsSeeds = 64
  private val BfsHops = 4
  private val BfsSeedHashSeed = 313131L

  /** q242: landmark multi-source BFS — the per-radius neighborhood
    * function N(seed, r) = |{v : dist(seed, v) ≤ r}| for 64 hash-chosen
    * landmark items over the co-purchase graph, radii 1..4. The
    * distance-distribution / effective-diameter probe (the HyperANF
    * question) answered EXACTLY for a landmark panel: 64 simultaneous
    * BFS frontiers cost ONE long column, because each node carries a
    * 64-bit reachability mask (bit i = "landmark i reaches me") and a
    * BFS superstep for all 64 sources is a single edge join + bit_or
    * fold — the Pregel rendering of HyperANF with exact bitmasks in
    * place of HLL registers (the full-graph estimate version would
    * swap the mask for a register array; the plumbing is identical).
    *
    * Scale: per round, ranks-style edge join (hash exchange on the
    * source key against the CACHED degree-annotated edge frame) +
    * map-side-combined bit_or into the destination, then
    * localCheckpoint — the q208 superstep discipline, so round r+1
    * scans materialized blocks instead of replanning r rounds of
    * lineage. Fixed 4 rounds unroll into 4 bounded jobs; the landmark
    * panel is CONSTANT-width (64 bits) however large the graph, so
    * state is one i64 per node — 8 GB per billion nodes, flat across
    * rounds. Seed choice is the bijective keyed hash (order
    * statistics of a permutation — an unbiased panel, reproducible).
    *
    * Exactness: masks, popcount folds, and counts are pure integer
    * ops — every emitted cell is engine-exact; the oracle recomputes
    * the same radii by unrolled seed×node BFS joins (64·|V| rows per
    * level, bounded).
    */
  private val q242 = QueryDef(
    (s, d) => {
      val ed = degreeEdges(s, d)
      val nodes = ed.groupBy(col("u")).agg(first(col("deg")).as("deg"))
        .select(col("u").as("node"))
      val seeds = nodes
        .select(col("node"),
          Curation.shuffleKeyWith(col("node"), BfsSeedHashSeed).as("h"))
        .orderBy(col("h")).limit(BfsSeeds)
        .withColumn("seed_rank",
          row_number().over(org.apache.spark.sql.expressions.Window
            .orderBy(col("h"))).cast("long"))
        .select(col("node"), col("seed_rank"))
      var masked = nodes
        .join(broadcast(seeds), Seq("node"), "left")
        .select(col("node"),
          coalesce(
            expr("shiftleft(cast(1 as bigint), cast(seed_rank - 1 as int))"),
            lit(0L)).as("mask"))
        .localCheckpoint()
      // the four supersteps stay materialized Pregel rounds, but the
      // per-radius popcount folds collapse into ONE grouped aggregate
      // over the unioned round frames — the former per-radius
      // stack-aggregate subplans ran as four separate AQE jobs over
      // four checkpoints (r16: 28 warm jobs → ~10, identical sums)
      val roundFrames = (1 to BfsHops).map { r =>
        val prop = ed.select(col("u"), col("v"))
          .join(masked.withColumnRenamed("node", "u"), "u")
          .filter(col("mask") =!= 0L)
          .groupBy(col("v").as("node"))
          .agg(expr("bit_or(mask)").as("pm"))
        masked = masked.join(prop, Seq("node"), "left")
          .select(col("node"),
            expr("mask | coalesce(pm, 0L)").as("mask"))
          .localCheckpoint()
        masked.select(lit(r.toLong).as("radius"), col("mask"))
      }
      val sums = (1 to BfsSeeds).map { i =>
        sum(expr(s"shiftright(mask, ${i - 1}) & 1")).as(s"c_$i")
      }
      val stackArgs = (1 to BfsSeeds)
        .map(i => s"${i}L, c_$i").mkString(", ")
      roundFrames.reduce(_ unionByName _)
        .groupBy(col("radius"))
        .agg(sums.head, sums.tail: _*)
        .select(col("radius"),
          expr(s"stack($BfsSeeds, $stackArgs) AS (seed_rank, n_reached)"))
        .select(col("radius"), col("seed_rank"), col("n_reached"))
        .join(broadcast(seeds), "seed_rank")
        .select(col("radius"), col("seed_rank"),
          col("node").as("seed_part"), col("n_reached"))
    },
    Some {
      val hSql = Curation.shuffleKeySqlWith("u", BfsSeedHashSeed)
      s"""WITH i AS (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
          ), pairs AS (
            SELECT a.l_partkey AS u, b.l_partkey AS v
            FROM i a JOIN i b ON a.l_orderkey = b.l_orderkey
              AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2 HAVING count(*) >= $MinSupport
          ), e AS (
            SELECT u, v FROM pairs
            UNION ALL SELECT v AS u, u AS v FROM pairs
          ), n AS (
            SELECT DISTINCT u FROM e
          ), seeds AS (
            SELECT u AS node,
              CAST(ROW_NUMBER() OVER (ORDER BY $hSql) AS BIGINT)
                AS seed_rank
            FROM n ORDER BY $hSql LIMIT $BfsSeeds
          ), d0 AS (
            SELECT seed_rank, node FROM seeds
          ), d1 AS (
            SELECT seed_rank, node FROM d0
            UNION
            SELECT d0.seed_rank, e.v AS node FROM d0 JOIN e ON d0.node = e.u
          ), d2 AS (
            SELECT seed_rank, node FROM d1
            UNION
            SELECT d1.seed_rank, e.v AS node FROM d1 JOIN e ON d1.node = e.u
          ), d3 AS (
            SELECT seed_rank, node FROM d2
            UNION
            SELECT d2.seed_rank, e.v AS node FROM d2 JOIN e ON d2.node = e.u
          ), d4 AS (
            SELECT seed_rank, node FROM d3
            UNION
            SELECT d3.seed_rank, e.v AS node FROM d3 JOIN e ON d3.node = e.u
          ), lv AS (
            SELECT 1 AS radius, seed_rank, node FROM d1
            UNION ALL SELECT 2, seed_rank, node FROM d2
            UNION ALL SELECT 3, seed_rank, node FROM d3
            UNION ALL SELECT 4, seed_rank, node FROM d4
          )
          SELECT CAST(l.radius AS BIGINT) AS radius, l.seed_rank,
            s.node AS seed_part,
            CAST(count(*) AS BIGINT) AS n_reached
          FROM lv l JOIN seeds s USING (seed_rank)
          GROUP BY 1, 2, 3"""
    },
    "landmark multi-source BFS neighborhood function: 64 frontiers in " +
      "one bitmask column, 4 supersteps, exact per-radius reach [graph]")

  /** q261: HITS authority scores over the bipartite customer→part
    * order graph — "which parts do the broadest buyers concentrate
    * on?" One full hub/authority update from the uniform start
    * (Kleinberg's power iteration, unrolled): auth⁰ = 1, so
    * hub¹(c) = Σ_{p ∈ N(c)} 1 = outdeg is replaced by the real first
    * step hub¹(c) = Σ_{p ∈ N(c)} indeg(p), and
    * auth²(p) = Σ_{c ∈ N(p)} hub¹(c). Unnormalized by design: the
    * per-step L2 normalization is a positive scalar, so the RANKING —
    * the thing HITS exists to produce — is identical, and dropping it
    * keeps every value an exact integer (a float normalization would
    * be partial-order-dependent and not hash-comparable). q140's
    * PageRank answers the flow-centrality question on the co-purchase
    * projection; this answers the mutual-reinforcement one on the raw
    * bipartite graph without materializing the quadratic projection.
    *
    * Scale: the Pregel shape — distinct (c, p) edges (one exchange),
    * then each half-step is a keyed join + map-side-combined
    * aggregate; the edge frame is checkpointed once for its three
    * consumers. Envelope: indeg fits i64 everywhere; hub¹ ≤
    * outdeg·max(indeg) ≤ ~10¹⁵ at a 10⁹-customer corpus (i64-safe,
    * documented); auth² crosses i64 at that extreme, so BOTH engines
    * fold it 128-bit and emit the canonical decimal string.
    */
  /** Session memo of the materialized bipartite (customer, part) edge
    * frame, keyed by sf dir — q261's three consumers and its repeat
    * invocations (bench min-of-2, the determinism sweep) reuse ONE
    * cached frame instead of re-running the order join + distinct per
    * pass (the [[degreeEdges]] pattern, same bound and release).
    */
  private val biMemo = new graft.common.BoundedFrameMemo[DataFrame](
    MemoCap, _.unpersist())

  private def bipartiteEdges(s: SparkSession, d: String): DataFrame =
    biMemo.getOrElseUpdate(d) {
      load(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey").as("c"))
        .join(load(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_partkey").as("p")),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("c"), col("p")).distinct()
        .cache()
    }

  private val q261 = QueryDef(
    (s, d) => {
      val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
      val e = bipartiteEdges(s, d)
      val indeg = e.groupBy(col("p")).agg(lcountAll.as("indeg"))
      val hub1 = e.join(indeg, "p")
        .groupBy(col("c")).agg(sum(col("indeg")).as("h1"))
      e.join(hub1, "c")
        .groupBy(col("p"))
        .agg(sum(col("h1").cast(dec38)).as("a2"))
        .join(indeg, "p")
        .select(col("p").as("part"), col("indeg"),
          col("a2").cast("string").as("auth2"))
    },
    Some("""WITH e AS (
              SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
              FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
            ), indeg AS (
              SELECT p, CAST(count(*) AS BIGINT) AS indeg
              FROM e GROUP BY 1
            ), hub1 AS (
              SELECT e.c, CAST(SUM(indeg.indeg) AS BIGINT) AS h1
              FROM e JOIN indeg ON e.p = indeg.p GROUP BY 1
            ), a2 AS (
              SELECT e.p, SUM(CAST(hub1.h1 AS HUGEINT)) AS a2
              FROM e JOIN hub1 ON e.c = hub1.c GROUP BY 1
            )
            SELECT a2.p AS part, indeg.indeg,
              CAST(a2.a2 AS VARCHAR) AS auth2
            FROM a2 JOIN indeg ON a2.p = indeg.p"""),
    "HITS authority after one full hub/auth update on the bipartite " +
      "order graph: exact integer propagation, 128-bit emission [graph]")

  def all: Seq[(String, QueryDef)] = Seq(
    "q261_hits_authority" -> q261,
    "q140_pagerank" -> q140,
    "q157_triangles" -> q157,
    "q208_kcore" -> q208,
    "q210_degree_assortativity" -> q210,
    "q242_landmark_bfs" -> q242)
}
