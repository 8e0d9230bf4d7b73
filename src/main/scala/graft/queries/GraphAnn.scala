package graft.queries

import graft.QueryDef
import graft.common.Tables.load
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Navigable-graph ANN over the `embeddings` table — the third
  * industry-standard index family next to the trained-IVF/PQ
  * quantizers (q54/q87) and hyperplane LSH (q39): an NSW/HNSW-style
  * k-NN GRAPH searched by beam walk, expressed Spark-first.
  *
  * Index build (NN-Descent, Dong et al. WWW'11, with a mixed seed):
  *   1. Initial candidates are the union of a LOCAL family (successor
  *      chains inside the persisted LSH buckets) and a DIVERSITY
  *      family (successor chains around a deterministic hash ring) —
  *      NN-Descent needs both: locality to start near the answer,
  *      long-range links to escape the seed's cliques. Both families
  *      are per-bucket SORTED ADJACENCY, not a bucket cross-product:
  *      a hot bucket of s vectors contributes O(s·C) pairs, never
  *      O(s²) — the property that keeps the build alive when a 100 TB
  *      corpus hashes unevenly.
  *   2. A fixed number of NN-Descent rounds refine: each node offers
  *      its neighbors to its neighbors (edges ⋈ edges on the shared
  *      endpoint — the "a friend of my friend is likely my friend"
  *      step of Dong et al., WWW'11), candidates are re-scored with
  *      the exact codegen cosine, and each node keeps its best M.
  *      Every round materializes with `localCheckpoint` (the q208
  *      Pregel-superstep discipline — the unrolled lineage would
  *      re-derive the base edges ~3^R times otherwise).
  *   3. Edges persist through the IndexStore lifecycle (kind
  *      `nsw_index`) pinned to a scheme version. Appended embedding
  *      files take the HNSW-style incremental INSERT (Malkov &
  *      Yashunin, TPAMI'18: search → link → prune) instead of a
  *      rebuild — see [[insertBatch]]/[[pruneOverflow]]; a rewritten
  *      or removed file still invalidates the whole graph (its edges
  *      are global state), and a batch larger than [[InsertCap]]
  *      falls back to the NN-Descent rebuild, which produces a better
  *      graph than bulk-chained inserts for the same order of work.
  *
  * Search (q211): HNSW layer descent + beam walk (round 13 — before
  * that, a flat 4-hop walk from an id-cut sample, whose hop count to
  * reach a target grows with graph diameter at billion-node scale).
  * The graph is LAYERED: layer l holds the deterministic 4^-l level
  * subset ([[levelCol]]) with its own navigable adjacency. Entry
  * points are ALL top-layer nodes (~[[TopTarget]], bounded by the
  * geometric draw); the walk descends the sparse upper layers at a
  * narrow greedy width — constant hops per layer because geometric
  * sizes keep each layer's diameter constant — and runs the full beam
  * only at layer 0. Hop budget: UpperHops·L + Hops with
  * L = ceil(log4(n/TopTarget)) — O(log n), the HNSW promise
  * (GraphAnnSpec emits the layer histogram as evidence). Every hop's
  * frontier is O(|queries|·B·M) rows REGARDLESS of corpus size — the
  * stored edge table is the only corpus-proportional frame, and it
  * joins by key.
  *
  * Oracles: q211 carries the family's pair-level derived oracle (every
  * emitted score re-derived from the embeddings, ranks re-derived from
  * the re-computed scores); q212 is the q123-shape recall audit
  * against the exact baseline with a macro-recall FLOOR baked into the
  * oracle — if the walk's recall drops below the floor, the oracle
  * returns zero rows and the driver compare fails on rowcount.
  */
object GraphAnn {

  /** Neighbors kept per node in the k-NN graph (directed; the stored
    * adjacency is the symmetrized ≤2M-degree form).
    */
  private val M = 16

  /** NN-Descent refinement rounds (fixed — each is a full
    * neighbor-of-neighbor exchange over the SYMMETRIZED graph).
    * Measured on the sf0.1 corpus (simulated round-by-round before the
    * Spark build was written): the fraction of true top-10 neighbors
    * present as edges goes ~0.06 (seed) → ~0.80 by round 5; fewer
    * rounds strand the walk in a disconnected neighborhood and
    * recall@10 collapses (0.44 at R=2 during development).
    */
  private val DescentRounds = 5

  /** Per-bucket successor fan-out seeding the graph — applied to BOTH
    * seed families (LSH buckets and the hash ring below).
    */
  private val InitSuccessors = 3

  /** Long-range seed: nodes bucketed by pmod(xxhash64(id), HashRing),
    * chained in hash order. A pure-LSH seed is assortative — all-local
    * cliques aligned with the hash buckets — and NN-Descent then
    * explores only within cliques (measured: LSH-only seed converged
    * to 0.32 true-top10 coverage after 5 rounds; mixing in the random
    * ring, 0.80). The ring is the diversity NN-Descent's random init
    * normally provides, made deterministic.
    */
  private val HashRing = 64

  /** Beam width per query during the walk (≥ the served k=10). */
  private val Beam = 32

  /** Walk depth. With beam B and symmetrized degree ≤2M each hop
    * explores ≤ B·2M candidates; 4 hops reach ~4 edge-lengths from
    * the entry sample. Measured recall@10 at sf0.1: 0.91 (B=32, H=4)
    * vs 0.705 (B=16, H=3).
    */
  private val Hops = 4

  /** Entry points: vec_id ≡ 0 (mod stride) under a literal id cap —
    * deterministic and BOUNDED (≤ cap/stride rows) no matter the
    * corpus size, so the entry scoring never becomes a scan.
    */
  private val EntryStride = 64
  private val EntryCap = 4096

  /** Macro-average recall@10 the q212 oracle enforces. Measured ~0.9+
    * at the test scales; the floor is the regression tripwire, not the
    * expectation.
    */
  private[queries] val RecallFloor = 0.70

  // ---- HNSW layering (round 13) ----
  // The single-layer walk's fixed 4 hops from id-cut entry points is
  // fine while graph diameter is small, but hop count to REACH a
  // query's neighborhood grows with diameter at billion-node scale.
  // True HNSW fixes it with geometric levels: layer l holds the
  // P(level >= l) = 4^-l subset of nodes with its own navigable graph;
  // search enters at the (bounded) top layer, descends greedily
  // through the sparse upper layers — each a constant number of hops,
  // because each layer's diameter is constant when layer sizes shrink
  // geometrically — and runs the full beam only at layer 0. Hop
  // budget: UpperHops·L + Hops with L = ceil(log4(n/TopTarget)) —
  // O(log n), the HNSW promise (GraphAnnSpec emits the layer
  // histogram as evidence of the geometric sizes).

  /** Target occupancy of the TOP layer — the walk's entry set is every
    * top-layer node, so this bounds entry scoring exactly like the old
    * EntryCap/EntryStride cut did.
    */
  private val TopTarget = 64L

  /** Hard cap on levels (4^8 ≈ 65k shrink covers any corpus that fits
    * a cluster; beyond it TopTarget just grows a little).
    */
  private val MaxLevelCap = 8

  /** NN-Descent rounds for the UPPER layers: they exist for routing,
    * not recall — 2 rounds over a geometric subset is plenty, and the
    * total upper-layer build work is a geometric series ≈ 1/3 of the
    * base layer's.
    */
  private val UpperRounds = 2

  /** Frontier width through the upper layers (HNSW uses width 1; a
    * small beam is sturdier against a routing dead-end for the same
    * asymptotics).
    */
  private val GreedyWidth = 8

  /** Hops per upper layer — constant, because geometric layer sizes
    * keep each layer's diameter constant.
    */
  private val UpperHops = 2

  /** Deterministic HNSW level of a vector id: the count of trailing
    * base-4 zero digits of a seeded hash, capped — P(level >= l) =
    * 4^-l, the geometric draw HNSW makes from mL = 1/ln(M), rendered
    * as a PURE FUNCTION of the id. Every path (build, insert, walk,
    * spec) recomputes it identically, so the stored graph never
    * carries a level column per node — only the per-edge `layer`.
    */
  private[graft] def levelCol(id: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    (1 to MaxLevelCap).foldLeft(lit(0)) { (acc, l) =>
      when(pmod(xxhash64(id, lit(41)), lit(1L << (2 * l))) === 0, lit(l))
        .otherwise(acc)
    }

  /** Layer count for an n-vector corpus: enough levels that the top
    * layer holds ~[[TopTarget]] nodes, never less than 1 (so the
    * layered machinery is always exercised) and never more than
    * [[MaxLevelCap]].
    */
  private[graft] def levelsFor(n: Long): Int =
    math.min(MaxLevelCap, math.max(1,
      math.ceil(math.log(math.max(n, 1L).toDouble / TopTarget) /
        math.log(4.0)).toInt))

  /** Scheme pin for the stored graph: bump to invalidate every stored
    * edge table when the build algorithm changes.
    */
  private[graft] val GraphScheme =
    s"nsw:lsh+ring$HashRing-C$InitSuccessors:M${M}xR$DescentRounds" +
      s":sym:hnsw4^-l-top$TopTarget-R$UpperRounds:v4"

  private def emb(s: SparkSession, d: String): DataFrame =
    load(s, d, "embeddings").select(col("vec_id"), col("embedding"))

  /** Exact-cosine re-score of candidate id pairs: embeddings join back
    * by key ONLY for survivors-in-play — candidate generation travels
    * as id pairs (q62's rule: an edge frame carrying vectors would
    * store the corpus M times over).
    */
  private def scorePairs(s: SparkSession, d: String,
      pairs: DataFrame): DataFrame =
    pairs
      .join(emb(s, d).select(col("vec_id").as("u"), col("embedding").as("eu")),
        "u")
      .join(emb(s, d).select(col("vec_id").as("v"), col("embedding").as("ev")),
        "v")
      .select(col("u"), col("v"),
        Similarity.fastCosine(s)(col("eu"), col("ev")).as("score"))

  private def topM(e: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("u"))
      .orderBy(col("score").desc, col("v").asc)
    e.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= M).drop("rn")
  }

  /** Successor chaining within a bucketing: each node pairs with its
    * next `InitSuccessors` peers in (bucket, order) — O(rows·C) pairs
    * no matter how uneven the buckets, never a bucket cross-product.
    */
  private def chain(bucketed: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("bkt"))
      .orderBy(col("ord").asc, col("vec_id").asc)
    (1 to InitSuccessors).map { i =>
      bucketed.select(col("vec_id").as("u"),
        lead(col("vec_id"), i).over(w).as("v"))
    }.reduce(_.unionByName(_)).filter(col("v").isNotNull)
  }

  /** One NN-Descent pass over `nodes` (None = the whole corpus): the
    * SYMMETRIZED adjacency (u, v, score), degree ≤ 2M per node within
    * the subset. Upper HNSW layers pass their geometric subset and a
    * smaller round count.
    */
  private def descentEdges(s: SparkSession, d: String,
      nodes: Option[DataFrame], rounds: Int): DataFrame = {
    // seed = LSH locality ∪ hash-ring diversity (see HashRing scaladoc),
    // both restricted to the subset when one is given
    val lshAll = Similarity.resolveLshIndex(s, d) // (vec_id, bkt), persisted
    val lsh = nodes.fold(lshAll)(ns =>
      lshAll.join(ns.select(col("vec_id")), Seq("vec_id"), "left_semi"))
    val ringBase = nodes.fold(emb(s, d).select(col("vec_id")))(identity)
    val local = chain(lsh.select(col("vec_id"), col("bkt"),
      col("vec_id").as("ord")))
    val ring = chain(ringBase.select(col("vec_id"),
      pmod(xxhash64(col("vec_id")), lit(HashRing)).as("bkt"),
      xxhash64(col("vec_id"), lit(1)).as("ord")))
    val succ = local.unionByName(ring)
    val init = succ
      .unionByName(succ.select(col("v").as("u"), col("u").as("v")))
      .distinct()
    var edges = topM(scorePairs(s, d, init)).localCheckpoint()
    for (_ <- 1 to rounds) {
      // symmetrize (a reverse edge reuses the already-computed score),
      // exchange neighbors-of-neighbors over the symmetrized graph,
      // and pay the cosine ONLY for pairs not already scored — the
      // known frame carries its scores through the round
      val known = edges
        .unionByName(edges.select(col("v").as("u"), col("u").as("v"),
          col("score")))
        .groupBy(col("u"), col("v")).agg(max(col("score")).as("score"))
        .localCheckpoint()
      val nn = known.select(col("u"), col("v").as("mid"))
        .join(known.select(col("u").as("mid"), col("v").as("w")), "mid")
        .select(col("u"), col("w").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
        .join(known.select(col("u"), col("v")), Seq("u", "v"), "left_anti")
      edges = topM(known.unionByName(scorePairs(s, d, nn)))
        .localCheckpoint()
    }
    // store the symmetrized form: the walk then expands a frontier
    // with ONE keyed join instead of two, at ≤2x the (tiny) edge rows
    edges
      .unionByName(edges.select(col("v").as("u"), col("u").as("v"),
        col("score")))
      .groupBy(col("u"), col("v")).agg(max(col("score")).as("score"))
  }

  /** The full layered build: layer 0 is the usual NN-Descent graph over
    * the corpus; each layer l in 1..L re-runs a shorter descent over
    * the 4^-l level subset ([[levelCol]]), so upper-layer work is a
    * geometric series on top of the base. Emits (u, v, score, layer).
    */
  private def buildGraphEdges(s: SparkSession, d: String): DataFrame = {
    val n = emb(s, d).count()
    val maxL = levelsFor(n)
    val base = descentEdges(s, d, None, DescentRounds)
      .withColumn("layer", lit(0))
    val uppers = (1 to maxL).map { l =>
      val subset = emb(s, d)
        .filter(levelCol(col("vec_id")) >= l)
        .select(col("vec_id"))
      descentEdges(s, d, Some(subset), UpperRounds)
        .withColumn("layer", lit(l))
    }
    (base +: uppers).reduce(_.unionByName(_))
  }

  /** In-JVM full graph builds this session — lets the spec prove the
    * persisted index serves repeat executions without rebuilding.
    */
  private[graft] val graphBuildCount =
    new java.util.concurrent.atomic.AtomicLong(0L)

  /** Incremental (search-link-prune) insert batches this session — the
    * spec's witness that an appended file takes the delta path, never a
    * rebuild.
    */
  private[graft] val graphInsertCount =
    new java.util.concurrent.atomic.AtomicLong(0L)

  /** Bulk-ingest ceiling for the incremental path (rows per delta
    * batch): past it the NN-Descent rebuild both costs the same order
    * of work AND yields a better-navigable graph than chaining that
    * many inserts against an ever-staler neighborhood structure, so
    * the resolution falls back to rebuild. Overridable for tests.
    */
  private def insertCap: Long =
    sys.props.get("graft.nsw.insert.cap").map(_.toLong).getOrElse(65536L)

  /** HNSW-style insert, the SEARCH + LINK steps: each new vector beam-
    * walks the STANDING graph for its M best neighbors (exact-cosine
    * re-scored — the same walk the serve path runs, so insert cost is
    * O(batch · hops · beam · degree) regardless of corpus size), then
    * the new edges land SYMMETRIC through one keyed merge. Replay-safe:
    * the per-file witness probe upstream skips files already linked,
    * and the merge upserts identical rows onto themselves.
    */
  private def insertBatch(s: SparkSession, d: String,
      t: graft.tables.ParquetTable, toAppend: Seq[String]): Unit = {
    val fresh = s.read.parquet(toAppend: _*)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val standing = t.read.select(col("u"), col("v"), col("layer"))
    // a standing-graph insert links UP TO the graph's existing top
    // layer (state-derived; raising the top is a rebuild concern — the
    // level draw is a pure id function, so a later rebuild assigns the
    // same node its same level and only then materializes the higher
    // layer)
    val maxL = standing.agg(coalesce(max(col("layer")), lit(0)))
      .collect()(0).getInt(0)
    val beam = beamSearch(s, d, fresh, standing)
    // per-layer LINK: the new node joins every layer up to its own
    // level; layer-l neighbors are the best beam candidates whose own
    // level reaches l (levelCol is a pure id function — no lookup)
    val wQL = Window.partitionBy(col("query_id"), col("layer"))
      .orderBy(col("score").desc, col("cand").asc)
    val out = beam
      .withColumn("layer",
        explode(sequence(lit(0), least(levelCol(col("query_id")),
          lit(maxL)))))
      .filter(levelCol(col("cand")) >= col("layer"))
      .withColumn("rn", row_number().over(wQL))
      .filter(col("rn") <= M)
      .select(col("query_id").as("u"), col("cand").as("v"), col("score"),
        col("layer"))
    val linked = out
      .unionByName(out.select(col("v").as("u"), col("u").as("v"),
        col("score"), col("layer")))
      .groupBy(col("u"), col("v"), col("layer"))
      .agg(max(col("score")).as("score"))
      .localCheckpoint() // batch-bounded (≤ 2·batch·M·(L+1) rows);
                         // materialized so the merge never re-walks
                         // mid-write
    t.merge(linked, keys = Seq("u", "v", "layer"))
  }

  /** The insert's PRUNE step, derived from table state so an
    * interrupted insert retries to the same place: every node whose
    * adjacency this batch touched (the new nodes and their link
    * targets) is cut back to its best 2M edges, and each dropped edge's
    * mirror goes with it, preserving the stored form's symmetry and
    * degree bound. EXCEPT: an edge that is its mirror endpoint's
    * SINGLE BEST edge is undroppable — without that guard, an outlier
    * vector whose M link targets are all degree-saturated hubs would
    * lose every edge to mirror deletion (each (hub, n) ranks past 2M
    * on the hub) and become permanently unreachable by the walk, with
    * the committed state hiding the damage. The guard pins min-degree
    * ≥ 1 for every linked node; a hub may retain a few protected
    * extras past 2M (bounded by how many partners chose it as their
    * best — the standard HNSW keep-pruned-connections slack). The
    * overflow set is batch-bounded (a node gains at most the batch's
    * M links), so the dropped pairs collect driver-side under the same
    * cap that gates the insert itself.
    */
  private def pruneOverflow(s: SparkSession, d: String,
      t: graft.tables.ParquetTable, newFiles: Seq[String]): Unit = {
    val newIds = s.read.parquet(newFiles: _*)
      .select(col("vec_id").as("u")).distinct().localCheckpoint()
    val touched = t.read.join(broadcast(newIds), "u")
    val affected = touched.select(col("u"))
      .unionByName(touched.select(col("v").as("u")))
      .distinct().localCheckpoint() // ≤ batch·(M·(L+1)+1) node ids
    // degree bound and mirror protection are PER LAYER — each layer is
    // its own navigable graph with its own 2M contract
    val wU = Window.partitionBy(col("u"), col("layer"))
      .orderBy(col("score").desc, col("v").asc)
    val cand = t.read.join(broadcast(affected), "u")
      .withColumn("rn", row_number().over(wU))
      .filter(col("rn") > 2 * M)
      .select(col("u"), col("v"), col("layer"))
      .localCheckpoint() // batch-bounded overflow candidates
    // each candidate's mirror endpoint's best partner AT THAT LAYER —
    // dropping (u, v, l) also deletes (v, u, l), which must not be v's
    // last/best layer-l edge
    val mirrorNodes = cand.select(col("v").as("n"), col("layer").as("nl"))
      .distinct().localCheckpoint()
    val best = t.read
      .join(broadcast(mirrorNodes),
        col("u") === col("n") && col("layer") === col("nl"))
      .withColumn("rn", row_number().over(wU))
      .filter(col("rn") === 1)
      .select(col("u").as("bv"), col("v").as("bu"), col("layer").as("bl"))
    val dropped = cand.join(broadcast(best),
        col("v") === col("bv") && col("u") === col("bu") &&
          col("layer") === col("bl"), "left_anti")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    if (dropped.nonEmpty) {
      val keys = (dropped ++ dropped.map(x => (x._2, x._1, x._3))).distinct
        .map { case (u, v, l) => s"$u:$v:$l" }
      t.delete(concat_ws(":", col("u"), col("v"), col("layer"))
        .isin(keys: _*))
      ()
    }
  }

  /** Threshold-triggered tombstone fold for the edge table, WITH the
    * repair that keeps the min-degree guard ([[pruneOverflow]]'s
    * contract: every linked node keeps >=1 edge per layer it lives on)
    * true after deletion: removing a deleted node's incident edges can
    * orphan a live partner whose only layer-l edge pointed at it.
    * Repair links each orphan to its best CO-PARTNER (another live
    * partner of the same deleted node at the same layer — the standard
    * HNSW delete-repair, which patches the hole the deleted node
    * leaves in its own neighborhood), falling back to the bounded
    * entry-stride sample when the whole neighborhood died. Every frame
    * here is tombstone-batch-bounded: partners <= |tombs|*2M rows,
    * candidates <= partners^2 within one deleted node's adjacency,
    * orphans <= partners — the fold never scans corpus-sized state
    * beyond the file-granular delete itself. Best-effort like every
    * maintenance path: on failure the tombstones stay live and the
    * serve mask keeps hiding the nodes.
    */
  private def maybeFoldTombstonesWithRepair(s: SparkSession,
      d: String): Unit = {
    import graft.tables.IndexStore
    val kind = "nsw_index"
    try {
      val ids = IndexStore.tombstoneIds(s, kind, d)
      if (ids.length <= IndexStore.tombstoneFoldThreshold) return
      val t = IndexStore.corpusIndexTable(s, kind, d)
      if (!t.exists) return
      val idSeq = ids.toSeq
      val edges = t.read
      val isTomb = (c: String) => col(c).isin(idSeq: _*)
      // live partners of each deleted node, per layer
      val partners = edges.filter(isTomb("u") && !isTomb("v"))
        .select(col("u").as("t"), col("v").as("p"), col("layer"))
        .localCheckpoint()
      // (node, layer) pairs that still have an edge after the delete
      val after = edges.filter(!isTomb("u") && !isTomb("v"))
        .select(col("u"), col("layer")).distinct()
      // orphans: live partners whose LAST layer-l edge was to a tomb
      val orphans = partners.select(col("p").as("u"), col("layer"))
        .distinct()
        .join(after, Seq("u", "layer"), "left_anti").localCheckpoint()
      val nOrphans = orphans.count()
      val patch: Option[DataFrame] = if (nOrphans == 0) None else {
        // co-partner candidates within each deleted node's neighborhood
        val co = partners
          .join(partners.select(col("t"), col("p").as("q"), col("layer")),
            Seq("t", "layer"))
          .filter(col("p") =!= col("q"))
          .select(col("p").as("u"), col("q").as("v"), col("layer"))
        // fallback: the bounded deterministic entry sample, for orphans
        // whose whole neighborhood was deleted with them
        val entrySample = emb(s, d)
          .filter(col("vec_id") % EntryStride === 0 &&
            col("vec_id") < EntryCap && !isTomb("vec_id"))
          .select(col("vec_id").as("v"))
        val fb = orphans.select(col("u"), col("layer"))
          .crossJoin(broadcast(entrySample))
          .filter(col("u") =!= col("v"))
        val cand = co.join(orphans, Seq("u", "layer"), "left_semi")
          .unionByName(fb).filter(!isTomb("v")).distinct()
        val e = emb(s, d)
        val scored = cand
          .join(e.select(col("vec_id").as("u"), col("embedding").as("ue")),
            "u")
          .join(e.select(col("vec_id").as("v"), col("embedding").as("ve")),
            "v")
          .select(col("u"), col("v"), col("layer"),
            Similarity.fastCosine(s)(col("ue"), col("ve")).as("score"))
        val wO = Window.partitionBy(col("u"), col("layer"))
          .orderBy(col("score").desc, col("v").asc)
        val best = scored.withColumn("rn", row_number().over(wO))
          .filter(col("rn") === 1).drop("rn")
        Some(best
          .unionByName(best.select(col("v").as("u"), col("u").as("v"),
            col("layer"), col("score")))
          .groupBy(col("u"), col("v"), col("layer"))
          .agg(max(col("score")).as("score"))
          .localCheckpoint()) // orphan-bounded; pinned across the delete
      }
      // REPAIR BEFORE DELETE (ADVICE r14): the patch links live nodes
      // only, so the delete never touches it — and if the process dies
      // between the two steps, the tombstones are still set, the next
      // fold recomputes partners from the still-present edges and
      // re-merges the (idempotent, keyed) patch before deleting.
      // Delete-first had no such recovery: a crash after the delete
      // left partners empty on retry, the patch was never derived
      // again, and the orphans stayed unreachable forever.
      patch.foreach { pf => t.merge(pf, keys = Seq("u", "v", "layer")); () }
      t.delete(isTomb("u") || isTomb("v"))
      IndexStore.clearTombstones(kind, d)
    } catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[index-store] nsw tombstone fold skipped: $e")
    }
  }

  private[graft] def resolveGraphIndex(s: SparkSession,
      d: String): DataFrame = {
    import graft.tables.IndexStore
    val kind = "nsw_index"
    maybeFoldTombstonesWithRepair(s, d)
    val meta = Similarity.embeddingsFileMeta(s, d)
    def rebuild(): DataFrame = {
      graphBuildCount.incrementAndGet()
      val edges = buildGraphEdges(s, d)
      try {
        val t = IndexStore.corpusIndexTable(s, kind, d)
        t.overwrite(edges)
        IndexStore.commitCorpusIndexState(kind, d, GraphScheme, meta)
        t.read
      } catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[index-store] nsw publish skipped: $e")
          edges
      }
    }
    IndexStore.resolveCorpusIndex(s, kind, d, meta) match {
      case IndexStore.CorpusIndexHit(GraphScheme) =>
        IndexStore.corpusIndexTable(s, kind, d).read
      case IndexStore.CorpusIndexDelta(GraphScheme, newFiles) =>
        try {
          val batchRows = s.read.parquet(newFiles: _*).count()
          if (batchRows > insertCap) rebuild() // bulk backfill: see cap doc
          else {
            val t = IndexStore.corpusIndexTable(s, kind, d)
            val toAppend =
              IndexStore.filesNeedingAppend(s, t, newFiles, probeCol = "u")
            if (toAppend.nonEmpty) {
              graphInsertCount.incrementAndGet()
              insertBatch(s, d, t, toAppend)
            }
            // prune runs even on a witness-skipped replay: it re-derives
            // from table state, healing a crash between merge and delete
            pruneOverflow(s, d, t, newFiles)
            IndexStore.commitCorpusIndexState(kind, d, GraphScheme, meta)
            t.read
          }
        } catch {
          case scala.util.control.NonFatal(e) =>
            System.err.println(
              s"[index-store] nsw delta insert failed, rebuilding: $e")
            rebuild()
        }
      // rewritten/removed files, scheme change, or no standing index: a
      // k-NN graph's edges are global state, so anything but a pure
      // append invalidates and rebuilds
      case _ => rebuild()
    }
  }

  /** q211's emitted top-10 frame, memoized per corpus — fingerprint-
    * and session-validated like the served-index memos in
    * [[Similarity]]: q212's recall audit consumes the SAME walk, and
    * without the memo every q212 execution (and the bench's min-of-2
    * repeat) re-pays the full beam walk (~1.6 s at sf0.1) to recompute
    * a ≤|queries|·10-row frame. The pinned state is that tiny frame
    * over already-checkpointed lineage; released via the session-memo
    * registry with every other pin.
    */
  private val walkMemo = new java.util.concurrent.ConcurrentHashMap[
    String, (String, DataFrame)]()
  graft.common.Memos.register("graphann.walk")(() => walkMemo.clear())

  /** Uncached walk executions this session (spec hook: q211 + q212 in
    * sequence must pay exactly one walk).
    */
  private[graft] val walkCount =
    new java.util.concurrent.atomic.AtomicLong(0L)

  private def walkTopK(s: SparkSession, d: String): DataFrame = {
    // the memo key carries the tombstone version: a new delete batch
    // must invalidate the memoized RESULT frame (the walk's top-k could
    // contain a just-dropped id), unlike the IVF/LSH paths where the
    // mask applies outside the memo to a row-per-vector frame
    // key carries the STORE ROOT too: a root switch (test fixtures,
    // a re-pointed lakehouse) must not serve a frame walked over the
    // other root's graph — fingerprint and tombstone version are both
    // per-root state
    val fp = Similarity.embeddingsFingerprint(s, d) + "|root=" +
      graft.tables.IndexStore.root + "|tombs=" +
      graft.tables.IndexStore.tombstoneVersion(s, "nsw_index", d)
        .getOrElse(-1L)
    walkMemo.compute(d, (_, cur) =>
      if (cur != null && cur._1 == fp && (cur._2.sparkSession eq s)) cur
      else {
        walkCount.incrementAndGet()
        (fp, walkTopKUncached(s, d).localCheckpoint())
      })._2
  }

  /** q211: graph-walk ANN top-10 for the fixed query set (vec_id < 20,
    * the q38/q39/q54 contract) over the persisted NSW edge table.
    */
  /** Greedy beam walk over `edges` for an arbitrary BOUNDED query frame
    * (query_id, qv) — shared by the q211 serve path (the fixed literal
    * query set) and the incremental insert's SEARCH step (a micro-batch
    * of new vectors). Returns the final beam (query_id, cand, score),
    * self-matches excluded; every hop's frontier is O(|queries|·B·M)
    * rows regardless of corpus size. The query frame is broadcast into
    * each re-score — literal-bounded for q211, micro-batch-bounded (and
    * [[InsertCap]]-capped) for the insert.
    */
  private def beamSearch(s: SparkSession, d: String, q: DataFrame,
      edges: DataFrame, beam: Int = Beam): DataFrame = {
      val e = emb(s, d)
      // state-derived layer count (replay-safe: whatever the stored
      // graph carries is what the walk descends)
      val maxL = edges.agg(coalesce(max(col("layer")), lit(0)))
        .collect()(0).getInt(0)
      // entry set: every TOP-layer node — bounded at ~TopTarget by the
      // geometric level draw, exactly the role the old id-cut sample
      // played, but now the entries are the nodes HNSW routes from
      val entries =
        if (maxL == 0)
          e.filter(col("vec_id") % EntryStride === 0 &&
              col("vec_id") < EntryCap)
            .select(col("vec_id").as("cand"))
        else edges.filter(col("layer") === maxL)
          .select(col("u").as("cand")).distinct()
      val wQ = Window.partitionBy(col("query_id"))
        .orderBy(col("score").desc, col("cand").asc)
      def rescore(cands: DataFrame): DataFrame =
        cands
          .join(e.select(col("vec_id").as("cand"), col("embedding").as("cv")),
            "cand")
          .join(broadcast(q), "query_id")
          .select(col("query_id"), col("cand"),
            Similarity.fastCosine(s)(col("qv"), col("cv")).as("score"))
      def keepTop(f: DataFrame, k: Int): DataFrame = f
        .withColumn("rn", row_number().over(wQ))
        .filter(col("rn") <= k)
        .select(col("query_id"), col("cand"), col("score"))
      def hop(f: DataFrame, layer: Int, k: Int): DataFrame = {
        val expanded = f.select(col("query_id"), col("cand").as("u"))
          .join(edges.filter(col("layer") === layer)
            .select(col("u"), col("v")), "u")
          .select(col("query_id"), col("v").as("cand"))
          .unionByName(f.select(col("query_id"), col("cand")))
          .distinct()
        keepTop(rescore(expanded), k).localCheckpoint()
      }
      var frontier = keepTop(rescore(
          q.select(col("query_id")).crossJoin(broadcast(entries))),
          if (maxL == 0) beam else GreedyWidth)
        .localCheckpoint()
      // descend the sparse upper layers at greedy width — constant
      // hops per layer, O(log n) layers
      for (l <- maxL to 1 by -1; _ <- 1 to UpperHops)
        frontier = hop(frontier, l, GreedyWidth)
      // full beam only at layer 0
      for (_ <- 1 to Hops)
        frontier = hop(frontier, 0, beam)
      frontier.filter(col("cand") =!= col("query_id"))
  }

  private def walkTopKUncached(s: SparkSession, d: String): DataFrame = {
      val edges = resolveGraphIndex(s, d)
        .select(col("u"), col("v"), col("layer"))
      val q = emb(s, d).filter(col("vec_id") < 20)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      val wQ = Window.partitionBy(col("query_id"))
        .orderBy(col("score").desc, col("cand").asc)
      // tombstone mask on the FINAL BEAM, before the top-k rank — the
      // HNSW deleted-node discipline: dropped nodes stay in the stored
      // graph as ROUTING waypoints until the threshold fold (removing
      // them early would tear the walk's connectivity), but they are
      // never returnable; masking the Beam(=32)-deep candidate set and
      // THEN ranking k=10 keeps the result full, where masking an
      // already-ranked top-k would silently under-return
      graft.tables.IndexStore.maskTombstones(s, "nsw_index", d,
          beamSearch(s, d, q, edges), cols = Seq("cand"))
        .withColumn("rn", row_number().over(wQ))
        .filter(col("rn") <= 10)
        .select(col("query_id"), col("cand").as("vec_id"),
          col("score"), col("rn").cast("int").as("rn"))
  }

  /** FILTERED graph ANN (round-14, the q273 contract on the NSW
    * index; round-16: arbitrary predicate over the declared filter
    * columns): top-k among predicate-matching vectors only. The walk
    * ROUTES over the full graph — restricting routing to matching
    * nodes would fragment the navigable structure at selective
    * filters, the known failure mode of filtered graph search — and
    * the predicate applies to the FINAL beam (one metadata join
    * against the column-pruned filter-column scan per round, never
    * per hop). Queries whose
    * beam holds fewer than k matching candidates re-walk with a
    * DOUBLED beam (32→64→128 — the filtered-HNSW over-fetch rule);
    * a query still short at the beam cap falls back to the EXACT
    * filtered scan for itself alone, so the operator never silently
    * under-returns: at 10% selectivity the 128-beam satisfies
    * virtually all queries and the fallback is the bounded
    * correctness backstop, not the serving path.
    */
  private[graft] def walkTopKFiltered(s: SparkSession, d: String,
      pred: org.apache.spark.sql.Column, k: Int = 10): DataFrame = {
    import s.implicits._
    val edges = resolveGraphIndex(s, d).select(col("u"), col("v"), col("layer"))
    val e = graft.common.Tables.load(s, d, "embeddings")
    // the beam's metadata side: one column-pruned corpus scan carrying
    // exactly the filter columns `pred` references (round-16 — the
    // graph index stores edges, so its filter columns live on the
    // corpus scan, enriched from `documents` only when referenced)
    val meta = Similarity.enrichForPred(s, d,
        e.select(col("vec_id"), col("label")), pred)
      .withColumnRenamed("vec_id", "cand")
    val wQ = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("cand").asc)
    def topK(f: DataFrame): DataFrame = f
      .withColumn("rn", row_number().over(wQ))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("cand").as("vec_id"),
        col("score"), col("rn").cast("int").as("rn"))
    val qvecs = e.filter(col("vec_id") < 20)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    var remaining: Seq[(Long, Array[Float])] = qvecs.toSeq
    val finals = scala.collection.mutable.ArrayBuffer[DataFrame]()
    for (beam <- Seq(Beam, 2 * Beam, 4 * Beam) if remaining.nonEmpty) {
      val q = remaining.toDF("query_id", "qv")
      val masked = graft.tables.IndexStore.maskTombstones(s, "nsw_index", d,
        beamSearch(s, d, q, edges, beam), cols = Seq("cand"))
      val matching = masked.join(meta, "cand").filter(pred)
        .select(col("query_id"), col("cand"), col("score"))
        .localCheckpoint() // consumed twice: counts + emit
      val counts = matching.groupBy("query_id").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val (done, notDone) = remaining.partition { case (qid, _) =>
        counts.getOrElse(qid, 0L) >= k || beam == 4 * Beam
      }
      val satisfied = done.filter { case (qid, _) =>
        counts.getOrElse(qid, 0L) >= k
      }
      if (satisfied.nonEmpty)
        finals += topK(matching
          .filter(col("query_id").isin(satisfied.map(_._1): _*)))
      // beam-cap leftovers: exact filtered brute force for THESE
      // queries only — bounded (|deficient| broadcast against the
      // pushed-predicate label scan), the no-under-return backstop
      val leftover = done.filterNot(satisfied.contains)
      if (leftover.nonEmpty) {
        val lq = leftover.toDF("query_id", "qv")
        // the backstop serves from RAW embeddings, so it must mask
        // tombstones exactly like the beam path does — a taken-down
        // vec_id re-served here would be a takedown-contract violation
        // on what is, at sparse filters, the COMMON path (ADVICE r14)
        finals += topK(graft.tables.IndexStore.maskTombstones(s,
          "nsw_index", d,
          Similarity.enrichForPred(s, d, e, pred).filter(pred)
            .join(broadcast(lq), col("vec_id") =!= col("query_id"))
            .select(col("query_id"), col("vec_id").as("cand"),
              Similarity.fastCosine(s)(col("qv"), col("embedding"))
                .as("score")),
          cols = Seq("cand")))
      }
      remaining = notDone
    }
    finals.reduceOption(_.unionByName(_))
      .getOrElse(Similarity.emptyTopKFrame(s))
  }

  /** q274's memoized frame — q211's memo discipline (fingerprint +
    * store root + tombstone version).
    */
  private val filteredWalkMemo = new java.util.concurrent.ConcurrentHashMap[
    String, (String, DataFrame)]()
  graft.common.Memos.register("graphann.filteredWalk")(() =>
    filteredWalkMemo.clear())

  private def walkTopKFilteredMemo(s: SparkSession, d: String): DataFrame = {
    val fp = Similarity.embeddingsFingerprint(s, d) + "|root=" +
      graft.tables.IndexStore.root + "|tombs=" +
      graft.tables.IndexStore.tombstoneVersion(s, "nsw_index", d)
        .getOrElse(-1L)
    filteredWalkMemo.compute(d, (_, cur) =>
      if (cur != null && cur._1 == fp && (cur._2.sparkSession eq s)) cur
      else (fp, walkTopKFiltered(s, d, col("label") === 1)
        .localCheckpoint()))._2
  }

  private val q274 = QueryDef(
    (s, d) => walkTopKFilteredMemo(s, d),
    // derived oracle restricted to the filtered universe (the q273
    // pattern): an emitted row with label != 1 vanishes from the
    // verified frame and fails the hash compare
    Some(Similarity.emittedTopKOracle("q274_ann_graph_filtered",
      "e.label = 1")),
    "filtered graph-walk ANN top-10: label=1 on the final beam, " +
      "adaptive beam widening, exact backstop [similarity]")

  private val q211 = QueryDef(
    (s, d) => walkTopK(s, d),
    Some(Similarity.emittedTopKOracle("q211_ann_graph")),
    "graph-walk (NSW) ANN top-10 from a persisted NN-Descent k-NN graph: " +
      "pair-level derived oracle [similarity]")

  /** q212: recall@10 of the graph walk against the exact baseline —
    * the q123 audit shape for the NSW family, with the macro-recall
    * floor enforced BY the oracle (below the floor the oracle emits
    * zero rows and the driver compare fails on rowcount). The floor
    * statistic is the MACRO average AVG(n_hits/n_exact) — per-query
    * recalls averaged equally — matching this scaladoc and the spec;
    * it coincides with the micro form only while every query's exact
    * baseline returns a full 10 rows. The walk itself is the memoized
    * q211 frame, not a recomputation.
    */
  private val q212 = QueryDef(
    (s, d) => {
      val exact = Similarity.exactTopK(s, d)
        .select(col("query_id"), col("vec_id"))
      val approx = walkTopK(s, d)
        .select(col("query_id").as("aqid"), col("vec_id").as("avid"))
      exact.join(approx,
          col("query_id") === col("aqid") && col("vec_id") === col("avid"),
          "left")
        .groupBy(col("query_id"))
        .agg(graft.common.Exact.lcountAll.as("n_exact"),
          graft.common.Exact.lcount(col("avid")).as("n_hits"))
        .withColumn("recall", col("n_hits") / col("n_exact"))
    },
    Some(s"""WITH ex AS (
              SELECT query_id, vec_id FROM read_parquet(
                '${graft.QueryDef.OutDirToken}/q38_ann_bruteforce/*.parquet')
            ), ap AS (
              SELECT query_id, vec_id FROM read_parquet(
                '${graft.QueryDef.OutDirToken}/q211_ann_graph/*.parquet')
            ), j AS (
              SELECT e.query_id, CAST(count(*) AS BIGINT) AS n_exact,
                CAST(count(a.vec_id) AS BIGINT) AS n_hits
              FROM ex e LEFT JOIN ap a
                ON e.query_id = a.query_id AND e.vec_id = a.vec_id
              GROUP BY 1
            )
            SELECT query_id, n_exact, n_hits,
              n_hits / n_exact AS recall
            FROM j
            WHERE (SELECT AVG(CAST(n_hits AS DOUBLE) / n_exact)
                   FROM j) >= $RecallFloor"""),
    "NSW recall@10 audit vs exact baseline with an oracle-enforced " +
      "macro-recall floor [similarity]")

  def all: Seq[(String, QueryDef)] = Seq(
    "q211_ann_graph" -> q211,
    "q212_graph_recall" -> q212,
    "q274_ann_graph_filtered" -> q274)
}
