package graft.queries

import graft.QueryDef
import graft.common.Tables.load
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (vec_id,
  * embedding: array<float>, label): brute-force cosine top-k as the exact
  * baseline, random-hyperplane LSH and trained-IVF bucketed variants as
  * the scale paths, embedding-cosine near-dup pairs (the 5th dedup
  * flavor, exact + candidates-then-rerank), and the int8 quantization
  * audit for serving the index compressed.
  *
  * Cosine is computed as a sequential left-fold in DOUBLE (floats cast
  * per-element before multiply) so the result is bit-identical to the
  * oracle's `list_reduce` mirror — see graft.common.Exact for why order
  * discipline matters for float parity.
  */
object Similarity {

  /** dot(a,b) as a sequential double fold over zip_with. */
  private def ddot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  private def dnorm(a: Column): Column =
    sqrt(aggregate(
      transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, x) => acc + x))

  /** Interpreted-HOF cosine (kept as the portable reference formulation;
    * the hot paths use the codegen'd native expression below).
    */
  def cosine(a: Column, b: Column): Column =
    ddot(a, b) / (dnorm(a) * dnorm(b))

  /** Native codegen'd cosine (graft.functions.CosineSimilarity) —
    * bit-identical result, stays inside whole-stage codegen.
    */
  private[queries] def fastCosine(s: SparkSession)(a: Column, b: Column): Column = {
    graft.functions.GraftFunctions.register(s)
    graft.functions.GraftFunctions.cosineSim(a, b)
  }

  /** DuckDB mirror of the same sequential-double cosine. The builtin
    * list_cosine_similarity accumulates in FLOAT (≈1e-7 off) — not used.
    */
  private[queries] def cosineSql(a: String, b: String): String =
    s"""(list_reduce(list_transform(list_zip($a, $b),
          x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), (x,y) -> x+y)
        / (sqrt(list_reduce(list_transform($a, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), (x,y) -> x+y))
         * sqrt(list_reduce(list_transform($b, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), (x,y) -> x+y))))"""

  /** Pair-level derived oracle for the approximate top-k family (q39 /
    * q54 / q87): the CANDIDATE SET is algorithm-specific (LSH buckets,
    * IVF cells, ADC pools — DuckDB can't re-derive it), but every
    * emitted (query_id, vec_id, score, rn) row makes two exact claims
    * an independent engine CAN check: the score is the true sequential-
    * double cosine of that pair, and rn is the (score DESC, vec_id ASC)
    * rank within the emitted set. The oracle re-reads the emitted pairs
    * from Verify's own output (QueryDef.OutDirToken, resolved at dump
    * time), recomputes the cosine per pair from the `embeddings` table,
    * re-derives the ranks from the RECOMPUTED scores, and the driver
    * hash-compares the verified frame against the emitted one — a wrong
    * score, a mis-ordered top-k, a duplicated pair, or a phantom vec_id
    * (which would recompute as NULL) all fail the compare. What stays
    * outside the oracle is RECALL (which pairs were nominated); that is
    * pinned against the exact baselines in ApproxOpsSpec / IvfPqSpec.
    */
  private[queries] def emittedTopKOracle(name: String,
      candidateWhere: String = "TRUE"): String =
    s"""WITH emitted AS (
          SELECT query_id, vec_id
          FROM read_parquet('${graft.QueryDef.OutDirToken}/$name/*.parquet')
        ), verified AS (
          SELECT m.query_id, m.vec_id,
            ${cosineSql("q.embedding", "e.embedding")} AS score
          FROM emitted m
          JOIN embeddings e ON e.vec_id = m.vec_id
          JOIN embeddings q ON q.vec_id = m.query_id
          WHERE ($candidateWhere)
        )""" + s"""
        SELECT query_id, vec_id, score,
          CAST(ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY score DESC, vec_id ASC) AS INTEGER) AS rn
        FROM verified"""

  /** Brute-force cosine top-k (k=10) for a fixed query set (vec_id < 20).
    * The query side is tiny → broadcast; the big side streams through one
    * codegen stage: no shuffle except the per-query top-k window, which
    * TakeOrdered-style only keeps k rows per partition. This is the exact
    * baseline an IVF/LSH index is measured against.
    */
  private val q38 = QueryDef(
    (s, d) => {
      val e = load(s, d, "embeddings")
      val q = e.filter(col("vec_id") < 20)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("score").desc, col("vec_id").asc)
      e.join(broadcast(q), col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"),
          fastCosine(s)(col("qv"), col("embedding")).as("score"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 10)
        .select(col("query_id"), col("vec_id"),
          col("score"), col("rn").cast("int").as("rn"))
    },
    Some(s"""WITH q AS (
              SELECT vec_id AS query_id, embedding AS qv FROM embeddings
              WHERE vec_id < 20
            ), scored AS (
              SELECT q.query_id, e.vec_id,
                ${cosineSql("q.qv", "e.embedding")} AS score
              FROM embeddings e JOIN q ON e.vec_id <> q.query_id
            )
            SELECT query_id, vec_id, score, CAST(rn AS INTEGER) AS rn
            FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY score DESC, vec_id ASC) AS rn FROM scored)
            WHERE rn <= 10"""),
    "brute-force cosine top-10 for 20 queries [similarity]")

  // ---- Random-hyperplane LSH (multi-table) ----
  // L tables of k hyperplane bits each (deterministic xorshift64* planes,
  // fixed seed). A pair is a candidate if it collides in >=1 table.
  // With neighbor cosine ~0.45 (this corpus is near-uniform), per-bit
  // agreement p = 1 - θ/π ≈ 0.65: recall@k=4,L=12 ≈ 1-(1-p^4)^12 ≈ 0.9,
  // examining ~half the points. On real (clustered) embedding corpora the
  // same structure prunes far harder; the mechanics — narrow map to
  // (table, bucket) + bucketed join, no cartesian — are the 100 TB path.
  private val BitsPerTable = 4
  private val NumTables = 16

  /** Deterministic planes via xorshift64* from a fixed seed, for a given
    * embedding width: planesFor(dim)(table)(bit)(component). The width
    * comes from the data (like the k-means trainer), so the LSH surface
    * serves any embedding dimension; for a fixed dim the fill order is
    * fixed, so the planes — and every downstream bucket — are identical
    * across drivers and executors. Memoized per width (a few KB each).
    */
  private val planesCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Array[Double]]]]()

  private[queries] def planesFor(dim: Int): Array[Array[Array[Double]]] =
    planesCache.computeIfAbsent(dim, { d =>
      var state = 0x9E3779B97F4A7C15L // fixed seed: golden-ratio constant
      def next(): Double = {
        state ^= state >>> 12; state ^= state << 25; state ^= state >>> 27
        val r = state * 0x2545F4914F6CDD1DL
        (r >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
      }
      Array.fill(NumTables, BitsPerTable, d)(next())
    })

  /** All L bucket ids of one vector — the signature loop shared by the
    * distributed bucketing pass and the driver-side query probe (the
    * planes are a pure function of the width, so both sides derive
    * identical buckets with no state shipped).
    */
  private[graft] def bucketIdsOf(v: Array[Float]): Array[Int] = {
    val ps = planesFor(v.length)
    Array.tabulate(NumTables) { t =>
      var sig = 0
      var b = 0
      while (b < BitsPerTable) {
        val p = ps(t)(b)
        var dot = 0.0
        var k = 0
        while (k < v.length) { dot += v(k).toDouble * p(k); k += 1 }
        if (dot >= 0.0) sig |= (1 << b)
        b += 1
      }
      sig + (t << BitsPerTable)
    }
  }

  /** All bucket ids within Hamming distance `radius` of the vector's L
    * signatures — multi-probe LSH (Lv et al., VLDB'07): a deficient
    * filtered query widens its probe set by perturbing signature bits
    * instead of re-scanning the corpus, the LSH analogue of IVF's
    * probe-doubling. radius=0 is exactly [[bucketIdsOf]]; radius=1 adds
    * BitsPerTable buckets per table (the partition-pruned widening is
    * L·(1+K) directories at these settings — still a static
    * PartitionFilter, never a scan).
    */
  private[graft] def multiprobeBucketIdsOf(v: Array[Float],
      radius: Int): Array[Int] = {
    val exact = bucketIdsOf(v)
    if (radius <= 0) exact
    else {
      val out = scala.collection.mutable.LinkedHashSet[Int]()
      def expand(sig: Int, table: Int, fromBit: Int, left: Int): Unit = {
        out += sig
        if (left > 0) {
          var b = fromBit
          while (b < BitsPerTable) {
            expand(sig ^ (1 << b), table, b + 1, left - 1)
            b += 1
          }
        }
      }
      exact.zipWithIndex.foreach { case (sig, t) => expand(sig, t, 0, radius) }
      out.toArray
    }
  }

  // ---- stored filter columns (round-16) -------------------------------
  //
  // The filtered-ANN contract (q273-q276) used to hardwire ONE baked-in
  // int column (`label`). Real curation filters are multi-column (lang,
  // source, license, date), so the stored set is now a BUILD-TIME
  // PARAMETER: every persisted index row carries each declared column
  // beside the vector/codes/bucket, the column set is recorded in each
  // index's format pin (changing it rebuilds v-old stores through the
  // ordinary pin-mismatch MISS path), and the probes accept an
  // arbitrary predicate over the stored columns — it still lands on the
  // pruned scan as parquet PushedFilters next to the cell/bkt
  // PartitionFilter, never as a post-filter on a top-k.

  /** The declared stored-filter-column set: (name, Spark type). Columns
    * resolve from the embeddings table itself when present, else from
    * the `documents` table by the corpus key (vec_id ≡ doc_id — one
    * co-keyed join paid ONCE at index build/extend, never at probe
    * time), else a typed default (synthetic spec fixtures without
    * metadata index the default and stay generic).
    */
  private[graft] val IndexFilterCols: Seq[(String, String)] =
    Seq("label" -> "int", "lang" -> "string")

  /** The column-set tag recorded inside each index format pin. */
  private[graft] val FilterColsTag: String =
    IndexFilterCols.map(_._1).mkString(",")

  private def filterDefault(tpe: String): Column = tpe match {
    case "string" => lit("")
    case _ => lit(0).cast(tpe)
  }

  /** `vectors` (vec_id, embedding, ...) with EVERY declared filter
    * column present and typed: kept (cast) when already on the frame,
    * joined from `documents` by vec_id ≡ doc_id when that table carries
    * it, else the typed default (a column absent EVERYWHERE — synthetic
    * fixtures — indexes the default so the layer stays generic). A
    * vector WITHOUT a document row reads NULL for a documents-resident
    * column and is excluded from every predicate universe — standard
    * SQL null semantics, deliberately NOT coalesced to the default:
    * identical on the index path (null stored beside the vector) and
    * the exact backstop (null joined at query time), and it keeps the
    * predicate parquet-PUSHABLE — `coalesce(lang,'') = 'en'` cannot
    * reach a scan as a PushedFilter, `lang = 'en'` can.
    */
  private[graft] def withFilterCols(s: SparkSession, d: String,
      vectors: DataFrame): DataFrame = {
    val have = vectors.columns.toSet
    val missing = IndexFilterCols.filterNot { case (c, _) => have(c) }
    val docsPath = java.nio.file.Paths.get(d, "documents.parquet")
    val docCols: Set[String] =
      if (missing.nonEmpty && java.nio.file.Files.exists(docsPath))
        try load(s, d, "documents").columns.toSet
        catch { case scala.util.control.NonFatal(_) => Set.empty }
      else Set.empty
    val (fromDocs, defaulted) =
      missing.partition { case (c, _) => docCols.contains(c) }
    val present = IndexFilterCols.collect {
      case (c, t) if have(c) => (c, t)
    }
    val cast = present.foldLeft(vectors) { case (df, (c, t)) =>
      df.withColumn(c, col(c).cast(t))
    }
    val withDefaults = defaulted.foldLeft(cast) { case (df, (c, t)) =>
      df.withColumn(c, filterDefault(t))
    }
    if (fromDocs.isEmpty) withDefaults
    else {
      val docs = load(s, d, "documents").select(
        col("doc_id").as("vec_id") +:
          fromDocs.map { case (c, t) => col(c).cast(t).as(c) }: _*)
      withDefaults.join(docs, Seq("vec_id"), "left")
    }
  }

  /** `frame` extended with ONLY the filter columns `pred` references
    * that it does not already carry — the exact-scan backstops' form of
    * [[withFilterCols]]: a label-only predicate keeps the raw
    * embeddings scan join-free; a documents-resident column pays its
    * one metadata join only when actually referenced.
    */
  /** The column names `pred` references, resolved against a zero-row
    * probe frame carrying the corpus key and every declared filter
    * column (Spark 4's Column no longer exposes its expression, so the
    * public-API way to ask a predicate what it mentions is to analyze
    * it). A predicate over anything OUTSIDE the declared set fails
    * analysis here — loudly, at plan time — which IS the contract: the
    * filtered probes accept arbitrary predicates over the STORED
    * filter columns.
    */
  private[graft] def predReferences(s: SparkSession, pred: Column): Set[String] = {
    val probe = IndexFilterCols.foldLeft(s.range(0).toDF("vec_id")) {
      case (df, (c, t)) => df.withColumn(c, filterDefault(t))
    }
    probe.filter(pred).queryExecution.analyzed.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        f.condition.references.map(_.name).toSet
    }.headOption.getOrElse(Set.empty)
  }

  private[graft] def enrichForPred(s: SparkSession, d: String,
      frame: DataFrame, pred: Column): DataFrame = {
    val needed = predReferences(s, pred) -- frame.columns
    if (needed.isEmpty) frame
    else {
      val spec = IndexFilterCols.filter { case (c, _) => needed(c) }
      val docsPath = java.nio.file.Paths.get(d, "documents.parquet")
      val docCols: Set[String] =
        if (java.nio.file.Files.exists(docsPath))
          try load(s, d, "documents").columns.toSet
          catch { case scala.util.control.NonFatal(_) => Set.empty }
        else Set.empty
      val (fromDocs, defaulted) =
        spec.partition { case (c, _) => docCols.contains(c) }
      val withDefaults = defaulted.foldLeft(frame) { case (df, (c, t)) =>
        df.withColumn(c, filterDefault(t))
      }
      if (fromDocs.isEmpty) withDefaults
      else {
        // left join, NOT coalesced — [[withFilterCols]]'s null
        // semantics, and the reason the predicate stays pushable into
        // the documents scan here
        val docs = load(s, d, "documents").select(
          col("doc_id").as("vec_id") +:
            fromDocs.map { case (c, t) => col(c).cast(t).as(c) }: _*)
        withDefaults.join(docs, Seq("vec_id"), "left")
      }
    }
  }

  /** The declared filter columns of `vectors` packed into one
    * string-valued map column — the generic carry through the typed
    * index-build passes (a dynamic column SET can't ride a fixed-arity
    * tuple encoder); [[restoredFilterCols]] unpacks them back into
    * typed, pushdown-able parquet columns on the way out.
    */
  private[queries] def fmetaExpr(vectors: DataFrame): Column =
    map(IndexFilterCols.flatMap { case (c, t) =>
      val v =
        if (vectors.columns.contains(c)) col(c).cast(t)
        else filterDefault(t)
      Seq(lit(c), v.cast("string"))
    }: _*)

  private[queries] def restoredFilterCols: Seq[Column] =
    IndexFilterCols.map { case (c, t) =>
      col("fmeta").getItem(c).cast(t).as(c)
    }

  private[queries] def filterColRefs: Seq[Column] = IndexFilterCols.map(c => col(c._1))

  /** (vec_id, embedding, bucket, <filter cols>) rows for all L tables
    * over `vectors`, one typed partition pass (plane dots in a
    * primitive loop — Spark's higher-order array functions are
    * interpreted and ~30x slower here). The declared filter columns
    * ride into the bucket row for the same reason they ride into the
    * inverted file ([[assignRows]]): a filtered probe's predicate must
    * land on the pruned index scan as a parquet PushedFilter, not
    * post-filter a top-k.
    */
  private def bucketRows(s: SparkSession, vectors: DataFrame): DataFrame = {
    import s.implicits._
    vectors.select(col("vec_id"), col("embedding"),
        fmetaExpr(vectors).as("fmeta"))
      .as[(Long, Array[Float], Map[String, String])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, v, fm) =>
          bucketIdsOf(v).iterator.map(bkt => (id, v, bkt, fm))
        }
      }.toDF("vec_id", "embedding", "bkt", "fmeta")
      .select(col("vec_id") +: col("embedding") +: col("bkt") +:
        restoredFilterCols: _*)
  }

  /** Version marker recorded as the LSH index's "quantizer": the planes
    * are derived from a fixed seed (pure function of the embedding
    * width), so unlike the IVF/PQ indexes there is no trained state to
    * pin — but a future change to the plane scheme must invalidate
    * every stored bucket table, and bumping this string does exactly
    * that through the ordinary pin-mismatch path.
    */
  // v2 added the `label` filter column (round-15 filtered LSH); v3
  // (round-16) records the DECLARED filter-column set in the pin —
  // bucket rows carry every declared column, and changing the set
  // rebuilds older stores through the ordinary pin-mismatch path
  private val LshPlanesVersion =
    s"planes:xorshift64s:L16xK4:v3-filters:$FilterColsTag"

  /** Number of in-JVM full-corpus bucketing passes for the LSH index —
    * lets IncrementalIndexSpec prove the delta path never re-buckets
    * the standing corpus.
    */
  private[graft] val lshBucketCount =
    new java.util.concurrent.atomic.AtomicLong(0L)

  private def normalizedLshRead(t: graft.tables.ParquetTable): DataFrame =
    t.read.select(col("vec_id") +: col("bkt").cast("int").as("bkt") +:
      filterColRefs: _*)

  /** The persisted multi-table LSH index — (vec_id, bkt) partitioned by
    * bkt, [[resolveIvfIndex]]'s lifecycle for the hyperplane buckets.
    * Deliberately ids-only: bucket rows carrying embeddings would store
    * the corpus L times over (16x at these settings); candidates travel
    * as 16-byte pairs and embeddings join back only for survivors —
    * q62's scale rule. Because the planes are seed-deterministic there
    * is no trained quantizer to pin; the recorded pin is the plane
    * SCHEME version, and new files are bucketed alone and appended
    * (same witness-probe idempotence, same rebuild-on-rewrite).
    */
  /** Served-index session memos — the resolve analog of
    * [[centroidCache]]. Every resolution pays driver-side filesystem
    * work (dataset listStatus, sidecar parse, manifest read, a file
    * listing per stored data dir) before a single row moves; a query
    * family that executes several index-backed plans per session
    * (q39/q54/q62/q87/q89/q91, the bench's steady state) would pay it
    * per EXECUTION. The memo returns the previously resolved DataFrame
    * — whose relation already holds its listed FileIndex, so re-use
    * costs nothing on the driver — keyed by dataset dir and validated
    * against the dataset's CURRENT content fingerprint: one listStatus
    * per lookup is the price of never serving a stale index. The frame
    * is deliberately NOT persist()ed: it stays a plain parquet-backed
    * plan, so each probe still partition-prunes to its probed cells —
    * an InMemoryRelation would pin the WHOLE index in executor memory
    * and answer probes with full cached scans, exactly wrong at 100 TB.
    * Entries are validated on THREE axes per lookup: the dataset
    * content fingerprint (stale data never served), the index table's
    * own committed version (a compaction — whose vacuum deletes the
    * files the memoized plan references — or any other writer bumps
    * it), and the owning SparkSession (a stopped session's plans are
    * unusable).
    */
  private val lshServeCache = new java.util.concurrent.ConcurrentHashMap[
    String, (String, Option[Long], DataFrame)]()
  private val ivfServeCache = new java.util.concurrent.ConcurrentHashMap[
    String, (String, Option[Long],
      Array[(Long, Array[Double], Double)], DataFrame)]()

  /** Current committed version of a stored corpus index — one tiny
    * pointer-file read, the price of catching an out-of-band rewrite
    * (compaction, another maintainer) before serving a dead plan.
    */
  private[queries] def indexVersion(s: SparkSession, kind: String,
      d: String): Option[Long] =
    try graft.tables.IndexStore.corpusIndexTable(s, kind, d).latestVersion
    catch { case scala.util.control.NonFatal(_) => None }

  /** Uncached resolutions performed this session (per index kind) —
    * lets IndexStoreSpec assert the memo serves repeat executions with
    * exactly one resolution.
    */
  private[graft] val lshResolveCount =
    new java.util.concurrent.atomic.AtomicLong(0L)
  private[graft] val ivfResolveCount =
    new java.util.concurrent.atomic.AtomicLong(0L)

  /** Drop the served-index session memos (a fresh session's state) —
    * test hook for the persisted-index lifecycle, paired with
    * [[clearCentroidSessionCache]].
    */
  private[graft] def clearServedIndexCaches(): Unit = {
    lshServeCache.clear()
    ivfServeCache.clear()
    IvfPq.clearServedIndexCache()
  }

  // session teardown / multi-corpus eviction path: one Memos.clearAll()
  // drops every resolved-plan and trained-model memo in the family
  graft.common.Memos.register("ann.servedIndexes")(() =>
    clearServedIndexCaches())
  graft.common.Memos.register("ann.centroids")(() =>
    clearCentroidSessionCache())

  private[graft] def resolveLshIndex(s: SparkSession, d: String): DataFrame = {
    // threshold-triggered tombstone fold runs BEFORE the memo check:
    // a fold bumps the index version, so the memo re-resolves and the
    // serve mask below shrinks back to the (now empty) live set
    graft.tables.IndexStore.maybeFoldTombstones(
      s, "lsh_index", d, Seq("vec_id"), Some("bkt"))
    val meta = embeddingsFileMeta(s, d)
    val fp = fingerprintOf(d, meta)
    val ver = indexVersion(s, "lsh_index", d)
    val served = lshServeCache.compute(d, (_, cur) =>
      if (cur != null && cur._1 == fp && cur._2 == ver &&
          (cur._3.sparkSession eq s)) cur
      else {
        lshResolveCount.incrementAndGet()
        val df = resolveLshIndexUncached(s, d, meta)
        // version recorded AFTER the resolve — it may have appended or
        // compacted, and the memo must match what the next lookup sees
        (fp, indexVersion(s, "lsh_index", d), df)
      })._3
    // mask OUTSIDE the memo: the memoized plan stays delete-agnostic
    // and each call applies the CURRENT live set (a threshold-bounded
    // literal InSet — no join, empty set = untouched plan)
    graft.tables.IndexStore.maskTombstones(s, "lsh_index", d, served)
  }

  private def resolveLshIndexUncached(s: SparkSession, d: String,
      meta: Map[String, String]): DataFrame = {
    import graft.tables.IndexStore
    val kind = "lsh_index"

    def rebuild(): DataFrame = {
      lshBucketCount.incrementAndGet()
      val computed =
        bucketRows(s, withFilterCols(s, d, load(s, d, "embeddings")))
          .select(col("vec_id") +: col("bkt") +: filterColRefs: _*)
      try {
        val t = IndexStore.corpusIndexTable(s, kind, d)
        t.overwrite(computed, partitionBy = Seq("bkt"))
        IndexStore.commitCorpusIndexState(kind, d, LshPlanesVersion, meta)
        normalizedLshRead(t)
      } catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[index-store] lsh publish skipped: $e")
          computed
      }
    }

    IndexStore.resolveCorpusIndex(s, kind, d, meta) match {
      case IndexStore.CorpusIndexHit(LshPlanesVersion) =>
        normalizedLshRead(IndexStore.corpusIndexTable(s, kind, d))
      case IndexStore.CorpusIndexDelta(LshPlanesVersion, newFiles) =>
        try {
          val t = IndexStore.corpusIndexTable(s, kind, d)
          val toAppend = IndexStore.filesNeedingAppend(s, t, newFiles)
          if (toAppend.nonEmpty) {
            // the fresh rows are enriched with the declared filter
            // columns exactly like a rebuild (documents join by vec_id)
            val fresh = withFilterCols(s, d, s.read.parquet(toAppend: _*))
            t.append(bucketRows(s, fresh)
              .select(col("vec_id") +: col("bkt") +: filterColRefs: _*),
              partitionBy = Seq("bkt"))
          }
          IndexStore.commitCorpusIndexState(kind, d, LshPlanesVersion, meta)
          IndexStore.maybeCompactCorpusIndex(s, kind, d, partitionCol = "bkt")
          normalizedLshRead(t)
        } catch {
          case scala.util.control.NonFatal(e) =>
            System.err.println(
              s"[index-store] lsh delta append failed, rebuilding: $e")
            rebuild()
        }
      case _ => rebuild() // miss, or a pin from an older plane scheme
    }
  }

  /** LSH-bucketed ANN: same contract as q38 but candidates restricted to
    * vectors sharing >=1 of the query's L bucket ids, served from the
    * persisted bucket table. The 20 query vectors are collected
    * driver-side and bucketed with the same pure-function planes, so
    * every probed bucket is known BEFORE the scan — the isin reaches
    * the stored table as a static PartitionFilter. Collisions collapse
    * BEFORE embeddings join back: distinct on 16-byte (query, vec) id
    * pairs, then embeddings only for surviving candidates (at 16
    * tables, scoring first would fetch each candidate's vector up to
    * 16 times — and a stored index carrying embeddings would store the
    * corpus 16x).
    */
  private val q39 = QueryDef(
    (s, d) => {
      import s.implicits._
      val idx = resolveLshIndex(s, d)
      val qvecs = load(s, d, "embeddings").filter(col("vec_id") < 20)
        .select(col("vec_id"), col("embedding"))
        .as[(Long, Array[Float])].collect().sortBy(_._1)
      val qRows = qvecs.toSeq.flatMap { case (qid, v) =>
        bucketIdsOf(v).map(b => (qid, b))
      }
      val probed = qRows.map(_._2).distinct.sorted
      val q = qRows.toDF("query_id", "qbkt")
      val qemb = qvecs.toSeq.toDF("query_id", "qv")
      val emb = load(s, d, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("score").desc, col("vec_id").asc)
      idx.filter(col("bkt").isin(probed: _*))
        .join(broadcast(q),
          col("bkt") === col("qbkt") && col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"))
        .distinct() // collapse multi-table collisions as 16-byte pairs
        // deliberately UNHINTED (r16): at bench scale the planner
        // broadcasts the embedding side and rebuilds its hash relation
        // per execution (~7 task-s) — but the candidate side is
        // bucket-occupancy-proportional, so pinning it as the build
        // side would be a latent 100 TB OOM (BroadcastLintSpec's
        // contract); the planner's own choice degrades safely to SMJ
        // at scale
        .join(emb, "vec_id") // embeddings only for surviving candidates
        .join(broadcast(qemb), "query_id")
        .select(col("query_id"), col("vec_id"),
          fastCosine(s)(col("qv"), col("embedding")).as("score"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 10)
        .select(col("query_id"), col("vec_id"),
          col("score"), col("rn").cast("int").as("rn"))
    },
    Some(emittedTopKOracle("q39_ann_lsh")), // pair-level derived oracle;
    // recall vs q38 measured in specs
    "LSH ANN top-10, 16 tables x 4-bit hyperplane buckets [similarity]")

  /** FILTERED LSH ANN (round-15, closing the filtered-ANN contract on
    * the last hash index): q39's bucket probe under a metadata
    * predicate, with the q273 design rules —
    *
    *  1. The predicate lands AT THE INDEX SCAN (the bucket table stores
    *     the filter column beside the bucket id, so the probed-bucket
    *     `isin` is a PartitionFilter and the predicate an ordinary
    *     parquet PushedFilter); candidates the ranking sees are
    *     qualifying by construction, never post-filtered out of a
    *     top-k.
    *  2. ADAPTIVE WIDENING, the LSH analogue of q273's probe-doubling:
    *     a query short of overFetch·k qualifying candidates re-probes
    *     with MULTI-PROBE buckets (Hamming-1 perturbations of its L
    *     signatures — Lv et al., VLDB'07), which widens the
    *     partition-pruned read from L to L·(1+K) directories without
    *     any corpus scan. Still-deficient queries fall back to the
    *     exact filtered scan for themselves alone (the bounded
    *     no-under-return backstop), tombstone-masked exactly like the
    *     bucket path.
    */
  /** Schema-correct empty result for the filtered-ANN family — the
    * `finals.reduceOption` fallback when the probe set itself is empty
    * (no `vec_id < 20` rows): `reduce` on the empty buffer would throw
    * instead of returning zero rows (ADVICE r15).
    */
  private[graft] def emptyTopKFrame(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq.empty[(Long, Long, Double, Int)]
      .toDF("query_id", "vec_id", "score", "rn")
  }

  private[graft] def lshTopKFiltered(s: SparkSession, d: String,
      pred: Column, k: Int = 10, overFetch: Int = 3): DataFrame = {
    import s.implicits._
    val idx = resolveLshIndex(s, d) // masked (vec_id, bkt, label)
    val e = load(s, d, "embeddings")
    val emb = e.select(col("vec_id"), col("embedding"))
    val qvecs = e.filter(col("vec_id") < 20)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val qemb = qvecs.toSeq.toDF("query_id", "qv")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id").asc)
    def topK(scored: DataFrame): DataFrame = scored
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("vec_id"),
        col("score"), col("rn").cast("int").as("rn"))
    def score(cands: DataFrame): DataFrame = cands
      .join(emb, "vec_id") // embeddings only for qualifying candidates
      .join(broadcast(qemb), "query_id")
      .select(col("query_id"), col("vec_id"),
        fastCosine(s)(col("qv"), col("embedding")).as("score"))
    var remaining: Seq[(Long, Array[Float])] = qvecs.toSeq
    val finals = scala.collection.mutable.ArrayBuffer[DataFrame]()
    for (radius <- 0 to 1 if remaining.nonEmpty) {
      val qRows = remaining.flatMap { case (qid, v) =>
        multiprobeBucketIdsOf(v, radius).toSeq.map(b => (qid, b))
      }
      val probed = qRows.map(_._2).distinct.sorted
      val q = qRows.toDF("query_id", "qbkt")
      val cands = idx.filter(col("bkt").isin(probed: _*) && pred)
        .join(broadcast(q),
          col("bkt") === col("qbkt") && col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"))
        .distinct() // collapse multi-table collisions as 16-byte pairs
      // (consumed twice — counts + emit — UNCHECKPOINTED, the q273
      // rule: the pruned bucket scan is cheap and a checkpoint would
      // hide the scan shape FilteredAnnSpec pins)
      // candidate-depth satisfaction, the q273 over-fetch rule: one
      // |queries|-row collect per round, driver-bounded by the fixed
      // query-set size
      val counts = cands.groupBy("query_id").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val (done, notDone) = remaining.partition { case (qid, _) =>
        counts.getOrElse(qid, 0L) >= k.toLong * overFetch || radius == 1
      }
      val satisfied = done.filter { case (qid, _) =>
        counts.getOrElse(qid, 0L) >= k.toLong * overFetch
      }
      if (satisfied.nonEmpty)
        finals += topK(score(cands
          .filter(col("query_id").isin(satisfied.map(_._1): _*))))
      // multiprobe-exhausted leftovers: exact filtered scan for THESE
      // queries only — |deficient| broadcast against the pushed-
      // predicate embedding scan, masked like the bucket path (a
      // takedown must not resurface through the backstop)
      val leftover = done.filterNot(satisfied.contains)
      if (leftover.nonEmpty) {
        val lq = leftover.toDF("query_id", "qv")
        finals += topK(graft.tables.IndexStore.maskTombstones(s,
          "lsh_index", d,
          enrichForPred(s, d, e, pred).filter(pred)
            .join(broadcast(lq), col("vec_id") =!= col("query_id"))
            .select(col("query_id"), col("vec_id"),
              fastCosine(s)(col("qv"), col("embedding")).as("score")),
          cols = Seq("vec_id")))
      }
      remaining = notDone
    }
    finals.reduceOption(_.unionByName(_)).getOrElse(emptyTopKFrame(s))
  }

  /** Contamination flag threshold for q277 — the published
    * semantic-decontamination operating range (SemDeDup-family work
    * flags near-verbatim semantic copies well above 0.9 cosine; the
    * continuous `bench_sim` column is the audit signal below it).
    */
  private[graft] val SemanticDecontamTau = 0.95

  /** q277: SEMANTIC decontamination audit — the embedding-level
    * complement of q69's 5-gram decontamination: an eval answer
    * paraphrased into the training set shares no exact n-gram but
    * sits at high embedding cosine. Every train doc (doc_id ≢ 0 mod
    * 50, q69's benchmark convention; vec_id ≡ doc_id) reports its
    * nearest benchmark doc and that cosine, plus the τ-threshold
    * contamination flag.
    *
    * Scale shape — the reason this is NOT an ANN problem: the
    * benchmark side is bounded by construction (eval suites are
    * small and fixed), so the exact scan is one broadcast
    * nested-loop pass over the train side; the argmax is a max-by
    * STRUCT aggregate — (sim, −bid) lexicographic max = highest sim,
    * ties to the lowest bench id — which partial-aggregates map-side
    * to |train| rows before the exchange, instead of shuffling the
    * full |train|·|bench| pair stream through a window sort. At
    * 100 TB: one pass, one |train|-row exchange, zero index to
    * maintain or trust.
    */
  /** q277's benchmark-registry bound: benchmark suites are a FIXED,
    * registered set in production — the synthetic `% 50` slice would
    * grow with the corpus, so the registry cap (first 1024 benchmark
    * docs = vec_id < 50·1024) makes the broadcast side PROVABLY
    * bounded in the plan (the BroadcastLintSpec `vec_id < literal`
    * idiom) instead of exempted by prose. Covers every benchmark doc
    * at all committed test scales.
    */
  private[graft] val BenchRegistryCap = 50L * 1024L

  /** Row-schema generation of the benchmark registry store. */
  private[graft] val BenchRegistryFormat = "v1-registry"

  /** The benchmark-membership REGISTRY TABLE (round-16): q277's bench
    * set as a real registered table under the table layer — one small
    * parquet of `bench_id`s per dataset — instead of an inline `% 50`
    * convention in the query. Production-shaped: eval-suite membership
    * IS a curated table, and the broadcast bound becomes data-driven
    * (the registry's cardinality) rather than a literal in the plan.
    * Seeded once per dataset from the same convention the DuckDB
    * oracle derives membership from, through the corpus-index
    * lifecycle: HIT serves the stored table; a changed/grown corpus
    * re-seeds so registry and oracle can never disagree (a production
    * registry would instead append deliberately — the lifecycle hook
    * is where that policy would live). Publish failures degrade to
    * the computed frame — the store is a cache, never a dependency.
    */
  private[graft] def benchRegistryIds(s: SparkSession, d: String): DataFrame = {
    import graft.tables.IndexStore
    val kind = "bench_registry"
    def convention(): DataFrame = load(s, d, "embeddings")
      .filter(col("vec_id") % 50 === 0 && col("vec_id") < BenchRegistryCap)
      .select(col("vec_id").as("bench_id"))
    val meta = embeddingsFileMeta(s, d)
    def seed(): DataFrame = {
      val ids = convention()
      try {
        val t = IndexStore.corpusIndexTable(s, kind, d)
        t.overwrite(ids)
        IndexStore.commitCorpusIndexState(kind, d, "convention", meta,
          BenchRegistryFormat)
        t.read.select(col("bench_id"))
      } catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[index-store] bench registry seed skipped: $e")
          ids
      }
    }
    IndexStore.resolveCorpusIndex(s, kind, d, meta, BenchRegistryFormat) match {
      case IndexStore.CorpusIndexHit(_) =>
        IndexStore.corpusIndexTable(s, kind, d).read.select(col("bench_id"))
      case _ => seed() // delta or miss: re-seed to the convention
    }
  }

  private val q277 = QueryDef(
    (s, d) => {
      val e = load(s, d, "embeddings")
      // membership is the REGISTRY TABLE, not an inline convention:
      // both sides decide bench-vs-train by a broadcast (semi/anti)
      // join against the small registered id table, so the broadcast
      // side's bound is the registry's own cardinality
      val reg = benchRegistryIds(s, d)
      val bench = e.join(broadcast(reg),
          col("vec_id") === col("bench_id"), "left_semi")
        .select(col("vec_id").as("bid"), col("embedding").as("be"))
      val train = e.join(broadcast(reg),
          col("vec_id") === col("bench_id"), "left_anti")
        .select(col("vec_id").as("doc_id"), col("embedding"))
      train.crossJoin(broadcast(bench))
        .select(col("doc_id"), col("bid"),
          fastCosine(s)(col("embedding"), col("be")).as("bench_sim"))
        .groupBy(col("doc_id"))
        .agg(max(struct(col("bench_sim"),
          (col("bid") * -1L).as("negbid"), col("bid"))).as("m"))
        .select(col("doc_id"),
          col("m.bid").as("nearest_bench_id"),
          col("m.bench_sim").as("bench_sim"),
          (col("m.bench_sim") >= SemanticDecontamTau)
            .as("is_contaminated"))
    },
    Some(s"""WITH b AS (
              SELECT vec_id AS bid, embedding AS be FROM embeddings
              WHERE vec_id % 50 = 0 AND vec_id < $BenchRegistryCap
            ), t AS (
              SELECT vec_id AS doc_id, embedding FROM embeddings
              WHERE vec_id % 50 <> 0
            ), scored AS (
              SELECT t.doc_id, b.bid,
                ${cosineSql("t.embedding", "b.be")} AS bench_sim
              FROM t CROSS JOIN b
            ), ranked AS (
              SELECT doc_id, bid, bench_sim,
                ROW_NUMBER() OVER (PARTITION BY doc_id
                  ORDER BY bench_sim DESC, bid ASC) AS rn
              FROM scored
            )
            SELECT doc_id, bid AS nearest_bench_id, bench_sim,
              bench_sim >= $SemanticDecontamTau AS is_contaminated
            FROM ranked WHERE rn = 1"""),
    "semantic decontamination audit: per-train-doc nearest benchmark " +
      "cosine via broadcast exact scan + max-by-struct argmax " +
      "[similarity,curation]")

  /** Filtered LSH ANN: label = 1 pushed into the bucket scan,
    * Hamming-1 multiprobe widening, exact filtered backstop.
    */
  private val q276 = QueryDef(
    (s, d) => lshTopKFiltered(s, d, col("label") === 1),
    // derived oracle restricted to the FILTERED universe (q273's
    // pattern): an emitted row with label != 1 vanishes from the
    // verified frame and fails the hash compare
    Some(emittedTopKOracle("q276_ann_lsh_filtered", "e.label = 1")),
    "filtered LSH ANN top-10: label=1 pushed to the bucket scan, " +
      "Hamming-1 multiprobe widening, exact backstop [similarity]")

  /** Rows per broadcast block in the blocked 1-NN. Sized so the sf0.1
    * correctness gate exercises the multi-block argmax merge (2000
    * vectors -> 2 blocks) without paying a collect-per-256-rows at bench
    * time; ApproxOpsSpec forces an 8-way split explicitly. A production
    * corpus would size this to executor broadcast budget (1-4M vectors
    * per block).
    */
  private[graft] val DefaultBlockRows = 1024

  private[graft] def blockCount(n: Long, blockRows: Int): Int =
    math.max(1, math.ceil(n.toDouble / blockRows).toInt)

  /** Hard cap on the exact 1-NN baseline's corpus size. The blocked
    * relay is O(n²) compute with B sequential driver round trips — it
    * exists as the RECALL ORACLE for the candidates-then-rerank path
    * (q62), not as a production operator, and refusing early beats
    * discovering that at hour three of a 100 TB run.
    */
  private[graft] val ExactBaselineMaxRows = 100000L

  /** Blocked-broadcast exact 1-NN: the reference side is split into
    * ceil(n/blockRows) hash blocks; the driver collects ONE bounded block
    * at a time, broadcasts it, and folds it into a running per-vector
    * argmax through a narrow mapPartitions — the full table is never
    * resident on the driver, and driver/executor memory is
    * O(blockRows * dim) regardless of corpus size. All B folds are narrow
    * maps over one scan, so they fuse into a single stage. Ties break
    * toward the smaller vec_id explicitly, making the result independent
    * of block order; the dot product stays the same sequential double
    * fold, so the output is bit-identical to the single-block variant and
    * the DuckDB oracle.
    */
  private[graft] def nearestNeighborBlocked(
      s: SparkSession, d: String,
      blockRows: Int = DefaultBlockRows,
      maxRows: Long = ExactBaselineMaxRows): DataFrame = {
    import s.implicits._
    val proj = load(s, d, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = proj.count()
    if (n > maxRows) {
      proj.unpersist(blocking = false)
      throw new IllegalArgumentException(
        s"exact 1-NN baseline refused: corpus has $n vectors (cap " +
          s"$maxRows). This operator is the recall oracle for small " +
          "probes only — use q62_dedup_embedding_ann (candidates-then-" +
          "rerank) for production-scale corpora.")
    }
    val numBlocks = blockCount(n, blockRows)

    // (id, vec, ownNorm, bestId, bestCos) running state per vector.
    var state = proj.map { case (id, v) =>
      var n = 0.0
      var i = 0
      while (i < v.length) { n += v(i).toDouble * v(i).toDouble; i += 1 }
      (id, v, math.sqrt(n), Long.MaxValue, Double.NegativeInfinity)
    }

    (0 until numBlocks).foreach { b =>
      // One bounded block to the driver (a cached-scan collect), with
      // per-vector norms precomputed; ids sorted for deterministic order.
      val block = proj
        .filter(x => (java.lang.Long.hashCode(x._1 * 0x9E3779B97F4A7C15L)
          & Int.MaxValue) % numBlocks == b)
        .collect().sortBy(_._1)
        .map { case (id, v) =>
          var n = 0.0
          var i = 0
          while (i < v.length) { n += v(i).toDouble * v(i).toDouble; i += 1 }
          (id, v, math.sqrt(n))
        }
      val bc = s.sparkContext.broadcast(block)
      state = state.mapPartitions { rows =>
        val blk = bc.value
        rows.map { case (v1, x, xn, curId, curCos) =>
          var bestId = curId
          var bestCos = curCos
          var j = 0
          while (j < blk.length) {
            val (id2, y, yn) = blk(j)
            if (id2 != v1) {
              var dot = 0.0
              var k = 0
              while (k < y.length) {
                dot += x(k).toDouble * y(k).toDouble; k += 1
              }
              val c = dot / (xn * yn)
              if (c > bestCos || (c == bestCos && id2 < bestId)) {
                bestCos = c; bestId = id2
              }
            }
            j += 1
          }
          (v1, x, xn, bestId, bestCos)
        }
      }
    }

    val out = state
      .map { case (v1, _, _, nn, cos) => (v1, nn, cos, cos >= 0.95) }
      .toDF("v1", "nn", "cos", "is_near_dup")
    // The per-block collects above were the only eager consumers; the
    // returned plan recomputes from the (two-column) scan after unpersist.
    proj.unpersist(blocking = false)
    out
  }

  /** Embedding-cosine near-dup (dedup flavor #5): each vector's nearest
    * neighbor with its cosine and an `is_near_dup` flag at 0.95 — the full
    * all-pairs 1-NN, fixed-size output, computed by blocked broadcast
    * (never a full-table collect; see nearestNeighborBlocked). The
    * LSH-bucket route (q39) is the approximate scale path for the same
    * predicate. Refuses corpora above [[ExactBaselineMaxRows]]: this is
    * the recall oracle for q62, never the production operator.
    */
  private val q40 = QueryDef(
    (s, d) => nearestNeighborBlocked(s, d),
    Some(s"""WITH nrm AS (
              SELECT vec_id, embedding,
                sqrt(list_reduce(list_transform(embedding,
                  x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), (x,y) -> x+y)) AS nrm
              FROM embeddings
            ), pairs AS (
              SELECT a.vec_id AS v1, b.vec_id AS v2,
                list_reduce(list_transform(list_zip(a.embedding, b.embedding),
                  x -> CAST(x[1] AS DOUBLE)*CAST(x[2] AS DOUBLE)), (x,y) -> x+y)
                / (a.nrm * b.nrm) AS cos
              FROM nrm a JOIN nrm b ON a.vec_id <> b.vec_id
            )
            SELECT v1, v2 AS nn, cos, cos >= 0.95 AS is_near_dup
            FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY v1
                    ORDER BY cos DESC, v2 ASC) AS rn FROM pairs)
            WHERE rn = 1"""),
    "exact 1-NN + near-dup flag at 0.95 — recall ORACLE for q62, " +
      "capped at 100k vectors [dedup,similarity]")

  // ---- IVF (inverted-file) ANN ----
  // Coarse quantizer: NumCells spherical-k-means centroids trained on a
  // deterministic hash-sample of the corpus. Every vector is assigned to
  // its nearest centroid once (narrow map over a tiny broadcast); a
  // query probes its NProbe nearest cells only. At 100 TB the quantizer
  // trains on a fixed-size sample (one bounded pass per Lloyd round),
  // the index build is one linear pass, and search touches
  // ~NProbe/NumCells of the data — the classic FAISS-style layout, in
  // pure DataFrame operations.
  // 64 cells / 16 probes: at a FIXED 1/4 scan fraction, finer
  // quantization recalls better — measured recall@10 vs q38 at 25% scan:
  // k=16/p=4 0.53-0.58, k=32/p=8 0.67-0.68, k=64/p=16 0.76-0.78 (sf0.001
  // / sf0.01). Training cost stays bounded (fixed-size sample per Lloyd
  // round); the assignment pass pays k distance evals per vector, still
  // a narrow map. k tracks ~sqrt(n) on real corpora and would be a
  // per-dataset tuning knob.
  private val NumCells = 64
  private val NProbe = 16
  // each vector nominates near-dup candidates from its NearDupProbes
  // top cells (q62): k/8 keeps the nominated corpus fraction at ~1/8
  // as k changes
  private val NearDupProbes = math.max(2, NumCells / 8)
  // 4 Lloyd rounds: measured occupancy cv 0.1117 at 4 vs 0.1123 at 8 on
  // the test corpus (k=16) — convergence is effectively complete, so
  // extra rounds only buy latency
  private val KMeansIters = 4
  private val KMeansSampleTarget = 4096L

  /** Trained quantizers memoized per (dir, k, iters), validated by a
    * content fingerprint of the table's files: training is
    * bit-deterministic for a given file layout, so the index build is
    * paid once per dataset per session (q54 and q62 share one training
    * pass), exactly as a production index would be trained once and
    * served many times. Rewriting the dataset in-session (regenerated
    * testdata, a table republished under the same root) changes the
    * fingerprint and retrains — and the stale entry is REPLACED, not
    * kept alongside: one entry per (dir, k, iters), so repeated
    * rewrites can't accumulate dead k×dim centroid arrays.
    */
  private val centroidCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Int, Int),
      (String, Array[(Long, Array[Double], Double)])]()

  /** Cheap content fingerprint of the embeddings table under a dir:
    * sorted (path, length, mtime) triples of its backing files, hashed.
    * ONE `listStatus` RPC per parent directory (almost always exactly
    * one), not one `getFileStatus` per file — on an object store backing
    * 10⁵ part files the per-file variant is 10⁵ sequential namenode
    * round trips on the driver before any work starts. No data is read.
    */
  private[graft] def embeddingsFingerprint(s: SparkSession, d: String): String =
    fingerprintOf(d, embeddingsFileMeta(s, d))

  /** Per-file metadata of the embeddings table's backing files:
    * absolute path → "length:mtime". The unit the incremental index
    * resolution compares — a standing index whose recorded files are
    * a strict subset of these (all unchanged) is extended with just
    * the new files.
    */
  private[graft] def embeddingsFileMeta(s: SparkSession,
      d: String): Map[String, String] = {
    val conf = s.sparkContext.hadoopConfiguration
    val files = load(s, d, "embeddings").inputFiles
    files.map(new org.apache.hadoop.fs.Path(_))
      .groupBy(_.getParent)
      .flatMap { case (parent, ps) =>
        val wanted = ps.iterator.map(_.getName).toSet
        parent.getFileSystem(conf).listStatus(parent).iterator
          .filter(st => wanted.contains(st.getPath.getName))
          .map(st => st.getPath.toString ->
            s"${st.getLen}:${st.getModificationTime}")
      }
  }

  /** The same fingerprint string the pre-incremental store derived:
    * sorted path:len:mtime lines, hashed — existing persisted
    * quantizers stay addressable.
    */
  private[graft] def fingerprintOf(d: String,
      meta: Map[String, String]): String = {
    val parts = meta.map { case (p, m) => s"$p:$m" }.toArray.sorted
    val digest = java.security.MessageDigest.getInstance("SHA-256")
      .digest(parts.mkString("\n").getBytes("UTF-8"))
    d + "#" + digest.map("%02x".format(_)).mkString
  }

  /** Primitive-loop cosine against a pre-normed centroid. */
  private[queries] def cosTo(v: Array[Float], vNorm: Double,
      c: Array[Double], cNorm: Double): Double = {
    var dot = 0.0
    var i = 0
    while (i < c.length) { dot += v(i).toDouble * c(i); i += 1 }
    dot / (vNorm * cNorm)
  }

  private[queries] def vecNorm(v: Array[Float]): Double = {
    var n = 0.0
    var k = 0
    while (k < v.length) { n += v(k).toDouble * v(k).toDouble; k += 1 }
    math.sqrt(n)
  }

  /** The untrained quantizer (the k smallest-id vectors as centroids) —
    * kept only as the baseline the k-means balance/leakage spec measures
    * against (at k=16, where the leakage analysis was done); q54 uses
    * [[kMeansCentroids]].
    */
  private[graft] def firstVectorCentroids(s: SparkSession,
      d: String, k: Int = NumCells): Array[(Long, Array[Double], Double)] = {
    import s.implicits._
    load(s, d, "embeddings").filter(col("vec_id") < k)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
      .zipWithIndex
      .map { case ((_, c), i) =>
        val cd = c.map(_.toDouble)
        (i.toLong, cd, math.sqrt(cd.map(x => x * x).sum))
      }
  }

  /** Spherical-k-means coarse quantizer, trained deterministically.
    *
    * Sample: vectors with `xxhash64(vec_id) % sampleMod == 0`, where
    * sampleMod bounds the sample near KMeansSampleTarget regardless of
    * corpus size — at 100 TB training cost is a fixed-size sample scan
    * per Lloyd round, not a corpus scan. Init: the k sample vectors with
    * the smallest hash (a deterministic pseudo-random draw). Each round
    * assigns sample vectors to their max-cosine centroid in one narrow
    * mapPartitions and updates centroids from per-partition partial
    * (sum, count) pairs folded on the driver in partition order — every
    * float fold has a fixed order, so retraining on the same file layout
    * is bit-identical. Empty cells keep their previous centroid.
    * Returns (cell_id 0..k-1, components, norm).
    */
  /** Number of in-JVM k-means training runs — lets IndexStoreSpec
    * prove the persisted-index load path performs ZERO training.
    */
  private[graft] val kMeansTrainCount =
    new java.util.concurrent.atomic.AtomicLong(0L)

  /** Drop the in-session centroid memo (a fresh session's state) —
    * test hook for the persisted-index lifecycle.
    */
  private[graft] def clearCentroidSessionCache(): Unit =
    centroidCache.clear()

  private[graft] def kMeansCentroids(s: SparkSession, d: String,
      k: Int = NumCells,
      iters: Int = KMeansIters): Array[(Long, Array[Double], Double)] = {
    val fp = embeddingsFingerprint(s, d)
    centroidCache.compute((d, k, iters), (_, cur) =>
      if (cur != null && cur._1 == fp) cur
      else {
        // load-or-train through the persisted index store: a fresh
        // session serves the on-disk quantizer (validated against the
        // dataset fingerprint) instead of retraining; only a genuine
        // miss trains — and publishes for the next session.
        val arr = graft.tables.IndexStore.loadCentroids(s, fp, k, iters)
          .getOrElse {
            val trained = trainKMeans(s, d, k, iters)
            graft.tables.IndexStore.saveCentroids(s, fp, k, iters, trained)
            trained
          }
        (fp, arr)
      })._2
  }

  private[graft] def trainKMeans(s: SparkSession, d: String, k: Int,
      iters: Int): Array[(Long, Array[Double], Double)] = {
    kMeansTrainCount.incrementAndGet()
    import s.implicits._
    val base = load(s, d, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val n = base.count()
    val sampleMod = math.max(1L, n / KMeansSampleTarget)
    val hashed = base.withColumn("h", xxhash64(col("vec_id")))
      .filter(pmod(col("h"), lit(sampleMod)) === 0)
    val sample = hashed.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var centroids: Array[Array[Double]] = hashed
        .orderBy(col("h"), col("vec_id")).limit(k)
        .select(col("vec_id"), col("embedding"))
        .as[(Long, Array[Float])].collect()
        .map(_._2.map(_.toDouble))
      require(centroids.nonEmpty, "k-means: empty sample")
      // dimension comes from the data, not the testdata's 64 — the
      // trainer serves any embedding width
      val dim = centroids(0).length
      var iter = 0
      while (iter < iters) {
        val withNorms = centroids.map(c =>
          (c, math.sqrt(c.map(x => x * x).sum)))
        val bc = s.sparkContext.broadcast(withNorms)
        val partials = sample.mapPartitions { rows =>
          val cs = bc.value
          val kk = cs.length
          val sums = Array.ofDim[Double](kk, dim)
          val counts = new Array[Long](kk)
          rows.foreach { case (_, v) =>
            // argmax of dot/centroidNorm == argmax of cosine (|v| is
            // constant across candidates); strict > keeps the lowest
            // cell on ties, matching rankedCells' stable sort
            var best = 0
            var bestScore = Double.NegativeInfinity
            var c = 0
            while (c < kk) {
              val (cd, cn) = cs(c)
              var dot = 0.0
              var i = 0
              while (i < cd.length) { dot += v(i).toDouble * cd(i); i += 1 }
              val score =
                if (cn == 0.0) Double.NegativeInfinity else dot / cn
              if (score > bestScore) { bestScore = score; best = c }
              c += 1
            }
            val sb = sums(best)
            var i = 0
            while (i < v.length) { sb(i) += v(i).toDouble; i += 1 }
            counts(best) += 1L
          }
          (0 until kk).iterator.filter(counts(_) > 0L)
            .map(c => (c, counts(c), sums(c)))
        }.collect()
        val newSums = Array.ofDim[Double](centroids.length, dim)
        val newCounts = new Array[Long](centroids.length)
        partials.foreach { case (c, cnt, sum) =>
          newCounts(c) += cnt
          var i = 0
          while (i < dim) { newSums(c)(i) += sum(i); i += 1 }
        }
        centroids = centroids.zipWithIndex.map { case (old, c) =>
          if (newCounts(c) == 0L) old
          else newSums(c).map(_ / newCounts(c))
        }
        iter += 1
      }
      centroids.zipWithIndex.map { case (cd, i) =>
        (i.toLong, cd, math.sqrt(cd.map(x => x * x).sum))
      }
    } finally sample.unpersist(blocking = false)
  }

  /** Cells ranked by centroid cosine for one vector, best first. */
  private[queries] def rankedCells(cs: Array[(Long, Array[Double], Double)],
      v: Array[Float]): Array[Long] = {
    val vn = vecNorm(v)
    cs.map { case (cid, c, cn) => cid -> cosTo(v, vn, c, cn) }
      .sortBy(-_._2).map(_._1)
  }

  /** Number of in-JVM full-corpus cell-assignment passes — lets
    * IndexStoreSpec prove the persisted-inverted-file serve path
    * performs ZERO re-assignment.
    */
  private[graft] val cellAssignCount =
    new java.util.concurrent.atomic.AtomicLong(0L)

  /** Assign each row of `vectors` (vec_id, embedding) to its
    * max-cosine cell of `centroids` — one narrow map, no shuffle. The
    * row also carries `probes`, the vector's NearDupProbes-many best
    * cells (probes(0) == cell): the near-dup nomination (q62/q89)
    * needs each vector's multi-probe cell set, and ranking the cells
    * costs k centroid dot products per vector — paid HERE, once, at
    * index build/extend time under the pinned quantizer, instead of
    * once per query execution over the raw corpus. 8 extra longs per
    * row next to a 256-byte embedding, the classic store-the-routing
    * trade.
    */
  private[graft] def assignRows(s: SparkSession, vectors: DataFrame,
      centroids: Array[(Long, Array[Double], Double)]): DataFrame = {
    import s.implicits._
    val nProbes = math.max(2, centroids.length / 8) // NearDupProbes rule
    val bc = s.sparkContext.broadcast(centroids)
    // the DECLARED filter columns ride into the index row (round-14
    // filtered ANN, generalized round-16 to [[IndexFilterCols]]): a
    // query-time metadata predicate then lands directly on the pruned
    // index scan as ordinary parquet PushedFilters NEXT TO the cell
    // PartitionFilter — no join against an allowed-id set, no second
    // pass over the corpus. A corpus without a declared column
    // (synthetic spec fixtures) indexes its typed default so the layer
    // stays generic.
    vectors.select(col("vec_id"), col("embedding"),
        fmetaExpr(vectors).as("fmeta"))
      .as[(Long, Array[Float], Map[String, String])]
      .map { case (id, v, fm) =>
        val ranked = rankedCells(bc.value, v)
        (id, v, fm, ranked.head, ranked.take(nProbes))
      }
      .toDF("vec_id", "embedding", "fmeta", "cell", "probes")
      .select(col("vec_id") +: col("embedding") +: restoredFilterCols :+
        col("cell") :+ col("probes"): _*)
  }

  private[graft] def cellAssignments(s: SparkSession, d: String,
      centroids: Array[(Long, Array[Double], Double)]): DataFrame = {
    cellAssignCount.incrementAndGet()
    assignRows(s, withFilterCols(s, d, load(s, d, "embeddings")), centroids)
  }

  /** Stored-index read normalized back to the assignment schema: the
    * partition-dir-inferred `cell` cast to long and restored to its
    * encode position (the optimizer unwraps the cast when pruning, so
    * the probed-cell filter still reaches the scan as a
    * PartitionFilter).
    */
  private def normalizedIvfRead(
      t: graft.tables.ParquetTable): DataFrame =
    t.read.select(col("vec_id") +: col("embedding") +: filterColRefs :+
      col("cell").cast("long").as("cell") :+ col("probes"): _*)

  /** Sidecar format of the stored inverted file: v2 added the `probes`
    * multi-cell column, v3 the `label` filter column (round-14 filtered
    * ANN), v4 (round-16) the DECLARED filter-column set, recorded in
    * the pin itself so changing the set invalidates the store. Stores
    * in an older format resolve MISS and rebuild once rather than
    * serving rows the filtered probe can't use.
    */
  private[graft] val IvfFormat = s"v4-filters:$FilterColsTag"

  /** The persisted INVERTED FILE — (vec_id, embedding, cell)
    * partitioned by cell in the table layer, the FAISS inverted-list
    * layout on parquet, resolved against the dataset's current backing
    * files. Without it every q54 probe re-scans the corpus and
    * re-derives each vector's cell (k centroid dot products per
    * vector, per query run); served from storage, probing nProbe of k
    * cells is a partition-pruned read of ~nProbe/k of the files and
    * zero re-assignment — at 100 TB the difference between touching
    * 25 TB and touching 100 TB plus recomputing the quantization.
    *
    * Lifecycle (the FAISS one): the index CARRIES ITS QUANTIZER — the
    * sidecar records the content fingerprint the centroids were
    * trained under, and serving loads exactly those centroids, so
    * probe routing and stored assignments can never disagree. New
    * files landing in the dataset (a day's partition) take the DELTA
    * path: only the new files' rows are assigned — under the pinned
    * quantizer, never a retrained one, or every standing row would be
    * stale — and appended through the table layer's atomic commit.
    * A single-witness membership probe makes the append idempotent:
    * rows of a batch commit atomically, so one known vec_id from the
    * new files already present means a crashed run committed the
    * append but not the sidecar, and only the sidecar needs
    * re-publishing. Any rewritten/removed file → full rebuild with a
    * freshly trained quantizer. Returns the quantizer alongside the
    * index; every failure degrades to in-session train + assign.
    * Returns vectors with unique vec_ids' assignments (the ANN
    * family's standing contract — vec_id is the embeddings key).
    */
  /** The quantizer a standing corpus index was encoded under. When the
    * pin IS the current content the memoized path serves it (and could
    * even retrain bit-identically — the trainer is deterministic per
    * file layout); a historical pin loads content-keyed from the
    * store, which is why the quantizer artifacts are content-keyed in
    * the first place. None = the pin is unrecoverable → the index that
    * references it is unusable and must be rebuilt.
    */
  private[graft] def pinnedCentroids(s: SparkSession, d: String,
      qfp: String,
      currentFp: String): Option[Array[(Long, Array[Double], Double)]] =
    if (qfp == currentFp) Some(kMeansCentroids(s, d))
    else graft.tables.IndexStore.loadCentroids(s, qfp, NumCells, KMeansIters)

  private[graft] def resolveIvfIndex(s: SparkSession,
      d: String): (Array[(Long, Array[Double], Double)], DataFrame) = {
    // tombstone fold before the memo check; mask outside the memo —
    // see resolveLshIndex for the rationale
    graft.tables.IndexStore.maybeFoldTombstones(
      s, "ivf_index", d, Seq("vec_id"), Some("cell"))
    val meta = embeddingsFileMeta(s, d)
    val fp = fingerprintOf(d, meta)
    val ver = indexVersion(s, "ivf_index", d)
    val hit = ivfServeCache.compute(d, (_, cur) =>
      if (cur != null && cur._1 == fp && cur._2 == ver &&
          (cur._4.sparkSession eq s)) cur
      else {
        ivfResolveCount.incrementAndGet()
        val (cs, df) = resolveIvfIndexUncached(s, d, meta, fp)
        (fp, indexVersion(s, "ivf_index", d), cs, df)
      })
    (hit._3,
      graft.tables.IndexStore.maskTombstones(s, "ivf_index", d, hit._4))
  }

  private def resolveIvfIndexUncached(s: SparkSession, d: String,
      meta: Map[String, String],
      fp: String): (Array[(Long, Array[Double], Double)], DataFrame) = {
    import graft.tables.IndexStore
    val kind = "ivf_index"

    def rebuild(): (Array[(Long, Array[Double], Double)], DataFrame) = {
      val cs = kMeansCentroids(s, d)
      val computed = cellAssignments(s, d, cs)
      val served =
        try {
          val t = IndexStore.corpusIndexTable(s, kind, d)
          t.overwrite(computed, partitionBy = Seq("cell"))
          IndexStore.commitCorpusIndexState(kind, d, fp, meta, IvfFormat)
          normalizedIvfRead(t)
        } catch {
          case scala.util.control.NonFatal(e) =>
            System.err.println(s"[index-store] ivf publish skipped: $e")
            computed
        }
      (cs, served)
    }

    IndexStore.resolveCorpusIndex(s, kind, d, meta, IvfFormat) match {
      case IndexStore.CorpusIndexHit(qfp) =>
        pinnedCentroids(s, d, qfp, fp) match {
          case Some(cs) =>
            (cs, normalizedIvfRead(IndexStore.corpusIndexTable(s, kind, d)))
          case None => rebuild() // pinned quantizer lost → index unusable
        }
      case IndexStore.CorpusIndexDelta(qfp, newFiles) =>
        pinnedCentroids(s, d, qfp, fp) match {
          case Some(cs) =>
            try {
              val t = IndexStore.corpusIndexTable(s, kind, d)
              val toAppend = IndexStore.filesNeedingAppend(s, t, newFiles)
              if (toAppend.nonEmpty) {
                val fresh =
                  withFilterCols(s, d, s.read.parquet(toAppend: _*))
                t.append(assignRows(s, fresh, cs), partitionBy = Seq("cell"))
              }
              IndexStore.commitCorpusIndexState(kind, d, qfp, meta, IvfFormat)
              IndexStore.maybeCompactCorpusIndex(s, kind, d)
              (cs, normalizedIvfRead(t))
            } catch {
              case scala.util.control.NonFatal(e) =>
                System.err.println(
                  s"[index-store] ivf delta append failed, rebuilding: $e")
                rebuild()
            }
          case None => rebuild()
        }
      case IndexStore.CorpusIndexMiss => rebuild()
    }
  }

  /** IVF-bucketed top-10 under a given quantizer: same contract as q38,
    * candidates restricted to each query's NProbe nearest cells.
    * Parameterized so the spec can measure recall under both quantizers.
    */
  private[graft] def ivfTopK(s: SparkSession, d: String,
      centroids: Array[(Long, Array[Double], Double)],
      nProbe: Int = NProbe,
      assignments: Option[DataFrame] = None): DataFrame = {
    import s.implicits._
    val assigned = assignments.getOrElse(cellAssignments(s, d, centroids))
    // fixed probe set collected driver-side (the same bounded 20-vector
    // side q87 collects): knowing every probed cell BEFORE the scan
    // turns the candidate read into a STATIC partition-pruned read of
    // the stored inverted file — the `isin` reaches the scan as a
    // PartitionFilter (IndexStoreSpec pins it), so unprobed cells'
    // files are never listed, let alone read.
    val qvecs = load(s, d, "embeddings").filter(col("vec_id") < 20)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val probeRows = qvecs.toSeq.flatMap { case (qid, v) =>
      rankedCells(centroids, v).take(nProbe).map(c => (qid, v, c))
    }
    val probedCells = probeRows.map(_._3).distinct.sorted
    val queries = probeRows.toDF("query_id", "qv", "probe_cell")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id").asc)
    assigned.filter(col("cell").isin(probedCells: _*))
      .join(broadcast(queries),
        col("cell") === col("probe_cell") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        fastCosine(s)(col("qv"), col("embedding")).as("score"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 10)
      .select(col("query_id"), col("vec_id"),
        col("score"), col("rn").cast("int").as("rn"))
  }

  /** IVF-bucketed ANN: q38's contract under the trained k-means
    * quantizer.
    */
  private val q54 = QueryDef(
    (s, d) => {
      val (cs, idx) = resolveIvfIndex(s, d)
      ivfTopK(s, d, cs, NProbe, Some(idx))
    },
    Some(emittedTopKOracle("q54_ann_ivf")), // pair-level derived oracle;
    // recall vs q38 measured in specs
    "IVF ANN top-10: 64 k-means cells, 16-probe [similarity]")

  /** FILTERED ANN (round-14): q54's IVF probe under a metadata predicate
    * — the retrieval-stack shape every real deployment runs
    * (`lang = 'en' AND source = X` + top-k). Two design rules, both the
    * 100 TB path:
    *
    *  1. The predicate is applied AT THE INDEX SCAN, never as a
    *     post-filter on the top-k (a post-filter silently under-returns:
    *     filtering 10 ranked rows at 10% selectivity leaves ~1). The
    *     inverted file stores the filter column beside the vector
    *     ([[assignRows]]), so the scan carries the cell `isin` as a
    *     PartitionFilter and the predicate as an ordinary parquet
    *     PushedFilter — no join against an allowed-id set, no second
    *     corpus pass, ranking only ever sees qualifying rows.
    *  2. ADAPTIVE OVER-FETCH: a sparse filter can leave a query with
    *     fewer than k qualifying candidates in its nProbe cells. Queries
    *     that come back short re-probe with DOUBLED nProbe (only the
    *     deficient queries — satisfied ones never pay), until k results
    *     or the probe set is the whole cell space, at which point the
    *     result is exact-within-filter by construction. Bounded:
    *     log2(NumCells/nProbe0) extra rounds, each a pruned scan.
    */
  private[graft] def ivfTopKFiltered(s: SparkSession, d: String,
      centroids: Array[(Long, Array[Double], Double)],
      pred: Column, k: Int = 10, nProbe0: Int = NProbe,
      overFetch: Int = 3,
      assignments: Option[DataFrame] = None): DataFrame = {
    import s.implicits._
    val assigned = assignments.getOrElse(cellAssignments(s, d, centroids))
    val qvecs = load(s, d, "embeddings").filter(col("vec_id") < 20)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id").asc)
    def scoredCandidates(qs: Seq[(Long, Array[Float])], nProbe: Int): DataFrame = {
      val probeRows = qs.flatMap { case (qid, v) =>
        rankedCells(centroids, v).take(nProbe).map(c => (qid, v, c))
      }
      val probedCells = probeRows.map(_._3).distinct.sorted
      val queries = probeRows.toDF("query_id", "qv", "probe_cell")
      assigned.filter(col("cell").isin(probedCells: _*) && pred)
        .join(broadcast(queries),
          col("cell") === col("probe_cell") && col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"),
          fastCosine(s)(col("qv"), col("embedding")).as("score"))
    }
    def topK(scored: DataFrame): DataFrame = scored
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("vec_id"),
        col("score"), col("rn").cast("int").as("rn"))
    var remaining: Seq[(Long, Array[Float])] = qvecs.toSeq
    var nProbe = nProbe0
    val finals = scala.collection.mutable.ArrayBuffer[DataFrame]()
    while (remaining.nonEmpty) {
      val scored = scoredCandidates(remaining, nProbe)
      if (nProbe >= centroids.length) {
        finals += topK(scored) // whole cell space: exact within the filter
        remaining = Nil
      } else {
        // Satisfaction is judged on CANDIDATE DEPTH, pre-truncation: a
        // query whose probed cells hold only k qualifying rows would
        // "fill" its top-k from a forced, weak tail (measured 0.53
        // filtered recall with a done-at-k rule). Requiring overFetch*k
        // qualifying candidates before trusting a probe set restores
        // the unfiltered probe's recall profile — the filtered analogue
        // of FAISS's over-fetch-then-rank rule. The check is one
        // |queries|-row collect per round — driver-bounded by the fixed
        // query-set size, never the corpus.
        val counts = scored.groupBy("query_id").agg(count(lit(1)).as("n"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val (done, notDone) = remaining.partition { case (qid, _) =>
          counts.getOrElse(qid, 0L) >= k.toLong * overFetch
        }
        if (done.nonEmpty)
          finals += topK(scored)
            .filter(col("query_id").isin(done.map(_._1): _*))
        remaining = notDone
        nProbe = math.min(centroids.length, nProbe * 2)
      }
    }
    finals.reduceOption(_.unionByName(_)).getOrElse(emptyTopKFrame(s))
  }

  /** Filtered IVF ANN: label = 1 (~10% selectivity) pushed into the
    * index scan, adaptive probe widening for under-filled queries.
    */
  private val q273 = QueryDef(
    (s, d) => {
      val (cs, idx) = resolveIvfIndex(s, d)
      ivfTopKFiltered(s, d, cs, col("label") === 1, k = 10,
        nProbe0 = NProbe, assignments = Some(idx))
    },
    // derived oracle restricted to the FILTERED universe: an emitted row
    // whose vec_id has label != 1 vanishes from the verified frame and
    // fails the hash compare, so filter violations are oracle-caught,
    // not just spec-caught
    Some(emittedTopKOracle("q273_ann_filtered", "e.label = 1")),
    "filtered IVF ANN top-10: label=1 pushed to the index scan, " +
      "adaptive probe widening [similarity]")

  /** Filtered IVF ANN on a NON-label stored filter column (round-16):
    * `lang = 'fr'` — a documents-resident string attribute, attached to
    * the index row at build time by the vec_id ≡ doc_id join and pushed
    * to the pruned inverted-file scan exactly like the baked-in label
    * was. The probe machinery is q273's unchanged; what this query
    * proves is that the stored filter-column SET is a build parameter,
    * not a hardwired int.
    */
  private val q278 = QueryDef(
    (s, d) => {
      val (cs, idx) = resolveIvfIndex(s, d)
      ivfTopKFiltered(s, d, cs, col("lang") === "fr", k = 10,
        nProbe0 = NProbe, assignments = Some(idx))
    },
    // filtered-universe derived oracle (the q273 pattern): the universe
    // is re-derived through the documents table, so an emitted vec_id
    // whose document is not French vanishes from the verified frame and
    // fails the hash compare — a filter leak OR a stale/wrong stored
    // lang column is oracle-caught
    Some(emittedTopKOracle("q278_ann_filtered_lang",
      "e.vec_id IN (SELECT doc_id FROM documents WHERE lang = 'fr')")),
    "filtered IVF ANN top-10 on a second, non-label stored filter " +
      "column (lang='fr' from documents, joined at index build), " +
      "adaptive probe widening [similarity]")

  /** Filtered LSH ANN under a MULTI-COLUMN predicate (round-16):
    * `lang = 'en' AND label = 1` — both columns stored beside the
    * bucket id, the conjunction pushed to the pruned bucket scan as two
    * parquet PushedFilters. At ~4% joint selectivity most queries
    * exhaust Hamming-1 multiprobe and take the exact masked backstop —
    * the no-under-return path under a sparse conjunctive filter.
    */
  private val q279 = QueryDef(
    (s, d) => lshTopKFiltered(s, d,
      col("lang") === "en" && col("label") === 1),
    Some(emittedTopKOracle("q279_ann_lsh_filtered_multi",
      "e.label = 1 AND e.vec_id IN " +
        "(SELECT doc_id FROM documents WHERE lang = 'en')")),
    "filtered LSH ANN top-10 under a conjunctive two-column predicate " +
      "(lang='en' AND label=1), multiprobe widening, masked exact " +
      "backstop [similarity]")

  /** Candidates-then-rerank exact-scored 1-NN — the default q40-shaped
    * operator at 100 TB. Candidate pairs come from two independent
    * bucketings (either suffices to nominate): the 16×4-bit hyperplane
    * LSH tables and the trained IVF quantizer's cells. Both are narrow
    * maps followed by bucketed equi-joins on 8-byte keys; candidate ids
    * travel as 16-byte pairs and embeddings are joined back only for
    * surviving pairs, which are then scored with the same bit-exact
    * cosine as q40 and reduced to each vector's argmax (ties → smaller
    * id, q40's rule). Unlike [[nearestNeighborBlocked]] there is no
    * per-block driver collect — no data transits the driver, so
    * throughput scales with the cluster, at the price of missing a
    * neighbor that shares no bucket (recall vs q40 asserted >=0.95@1 in
    * ApproxOpsSpec). Vectors with no candidate surface with a null nn
    * and is_near_dup=false rather than silently disappearing.
    */
  /** Exact-scored candidate pairs (v1, v2, cos) from the two
    * independent bucketings (LSH tables ∪ IVF cells) — the shared
    * nomination front end of q62's 1-NN and the label-noise audit's
    * k-NN: narrow maps, bucketed equi-joins on 8-byte keys, embeddings
    * joined back only for surviving pairs.
    */
  private[queries] def candidateScoredPairs(s: SparkSession,
      d: String): DataFrame = {
    val ids = load(s, d, "embeddings")
      .select(col("vec_id"), col("embedding"))
    // served from the persisted bucket table (ids only) — the corpus
    // is never re-hashed once the index stands
    val lsh = resolveLshIndex(s, d)
    val lshPairs = lsh.as("a").join(lsh.as("b"),
        col("a.bkt") === col("b.bkt") &&
          col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("v1"), col("b.vec_id").as("v2"))
    // each vector nominates from its NearDupProbes top cells
    // (multi-assignment blunts the boundary-miss mode where 1-NN pairs
    // straddle a Voronoi edge; k/8 cells keeps the nominated fraction
    // constant as the quantizer refines). The multi-probe cell set is
    // SERVED from the persisted inverted file's `probes` column — the
    // ranking was paid once at index build time under the pinned
    // quantizer; re-deriving it here would re-scan the raw corpus and
    // pay k centroid dot products per vector per execution.
    val cells = resolveIvfIndex(s, d)._2
      .select(col("vec_id"), explode(col("probes")).as("cell"))
    val cellPairs = cells.as("a").join(cells.as("b"),
        col("a.cell") === col("b.cell") &&
          col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("v1"), col("b.vec_id").as("v2"))
    val pairs = lshPairs.unionByName(cellPairs).distinct()
    val e1 = ids.select(col("vec_id").as("v1"), col("embedding").as("emb1"))
    val e2 = ids.select(col("vec_id").as("v2"), col("embedding").as("emb2"))
    pairs.join(e1, "v1").join(e2, "v2")
      .select(col("v1"), col("v2"),
        fastCosine(s)(col("emb1"), col("emb2")).as("cos"))
  }

  private[graft] def nearestNeighborCandidates(s: SparkSession,
      d: String): DataFrame = {
    val ids = load(s, d, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val scored = candidateScoredPairs(s, d)
    // argmax as a hash aggregate (partial map-side combine), not a
    // window: no per-partition sort of the candidate set. max of
    // (cos, -v2) orders by cosine then smaller id — q40's tie rule
    val best = scored.groupBy(col("v1"))
      .agg(max(struct(col("cos"), (-col("v2")).as("negv2"))).as("m"))
      .select(col("v1"), (-col("m.negv2")).as("nn"), col("m.cos").as("cos"))
    ids.select(col("vec_id").as("v1")).join(best, Seq("v1"), "left")
      .select(col("v1"), col("nn"), col("cos"),
        coalesce(col("cos") >= 0.95, lit(false)).as("is_near_dup"))
  }

  private val q62 = QueryDef(
    (s, d) => nearestNeighborCandidates(s, d),
    // Pair-level derived oracle (see emittedTopKOracle): which neighbor
    // got nominated is algorithm-specific, but the emitted cosine and
    // the 0.95 flag are exact pair arithmetic — recompute both from the
    // emitted (v1, nn) pairs. A null nn (no candidate) must carry a
    // null cos and a false flag; a wrong cosine, a flag off the 0.95
    // contract, or an nn that is not a real vec_id (cos recomputes
    // NULL against a non-null emitted value) all fail the compare.
    // Recall vs q40 asserted in ApproxOpsSpec.
    Some(s"""WITH emitted AS (
              SELECT v1, nn
              FROM read_parquet('${graft.QueryDef.OutDirToken}/q62_dedup_embedding_ann/*.parquet')
            ), verified AS (
              SELECT m.v1, m.nn,
                ${cosineSql("a.embedding", "b.embedding")} AS cos
              FROM emitted m
              LEFT JOIN embeddings a ON a.vec_id = m.v1
              LEFT JOIN embeddings b ON b.vec_id = m.nn
            )
            SELECT v1, nn, cos,
              COALESCE(cos >= 0.95, false) AS is_near_dup
            FROM verified"""),
    "candidates (LSH ∪ IVF cells) + exact re-rank 1-NN [dedup,similarity]")

  /** Scalar int8 quantization of the embedding column — the standard
    * 4x memory compression for a resident ANN index (64 floats → 64
    * bytes + one scale). Per-vector symmetric scheme: scale = max|x|/127,
    * q_i = floor(x_i/scale + 0.5) (explicit round-half-up — both engines
    * agree bit-for-bit on IEEE double floor, unlike their native round()
    * tie rules). The query reports the quantization quality per vector:
    * the cosine between the original and the dequantized vector and the
    * max absolute reconstruction error — the numbers that justify (or
    * veto) serving the compressed index. Pure narrow map, zero shuffle;
    * all folds are sequential in array order so the doubles are
    * bit-identical to the DuckDB mirror.
    */
  /** Per-vector quantization audit row (core of q68; specs feed it the
    * degenerate vectors the natural table lacks). An all-zero embedding
    * makes scale = 0 and every x/scale a 0/0 NaN whose propagation the
    * two engines need not agree on — short-circuit it: a zero vector
    * reconstructs exactly, so (scale 0, recon_cos 1, max_abs_err 0).
    */
  private[graft] def quantizeAudit(
      id: Long, v: Array[Float]): (Long, Double, Double, Double) = {
    var maxAbs = 0.0
    var i = 0
    while (i < v.length) {
      val a = math.abs(v(i).toDouble)
      if (a > maxAbs) maxAbs = a
      i += 1
    }
    val scale = maxAbs / 127.0
    if (scale == 0.0) return (id, 0.0, 1.0, 0.0)
    // fold order: dot/norms accumulate left-to-right, matching the
    // oracle's list_reduce
    var dot = 0.0
    var n1 = 0.0
    var n2 = 0.0
    var maxErr = 0.0
    i = 0
    while (i < v.length) {
      val x = v(i).toDouble
      val q = math.floor(x / scale + 0.5)
      val r = q * scale
      dot += x * r
      n1 += x * x
      n2 += r * r
      val e = math.abs(x - r)
      if (e > maxErr) maxErr = e
      i += 1
    }
    (id, scale, dot / (math.sqrt(n1) * math.sqrt(n2)), maxErr)
  }

  private val q68 = QueryDef(
    (s, d) => {
      import s.implicits._
      load(s, d, "embeddings")
        .select(col("vec_id"), col("embedding"))
        .as[(Long, Array[Float])]
        .map { case (id, v) => quantizeAudit(id, v) }
        .toDF("vec_id", "scale", "recon_cos", "max_abs_err")
    },
    Some("""WITH t AS (
              SELECT vec_id,
                list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
              FROM embeddings
            ), s AS (
              SELECT vec_id, v,
                list_reduce(list_transform(v, x -> abs(x)),
                  (a, b) -> greatest(a, b)) / 127.0 AS scale
              FROM t
            ), r AS (
              SELECT vec_id, v, scale,
                list_transform(v, x -> floor(x / scale + 0.5) * scale) AS rv
              FROM s
            )
            SELECT vec_id, scale,
              CASE WHEN scale = 0 THEN 1.0 ELSE
                list_reduce(list_transform(list_zip(v, rv),
                    x -> x[1] * x[2]), (a, b) -> a + b)
                / (sqrt(list_reduce(list_transform(v, x -> x * x), (a, b) -> a + b))
                 * sqrt(list_reduce(list_transform(rv, x -> x * x), (a, b) -> a + b)))
              END AS recon_cos,
              CASE WHEN scale = 0 THEN 0.0 ELSE
                list_reduce(list_transform(list_zip(v, rv),
                    x -> abs(x[1] - x[2])), (a, b) -> greatest(a, b))
              END AS max_abs_err
            FROM r"""),
    "int8 scalar quantization quality per vector [similarity]")

  /** q91: health audit of the standing IVF inverted file — per-cell
    * occupancy, corpus fraction, and balance (ratio to the
    * perfectly-even load over the OBSERVED cells). This is the metric
    * an index operator watches in production: skewed cells mean probe
    * latency variance (a probe of a hot cell scans many times the
    * mean) and signal a stale quantizer after the corpus drifts —
    * retrain/rebuild is the remedy, and this query is the trigger.
    * Served from the persisted index; the audit never touches the
    * embeddings themselves. One keyed aggregate with map-side partials
    * (at most k=64 groups), then a global window over the ≤k aggregate
    * rows — bounded by the cell count, never the corpus, so the single
    * window partition is safe at any scale.
    *
    * Derived oracle: frac and balance are single IEEE double divisions
    * of exactly-represented integers (row counts and their products),
    * so DuckDB re-deriving them from the emitted n_vectors is
    * bit-identical; the oracle re-verifies the arithmetic and guards
    * coverage — the per-cell counts must sum to the corpus row count
    * (a dropped or double-indexed vector fails the compare) and cells
    * must be distinct.
    */
  private val q91 = QueryDef(
    (s, d) => {
      val (_, idx) = resolveIvfIndex(s, d)
      val w = Window.partitionBy()
      val tot = sum(col("n_vectors")).over(w)
      val cnt = count(lit(1)).over(w)
      idx.groupBy(col("cell"))
        .agg(count(lit(1)).as("n_vectors"))
        .select(col("cell"), col("n_vectors"),
          (col("n_vectors").cast("double") / tot.cast("double"))
            .as("frac"),
          ((col("n_vectors") * cnt).cast("double") / tot.cast("double"))
            .as("balance"))
    },
    Some(s"""WITH emitted AS (
              SELECT cell, n_vectors
              FROM read_parquet('${graft.QueryDef.OutDirToken}/q91_index_health/*.parquet')
            ), tot AS (
              SELECT CAST(SUM(n_vectors) AS BIGINT) AS st,
                CAST(COUNT(*) AS BIGINT) AS c FROM emitted
            )
            SELECT e.cell, e.n_vectors,
              CAST(e.n_vectors AS DOUBLE) / CAST(t.st AS DOUBLE) AS frac,
              CAST(e.n_vectors * t.c AS DOUBLE) / CAST(t.st AS DOUBLE)
                AS balance
            FROM emitted e, tot t
            WHERE t.st = (SELECT COUNT(*) FROM embeddings)
              AND (SELECT COUNT(*) FROM emitted) =
                  (SELECT COUNT(DISTINCT cell) FROM emitted)"""),
    "IVF index health: per-cell occupancy + balance [similarity]")

  /** q92: q91's health audit for the LSH bucket table — per-bucket
    * occupancy, fraction, and balance over the persisted (vec_id, bkt)
    * index. The production signal is the same (hot buckets = probe
    * latency variance) but the remedy differs: LSH has no quantizer to
    * retrain — persistent skew means the plane count/bit depth is
    * mis-sized for the corpus (or the embeddings aren't centered), and
    * the fix is a scheme-version bump that rebuilds every bucket
    * table. Same bounded plan as q91: one keyed aggregate with
    * map-side partials (at most L x 2^k = 256 groups), then a global
    * window over the aggregate rows.
    *
    * Derived oracle (q91's pattern): frac/balance are single IEEE
    * divisions of exactly-represented integers, re-derived from the
    * emitted counts; the coverage guard pins sum(n_vectors) to
    * NumTables x corpus rows — a vector missing from (or duplicated
    * in) any table fails the compare — and buckets must be distinct.
    */
  private val q92 = QueryDef(
    (s, d) => {
      val idx = resolveLshIndex(s, d)
      val w = Window.partitionBy()
      val tot = sum(col("n_vectors")).over(w)
      val cnt = count(lit(1)).over(w)
      idx.groupBy(col("bkt"))
        .agg(count(lit(1)).as("n_vectors"))
        .select(col("bkt"), col("n_vectors"),
          (col("n_vectors").cast("double") / tot.cast("double"))
            .as("frac"),
          ((col("n_vectors") * cnt).cast("double") / tot.cast("double"))
            .as("balance"))
    },
    Some(s"""WITH emitted AS (
              SELECT bkt, n_vectors
              FROM read_parquet('${graft.QueryDef.OutDirToken}/q92_lsh_health/*.parquet')
            ), tot AS (
              SELECT CAST(SUM(n_vectors) AS BIGINT) AS st,
                CAST(COUNT(*) AS BIGINT) AS c FROM emitted
            )
            SELECT e.bkt, e.n_vectors,
              CAST(e.n_vectors AS DOUBLE) / CAST(t.st AS DOUBLE) AS frac,
              CAST(e.n_vectors * t.c AS DOUBLE) / CAST(t.st AS DOUBLE)
                AS balance
            FROM emitted e, tot t
            WHERE t.st = $NumTables * (SELECT COUNT(*) FROM embeddings)
              AND (SELECT COUNT(*) FROM emitted) =
                  (SELECT COUNT(DISTINCT bkt) FROM emitted)"""),
    "LSH index health: per-bucket occupancy + balance [similarity]")

  /** q123: per-query recall@10 of the IVF index against the exact
    * baseline — the production index-quality monitor (alongside q91's
    * occupancy health): recall dropping under a threshold is the signal
    * to retrain the quantizer or raise nprobe. Composes the q38 and q54
    * operators directly, so it measures exactly what those queries
    * serve.
    *
    * Scale: both inputs are top-k lists — 10 rows per query by
    * construction — so the audit joins and aggregates O(queries·k)
    * rows no matter the corpus size; the cost is the two underlying
    * operators, which are the IVF/index paths already built for scale.
    *
    * Oracle: DuckDB recomputes the same join over the ENGINE'S OWN
    * emitted q38/q54 row sets (each independently oracle-verified), so
    * a q123 row that disagrees with the lists it claims to audit fails
    * the compare. recall is one exact long/long division.
    */
  private val q123 = QueryDef(
    (s, d) => {
      val exact = q38.fn(s, d).select(col("query_id"), col("vec_id"))
      val approx = q54.fn(s, d)
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
                '${graft.QueryDef.OutDirToken}/q54_ann_ivf/*.parquet')
            ), j AS (
              SELECT e.query_id, CAST(count(*) AS BIGINT) AS n_exact,
                CAST(count(a.vec_id) AS BIGINT) AS n_hits
              FROM ex e LEFT JOIN ap a
                ON e.query_id = a.query_id AND e.vec_id = a.vec_id
              GROUP BY 1
            )
            SELECT query_id, n_exact, n_hits,
              n_hits / n_exact AS recall
            FROM j"""),
    "IVF recall@10 audit vs exact baseline: derived oracle over emitted lists [similarity]")

  /** The exact top-k baseline (q38), exposed for the other ANN
    * families' recall audits (q123 here, q212 in GraphAnn).
    */
  private[queries] def exactTopK(s: SparkSession, d: String): DataFrame =
    q38.fn(s, d)

  /** q230: per-query NDCG@10 of the IVF lists — the POSITION-AWARE
    * companion to q123's recall (recall says "8 of the true top-10
    * surfaced"; NDCG says "and they surfaced near the top, where the
    * user of a retrieval API actually looks"): binary relevance (the
    * approx item is in the exact top-10), gain discounted by
    * 1/log2(rank+1) at the approx list's OWN rank, normalized by the
    * ideal DCG over min(10, n_exact) positions.
    *
    * Scale: both inputs are the already-built top-k lists — 10 rows
    * per query by construction — so the audit is O(queries·k) joins
    * and folds regardless of corpus size (the q123 argument).
    *
    * Exactness: hits and ranks are exact integers joined bit-exact;
    * DCG/IDCG involve log2, so the derived oracle recomputes them in
    * DuckDB from the ENGINE'S OWN emitted q38/q54 lists and admits
    * each within 1e-9 (the q167 tolerance-contract discipline; the
    * ordered fold pins Spark's summation order so the engine side is
    * itself run-stable).
    */
  private val q230 = QueryDef(
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
      val exact = q38.fn(s, d)
        .select(col("query_id").as("eqid"), col("vec_id").as("evid"))
      val approx = q54.fn(s, d)
        .select(col("query_id"), col("vec_id"), col("rn"))
      val perQuery = w.partitionBy(col("query_id"))
      // ordered fold: the float sum accumulates in rank order, so the
      // engine-side DCG is partition-invariant (q181 discipline)
      val ordered = perQuery.orderBy(col("rn").asc)
        .rowsBetween(w.unboundedPreceding, w.currentRow)
      approx
        .join(exact, col("query_id") === col("eqid") &&
          col("vec_id") === col("evid"), "left")
        .withColumn("rel", when(col("evid").isNotNull, 1L).otherwise(0L))
        .withColumn("dcg_run",
          sum(col("rel").cast("double") /
            log2(col("rn").cast("double") + 1.0)).over(ordered))
        .withColumn("idcg_run",
          sum(lit(1.0) / log2(col("rn").cast("double") + 1.0))
            .over(ordered))
        .withColumn("n_hits", sum(col("rel")).over(perQuery))
        .withColumn("last", row_number().over(
          perQuery.orderBy(col("rn").desc)))
        .filter(col("last") === 1)
        .select(col("query_id"), col("n_hits"),
          col("dcg_run").as("dcg"), col("idcg_run").as("idcg"),
          (col("dcg_run") / col("idcg_run")).as("ndcg"))
    },
    Some(s"""WITH ex AS (
              SELECT query_id, vec_id FROM read_parquet(
                '${graft.QueryDef.OutDirToken}/q38_ann_bruteforce/*.parquet')
            ), ap AS (
              SELECT query_id, vec_id, rn FROM read_parquet(
                '${graft.QueryDef.OutDirToken}/q54_ann_ivf/*.parquet')
            ), j AS (
              SELECT a.query_id,
                CASE WHEN e.vec_id IS NULL THEN 0 ELSE 1 END AS rel,
                a.rn
              FROM ap a LEFT JOIN ex e
                ON a.query_id = e.query_id AND a.vec_id = e.vec_id
            ), ref AS (
              SELECT query_id,
                CAST(SUM(rel) AS BIGINT) AS n_hits,
                SUM(CAST(rel AS DOUBLE) / log2(CAST(rn AS DOUBLE) + 1.0))
                  AS dcg,
                SUM(1.0 / log2(CAST(rn AS DOUBLE) + 1.0)) AS idcg
              FROM j GROUP BY 1
            ), emitted AS (
              SELECT * FROM read_parquet(
                '${graft.QueryDef.OutDirToken}/q230_ann_ndcg/*.parquet')
            )
            SELECT e.query_id, e.n_hits, e.dcg, e.idcg, e.ndcg
            FROM emitted e JOIN ref r ON e.query_id = r.query_id
              AND e.n_hits = r.n_hits
            WHERE abs(e.dcg - r.dcg) < 1e-9
              AND abs(e.idcg - r.idcg) < 1e-9
              AND abs(e.ndcg - r.dcg / r.idcg) < 1e-9"""),
    "IVF NDCG@10 audit vs exact baseline: position-aware derived " +
      "oracle over emitted lists [similarity]")

  /** q250's pool depth, output depth, and the relevance/diversity
    * trade-off λ (score = λ·rel − (1−λ)·max-sim-to-selected).
    */
  private val MmrPoolK = 50
  private val MmrOutK = 10
  private val MmrLambda = 0.7

  /** q250: MMR (maximal marginal relevance) diversified top-10 — the
    * re-ranking layer every retrieval-for-training pipeline puts over
    * a raw similarity top-k, because the 10 nearest neighbors of a
    * query are usually 10 near-copies of the SAME document: MMR picks
    * greedily by λ·relevance − (1−λ)·max-similarity-to-already-picked
    * (Carbonell-Goldstein), trading a little relevance for coverage.
    *
    * Scale split: the CORPUS-scale stage is candidate generation —
    * q38's broadcast-probe codegen cosine scan with a per-query top-50
    * cut (the same partial-rank discipline; swap in the IVF/NSW index
    * for the scan at larger corpora, the re-rank is agnostic). The
    * greedy re-rank then runs per query INSIDE one `flatMapGroups`
    * task over its literal-bounded 50-candidate pool (50 vectors ≈
    * 13 KB) — iterative selection is inherently sequential per query,
    * so the right distribution is "one bounded local loop per query
    * key", never 10 distributed supersteps over 1000-row frames.
    *
    * Determinism/oracle: relevance scores come from the native codegen
    * cosine; the in-loop candidate-candidate similarities use the
    * IDENTICAL sequential-double formula, so every emitted double is a
    * fixed IEEE sequence DuckDB reproduces bit-for-bit. The oracle is
    * derived (the q123 pattern, upgraded to GREEDY optimality): it
    * recomputes the pool, re-derives each step's max-sim from the
    * emitted prefix, and re-selects each step's argmax over the
    * not-yet-picked pool — an emitted row that is not the true greedy
    * pick at its rank fails the join and the row count.
    */
  private val q250 = QueryDef(
    (s, d) => {
      import s.implicits._
      val e = load(s, d, "embeddings")
      val q = e.filter(col("vec_id") < 20)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("score").desc, col("vec_id").asc)
      val pool = e.join(broadcast(q), col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"),
          fastCosine(s)(col("qv"), col("embedding")).as("score"),
          col("embedding"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= MmrPoolK)
        .select(col("query_id"), col("vec_id"), col("score"),
          col("embedding"))
      val lam = MmrLambda
      val outK = MmrOutK
      pool.as[(Long, Long, Double, Seq[Float])]
        .groupByKey(_._1)
        .flatMapGroups { (qid, it) =>
          // the same sequential-double cosine as the codegen expression
          def cos(a: Seq[Float], b: Seq[Float]): Double = {
            var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
            val n = a.length
            while (i < n) {
              val x = a(i).toDouble; val y = b(i).toDouble
              dot += x * y; na += x * x; nb += y * y; i += 1
            }
            dot / (math.sqrt(na) * math.sqrt(nb))
          }
          val cands = it.toArray.sortBy(c => (-c._3, c._2))
          // max-sim to the EMPTY selection is 0 (step 1 is pure
          // relevance); from step 2 on it is the TRUE max — which can
          // be NEGATIVE for anti-correlated vectors, and clamping it
          // at 0 would under-reward genuinely diverse picks
          val maxSim = Array.fill(cands.length)(Double.NegativeInfinity)
          def ms(i: Int): Double =
            if (maxSim(i).isNegInfinity) 0.0 else maxSim(i)
          val picked = Array.fill(cands.length)(false)
          val out = Vector.newBuilder[(Long, Long, Int, Double, Double, Double)]
          var step = 1
          while (step <= math.min(outK, cands.length)) {
            var best = -1
            var bestScore = Double.NegativeInfinity
            var i = 0
            while (i < cands.length) {
              if (!picked(i)) {
                val m = lam * cands(i)._3 - (1.0 - lam) * ms(i)
                // ties break on vec_id — the oracle's (m DESC, vec_id)
                // order, NOT the pool's relevance order
                if (m > bestScore ||
                  (m == bestScore && cands(i)._2 < cands(best)._2)) {
                  bestScore = m; best = i
                }
              }
              i += 1
            }
            // every remaining score NaN (possible only via a zero-norm
            // embedding making cosine 0/0) leaves best = -1 — stop the
            // greedy rather than index with it
            if (best < 0) {
              step = cands.length + 1
            } else {
            picked(best) = true
            out += ((qid, cands(best)._2, step, cands(best)._3,
              ms(best), bestScore))
            var j = 0
            while (j < cands.length) {
              if (!picked(j)) {
                val sim = cos(cands(j)._4, cands(best)._4)
                if (sim > maxSim(j)) maxSim(j) = sim
              }
              j += 1
            }
            step += 1
            }
          }
          out.result().iterator
        }
        .toDF("query_id", "vec_id", "pick_rank", "relevance",
          "max_sim_selected", "mmr_score")
        .select(col("query_id"), col("vec_id"),
          col("pick_rank").cast("int").as("pick_rank"),
          col("relevance"), col("max_sim_selected"), col("mmr_score"))
    },
    Some(s"""WITH q AS (
              SELECT vec_id AS query_id, embedding AS qv FROM embeddings
              WHERE vec_id < 20
            ), scored AS (
              SELECT query_id, vec_id, score, embedding
              FROM (
                SELECT q.query_id, e.vec_id,
                  ${cosineSql("q.qv", "e.embedding")} AS score,
                  e.embedding,
                  ROW_NUMBER() OVER (PARTITION BY q.query_id
                    ORDER BY ${cosineSql("q.qv", "e.embedding")} DESC,
                      e.vec_id ASC) AS rn
                FROM embeddings e JOIN q ON e.vec_id <> q.query_id)
              WHERE rn <= $MmrPoolK
            ), emitted AS (
              SELECT * FROM read_parquet(
                '${graft.QueryDef.OutDirToken}/q250_mmr_diversify/*.parquet')
            ), sel_sims AS (
              -- candidate-in-pool x emitted-pick similarity grid
              SELECT c.query_id, c.vec_id AS cand, e.pick_rank,
                ${cosineSql("c.embedding", "p.embedding")} AS sim
              FROM scored c
              JOIN emitted e ON e.query_id = c.query_id
              JOIN embeddings p ON p.vec_id = e.vec_id
            ), steps AS (
              SELECT unnest(generate_series(1, $MmrOutK, 1)) AS i
            ), ms AS (
              -- each pool candidate's max-sim to the picks BEFORE step i
              SELECT c.query_id, c.vec_id, c.score, st.i,
                COALESCE(MAX(CASE WHEN ss.pick_rank < st.i
                  THEN ss.sim END), 0.0) AS maxsim
              FROM scored c CROSS JOIN steps st
              LEFT JOIN sel_sims ss ON ss.query_id = c.query_id
                AND ss.cand = c.vec_id
              GROUP BY 1, 2, 3, 4
            ), avail AS (
              SELECT query_id, vec_id, score, i, maxsim,
                $MmrLambda * score - ${1.0 - MmrLambda} * maxsim AS m
              FROM ms a
              WHERE NOT EXISTS (
                SELECT 1 FROM emitted e
                WHERE e.query_id = a.query_id AND e.vec_id = a.vec_id
                  AND e.pick_rank < a.i)
            ), best AS (
              SELECT query_id, vec_id, score, i, maxsim, m
              FROM (SELECT *, ROW_NUMBER() OVER (
                      PARTITION BY query_id, i
                      ORDER BY m DESC, vec_id ASC) AS rn
                    FROM avail)
              WHERE rn = 1
            )
            SELECT e.query_id, e.vec_id,
              CAST(e.pick_rank AS INTEGER) AS pick_rank,
              b.score AS relevance, b.maxsim AS max_sim_selected,
              b.m AS mmr_score
            FROM emitted e
            JOIN best b ON b.query_id = e.query_id AND b.i = e.pick_rank
              AND b.vec_id = e.vec_id"""),
    "MMR-diversified top-10 over a top-50 cosine pool: greedy " +
      "re-rank per query key, derived greedy-optimality oracle [similarity]")

  /** q268: per-query MRR (mean reciprocal rank) of the IVF lists —
    * the FIRST-HIT companion completing the eval triad: recall@10
    * (q123) counts overlap, NDCG@10 (q230) weights every position,
    * MRR reads only where the first true neighbor lands — the metric
    * for interfaces that surface one answer (dedup candidate review,
    * top-1 retrieval augmentation). Emits each query's first-hit rank,
    * its reciprocal, and the corpus MRR.
    *
    * Exactness: the first-hit rank is an exact integer (min emitted rn
    * whose vec_id appears in the exact top-10); rr = 1/rank is one
    * division, and the MRR fold runs in PINNED query_id order (q254
    * discipline) — so unlike q230's tolerance bands, this derived
    * oracle recomputes every value independently from the two emitted
    * lists and compares EXACTLY. A query with no hit contributes
    * rr = 0 (NULL rank) — the standard convention, and the reason MRR
    * complements recall rather than repeating it.
    *
    * Scale: both inputs are per-query top-10 lists (query-count-
    * bounded); the join, the min-rank fold, and the pinned MRR fold
    * never touch corpus-sized frames (the q123/q230 argument).
    */
  private val q268 = QueryDef(
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
      val exact = q38.fn(s, d)
        .select(col("query_id").as("eqid"), col("vec_id").as("evid"))
      val approx = q54.fn(s, d)
        .select(col("query_id"), col("vec_id"), col("rn"))
      // two consumers (emit join, MRR fold) of a query-count-bounded
      // frame
      val perQ = approx
        .join(exact, col("query_id") === col("eqid") &&
          col("vec_id") === col("evid"), "left")
        .groupBy(col("query_id"))
        .agg(min(when(col("evid").isNotNull, col("rn")))
          .as("first_hit_rank"))
        .withColumn("rr",
          coalesce(lit(1.0) / col("first_hit_rank").cast("double"),
            lit(0.0)))
        .localCheckpoint()
      val ordered = w.orderBy(col("query_id").asc)
        .rowsBetween(w.unboundedPreceding, w.currentRow)
      val mrr = perQ
        .withColumn("rr_run", sum(col("rr")).over(ordered))
        .withColumn("nq", count(lit(1)).over(
          w.rowsBetween(w.unboundedPreceding, w.unboundedFollowing)))
        .withColumn("last", row_number().over(
          w.orderBy(col("query_id").desc)))
        .filter(col("last") === 1)
        .select((col("rr_run") / col("nq").cast("double")).as("mrr"))
      perQ.crossJoin(broadcast(mrr))
        .select(col("query_id"), col("first_hit_rank"), col("rr"),
          col("mrr"))
    },
    Some(s"""WITH ex AS (
              SELECT query_id, vec_id FROM read_parquet(
                '${graft.QueryDef.OutDirToken}/q38_ann_bruteforce/*.parquet')
            ), ap AS (
              SELECT query_id, vec_id, rn FROM read_parquet(
                '${graft.QueryDef.OutDirToken}/q54_ann_ivf/*.parquet')
            ), perq AS (
              SELECT a.query_id,
                MIN(CASE WHEN e.vec_id IS NOT NULL THEN a.rn END)
                  AS first_hit_rank
              FROM ap a LEFT JOIN ex e
                ON a.query_id = e.query_id AND a.vec_id = e.vec_id
              GROUP BY 1
            ), rrq AS (
              SELECT query_id, first_hit_rank,
                COALESCE(1.0 / CAST(first_hit_rank AS DOUBLE), 0.0) AS rr
              FROM perq
            ), folded AS (
              SELECT
                SUM(rr) OVER (ORDER BY query_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS rr_run,
                count(*) OVER () AS nq,
                ROW_NUMBER() OVER (ORDER BY query_id DESC) AS last
              FROM rrq
            )
            SELECT r.query_id, r.first_hit_rank, r.rr,
              f.rr_run / CAST(f.nq AS DOUBLE) AS mrr
            FROM rrq r
            CROSS JOIN (SELECT rr_run, nq FROM folded WHERE last = 1) f"""),
    "IVF MRR audit vs exact baseline: exact first-hit ranks, pinned-" +
      "order reciprocal fold, fully exact derived oracle [similarity]")

  /** q271's persistence parameter and the iteratively-computed weight
    * table p^(d−1) — materialized ONCE in Scala by repeated multiply
    * and injected as identical literals into both engines (the
    * shortest-roundtrip Double rendering reparses to the same bits),
    * so no engine ever evaluates pow().
    */
  private val RboP = 0.9
  private val RboDepth = 10
  private val RboPowers: Array[Double] =
    Array.iterate(1.0, RboDepth)(_ * RboP)
  private val RboOneMinusP = 1.0 - RboP

  /** q271: rank-biased overlap (Webber et al.) between the exact and
    * IVF top-10 RANKINGS, truncated at depth 10 — the list-similarity
    * readout the eval triad lacks: recall/NDCG/MRR all score the
    * approximate list against binary relevance, while RBO compares the
    * two rankings AS RANKINGS (top-weighted agreement at every depth),
    * which is the right lens for "did the index change what users see"
    * regression tests between index builds.
    *
    * RBO@k = (1−p)·Σ_{d≤k} (|E₁..d ∩ A₁..d|/d)·p^(d−1): each matched
    * pair contributes to every depth ≥ max of its two ranks, so the
    * per-depth overlap counts come from one explode of that integer —
    * never a per-depth set intersection. Overlap counts are exact
    * integers; the geometric weights are the shared literal table; the
    * per-query fold is ≤10 pinned-order terms — so the derived oracle
    * (the q268 pattern) recomputes every value from the two emitted
    * lists and compares EXACTLY.
    *
    * Scale: both inputs are query-count-bounded top-10 lists; nothing
    * here touches a corpus-sized frame (the q123/q230/q268 argument).
    */
  private val q271 = QueryDef(
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
      val exact = q38.fn(s, d)
        .select(col("query_id").as("eqid"), col("vec_id").as("evid"),
          col("rn").as("rn_e"))
      val approx = q54.fn(s, d)
        .select(col("query_id"), col("vec_id"), col("rn"))
      val powers = array(RboPowers.map(lit(_)): _*)
      val terms = approx
        .join(exact, col("query_id") === col("eqid") &&
          col("vec_id") === col("evid"))
        .select(col("query_id"),
          greatest(col("rn"), col("rn_e")).as("m"))
        .select(col("query_id"),
          explode(sequence(col("m"), lit(RboDepth))).as("dd"))
        .groupBy(col("query_id"), col("dd"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("term",
          (col("cnt").cast("double") / col("dd").cast("double")) *
            element_at(powers, col("dd").cast("int")))
      val perQ = terms
        .withColumn("sum_run", sum(col("term")).over(
          w.partitionBy(col("query_id")).orderBy(col("dd").asc)
            .rowsBetween(w.unboundedPreceding, w.currentRow)))
        .withColumn("last", row_number().over(
          w.partitionBy(col("query_id")).orderBy(col("dd").desc)))
        .filter(col("last") === 1)
        // the last row is depth 10, where cnt = #pairs with max rank
        // <= 10 = the full matched-pair count (overlap@10)
        .select(col("query_id"), col("cnt").as("ov10"),
          (lit(RboOneMinusP) * col("sum_run")).as("rbo"))
      // zero-overlap queries still emit a row
      approx.select(col("query_id")).distinct()
        .join(perQ, Seq("query_id"), "left")
        .select(col("query_id"),
          coalesce(col("ov10"), lit(0L)).as("n_overlap10"),
          coalesce(col("rbo"), lit(0.0)).as("rbo_trunc"))
    },
    Some {
      // each weight must be CAST AS DOUBLE: DuckDB types a bare decimal
      // literal as DECIMAL, and decimal-typed term arithmetic rounds
      // differently from the engine's double chain (measured 1-2 ulp)
      val powersSql = RboPowers
        .map(p => s"CAST($p AS DOUBLE)").mkString("[", ", ", "]")
      s"""WITH ex AS (
            SELECT query_id, vec_id, rn AS rn_e FROM read_parquet(
              '${graft.QueryDef.OutDirToken}/q38_ann_bruteforce/*.parquet')
          ), ap AS (
            SELECT query_id, vec_id, rn FROM read_parquet(
              '${graft.QueryDef.OutDirToken}/q54_ann_ivf/*.parquet')
          ), pairs AS (
            SELECT a.query_id, greatest(a.rn, e.rn_e) AS m
            FROM ap a JOIN ex e
              ON a.query_id = e.query_id AND a.vec_id = e.vec_id
          ), depths AS (
            SELECT query_id, unnest(generate_series(m, $RboDepth)) AS dd
            FROM pairs
          ), terms AS (
            SELECT query_id, dd, CAST(count(*) AS BIGINT) AS cnt,
              (CAST(count(*) AS DOUBLE) / CAST(dd AS DOUBLE))
                * ($powersSql)[CAST(dd AS INTEGER)] AS term
            FROM depths GROUP BY 1, 2
          ), folded AS (
            SELECT query_id, cnt,
              SUM(term) OVER (PARTITION BY query_id ORDER BY dd ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS sum_run,
              ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dd DESC)
                AS last
            FROM terms
          ), perq AS (
            -- the last row is depth 10: cnt there is the full
            -- matched-pair count (overlap@10)
            SELECT query_id, CAST(cnt AS BIGINT) AS ov10,
              CAST($RboOneMinusP AS DOUBLE) * sum_run AS rbo
            FROM folded WHERE last = 1
          )
          SELECT q.query_id,
            COALESCE(p.ov10, 0) AS n_overlap10,
            COALESCE(p.rbo, 0.0) AS rbo_trunc
          FROM (SELECT DISTINCT query_id FROM ap) q
          LEFT JOIN perq p USING (query_id)"""
    },
    "rank-biased overlap (p=0.9, depth 10) between exact and IVF " +
      "rankings: shared literal weight table, exact derived oracle " +
      "[similarity]")

  def all: Seq[(String, QueryDef)] = Seq(
    "q38_ann_bruteforce" -> q38,
    "q268_ann_mrr" -> q268,
    "q271_ann_rbo" -> q271,
    "q250_mmr_diversify" -> q250,
    "q39_ann_lsh" -> q39,
    "q276_ann_lsh_filtered" -> q276,
    "q277_semantic_decontam" -> q277,
    "q40_dedup_embedding" -> q40,
    "q54_ann_ivf" -> q54,
    "q273_ann_filtered" -> q273,
    "q278_ann_filtered_lang" -> q278,
    "q279_ann_lsh_filtered_multi" -> q279,
    "q62_dedup_embedding_ann" -> q62,
    "q68_embedding_quantize" -> q68,
    "q91_index_health" -> q91,
    "q92_lsh_health" -> q92,
    "q123_ann_recall" -> q123,
    "q230_ann_ndcg" -> q230)
}
