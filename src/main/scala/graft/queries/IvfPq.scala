package graft.queries

import graft.QueryDef
import graft.common.Tables.load
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF-PQ ANN search — the production composition of the two quantizers
  * this engine already trains: the coarse IVF k-means quantizer (q54)
  * routes the scan to a few cells, and the product quantizer (q86)
  * compresses every routed vector to NumSubspaces one-byte codes so the
  * candidate scan reads 8 bytes + a cell id per vector instead of a
  * 256-byte embedding. Candidates are ranked by ADC (asymmetric
  * distance computation): each query precomputes one tiny
  * (subspaces × codebook) table of query-to-codeword dot products, and
  * a candidate's approximate cosine is NumSubspaces array lookups — no
  * per-candidate float vector is touched until the exact re-rank, which
  * fetches real embeddings for only the RerankPool best approximate
  * candidates per query.
  *
  * Why this matters at 100 TB: q38 streams every embedding per query;
  * q54 reads full embeddings for ~NProbe/NumCells of the corpus. Here
  * the probed fraction moves as codes — 32× less I/O on the scan — and
  * full vectors move only for RerankPool rows per query. That is the
  * FAISS IVFADC layout, expressed as DataFrame ops: narrow encode map,
  * bucketed broadcast join on the cell id, hash-aggregate-free window
  * top-k, exact re-rank join.
  *
  * Same contract as q38/q54 (top-10 per query, vec_id < 20 probe set),
  * so the recall spec measures all three against each other. Like
  * q54/q62 the result is approximate → no SQL oracle; IvfPqSpec pins
  * recall@10 vs q38, determinism, and the candidates-are-codes shape.
  */
object IvfPq {

  private val NProbe = 16
  /** Exactly-re-ranked pool per query: ADC only has to land the true
    * top-10 inside its top-64 — measured recall@10 vs q38 is 0.72 at
    * sf0.001 and 0.71 at sf0.01, ~5pp under q54's full-embedding probe
    * scan (0.78/0.755) at 1/32 the candidate I/O. Near-uniform test
    * embeddings are PQ's worst case (q86's recon cosine ≈ 0.53); on
    * clustered real corpora the ADC ranking is tighter and the gap
    * closes. Re-ranking is exact, so the pool+probe choice, not score
    * error, bounds recall.
    */
  private val RerankPool = 64

  /** Number of in-JVM index-encode passes — lets IndexStoreSpec prove
    * the persisted-index serve path performs ZERO re-encoding.
    */
  private[graft] val encodeCount =
    new java.util.concurrent.atomic.AtomicLong(0L)

  /** Sidecar row-schema generation: v2 added the `label` filter column
    * (round-15 filtered IVF-PQ); v3 (round-16) records the DECLARED
    * filter-column set ([[Similarity.IndexFilterCols]]) in the pin —
    * every declared column rides beside the codes, and changing the
    * set rebuilds older stores through the ordinary MISS path.
    */
  private[graft] val PqFormat = s"v3-filters:${Similarity.FilterColsTag}"

  /** Stored-index read normalized back to the encode schema (cell cast
    * long, original column order); the optimizer unwraps the cast when
    * pruning, so the probed-cell filter still partition-prunes.
    */
  private def normalizedPqRead(t: graft.tables.ParquetTable): DataFrame =
    t.read.select(col("vec_id") +: col("cell").cast("long").as("cell") +:
      col("codes") +: col("rnorm") +:
      Similarity.IndexFilterCols.map(c => col(c._1)): _*)

  /** The encoded index resolved against the dataset's current backing
    * files — [[Similarity.resolveIvfIndex]]'s lifecycle for the PQ
    * code table (at 100 TB the encode is a full-corpus pass nobody
    * re-runs because data arrived): identical file set → serve the
    * stored codes under the PINNED quantizers (centroids AND
    * codebooks, both recorded by content fingerprint in the sidecar);
    * new files only → encode just those rows under the pinned
    * quantizers and append (idempotent via the single-witness
    * membership probe — the table commit is atomic); anything else, or
    * an unrecoverable pin, → full re-encode under freshly trained
    * quantizers. Returns the quantizers alongside the index so probe
    * routing and ADC tables always match the stored codes.
    */
  /** Served-index session memo + uncached-resolution counter —
    * `Similarity.lshServeCache`'s design (see the scaladoc there: plain
    * parquet-backed plan kept for partition pruning, fingerprint +
    * session validated, one listStatus per lookup).
    */
  private val pqServeCache = new java.util.concurrent.ConcurrentHashMap[
    String, (String, Option[Long], Array[(Long, Array[Double], Double)],
      Array[Array[Array[Double]]], DataFrame)]()

  private[graft] val pqResolveCount =
    new java.util.concurrent.atomic.AtomicLong(0L)

  private[graft] def clearServedIndexCache(): Unit = pqServeCache.clear()

  private[graft] def resolvePqIndex(s: SparkSession, d: String):
      (Array[(Long, Array[Double], Double)],
        Array[Array[Array[Double]]], DataFrame) = {
    // tombstone fold before the memo check; mask outside the memo —
    // see Similarity.resolveLshIndex for the rationale
    graft.tables.IndexStore.maybeFoldTombstones(
      s, "pq_index", d, Seq("vec_id"), Some("cell"))
    val meta = Similarity.embeddingsFileMeta(s, d)
    val fp = Similarity.fingerprintOf(d, meta)
    val ver = Similarity.indexVersion(s, "pq_index", d)
    val hit = pqServeCache.compute(d, (_, cur) =>
      if (cur != null && cur._1 == fp && cur._2 == ver &&
          (cur._5.sparkSession eq s)) cur
      else {
        pqResolveCount.incrementAndGet()
        val (cs, books, df) = resolvePqIndexUncached(s, d, meta, fp)
        (fp, Similarity.indexVersion(s, "pq_index", d), cs, books, df)
      })
    (hit._3, hit._4,
      graft.tables.IndexStore.maskTombstones(s, "pq_index", d, hit._5))
  }

  private def resolvePqIndexUncached(s: SparkSession, d: String,
      meta: Map[String, String], fp: String):
      (Array[(Long, Array[Double], Double)],
        Array[Array[Array[Double]]], DataFrame) = {
    import graft.tables.IndexStore
    val kind = "pq_index"

    def rebuild(): (Array[(Long, Array[Double], Double)],
        Array[Array[Array[Double]]], DataFrame) = {
      val cs = Similarity.kMeansCentroids(s, d)
      val books = ProductQuantization.trainCodebooks(s, d)
      val computed = encode(s, d, cs, books)
      val served =
        try {
          val t = IndexStore.corpusIndexTable(s, kind, d)
          t.overwrite(computed, partitionBy = Seq("cell"))
          IndexStore.commitCorpusIndexState(kind, d, fp, meta, PqFormat)
          normalizedPqRead(t)
        } catch {
          case scala.util.control.NonFatal(e) =>
            System.err.println(s"[index-store] pq publish skipped: $e")
            computed
        }
      (cs, books, served)
    }

    def pinned(qfp: String): Option[(Array[(Long, Array[Double], Double)],
        Array[Array[Array[Double]]])] =
      for {
        cs <- Similarity.pinnedCentroids(s, d, qfp, fp)
        books <- ProductQuantization.pinnedCodebooks(s, d, qfp, fp)
      } yield (cs, books)

    IndexStore.resolveCorpusIndex(s, kind, d, meta, PqFormat) match {
      case IndexStore.CorpusIndexHit(qfp) =>
        pinned(qfp) match {
          case Some((cs, books)) =>
            (cs, books, normalizedPqRead(
              IndexStore.corpusIndexTable(s, kind, d)))
          case None => rebuild()
        }
      case IndexStore.CorpusIndexDelta(qfp, newFiles) =>
        pinned(qfp) match {
          case Some((cs, books)) =>
            try {
              val t = IndexStore.corpusIndexTable(s, kind, d)
              val toAppend = IndexStore.filesNeedingAppend(s, t, newFiles)
              if (toAppend.nonEmpty) {
                val fresh =
                  Similarity.withFilterCols(s, d, s.read.parquet(toAppend: _*))
                t.append(encodeRows(s, fresh, cs, books),
                  partitionBy = Seq("cell"))
              }
              IndexStore.commitCorpusIndexState(kind, d, qfp, meta, PqFormat)
              IndexStore.maybeCompactCorpusIndex(s, kind, d)
              (cs, books, normalizedPqRead(t))
            } catch {
              case scala.util.control.NonFatal(e) =>
                System.err.println(
                  s"[index-store] pq delta append failed, rebuilding: $e")
                rebuild()
            }
          case None => rebuild()
        }
      case IndexStore.CorpusIndexMiss => rebuild()
    }
  }

  private[graft] def encode(s: SparkSession, d: String,
      centroids: Array[(Long, Array[Double], Double)],
      books: Array[Array[Array[Double]]]): DataFrame = {
    encodeCount.incrementAndGet()
    encodeRows(s, Similarity.withFilterCols(s, d, load(s, d, "embeddings")),
      centroids, books)
  }

  /** (vec_id, cell, codes, rnorm, <filter cols>): the compressed index
    * row. One narrow typed pass; `rnorm` is the reconstruction's norm —
    * |v̂|² is the sum of the chosen codewords' squared norms because
    * subspaces concatenate — so ADC can score cosines without touching
    * v. The declared filter columns ([[Similarity.IndexFilterCols]])
    * ride beside the codes (round-15 filtered IVF-PQ, generalized
    * round-16): a filtered probe's predicate then lands on the pruned
    * code scan as parquet PushedFilters next to the cell
    * PartitionFilter, so ADC ranking only ever sees qualifying rows. A
    * corpus without a declared column indexes its typed default.
    */
  private[graft] def encodeRows(s: SparkSession, vectors: DataFrame,
      centroids: Array[(Long, Array[Double], Double)],
      books: Array[Array[Array[Double]]]): DataFrame = {
    import s.implicits._
    val bcC = s.sparkContext.broadcast(centroids)
    val bcB = s.sparkContext.broadcast(books)
    vectors.select(col("vec_id"), col("embedding"),
        Similarity.fmetaExpr(vectors).as("fmeta"))
      .as[(Long, Array[Float], Map[String, String])]
      .mapPartitions { rows =>
        val cs = bcC.value
        val bs = bcB.value
        val m = bs.length
        val ds = bs(0)(0).length
        rows.map { case (id, v, fm) =>
          val cell = Similarity.rankedCells(cs, v).head
          val codes = new Array[Byte](m)
          var rn2 = 0.0
          var mi = 0
          while (mi < m) {
            val cb = bs(mi)
            var best = 0
            var bd = Double.MaxValue
            var k = 0
            while (k < cb.length) {
              var dd = 0.0
              var i = 0
              while (i < ds) {
                val t = v(mi * ds + i).toDouble - cb(k)(i); dd += t * t
                i += 1
              }
              if (dd < bd) { bd = dd; best = k } // ties → lower code
              k += 1
            }
            codes(mi) = best.toByte
            val c = cb(best)
            var i = 0
            while (i < ds) { rn2 += c(i) * c(i); i += 1 }
            mi += 1
          }
          (id, cell, codes, math.sqrt(rn2), fm)
        }
      }.toDF("vec_id", "cell", "codes", "rnorm", "fmeta")
      .select(col("vec_id") +: col("cell") +: col("codes") +:
        col("rnorm") +: Similarity.restoredFilterCols: _*)
  }

  /** Top-10 per query (vec_id < 20), IVF-routed, ADC-ranked, exactly
    * re-ranked. The query-side collect is the fixed 20-vector probe set
    * (bounded by construction, the same tiny side q38/q54 broadcast) —
    * it exists to precompute each query's ADC lookup table driver-side.
    */
  def ivfPqTopK(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val (centroids, books, index) = resolvePqIndex(s, d)

    // fixed probe set: LUT(m)(k) = dot(q's m-th subvector, codeword k).
    // LUTs are broadcast as a dense ARRAY indexed by a query ordinal
    // the probe rows carry — the ADC hot loop does one array load per
    // candidate row, not a boxed Map[Long,_] probe (noise at 20
    // queries, a real cost at 10⁵ concurrent ones).
    val qvecs = load(s, d, "embeddings").filter(col("vec_id") < 20)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val m = books.length
    val ds = books(0)(0).length
    val luts: Array[(Array[Array[Double]], Double)] =
      qvecs.map { case (_, qv) =>
        val lut = Array.tabulate(m, books(0).length) { (mi, k) =>
          val c = books(mi)(k)
          var dot = 0.0
          var i = 0
          while (i < ds) { dot += qv(mi * ds + i).toDouble * c(i); i += 1 }
          dot
        }
        (lut, Similarity.vecNorm(qv))
      }
    val probeRows = qvecs.toSeq.zipWithIndex.flatMap { case ((qid, qv), ord) =>
      Similarity.rankedCells(centroids, qv).take(NProbe)
        .map(c => (qid, ord, c))
    }
    val probedCells = probeRows.map(_._3).distinct.sorted
    val probes = probeRows.toDF("query_id", "query_ord", "probe_cell")

    val bcLut = s.sparkContext.broadcast(luts)
    // candidate scan: codes only — 8 bytes + cell per vector move here,
    // and only from the PROBED cells' partitions: the driver-known cell
    // list reaches the stored inverted file's scan as a static
    // PartitionFilter (IndexStoreSpec pins it), so unprobed partitions
    // are pruned at listing time, not filtered after a full read
    val approx = index.filter(col("cell").isin(probedCells: _*))
      .join(broadcast(probes),
        col("cell") === col("probe_cell") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("query_ord"), col("vec_id"),
        col("codes"), col("rnorm"))
      .as[(Long, Int, Long, Array[Byte], Double)]
      .mapPartitions { rows =>
        val tables = bcLut.value
        rows.map { case (qid, ord, vid, codes, rnorm) =>
          val (lut, qnorm) = tables(ord)
          var adot = 0.0
          var mi = 0
          while (mi < codes.length) {
            adot += lut(mi)(codes(mi) & 0xff); mi += 1
          }
          val denom = qnorm * rnorm
          (qid, vid, if (denom == 0.0) 0.0 else adot / denom)
        }
      }.toDF("query_id", "vec_id", "ascore")

    val poolW = Window.partitionBy(col("query_id"))
      .orderBy(col("ascore").desc, col("vec_id").asc)
    val pool = approx.withColumn("prn", row_number().over(poolW))
      .filter(col("prn") <= RerankPool)
      .select(col("query_id"), col("vec_id"))

    // exact re-rank: full embeddings join back for RerankPool rows/query.
    // The pool is bounded at queries × RerankPool rows — broadcast it
    // explicitly so the big table is NEVER the build side: without the
    // hint, size stats at small SF put the whole embeddings scan in the
    // broadcast (fine at test scale, fatal at 100 TB).
    val emb = load(s, d, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val qemb = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id").asc)
    emb.join(broadcast(pool), "vec_id").join(broadcast(qemb), "query_id")
      .select(col("query_id"), col("vec_id"),
        Similarity.fastCosine(s)(col("qv"), col("embedding")).as("score"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 10)
      .select(col("query_id"), col("vec_id"),
        col("score"), col("rn").cast("int").as("rn"))
  }

  /** FILTERED IVF-PQ ANN (round-15, closing the filtered-ANN contract
    * on the compressed index): q87's ADC pipeline under a metadata
    * predicate, with the q273 design rules —
    *
    *  1. The predicate lands AT THE CODE SCAN (the stored row carries
    *     the filter column beside the codes, so the cell `isin` stays a
    *     PartitionFilter and the predicate is an ordinary parquet
    *     PushedFilter); ADC ranking and the re-rank pool only ever see
    *     qualifying rows — a post-filter on the top-k would silently
    *     under-return, the exact failure q273 was built to kill.
    *  2. ADAPTIVE PROBE DOUBLING: queries short of overFetch·k
    *     qualifying ADC candidates re-probe with doubled nProbe (only
    *     the deficient queries pay), until the probe set is the whole
    *     cell space — at which point every qualifying code was ADC-
    *     scored and the result is exact-within-ADC, so the operator
    *     never under-returns.
    *
    * The ADC scan and exact re-rank are q87's shapes unchanged: codes
    * move for candidates, full embeddings only for RerankPool rows per
    * query.
    */
  private[graft] def ivfPqTopKFiltered(s: SparkSession, d: String,
      pred: org.apache.spark.sql.Column, k: Int = 10,
      nProbe0: Int = NProbe, overFetch: Int = 3): DataFrame = {
    import s.implicits._
    val (centroids, books, index) = resolvePqIndex(s, d)
    val qvecs = load(s, d, "embeddings").filter(col("vec_id") < 20)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val m = books.length
    val ds = books(0)(0).length
    val luts: Array[(Array[Array[Double]], Double)] =
      qvecs.map { case (_, qv) =>
        val lut = Array.tabulate(m, books(0).length) { (mi, kk) =>
          val c = books(mi)(kk)
          var dot = 0.0
          var i = 0
          while (i < ds) { dot += qv(mi * ds + i).toDouble * c(i); i += 1 }
          dot
        }
        (lut, Similarity.vecNorm(qv))
      }
    val bcLut = s.sparkContext.broadcast(luts)
    def adcCandidates(ords: Seq[Int], nProbe: Int): DataFrame = {
      val probeRows = ords.flatMap { ord =>
        val (qid, qv) = qvecs(ord)
        Similarity.rankedCells(centroids, qv).take(nProbe)
          .map(c => (qid, ord, c))
      }
      val probedCells = probeRows.map(_._3).distinct.sorted
      val probes = probeRows.toDF("query_id", "query_ord", "probe_cell")
      index.filter(col("cell").isin(probedCells: _*) && pred)
        .join(broadcast(probes),
          col("cell") === col("probe_cell") &&
            col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("query_ord"), col("vec_id"),
          col("codes"), col("rnorm"))
        .as[(Long, Int, Long, Array[Byte], Double)]
        .mapPartitions { rows =>
          val tables = bcLut.value
          rows.map { case (qid, ord, vid, codes, rnorm) =>
            val (lut, qnorm) = tables(ord)
            var adot = 0.0
            var mi = 0
            while (mi < codes.length) {
              adot += lut(mi)(codes(mi) & 0xff); mi += 1
            }
            val denom = qnorm * rnorm
            (qid, vid, if (denom == 0.0) 0.0 else adot / denom)
          }
        }.toDF("query_id", "vec_id", "ascore")
    }
    val emb = load(s, d, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val qemb = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val poolW = Window.partitionBy(col("query_id"))
      .orderBy(col("ascore").desc, col("vec_id").asc)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id").asc)
    def finish(approx: DataFrame): DataFrame = {
      val pool = approx.withColumn("prn", row_number().over(poolW))
        .filter(col("prn") <= RerankPool)
        .select(col("query_id"), col("vec_id"))
      emb.join(broadcast(pool), "vec_id").join(broadcast(qemb), "query_id")
        .select(col("query_id"), col("vec_id"),
          Similarity.fastCosine(s)(col("qv"), col("embedding")).as("score"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k)
        .select(col("query_id"), col("vec_id"),
          col("score"), col("rn").cast("int").as("rn"))
    }
    var remaining: Seq[Int] = qvecs.indices.toSeq
    var nProbe = nProbe0
    val finals = scala.collection.mutable.ArrayBuffer[DataFrame]()
    while (remaining.nonEmpty) {
      // consumed twice (counts + pool) UNCHECKPOINTED, the q273 rule:
      // the pruned code scan is cheap to recompute and checkpointing
      // would hide the PartitionFilters/PushedFilters scan from the
      // emitted plan (FilteredAnnSpec pins the scan shape)
      val approx = adcCandidates(remaining, nProbe)
      if (nProbe >= centroids.length) {
        finals += finish(approx) // whole cell space: every qualifying code seen
        remaining = Nil
      } else {
        // candidate-depth satisfaction (q273's over-fetch rule): one
        // |queries|-row collect per round, bounded by the probe set
        val counts = approx.groupBy("query_id").agg(count(lit(1)).as("n"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val (done, notDone) = remaining.partition { ord =>
          counts.getOrElse(qvecs(ord)._1, 0L) >= k.toLong * overFetch
        }
        if (done.nonEmpty)
          finals += finish(approx
            .filter(col("query_id").isin(done.map(qvecs(_)._1): _*)))
        remaining = notDone
        nProbe = math.min(centroids.length, nProbe * 2)
      }
    }
    finals.reduceOption(_.unionByName(_))
      .getOrElse(Similarity.emptyTopKFrame(s))
  }

  /** Filtered IVF-PQ ANN: label = 1 pushed into the code scan, adaptive
    * probe widening, exact re-rank of the qualifying pool.
    */
  private val q275 = QueryDef(
    (s, d) => ivfPqTopKFiltered(s, d, col("label") === 1),
    // derived oracle restricted to the FILTERED universe (q273's
    // pattern): an emitted row with label != 1 vanishes from the
    // verified frame and fails the hash compare
    Some(Similarity.emittedTopKOracle("q275_ann_ivfpq_filtered",
      "e.label = 1")),
    "filtered IVF-PQ ANN top-10: label=1 pushed to the code scan, " +
      "adaptive probe widening, exact re-rank [similarity,approx]")

  private val q87 = QueryDef(
    (s, d) => ivfPqTopK(s, d),
    // pair-level derived oracle (Similarity.emittedTopKOracle): emitted
    // scores are exact re-rank cosines and rn is their deterministic
    // rank, both recomputable per emitted pair; recall vs q38 pinned
    // in IvfPqSpec
    Some(Similarity.emittedTopKOracle("q87_ann_ivfpq")),
    s"IVF-PQ ANN top-10: coarse cells + 8-byte ADC codes, exact " +
      s"re-rank of $RerankPool [similarity,approx]")

  def all: Seq[(String, QueryDef)] = Seq(
    "q87_ann_ivfpq" -> q87,
    "q275_ann_ivfpq_filtered" -> q275)
}
