package graft.tables

import org.apache.spark.sql.{functions, Row, SparkSession}
import org.apache.spark.sql.types._

/** Persisted ANN index state — the production lifecycle for the trained
  * quantizers (IVF k-means centroids, PQ codebooks): train ONCE per
  * dataset, serve from storage in every later session. Without this the
  * session-level memo caches in `Similarity`/`ProductQuantization`
  * retrain from scratch whenever the JVM restarts — harmless at test
  * scale, a full (bounded-sample) training pass wasted per session on a
  * production corpus.
  *
  * Each artifact is its own versioned [[ParquetTable]] under
  * `<root>/<kind>/<key>` where `key` = sha256(dataset-content-
  * fingerprint + hyperparameters). The fingerprint
  * (`Similarity.embeddingsFingerprint`: file paths + lengths + mtimes)
  * rides along as a COLUMN and is re-validated on load, so a stale
  * artifact for a rewritten dataset can never be served — a changed
  * dataset changes the key AND the stored fingerprint. Retrains of the
  * same key overwrite through the table layer's atomic-pointer commit,
  * leaving version history (time travel over index generations for
  * free), and array-typed payloads (`array<double>` centroid
  * components) exercise the manifest/stats machinery beyond flat scalar
  * schemas.
  *
  * Loads and saves are best-effort by design: a missing/corrupt/
  * unwritable store must degrade to in-session training, never fail the
  * query — the store is a cache with validation, not a dependency.
  */
object IndexStore {

  /** Store root. Overridable for tests via the `graft.index.root`
    * system property or the `GRAFT_INDEX_ROOT` environment variable;
    * defaults to a per-user dir under java.io.tmpdir (production would
    * point this at the lakehouse root next to the data).
    */
  private[graft] def root: String =
    sys.props.get("graft.index.root")
      .orElse(sys.env.get("GRAFT_INDEX_ROOT"))
      .getOrElse(s"${sys.props("java.io.tmpdir")}/graft_index")

  private def key(parts: String*): String = {
    val digest = java.security.MessageDigest.getInstance("SHA-256")
      .digest(parts.mkString("|").getBytes("UTF-8"))
    digest.map("%02x".format(_)).mkString.take(32)
  }

  private def table(spark: SparkSession, kind: String,
      k: String): ParquetTable =
    ParquetTable(spark, s"$root/$kind/$k")

  private val CentroidSchema = new StructType()
    .add("fingerprint", StringType)
    .add("cell_id", LongType)
    .add("components", ArrayType(DoubleType))

  /** Persist trained IVF centroids for (fingerprint, k, iters). */
  private[graft] def saveCentroids(spark: SparkSession, fp: String,
      k: Int, iters: Int,
      centroids: Array[(Long, Array[Double], Double)]): Unit =
    try {
      val rows = centroids.toSeq.map { case (cid, c, _) =>
        Row(fp, cid, c.toSeq)
      }
      table(spark, "ivf_centroids", key(fp, s"k=$k", s"iters=$iters"))
        .overwrite(spark.createDataFrame(
          spark.sparkContext.parallelize(rows, 1), CentroidSchema))
      ()
    } catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[index-store] centroid save skipped: $e")
    }

  /** Load centroids for (fingerprint, k, iters); None on miss, stale
    * fingerprint, or any read failure. Norms are recomputed with the
    * same fold the trainer uses, so a loaded quantizer is bit-identical
    * to the trained one (IndexStoreSpec asserts it).
    */
  private[graft] def loadCentroids(spark: SparkSession, fp: String,
      k: Int, iters: Int): Option[Array[(Long, Array[Double], Double)]] =
    try {
      val t = table(spark, "ivf_centroids", key(fp, s"k=$k", s"iters=$iters"))
      if (!t.exists) None
      else {
        val rows = t.read.collect()
        if (rows.length != k || rows.exists(_.getString(0) != fp)) None
        else Some(rows
          .map { r =>
            val c = r.getSeq[Double](2).toArray
            (r.getLong(1), c, math.sqrt(c.map(x => x * x).sum))
          }
          .sortBy(_._1))
      }
    } catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[index-store] centroid load skipped: $e")
        None
    }

  /** Persist the ENCODED IVF-PQ index — the corpus-sized (vec_id,
    * cell, codes, rnorm) table the probed candidate scan reads. Unlike
    * the tiny quantizers above, this is O(corpus) rows, so the dataset
    * fingerprint is validated from a sidecar next to the table root
    * rather than a per-row column (64 fp bytes per 8-byte code row
    * would quadruple the index). The keyed path + sidecar give the
    * same staleness guarantee: a rewritten dataset changes the key AND
    * the recorded fingerprint.
    *
    * STORED PARTITIONED BY CELL — the FAISS inverted-list layout on
    * parquet: each coarse cell's codes are their own partition dir, so
    * a probe that knows its cells driver-side reads ~nProbe/k of the
    * files via partition pruning instead of scanning every code row.
    * The key versions the layout (`part=cell`) so a pre-partitioning
    * store from an older build misses and is re-encoded rather than
    * served without pruning.
    */
  private[graft] def savePqIndex(spark: SparkSession, fp: String,
      index: org.apache.spark.sql.DataFrame): Unit =
    try {
      val k = key(fp, "pq_index", "part=cell")
      table(spark, "pq_index", k)
        .overwrite(index, partitionBy = Seq("cell"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$root/pq_index/$k/fingerprint.json"),
        graft.common.JsonIO.render(Map("fingerprint" -> fp)))
    } catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[index-store] pq-index save skipped: $e")
    }

  /** Load the encoded index for a fingerprint; None on miss, stale or
    * missing fingerprint sidecar, or any read failure. The partition
    * column comes back int-inferred from the `cell=N` dirs and LAST in
    * column order — restore the encode schema (cell: long, original
    * order) so the serve path is schema-identical to the encode path;
    * the optimizer unwraps the resulting cast when pruning.
    */
  private[graft] def loadPqIndex(spark: SparkSession,
      fp: String): Option[org.apache.spark.sql.DataFrame] =
    try {
      val k = key(fp, "pq_index", "part=cell")
      val t = table(spark, "pq_index", k)
      val sidecar = java.nio.file.Paths.get(
        s"$root/pq_index/$k/fingerprint.json")
      if (!t.exists || !java.nio.file.Files.exists(sidecar)) None
      else {
        val recorded = graft.common.Json.obj(
          graft.common.Json.parseFile(sidecar.toString))("fingerprint")
        if (recorded != fp) None
        else Some(t.read.select(functions.col("vec_id"),
          functions.col("cell").cast("long").as("cell"),
          functions.col("codes"), functions.col("rnorm")))
      }
    } catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[index-store] pq-index load skipped: $e")
        None
    }

  /** Persist the IVF index — (vec_id, embedding, cell) PARTITIONED BY
    * CELL: the inverted-file layout on parquet. Probing nProbe of k
    * cells becomes a partition-pruned read of ~nProbe/k of the files
    * instead of a full-corpus scan plus a per-vector re-assignment
    * (64 centroid dot products each) on every query — at 100 TB the
    * difference between touching 25 TB and touching 100 TB plus
    * recomputing the quantization. Fingerprint validation mirrors
    * [[savePqIndex]] (sidecar, not a per-row column).
    */
  private[graft] def saveIvfIndex(spark: SparkSession, fp: String,
      index: org.apache.spark.sql.DataFrame): Unit =
    try {
      val k = key(fp, "ivf_index")
      table(spark, "ivf_index", k).overwrite(index, partitionBy = Seq("cell"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$root/ivf_index/$k/fingerprint.json"),
        graft.common.JsonIO.render(Map("fingerprint" -> fp)))
    } catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[index-store] ivf-index save skipped: $e")
    }

  /** Load the cell-partitioned IVF index for a fingerprint; None on
    * miss, stale or missing fingerprint sidecar, or any read failure.
    * Schema normalized like [[loadPqIndex]]: partition-dir-inferred
    * `cell` cast back to long and restored to last-column order so the
    * serve path matches the assignment path bit-for-bit.
    */
  private[graft] def loadIvfIndex(spark: SparkSession,
      fp: String): Option[org.apache.spark.sql.DataFrame] =
    try {
      val k = key(fp, "ivf_index")
      val t = table(spark, "ivf_index", k)
      val sidecar = java.nio.file.Paths.get(
        s"$root/ivf_index/$k/fingerprint.json")
      if (!t.exists || !java.nio.file.Files.exists(sidecar)) None
      else {
        val recorded = graft.common.Json.obj(
          graft.common.Json.parseFile(sidecar.toString))("fingerprint")
        if (recorded != fp) None
        else Some(t.read.select(functions.col("vec_id"),
          functions.col("embedding"),
          functions.col("cell").cast("long").as("cell")))
      }
    } catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[index-store] ivf-index load skipped: $e")
        None
    }

  private val CodebookSchema = new StructType()
    .add("fingerprint", StringType)
    .add("subspace", IntegerType)
    .add("code", IntegerType)
    .add("components", ArrayType(DoubleType))

  /** Persist trained PQ codebooks for (fingerprint, m, kk, iters). */
  private[graft] def saveCodebooks(spark: SparkSession, fp: String,
      m: Int, kk: Int, iters: Int,
      books: Array[Array[Array[Double]]]): Unit =
    try {
      val rows = for {
        (sub, mi) <- books.toSeq.zipWithIndex
        (cw, k) <- sub.toSeq.zipWithIndex
      } yield Row(fp, mi, k, cw.toSeq)
      table(spark, "pq_codebooks", key(fp, s"m=$m", s"kk=$kk", s"iters=$iters"))
        .overwrite(spark.createDataFrame(
          spark.sparkContext.parallelize(rows, 1), CodebookSchema))
      ()
    } catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[index-store] codebook save skipped: $e")
    }

  /** Load codebooks for (fingerprint, m, kk, iters); None on miss,
    * stale fingerprint, shape mismatch, or any read failure. The
    * codebook count per subspace may be < kk when the training sample
    * was smaller than kk (small-SF corpora) — the stored shape is
    * authoritative as long as every subspace agrees.
    */
  private[graft] def loadCodebooks(spark: SparkSession, fp: String,
      m: Int, kk: Int,
      iters: Int): Option[Array[Array[Array[Double]]]] =
    try {
      val t = table(spark, "pq_codebooks",
        key(fp, s"m=$m", s"kk=$kk", s"iters=$iters"))
      if (!t.exists) None
      else {
        val rows = t.read.collect()
        if (rows.isEmpty || rows.exists(_.getString(0) != fp)) None
        else {
          val bySub = rows
            .map(r => (r.getInt(1), r.getInt(2), r.getSeq[Double](3).toArray))
            .groupBy(_._1)
          val sizes = bySub.values.map(_.length).toSet
          if (bySub.keySet != (0 until m).toSet || sizes.size != 1) None
          else Some(Array.tabulate(m)(mi =>
            bySub(mi).sortBy(_._2).map(_._3)))
        }
      }
    } catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[index-store] codebook load skipped: $e")
        None
    }
}
