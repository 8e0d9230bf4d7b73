package graft.queries

import graft.QueryDef
import graft.common.Tables.load
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Near-dup clustering: connected components over the Jaccard>=0.8 pair
  * graph, labeling every clustered document with min(doc_id) of its
  * component — the step that turns pairwise near-dup evidence into "keep
  * one canonical doc per cluster".
  *
  * Implementation is iterative min-label propagation (the standard
  * Spark CC shape without GraphX): each round joins labels across edges
  * and keeps the per-node min; convergence when no label changes.
  * Rounds needed = graph diameter (near-dup clusters are tiny chains, so
  * 2-4 rounds); each round is one shuffle join on doc_id. At 100 TB the
  * same loop runs with checkpointing every few rounds to cut lineage.
  */
object DedupClusters {

  /** Connected components over an undirected edge list (d1, d2).
    * Strategy by size: a near-dup pair set is by construction a tiny
    * fraction of the corpus, so below `driverMaxEdges` the edges are
    * collected and solved with union-find (microseconds, no jobs beyond
    * the collect); above it the distributed min-label propagation loop
    * runs. Both label every node with its component's min id.
    *
    * The driver path is all primitive arrays — no boxed per-entry
    * objects. At the 1M-edge threshold: collected tuple array ~40 MB
    * (transient, 40 B per specialized Tuple2), src/dst 8 MB each,
    * sorted node-id array ≤16 MB (≤2M longs), parent index array ≤8 MB
    * — ≤~120 MB peak, comfortably inside any driver heap. The previous
    * boxed HashMap[Long,Long] was ~100 B/entry, which at its 10M-edge
    * threshold meant multi-GB; DedupSkewSpec exercises this path at
    * 200k edges.
    */
  def connectedComponents(spark: SparkSession, edges: DataFrame,
      maxIter: Int = 20, driverMaxEdges: Long = 1000000L): DataFrame = {
    // the edge plan may be expensive (LSH candidates + exact verify);
    // persist it so the size probe and the solve don't run it twice
    val cached = edges.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = cached.count()
      if (n <= driverMaxEdges) driverComponents(spark, cached)
      else propagateComponents(spark, cached, maxIter)
    } finally cached.unpersist(blocking = false)
  }

  /** Union-find over dense int indexes (path halving + union toward the
    * lower root index), then min-id per root. Node ids are compacted to
    * 0..m-1 via one sorted primitive array + binary search; every working
    * structure is a primitive array.
    */
  private def driverComponents(spark: SparkSession,
      edges: DataFrame): DataFrame = {
    import spark.implicits._
    val es = edges.select(col("d1").cast("long"), col("d2").cast("long"))
      .as[(Long, Long)].collect()
    val ne = es.length
    val src = new Array[Long](ne)
    val dst = new Array[Long](ne)
    var i = 0
    while (i < ne) { src(i) = es(i)._1; dst(i) = es(i)._2; i += 1 }

    // compact node ids: sorted unique array; id -> index by binary search
    val all = new Array[Long](2 * ne)
    System.arraycopy(src, 0, all, 0, ne)
    System.arraycopy(dst, 0, all, ne, ne)
    java.util.Arrays.sort(all)
    var m = 0
    i = 0
    while (i < all.length) {
      if (m == 0 || all(i) != all(m - 1)) { all(m) = all(i); m += 1 }
      i += 1
    }
    val nodes = java.util.Arrays.copyOf(all, m) // ascending unique ids
    def idx(id: Long): Int = java.util.Arrays.binarySearch(nodes, id)

    val parent = new Array[Int](m)
    i = 0
    while (i < m) { parent(i) = i; i += 1 }
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) {
        parent(r) = parent(parent(r)) // path halving
        r = parent(r)
      }
      r
    }
    i = 0
    while (i < ne) {
      val ra = find(idx(src(i)))
      val rb = find(idx(dst(i)))
      if (ra != rb) {
        // union toward the lower index = lower node id (ids are sorted),
        // so every root's index is its component's min-id index
        if (ra < rb) parent(rb) = ra else parent(ra) = rb
      }
      i += 1
    }

    val out = new Array[(Long, Long)](m)
    i = 0
    while (i < m) { out(i) = (nodes(i), nodes(find(i))); i += 1 }
    out.toSeq.toDF("node", "label")
  }

  /** Distributed min-label propagation (the 100 TB path). Min labels
    * advance one hop per round, so rounds needed = graph diameter;
    * hitting `maxIter` without convergence means the labels are WRONG
    * (components would be split), so it throws rather than returning
    * silently. Lineage is truncated with a localCheckpoint every few
    * rounds — an iterative plan otherwise grows one join/agg layer per
    * round until analysis itself dominates (a durable `checkpoint()` to
    * a cluster-visible dir is the production variant).
    */
  private val CheckpointEvery = 5

  private def propagateComponents(spark: SparkSession, edges: DataFrame,
      maxIter: Int): DataFrame = {
    // undirected: propagate both ways
    val sym = edges.select(col("d1").as("src"), col("d2").as("dst"))
      .unionByName(edges.select(col("d2").as("src"), col("d1").as("dst")))
      .distinct().persist()
    var labels = sym.select(col("src").as("node")).distinct()
      .withColumn("label", col("node")).persist()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // per-node min of (own label, neighbors' labels)
      val fromNeighbors = sym
        .join(labels.withColumnRenamed("node", "dst"), "dst")
        .groupBy(col("src").as("node"))
        .agg(min(col("label")).as("nlabel"))
      val step = labels.join(fromNeighbors, Seq("node"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("nlabel"), col("label")))
            .as("label"))
      val next = (if (iter % CheckpointEvery == CheckpointEvery - 1)
        step.localCheckpoint() else step).persist()
      val changed = next.join(labels.withColumnRenamed("label", "old"), "node")
        .filter(col("label") =!= col("old")).limit(1).count() > 0
      labels.unpersist()
      labels = next
      converged = !changed
      iter += 1
    }
    sym.unpersist()
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIter rounds — " +
          "graph diameter exceeds maxIter and the labels would be wrong; " +
          "raise maxIter")
    labels
  }

  /** Clusters over the q35 near-dup pairs: (doc_id, cluster_id) for every
    * document with at least one near-dup, cluster_id = min doc_id of the
    * component. The oracle computes the same fixpoint with a recursive
    * CTE (min reachable id == component minimum on an undirected graph).
    */
  private val q59 = QueryDef(
    (s, d) => {
      // Edges come from the MinHash-LSH path, NOT the gram self-join:
      // band buckets bound the candidate fan-out by construction (no
      // boilerplate-gram quadratic blowup), and the exact-verify step
      // emits the same >= 0.8 pairs as q35 minus a ~2e-4 worst-case miss
      // probability (~0 at the corpus's planted ~0.99 similarity —
      // ApproxOpsSpec asserts LSH == exact pair-for-pair).
      val pairs = Dedup.lshNearDupPairs(s, d)
      connectedComponents(s, pairs)
        .select(col("node").as("doc_id"), col("label").as("cluster_id"))
    },
    Some(s"""WITH RECURSIVE g AS (
              SELECT doc_id, unnest(${Dedup.GramsOracleSql}) AS gram FROM documents
            ), n AS (
              SELECT doc_id, count(*) AS ng FROM g GROUP BY 1
            ), pairs AS (
              SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS shared
              FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            ), near AS (
              SELECT d1, d2
              FROM pairs JOIN n n1 ON d1 = n1.doc_id JOIN n n2 ON d2 = n2.doc_id
              WHERE CAST(shared AS DOUBLE) / (n1.ng + n2.ng - shared) >= 0.8
            ), edges AS (
              SELECT d1 AS src, d2 AS dst FROM near
              UNION SELECT d2, d1 FROM near
            ), comp AS (
              SELECT DISTINCT src AS node, src AS label FROM edges
              UNION
              SELECT e.src, c.label FROM edges e JOIN comp c ON e.dst = c.node
            )
            SELECT node AS doc_id, CAST(min(label) AS BIGINT) AS cluster_id
            FROM comp GROUP BY node"""),
    "near-dup clusters via iterative connected components [dedup]")

  def all: Seq[(String, QueryDef)] = Seq("q59_dedup_clusters" -> q59)
}
