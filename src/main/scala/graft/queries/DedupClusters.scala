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
    */
  def connectedComponents(spark: SparkSession, edges: DataFrame,
      maxIter: Int = 20, driverMaxEdges: Long = 10000000L): DataFrame = {
    val n = edges.count()
    if (n <= driverMaxEdges) driverComponents(spark, edges)
    else propagateComponents(spark, edges, maxIter)
  }

  /** Union-find with path compression, then min-id per root. */
  private def driverComponents(spark: SparkSession, edges: DataFrame): DataFrame = {
    import spark.implicits._
    val es = edges.select(col("d1").cast("long"), col("d2").cast("long"))
      .as[(Long, Long)].collect()
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x
      while (parent.getOrElse(c, c) != r) { // path compression
        val next = parent.getOrElse(c, c); parent(c) = r; c = next
      }
      r
    }
    es.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a)
      parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(ra) = rb
    }
    val nodes = es.flatMap { case (a, b) => Seq(a, b) }.distinct
    val minOfRoot = nodes.groupBy(find).map { case (r, ns) => r -> ns.min }
    nodes.map(nd => (nd, minOfRoot(find(nd)))).toSeq
      .toDF("node", "label")
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
