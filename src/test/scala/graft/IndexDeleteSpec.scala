package graft

import graft.queries.{GraphAnn, IvfPq, Similarity}
import graft.tables.IndexStore
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Deletes in the persisted-index lifecycle (round-14): corpus curation
  * drops rows (near-dup drops, takedowns) far more often than it
  * rewrites files, and before this round any removal meant a full index
  * rebuild. Now a delete appends tombstones beside the index; probes
  * MASK the dropped ids with no rebuild (build counters stay flat), and
  * past the threshold the set FOLDS into the index physically — a
  * file-granular copy-on-write delete — with the HNSW repair keeping
  * the min-degree guard true for orphaned partners.
  */
class IndexDeleteSpec extends AnyFunSuite with SparkSpec {

  private var savedRoot: Option[String] = None

  override def beforeAll(): Unit = {
    super.beforeAll()
    savedRoot = sys.props.get("graft.index.root")
    sys.props("graft.index.root") =
      java.nio.file.Files.createTempDirectory("graft_del_index").toString
    // drop EVERY session memo (walk frames, served indexes, centroids):
    // entries resolved under the previous store root must not leak into
    // this suite's fresh root
    graft.common.Memos.clearAll()
  }

  override def afterAll(): Unit = {
    savedRoot match {
      case Some(v) => sys.props("graft.index.root") = v
      case None => sys.props -= "graft.index.root"
    }
    graft.common.Memos.clearAll()
    super.afterAll()
  }

  private def returned(q: String): Seq[(Long, Long)] =
    SparkEntry.queries(q)(spark, Sf)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq

  private def perQueryCounts(q: String): Map[Long, Long] =
    SparkEntry.queries(q)(spark, Sf).groupBy("query_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("IVF: a delete batch masks probes with NO rebuild; results stay full") {
    val before = returned("q54_ann_ivf")
    val drop = before.map(_._2).distinct.take(2)
    val trainBefore = Similarity.kMeansTrainCount.get()
    val assignBefore = Similarity.cellAssignCount.get()
    IndexStore.addTombstones(spark, "ivf_index", Sf, drop)
    val after = returned("q54_ann_ivf")
    assert(after.forall { case (_, v) => !drop.contains(v) },
      s"dropped ids $drop still served")
    // masked BEFORE ranking: every query still fills its k=10
    assert(perQueryCounts("q54_ann_ivf").values.forall(_ == 10L))
    assert(Similarity.kMeansTrainCount.get() == trainBefore &&
      Similarity.cellAssignCount.get() == assignBefore,
      "a delete must never retrain or re-assign (build counters moved)")
    IndexStore.clearTombstones("ivf_index", Sf)
  }

  test("LSH: delete batch masks probes, bucket build counter flat") {
    val before = returned("q39_ann_lsh")
    val drop = before.map(_._2).distinct.take(2)
    val buildBefore = Similarity.lshBucketCount.get()
    IndexStore.addTombstones(spark, "lsh_index", Sf, drop)
    val after = returned("q39_ann_lsh")
    assert(after.forall { case (_, v) => !drop.contains(v) })
    assert(Similarity.lshBucketCount.get() == buildBefore)
    IndexStore.clearTombstones("lsh_index", Sf)
  }

  test("PQ: delete batch masks probes, encode counter flat") {
    val before = returned("q87_ann_ivfpq")
    val drop = before.map(_._2).distinct.take(2)
    val encodeBefore = IvfPq.encodeCount.get()
    IndexStore.addTombstones(spark, "pq_index", Sf, drop)
    val after = returned("q87_ann_ivfpq")
    assert(after.forall { case (_, v) => !drop.contains(v) })
    assert(IvfPq.encodeCount.get() == encodeBefore)
    IndexStore.clearTombstones("pq_index", Sf)
  }

  test("NSW: dropped nodes stay routable but never returnable; no rebuild") {
    val before = returned("q211_ann_graph")
    val drop = before.map(_._2).distinct.take(2)
    val buildBefore = GraphAnn.graphBuildCount.get()
    IndexStore.addTombstones(spark, "nsw_index", Sf, drop)
    val after = returned("q211_ann_graph")
    assert(after.forall { case (_, v) => !drop.contains(v) })
    // beam(32) masked pre-rank: each query still returns its 10
    assert(perQueryCounts("q211_ann_graph").values.forall(_ == 10L))
    assert(GraphAnn.graphBuildCount.get() == buildBefore,
      "a delete must never rebuild the graph")
    // the stored edge table still CONTAINS the dropped nodes (routing
    // waypoints until the fold — removing them early tears the walk)
    val edges = IndexStore.corpusIndexTable(spark, "nsw_index", Sf).read
    assert(edges.filter(col("u").isin(drop: _*)).count() > 0)
    IndexStore.clearTombstones("nsw_index", Sf)
  }

  test("IndexMain --tombstone is the takedown CLI: all four indexes mask at once") {
    val drop = returned("q54_ann_ivf").map(_._2).distinct.take(2)
    graft.pipeline.cli.IndexMain.main(Array(
      "--data", Sf, "--tombstone", drop.mkString(",")))
    Seq("q54_ann_ivf", "q39_ann_lsh", "q87_ann_ivfpq", "q211_ann_graph")
      .foreach { q =>
        assert(returned(q).forall { case (_, v) => !drop.contains(v) },
          s"$q still serves a taken-down id")
      }
    Seq("ivf_index", "lsh_index", "pq_index", "nsw_index")
      .foreach(IndexStore.clearTombstones(_, Sf))
  }

  test("a takedown masks ALL filtered paths, including the exact backstops") {
    // ADVICE r14: q274's beam-cap backstop brute-forced raw embeddings
    // without the mask, so a taken-down label=1 id was still served
    // whenever a query fell to the backstop — the COMMON path at sparse
    // filters. Drop ids that the filtered queries actually return and
    // assert none of the four filtered operators (scan paths AND
    // backstops) ever serves them again.
    val filteredQs = Seq("q273_ann_filtered", "q274_ann_graph_filtered",
      "q275_ann_ivfpq_filtered", "q276_ann_lsh_filtered")
    val drop = filteredQs.flatMap(q => returned(q).map(_._2)).distinct.take(3)
    assert(drop.nonEmpty)
    Seq("ivf_index", "lsh_index", "pq_index", "nsw_index")
      .foreach(k => IndexStore.addTombstones(spark, k, Sf, drop))
    try filteredQs.foreach { q =>
      assert(returned(q).forall { case (_, v) => !drop.contains(v) },
        s"$q still serves a taken-down id through its scan or backstop")
    } finally Seq("ivf_index", "lsh_index", "pq_index", "nsw_index")
      .foreach(IndexStore.clearTombstones(_, Sf))
  }

  test("IVF fold: past the threshold the index physically drops the rows") {
    val drop = returned("q54_ann_ivf").map(_._2).distinct.take(3)
    val trainBefore = Similarity.kMeansTrainCount.get()
    val assignBefore = Similarity.cellAssignCount.get()
    IndexStore.addTombstones(spark, "ivf_index", Sf, drop)
    sys.props("graft.index.tombstone.threshold") = "0"
    try {
      val (_, idx) = Similarity.resolveIvfIndex(spark, Sf) // triggers fold
      // tombstone table gone, rows physically absent from the table
      assert(IndexStore.tombstoneIds(spark, "ivf_index", Sf).isEmpty,
        "fold must clear the tombstone table")
      val t = IndexStore.corpusIndexTable(spark, "ivf_index", Sf)
      assert(t.read.filter(col("vec_id").isin(drop: _*)).count() == 0,
        "folded rows still present in the stored index")
      assert(idx.filter(col("vec_id").isin(drop: _*)).count() == 0)
      // a fold is a file-granular delete, never a rebuild
      assert(Similarity.kMeansTrainCount.get() == trainBefore &&
        Similarity.cellAssignCount.get() == assignBefore,
        "fold must not retrain or re-assign")
    } finally sys.props -= "graft.index.tombstone.threshold"
  }

  test("NSW fold repairs orphans: min-degree guard holds, no tomb edges remain") {
    returned("q211_ann_graph") // ensure the graph is built and served
    val t = IndexStore.corpusIndexTable(spark, "nsw_index", Sf)
    val edges0 = t.read.select("u", "v", "layer").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // force an orphan: pick a victim node and tombstone EVERY neighbor
    // it has (at every layer), so the fold's incident-edge delete would
    // leave it edgeless without the repair
    val byU = edges0.groupBy(_._1)
    val (victim, vEdges) = byU.minBy { case (u, es) =>
      (es.map(_._2).distinct.size, u) // fewest distinct neighbors
    }
    val drop = vEdges.map(_._2).distinct.toSeq
    assert(drop.nonEmpty)
    val nodesBefore = edges0.flatMap(e => Seq((e._1, e._3), (e._2, e._3)))
      .distinct.filterNot { case (n, _) => drop.contains(n) }
    IndexStore.addTombstones(spark, "nsw_index", Sf, drop)
    sys.props("graft.index.tombstone.threshold") = "0"
    try {
      GraphAnn.resolveGraphIndex(spark, Sf) // triggers fold + repair
      assert(IndexStore.tombstoneIds(spark, "nsw_index", Sf).isEmpty)
      val after = t.read.select("u", "v", "layer").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      // no surviving edge references a dropped node
      assert(after.forall { case (u, v, _) =>
        !drop.contains(u) && !drop.contains(v)
      }, "folded graph still references tombstoned nodes")
      // min-degree guard: every (node, layer) linked before the fold —
      // and not itself dropped — is still linked after it, including
      // the victim whose whole neighborhood died (the repair's job)
      val linkedAfter = after
        .flatMap(e => Seq((e._1, e._3), (e._2, e._3))).toSet
      val orphaned = nodesBefore.filterNot(linkedAfter.contains)
      assert(orphaned.isEmpty,
        s"min-degree guard broken after deletion fold: $orphaned")
      assert(linkedAfter.exists(_._1 == victim),
        "the engineered orphan was not repaired")
      // and the serve path still answers full top-10s
      assert(perQueryCounts("q211_ann_graph").values.forall(_ == 10L))
    } finally sys.props -= "graft.index.tombstone.threshold"
  }
}
