package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-12 operator semantics pinned against LOCAL recomputations:
  * the landmark multi-source BFS (q242) against a driver-side BFS over
  * the collected edge list, the weighted quartiles (q247) against a
  * brute-force cumulative-weight sweep, and the containment pairs
  * (q248) against per-pair gram-set arithmetic.
  */
class LandmarkAndContainmentSpec extends AnyFunSuite with SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, Sf)

  /** The co-purchase edge list (support >= 2, both directions),
    * recomputed independently of Graph.scala's cached frame.
    */
  private lazy val edges: Map[Long, Set[Long]] = {
    val li = graft.common.Tables.load(spark, Sf, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val pairs = li.groupBy(_._1).values.flatMap { rows =>
      val parts = rows.map(_._2).distinct.sorted
      for (i <- parts.indices; j <- i + 1 until parts.length)
        yield (parts(i), parts(j))
    }.groupBy(identity).filter(_._2.size >= 2).keys
    // (.keys, not .collect — collecting (u,v) pairs OUT of a Map builds
    // a Map again and silently collapses every pair sharing a u)
    val adj = scala.collection.mutable.Map.empty[Long, Set[Long]]
      .withDefaultValue(Set.empty)
    pairs.foreach { case (u, v) =>
      adj(u) = adj(u) + v; adj(v) = adj(v) + u
    }
    adj.toMap
  }

  test("q242 landmark BFS matches a local BFS at every radius") {
    val nodes = edges.keySet
    // same seed choice: 64 smallest keyed hashes (bijective, no ties)
    val p = 1000000007L
    val a = 2654435761L
    def h(id: Long) = ((id % p + 313131L % p) % p) * a % p
    val seeds = nodes.toSeq.sortBy(h).take(64)
    val rows = run("q242_landmark_bfs").collect()
    assert(rows.length == 4 * seeds.length)
    val bySeed = rows.groupBy(_.getAs[Long]("seed_rank"))
    assert(bySeed.keySet == (1L to seeds.length).toSet)
    seeds.zipWithIndex.foreach { case (seed, i) =>
      var frontier = Set(seed)
      var reached = Set(seed)
      val rs = bySeed(i + 1L).sortBy(_.getAs[Long]("radius"))
      assert(rs.forall(_.getAs[Long]("seed_part") == seed))
      (1 to 4).foreach { r =>
        val next = frontier.flatMap(edges.getOrElse(_, Set.empty)) -- reached
        reached ++= next
        frontier = next
        assert(rs(r - 1).getAs[Long]("n_reached") == reached.size,
          s"seed $seed radius $r")
      }
    }
  }

  test("q247 weighted quartiles match a local cumulative-weight sweep") {
    val li = graft.common.Tables.load(spark, Sf, "lineitem")
      .select(col("l_returnflag"),
        graft.common.Exact.cents(col("l_extendedprice")).as("v"),
        col("l_quantity").cast("long").as("w"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val rows = run("q247_weighted_quartiles").collect()
    assert(rows.map(_.getString(0)).toSet == li.map(_._1).toSet)
    rows.foreach { r =>
      val mode = r.getString(0)
      val g = li.filter(_._1 == mode).map(t => (t._2, t._3))
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
      val wTot = g.map(_._2).sum
      assert(r.getLong(1) == wTot, s"$mode total weight")
      def pick(k: Int): Long = {
        var cum = 0L
        g.find { case (_, wv) => cum += wv; cum * 4 >= wTot * k }.get._1
      }
      assert(r.getLong(2) == pick(1), s"$mode wp25")
      assert(r.getLong(3) == pick(2), s"$mode wp50")
      assert(r.getLong(4) == pick(3), s"$mode wp75")
    }
  }

  test("q248 containment pairs are exact against per-pair gram sets") {
    def grams(text: String): Set[String] = {
      val w = text.trim.toLowerCase(java.util.Locale.ROOT)
        .split("\\s+").filter(_.nonEmpty)
      if (w.length < 5) Set.empty
      else (0 to w.length - 5).map(i => w.slice(i, i + 5).mkString(" ")).toSet
    }
    val docs = graft.common.Tables.load(spark, Sf, "documents")
      .select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> grams(r.getString(1))).toMap
    val rows = run("q248_containment_dedup").collect()
    assert(rows.nonEmpty, "planted near-dups must surface as containment")
    rows.foreach { r =>
      val (in, out) = (r.getLong(0), r.getLong(1))
      assert(in != out)
      val (gi, go) = (docs(in), docs(out))
      assert(gi.size <= go.size, "inner must be the smaller gram set")
      assert(r.getLong(2) == gi.size && r.getLong(3) == go.size)
      val shared = (gi intersect go).size
      assert(r.getLong(4) == shared, s"pair ($in,$out) shared")
      assert(shared * 10L >= gi.size * 9L, "below the 0.9 threshold")
      assert(r.getDouble(5) == shared.toDouble / gi.size)
    }
  }
}
