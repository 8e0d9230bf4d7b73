package graft

import graft.tables.ParquetTable
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants (SURVEY.md §5 plan): merge idempotence and
  * key uniqueness on the table layer, order-independence of the exact
  * aggregation helpers, dedupe-keeps-one on arbitrary duplicate
  * multiplicities. Generators are sampled with fixed seeds (the
  * scalatest-scalacheck bridge isn't in the offline cache).
  */
class PropertiesSpec extends AnyFunSuite with SparkSpec {

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      gen(Gen.Parameters.default, Seed(42L + i)))

  private def forAllSampled[A](gen: Gen[A], n: Int = 5)(body: A => Unit): Unit =
    samples(gen, n).foreach(body)

  private val kvGen: Gen[List[(Int, String)]] =
    Gen.listOfN(30, Gen.zip(Gen.choose(0, 9), Gen.alphaStr.map(_.take(5))))

  test("property: merge(merge(t,s),s) == merge(t,s) and keys stay unique") {
    import spark.implicits._
    forAllSampled(Gen.zip(kvGen, kvGen)) { case (target, source) =>
      if (target.nonEmpty && source.nonEmpty) {
        val root = Files.createTempDirectory("prop").toString
        val t = ParquetTable(spark, s"$root/t")
        // one row per key in both frames (merge semantics need keyed rows)
        val td = target.distinctBy(_._1).toDF("k", "v")
        val sd = source.distinctBy(_._1).toDF("k", "v")
        t.overwrite(td)
        t.merge(sd, Seq("k"))
        val once = t.read.orderBy("k", "v").collect().toSeq
        t.merge(sd, Seq("k"))
        val twice = t.read.orderBy("k", "v").collect().toSeq
        assert(once == twice)
        assert(t.read.groupBy("k").count()
          .filter(col("count") > 1).count() == 0)
      }
    }
  }

  test("property: dsum is invariant under row permutation and partitioning") {
    import spark.implicits._
    forAllSampled(Gen.listOfN(50, Gen.choose(-1e6, 1e6))) {
      xs: List[Double] =>
      if (xs.nonEmpty) {
        val rounded = xs.map(x => math.round(x * 100).toDouble / 100)
        val a = rounded.toDF("x").repartition(7)
          .agg(graft.common.Exact.dsum(col("x"))).collect()(0).getDouble(0)
        val b = rounded.reverse.toDF("x").repartition(3)
          .agg(graft.common.Exact.dsum(col("x"))).collect()(0).getDouble(0)
        assert(a == b)
      }
    }
  }

  test("property: keep-latest dedupe emits exactly one row per key") {
    import spark.implicits._
    forAllSampled(
      Gen.listOfN(40, Gen.zip(Gen.choose(0, 5), Gen.choose(1, 1000)))) {
      rows: List[(Int, Int)] =>
      if (rows.nonEmpty) {
        val df = rows.toDF("k", "seq")
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("k").orderBy(col("seq").desc, col("k").asc)
        val out = df.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
        assert(out.count() == rows.map(_._1).distinct.size)
        // the kept row carries the max seq per key
        val kept = out.select("k", "seq").collect()
          .map(r => r.getInt(0) -> r.getInt(1)).toMap
        val expected = rows.groupBy(_._1).view.mapValues(_.map(_._2).max)
        expected.foreach { case (k, v) => assert(kept(k) == v) }
      }
    }
  }
  test("property: greedy near-dup drops match the sequential online definition") {
    // the ONLINE contract: walk ids ascending; a doc drops iff it pairs
    // with an already-KEPT smaller id. greedyNearDupDrops computes it
    // in one victim-sorted pass; this property replays the definition
    // literally on random pair graphs and demands set equality.
    val genPairs = Gen.listOfN(60,
      for {
        a <- Gen.choose(0L, 19L)
        b <- Gen.choose(0L, 19L)
        if a != b
      } yield (math.min(a, b), math.max(a, b)))
    (1 to 50).foreach { i =>
      val pairs = genPairs(Gen.Parameters.default, Seed(i.toLong))
        .getOrElse(Nil).distinct
      val got = graft.queries.Dedup.greedyNearDupDrops(pairs.toArray)
      // sequential reference: process ids in order
      val ids = pairs.flatMap(p => Seq(p._1, p._2)).distinct.sorted
      val byVictim = pairs.groupBy(_._2)
      val dropped = scala.collection.mutable.HashSet.empty[Long]
      ids.foreach { id =>
        if (byVictim.getOrElse(id, Nil).exists(p => !dropped.contains(p._1)))
          dropped += id
      }
      assert(got == dropped.toSet, s"seed $i: $got != $dropped for $pairs")
    }
  }

}
