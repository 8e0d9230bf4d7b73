package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** Registry-wide plan-shape regression net: a golden snapshot of
  * (shuffle-exchange count, broadcast-nested-loop count, cartesian
  * count, global-sort count) for EVERY registered query, pinned at
  * sf0.001. PlanShapeSpec pins the handful of shapes PLANS.md argues
  * about in detail; this spec makes every OTHER query's physical shape
  * a test, so a future edit that adds an exchange, degrades a
  * broadcast-hash join to a nested loop, or introduces a global sort
  * fails here instead of waiting for a bench diff.
  *
  * The four counters are scale signals, not style checks:
  *   - shuffles: every extra hash/range exchange is a corpus-sized
  *     data movement at 100 TB;
  *   - bnlj: BroadcastNestedLoopJoin is only acceptable as the 1-row
  *     scalar-attach pattern (crossJoin(broadcast(agg))) — a COUNT
  *     change means a join lost its equi-key;
  *   - cartesian: never acceptable; the snapshot holds it at 0;
  *   - global sorts: a `Sort [...], true` above a corpus-sized frame
  *     is a single-machine bottleneck — top-k paths must plan as
  *     TakeOrderedAndProject instead (which this counter excludes).
  *
  * Intentional shape changes update the snapshot IN THE SAME COMMIT:
  * GRAFT_REGEN_PLAN_SHAPES=1 sbt "testOnly graft.PlanSnapshotSpec"
  * rewrites conf/plan_shapes.tsv; the diff then documents the change.
  */
class PlanSnapshotSpec extends AnyFunSuite with SparkSpec {

  private val GoldenPath = Paths.get("conf", "plan_shapes.tsv")

  private def shape(plan: String): String = {
    val shuffles =
      "Exchange (hashpartitioning|rangepartitioning|RoundRobinPartitioning)".r
        .findAllIn(plan).size
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
    val cartesian = "CartesianProduct".r.findAllIn(plan).size
    val globalSorts = "Sort \\[[^\\]]*\\], true".r.findAllIn(plan).size
    s"shuffles=$shuffles bnlj=$bnlj cartesian=$cartesian " +
      s"global_sorts=$globalSorts"
  }

  test("every registry query's physical plan shape matches the golden snapshot") {
    // memoized session frames (graph edges, index pins) make plan text
    // depend on which suite ran first; clearing them here makes this
    // spec's view deterministic regardless of suite order
    graft.common.Memos.clearAll()
    val current: Seq[(String, String)] = SparkEntry.registry.map {
      case (name, q) =>
        val plan = q.fn(spark, Sf).queryExecution.executedPlan.toString
        name -> shape(plan)
    }
    if (sys.env.contains("GRAFT_REGEN_PLAN_SHAPES") ||
        !Files.exists(GoldenPath)) {
      Files.createDirectories(GoldenPath.getParent)
      Files.write(GoldenPath,
        current.map { case (n, s) => s"$n\t$s" }.asJava)
      info(s"wrote ${current.size} shapes to $GoldenPath")
    } else {
      val golden = Files.readAllLines(GoldenPath).asScala
        .filter(_.nonEmpty).map { line =>
          val Array(n, s) = line.split("\t", 2); n -> s
        }.toMap
      val changed = current.collect {
        case (n, s) if golden.get(n).exists(_ != s) =>
          s"$n: golden '${golden(n)}' != current '$s'"
      }
      val missing = current.collect {
        case (n, _) if !golden.contains(n) => n
      }
      val orphaned = (golden.keySet -- current.map(_._1)).toSeq.sorted
      assert(changed.isEmpty && missing.isEmpty && orphaned.isEmpty,
        s"""plan shapes diverge from conf/plan_shapes.tsv —
           |changed:\n  ${changed.mkString("\n  ")}
           |new queries not in snapshot: ${missing.mkString(", ")}
           |snapshot rows without a query: ${orphaned.mkString(", ")}
           |If intentional: GRAFT_REGEN_PLAN_SHAPES=1 sbt "testOnly graft.PlanSnapshotSpec" and commit the tsv diff.""".stripMargin)
      // the two hard floors hold registry-wide even if the snapshot
      // is regenerated carelessly
      val cart = current.filter(_._2.contains("cartesian=") )
        .filterNot(_._2.contains("cartesian=0"))
      assert(cart.isEmpty, s"cartesian products: ${cart.map(_._1)}")
    }
  }
}
