package graft

import graft.common.{BoundedFrameMemo, Memos}
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** Session-memo lifecycle: memos that pin cluster state must be
  * bounded (LRU-evict + release on overflow) and centrally clearable
  * (`Memos.clearAll` at session teardown), so a long-lived
  * multi-corpus service never accretes pinned storage.
  */
class MemoEvictionSpec extends AnyFunSuite with SparkSpec {

  test("BoundedFrameMemo releases the least-recently-used entry on overflow") {
    val released = scala.collection.mutable.ArrayBuffer[String]()
    val memo = new BoundedFrameMemo[String](2, released += _)
    memo.getOrElseUpdate("dirA")("frameA")
    memo.getOrElseUpdate("dirB")("frameB")
    assert(memo.size == 2 && released.isEmpty)
    // touch A so B becomes the LRU entry, then overflow with C
    assert(memo.getOrElseUpdate("dirA")(fail("A must be memoized")) == "frameA")
    memo.getOrElseUpdate("dirC")("frameC")
    assert(released.toList == List("frameB"),
      "the UNTOUCHED entry must be the one released")
    assert(memo.contains("dirA") && memo.contains("dirC") &&
      !memo.contains("dirB") && memo.size == 2)
    // a re-request for the evicted corpus rebuilds rather than serving
    // a released frame
    assert(memo.getOrElseUpdate("dirB")("frameB2") == "frameB2")
    assert(released.toList == List("frameB", "frameA"))
  }

  test("BoundedFrameMemo with cap 1: the second corpus unpersists the first") {
    val released = scala.collection.mutable.ArrayBuffer[String]()
    val memo = new BoundedFrameMemo[String](1, released += _)
    memo.getOrElseUpdate("sfA")("pinnedA")
    memo.getOrElseUpdate("sfB")("pinnedB")
    assert(released.toList == List("pinnedA") && memo.size == 1)
    memo.clear()
    assert(released.toList == List("pinnedA", "pinnedB") && memo.size == 0)
  }

  test("Memos.clearAll unpersists the graph frames pinned across two corpora") {
    // the second corpus is a SIBLING of the configured one (any other
    // sf* dir next to Sf) so the suite doesn't hardcode a machine path;
    // cancel (not fail) where the fixture tree has only one scale
    val sfPath = java.nio.file.Paths.get(Sf)
    val sibling = Option(sfPath.getParent)
      .map(java.nio.file.Files.list(_))
      .toSeq.flatMap { s =>
        try s.iterator().asScala.toSeq finally s.close()
      }
      .filter(p => java.nio.file.Files.isDirectory(p) &&
        p.getFileName.toString.startsWith("sf") && p != sfPath)
      .sortBy(_.getFileName.toString)
      .headOption
      .getOrElse(cancel(s"no sibling sf* corpus next to $Sf"))
    val sc = spark.sparkContext
    // count only CACHE pins: fixed-point queries leave localCheckpoint
    // RDDs behind that the context cleaner collects nondeterministically
    // — they are not memo state and would make raw counts flaky
    // (isLocallyCheckpointed is private[spark] to scalac but public in
    // bytecode — reflection reaches it)
    val isLocalCkpt =
      classOf[org.apache.spark.rdd.RDD[_]].getMethod("isLocallyCheckpointed")
    def pinned(): Int = sc.getPersistentRDDs.values
      .count(r => !isLocalCkpt.invoke(r).asInstanceOf[Boolean])
    Memos.clearAll() // drop anything earlier suites pinned through memos
    val before = pinned()
    // two corpora → two pinned degree-edge frames (within the memo cap)
    SparkEntry.queries("q140_pagerank")(spark, Sf).count()
    SparkEntry.queries("q140_pagerank")(spark, sibling.toString).count()
    val during = pinned()
    assert(during >= before + 2,
      s"expected a pinned edge frame per corpus (before=$before during=$during)")
    assert(Memos.registered.contains("graph.frames"))
    Memos.clearAll()
    assert(pinned() <= during - 2,
      "clearAll must unpersist the graph session frames")
    // and the memo rebuilds on demand afterwards
    assert(SparkEntry.queries("q140_pagerank")(spark, Sf).count() > 0)
    Memos.clearAll()
  }
}
