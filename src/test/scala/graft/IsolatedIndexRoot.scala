package graft

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Suite-private `graft.index.root` (round-15): any suite that runs the
  * corpus curation pass must mix this in, because curation now
  * AUTO-TOMBSTONES its drops against the ANN indexes — under a shared
  * store root those tombstones would mask vectors out of every later
  * suite's served index (and the suite would inherit earlier suites'
  * stores in turn). Same pattern as IndexDeleteSpec; memos are cleared
  * on both edges so plans resolved under one root never serve another.
  */
trait IsolatedIndexRoot extends BeforeAndAfterAll { self: AnyFunSuite =>
  private var savedIndexRoot: Option[String] = None

  override def beforeAll(): Unit = {
    super.beforeAll()
    savedIndexRoot = sys.props.get("graft.index.root")
    sys.props("graft.index.root") =
      java.nio.file.Files.createTempDirectory("graft_spec_index").toString
    graft.common.Memos.clearAll()
  }

  override def afterAll(): Unit = {
    savedIndexRoot match {
      case Some(v) => sys.props("graft.index.root") = v
      case None => sys.props -= "graft.index.root"
    }
    graft.common.Memos.clearAll()
    super.afterAll()
  }
}
