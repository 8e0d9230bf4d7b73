package graft.common

import scala.collection.concurrent.TrieMap

/** Session-memo governance. Several query families memoize expensive
  * session state keyed by corpus dir — Graph pins cached edge frames,
  * the ANN family memoizes resolved index plans and trained centroids.
  * Each memo is individually justified (bench's min-of-2 and repeat
  * index probes would otherwise rebuild per execution), but an
  * UNBOUNDED memo in a long-lived multi-corpus service accretes pinned
  * executor storage forever. Two controls close that:
  *
  *   - every memo holder registers a clear hook here, so one
  *     [[Memos.clearAll]] call (wire it to session teardown, or call
  *     it between corpora) releases every pinned frame and cached
  *     plan in the process;
  *   - pinned-frame memos use [[BoundedFrameMemo]], which caps live
  *     entries and unpersists the least-recently-used entry on
  *     overflow — a corpus sweep over N dirs holds at most `cap`
  *     cached frames at any moment.
  */
object Memos {

  private val clearers = TrieMap.empty[String, () => Unit]

  /** Register (idempotently, by name) a hook that drops one memo's
    * state and unpersists anything it pinned.
    */
  def register(name: String)(clear: () => Unit): Unit =
    clearers.put(name, clear)

  /** Registered memo names (test/introspection hook). */
  def registered: Set[String] = clearers.keySet.toSet

  /** Drop every registered session memo — pinned frames unpersist,
    * resolved-plan and centroid caches empty. Safe to call at any
    * point; subsequent queries rebuild on demand.
    */
  def clearAll(): Unit = clearers.values.foreach(_.apply())
}

/** An insertion-refreshed bounded memo for session state that PINS
  * cluster resources (cached DataFrames): at most `cap` entries stay
  * live, and inserting beyond the cap evicts — and releases, via
  * `release` — the least-recently-USED entry. Lookups refresh
  * recency, so the bench's repeat invocations and a hot corpus keep
  * their frames while a multi-corpus sweep cycles through without
  * accreting pinned storage.
  */
final class BoundedFrameMemo[V](cap: Int, release: V => Unit) {
  require(cap >= 1, "cap must be >= 1")

  private val m = new java.util.LinkedHashMap[String, V](16, 0.75f, true)

  def getOrElseUpdate(key: String)(build: => V): V = synchronized {
    val cur = m.get(key)
    if (cur != null) cur
    else {
      val v = build
      m.put(key, v)
      while (m.size > cap) {
        val it = m.entrySet().iterator()
        val oldest = it.next()
        release(oldest.getValue)
        it.remove()
      }
      v
    }
  }

  def contains(key: String): Boolean = synchronized(m.containsKey(key))

  def size: Int = synchronized(m.size)

  def clear(): Unit = synchronized {
    m.values.forEach(v => release(v))
    m.clear()
  }
}
