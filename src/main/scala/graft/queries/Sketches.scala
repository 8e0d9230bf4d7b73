package graft.queries

import graft.QueryDef
import graft.common.Tables.load
import graft.functions.Text
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Frequency-sketch operators over the corpus term stream: the
  * approximate counterparts of the exact heavy-hitter scan (q61) for
  * cardinalities where a full `groupBy(term)` shuffle is the bottleneck.
  *
  * Two complementary shapes:
  *   - q103: Count-Min sketch — ONE mergeable 2 KB-per-partition summary
  *     replaces the term shuffle entirely; estimates carry the classic
  *     ε·N overcount bound, which the query audits row-by-row against
  *     exact counts (and the oracle re-audits in DuckDB).
  *   - q104: Misra-Gries map-side pruning — per-partition k-counter
  *     summaries nominate candidates (≤ k rows shuffle per partition, vs
  *     the full term cardinality), then ONE exact count restricted to
  *     the nominated terms rescores them. Any term with global frequency
  *     > N/k provably survives nomination (pigeonhole over partitions),
  *     so the top-20 is EXACT — the scan is unavoidable, the shuffle is
  *     what the sketch removes.
  */
object Sketches {

  // DuckDB mirrors of the Text.scala primitives (same strings as TextOps)
  private val NormSql = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
  private val WordsSql = s"string_split($NormSql, ' ')"
  private val OccSql =
    s"(SELECT unnest($WordsSql) AS term FROM documents)"

  private val TopK = 20
  private val Eps = 0.001
  private val Confidence = 0.99
  private val Seed = 42

  /** q103: exact top-20 terms, each audited against its Count-Min
    * estimate. `count_min_sketch` is Spark's native mergeable aggregate
    * (partial sketches per partition, bitwise merge at the driver —
    * no term shuffle); the exact side exists to make the ε·N guarantee
    * checkable. Both the engine and the oracle verify
    * exact ≤ estimate ≤ exact + ⌈ε·N⌉ per row.
    */
  private val q103 = QueryDef(
    (s, d) => {
      val occ = load(s, d, "documents")
        .select(explode(Text.words(col("text"))).as("term"))
      // one pass: total occurrences + the sketch (both map-side combined)
      val agg = occ.agg(
        count(lit(1)).as("n_total"),
        expr(s"count_min_sketch(term, ${Eps}d, ${Confidence}d, $Seed)")
          .as("cms")).head()
      val nTotal = agg.getLong(0)
      val sketch = CountMinSketch.readFrom(
        new java.io.ByteArrayInputStream(agg.getAs[Array[Byte]](1)))
      val bound = math.ceil(Eps * nTotal).toLong
      val top = occ.groupBy("term").agg(count(lit(1)).as("exact_n"))
        .orderBy(col("exact_n").desc, col("term").asc)
        .limit(TopK).collect()
      import s.implicits._
      top.toSeq.map { r =>
        val term = r.getString(0); val exact = r.getLong(1)
        val est = sketch.estimateCount(term)
        (term, exact, est, bound, est >= exact && est <= exact + bound)
      }.toDF("term", "exact_n", "cms_n", "bound", "within_bound")
    },
    Some(s"""WITH emitted AS (
              SELECT * FROM read_parquet(
                '${QueryDef.OutDirToken}/q103_cms_heavy_hitters/*.parquet')
            ), counts AS (
              SELECT term, CAST(count(*) AS BIGINT) AS n FROM $OccSql
              GROUP BY 1
            ), topk AS (
              SELECT term, n FROM counts ORDER BY n DESC, term LIMIT $TopK
            ), tot AS (
              SELECT CAST(count(*) AS BIGINT) AS n_total FROM $OccSql
            )
            SELECT e.term, e.exact_n, e.cms_n, e.bound, e.within_bound
            FROM emitted e
            JOIN topk t ON e.term = t.term AND e.exact_n = t.n
            CROSS JOIN tot
            WHERE e.bound = CAST(ceil($Eps * tot.n_total) AS BIGINT)
              AND e.within_bound
              AND e.cms_n >= e.exact_n
              AND e.cms_n <= e.exact_n + e.bound"""),
    "Count-Min heavy hitters: exact top-k audited against sketch bound [sketch]")

  /** Misra-Gries k-counter summary of one partition's term stream.
    * Classic decrement-on-overflow; survivors over-approximate every
    * term with partition frequency > N_p/k. The decrement step is the
    * textbook O(k) sweep — amortized O(1) per item in the usual
    * analysis, because a sweep of k counters pays for k prior arrivals.
    */
  private[graft] def misraGries(
      it: Iterator[String], k: Int): Iterator[(String, Long)] = {
    val counters = scala.collection.mutable.HashMap.empty[String, Long]
    it.foreach { t =>
      counters.get(t) match {
        case Some(c) => counters(t) = c + 1
        case None if counters.size < k => counters(t) = 1L
        case None =>
          val dead = List.newBuilder[String]
          counters.mapValuesInPlace((_, c) => c - 1)
          counters.foreach { case (key, c) => if (c == 0L) dead += key }
          dead.result().foreach(counters.remove)
      }
    }
    counters.iterator.map { case (t, c) => (t, c) }
  }

  /** Candidate budget per partition. The exactness condition is that
    * every true top-20 term has global frequency > N/k; k=400 gives a
    * >2x margin over the Zipf-expected frequency of rank 20 while the
    * nominated shuffle stays ≤ 400 rows per partition.
    */
  private val MgK = 400

  /** q104: exact top-20 terms computed WITHOUT shuffling the term
    * cardinality: per-partition Misra-Gries nominates ≤ k candidates
    * each, the driver unions the (bounded: k × partitions) candidate
    * set, and one broadcast-semi-join count pass rescores ONLY the
    * nominated terms exactly. Result identical to the full groupBy
    * (oracle is the plain exact SQL); the shuffle carries candidates
    * instead of every distinct term.
    */
  private val q104 = QueryDef(
    (s, d) => {
      import s.implicits._
      val occ = load(s, d, "documents")
        .select(explode(Text.words(col("text"))).as("term"))
      val candidates = occ.as[String]
        .mapPartitions(it => misraGries(it, MgK).map(_._1))
        .distinct().collect().toSeq // bounded: ≤ MgK × #partitions
      occ.join(broadcast(candidates.toDF("term")), Seq("term"), "inner")
        .groupBy("term").agg(count(lit(1)).as("n_occurrences"))
        .orderBy(col("n_occurrences").desc, col("term").asc)
        .limit(TopK)
    },
    Some(s"""SELECT term, CAST(count(*) AS BIGINT) AS n_occurrences
            FROM $OccSql GROUP BY 1
            ORDER BY n_occurrences DESC, term LIMIT $TopK"""),
    "Misra-Gries pruned exact top-k: map-side nomination, candidate-only shuffle [sketch]")

  val all: Seq[(String, QueryDef)] = Seq(
    "q103_cms_heavy_hitters" -> q103,
    "q104_mg_topk" -> q104)
}
