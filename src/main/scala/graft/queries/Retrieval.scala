package graft.queries

import graft.QueryDef
import graft.common.Tables.load
import graft.functions.Text._
import org.apache.spark.sql.functions._

/** Keyword-retrieval scoring over the corpus: BM25 ranked top-k for a
  * bounded user-query term set. Complements q113's inverted-index BUILD
  * (the artifact) with the QUERY-side operator a retrieval/dedup service
  * actually runs — the classic Robertson/Spärck Jones BM25 form
  * (k1 = 1.2, b = 0.75, the +1 idf variant that never goes negative).
  *
  * The reference has no retrieval surface; this is a training-data
  * extension (builder brief / SURVEY.md §7.5) — decontamination and
  * near-dup triage both start from "which docs score high for these
  * probe terms".
  */
object Retrieval {

  private val K1 = 1.2
  private val B = 0.75
  private val TopK = 10

  /** Probe terms — the bounded "user query" side. At scale this is the
    * small side by construction (a query has a handful of terms), so the
    * per-term df table and the corpus stats row are broadcast, never
    * shuffled.
    */
  private[graft] val QueryTerms =
    Seq("vector", "hash", "stream", "filter", "scan", "merge")

  /** q115: BM25 top-k per probe term.
    *
    * Scale: the corpus-wide work is one narrow scan projecting
    * (doc_id, words) and ONE explode FILTERED to the probe-term set
    * before it reaches any exchange — the shuffle carries only matching
    * (term, doc) postings, not the corpus. df is a count-over-term
    * window and the top-k a row_number window on the SAME term
    * partitioning, so postings shuffle once and the corpus is never
    * re-read for df; the (N, avgdl) stats row joins as a broadcast.
    * Same bounded-partition shape as q113: with a handful of probe
    * terms the sort is per-posting-list, WindowGroupLimit caps the
    * ranked rows, and the k cap bounds the emitted set.
    *
    * Oracle: integer evidence (tf, dl, df) compares exactly; the score
    * is ln-based so DuckDB recomputes it from the SAME integer evidence
    * and keeps rows within 1e-9 (q110's tolerance-contract idiom); the
    * rank is re-derived from the EMITTED scores (the ANN-oracle idiom),
    * and per-term completeness is pinned by requiring exactly
    * least(k, df) surviving rows per term.
    */
  private val q115 = QueryDef(
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = load(s, d, "documents")
        .select(col("doc_id"), words(col("text")).as("w"))
        .select(col("doc_id"), col("w"), size(col("w")).cast("long").as("dl"))
      val stats = docs.agg(
        count(lit(1)).as("n_docs"), avg("dl").as("avgdl"))
      val tf = docs
        .select(col("doc_id"), col("dl"), explode(col("w")).as("term"))
        .filter(col("term").isin(QueryTerms: _*))
        .groupBy("term", "doc_id", "dl")
        .agg(count(lit(1)).as("tf"))
      // df as a count-over-term window, NOT a separate aggregate+join:
      // a second aggregate would re-scan and re-explode the corpus (no
      // exchange reuse across the branches); the window rides the same
      // term exchange the top-k already pays, so the corpus is exploded
      // exactly once (PlanShapeSpec pins the 2-exchange shape).
      val scored = tf
        .withColumn("df", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("term")))
        .crossJoin(broadcast(stats))
        .withColumn("score",
          log(lit(1.0) +
            (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          (col("tf") * lit(K1 + 1.0)) /
          (col("tf") + lit(K1) *
            (lit(1.0 - B) + lit(B) * col("dl") / col("avgdl"))))
      scored
        .withColumn("rnk", row_number().over(
          Window.partitionBy("term")
            .orderBy(col("score").desc, col("doc_id"))))
        .filter(col("rnk") <= TopK)
        .select("term", "doc_id", "tf", "dl", "df", "score", "rnk")
    },
    Some {
      val WordsSql =
        "string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')"
      val terms = QueryTerms.map(t => s"'$t'").mkString(", ")
      s"""WITH emitted AS (
            SELECT * FROM read_parquet(
              '${graft.QueryDef.OutDirToken}/q115_bm25_topk/*.parquet')
          ), dl AS (
            SELECT doc_id, CAST(len($WordsSql) AS BIGINT) AS dl
            FROM documents
          ), stats AS (
            SELECT CAST(count(*) AS BIGINT) AS n_docs, AVG(dl) AS avgdl
            FROM dl
          ), t AS (
            SELECT doc_id, unnest($WordsSql) AS term FROM documents
          ), tf AS (
            SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
            FROM t WHERE term IN ($terms) GROUP BY 1, 2
          ), dfx AS (
            SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
          ), calc AS (
            SELECT tf.term, tf.doc_id, tf.tf, dl.dl, dfx.df,
              ln(1.0 + (stats.n_docs - dfx.df + 0.5) / (dfx.df + 0.5)) *
                (tf.tf * ${K1 + 1.0}) /
                (tf.tf + $K1 * (${1.0 - B} + $B * dl.dl / stats.avgdl))
                AS score
            FROM tf
            JOIN dl ON tf.doc_id = dl.doc_id
            JOIN dfx ON tf.term = dfx.term, stats
          ), chk AS (
            SELECT e.term, e.doc_id, e.tf, e.dl, e.df, e.score, e.rnk
            FROM emitted e
            JOIN calc c ON e.term = c.term AND e.doc_id = c.doc_id
              AND e.tf = c.tf AND e.dl = c.dl AND e.df = c.df
            WHERE abs(e.score - c.score) < 1e-9
          ), cnt AS (
            SELECT term, CAST(count(*) AS BIGINT) AS c FROM chk GROUP BY 1
          ), rr AS (
            SELECT chk.*, cnt.c,
              ROW_NUMBER() OVER (PARTITION BY chk.term
                ORDER BY chk.score DESC, chk.doc_id) AS rn
            FROM chk JOIN cnt ON chk.term = cnt.term
          )
          SELECT term, doc_id, tf, dl, df, score, rnk
          FROM rr WHERE rnk = rn AND c = least($TopK, df)"""
    },
    "BM25 top-k retrieval: broadcast df/stats, tolerance+rank oracle [retrieval]")

  private val RrfK = 60
  private val RrfTopK = 10

  /** q122: hybrid retrieval via reciprocal rank fusion — a LEXICAL
    * ranker (distinct-word overlap with the query document) and a DENSE
    * ranker (embedding cosine) over the same candidate set, fused with
    * RRF: 1/(60+r_lex) + 1/(60+r_dense), top-10 per query. This is the
    * production hybrid-search shape (BM25 ⊕ vector search); the corpus
    * is the documents that HAVE embeddings (doc_id = vec_id — at sf0.1
    * only a subset of docs carry vectors, exactly the real-world
    * partial-coverage case). Candidates with zero lexical overlap have
    * no lexical rank and contribute only their dense term.
    *
    * Scale: one scan of the joined corpus with the 20-query probe side
    * broadcast; BOTH signals (array_intersect size + cosine) compute in
    * the same codegen stage over that one pass. The two rank windows
    * and the final top-k all partition by query_id → one exchange. At
    * corpus scale each ranker's candidate source is its index path
    * (q113/q115 postings for lexical, q39/q54 cells for dense) and the
    * fusion runs on top-k' lists, tiny by construction — the fusion
    * arithmetic here is unchanged.
    *
    * Float parity: exact, full row-set oracle — overlap is an integer,
    * the cosine is the order-fixed fold, and RRF is two exact divisions
    * added once; both rank orders sort on exact values with doc_id
    * tie-breaks. No tolerance contract needed.
    */
  private val q122 = QueryDef(
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val corpus = load(s, d, "documents")
        .select(col("doc_id"), array_distinct(words(col("text"))).as("w"))
        .join(load(s, d, "embeddings"),
          col("doc_id") === col("vec_id"))
        .select(col("doc_id"), col("w"), col("embedding"))
      val q = corpus.filter(col("doc_id") < 20)
        .select(col("doc_id").as("query_id"), col("w").as("qw"),
          col("embedding").as("qv"))
      val byQuery = Window.partitionBy(col("query_id"))
      val scored = corpus.join(broadcast(q),
          col("doc_id") =!= col("query_id"))
        .select(col("query_id"), col("doc_id"),
          size(array_intersect(col("w"), col("qw"))).cast("long")
            .as("overlap"),
          Similarity.fastCosine(s)(col("qv"), col("embedding"))
            .as("cos_score"))
        // overlap DESC puts the zero-overlap tail last, so ranks 1..m
        // are exactly the candidates with lexical evidence; the rest
        // null out (no lexical rank) in the same single window
        .withColumn("rl_all", row_number().over(
          byQuery.orderBy(col("overlap").desc, col("doc_id").asc)))
        .withColumn("rank_lex",
          when(col("overlap") > 0, col("rl_all").cast("int")))
        .withColumn("rank_dense", row_number().over(
          byQuery.orderBy(col("cos_score").desc, col("doc_id").asc))
          .cast("int"))
        .withColumn("rrf",
          when(col("overlap") > 0,
            lit(1.0) / (lit(RrfK) + col("rl_all"))).otherwise(lit(0.0)) +
            lit(1.0) / (lit(RrfK) + col("rank_dense")))
      scored
        .withColumn("rn", row_number().over(
          byQuery.orderBy(col("rrf").desc, col("doc_id").asc)))
        .filter(col("rn") <= RrfTopK)
        .select(col("query_id"), col("doc_id"), col("overlap"),
          col("cos_score"), col("rank_lex"), col("rank_dense"),
          col("rrf"), col("rn").cast("int").as("rn"))
    },
    Some {
      val WordsSql =
        "list_distinct(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '))"
      s"""WITH corpus AS (
              SELECT d.doc_id, $WordsSql AS w, e.embedding
              FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
            ), q AS (
              SELECT doc_id AS query_id, w AS qw, embedding AS qv
              FROM corpus WHERE doc_id < 20
            ), scored AS (
              SELECT q.query_id, c.doc_id,
                CAST(len(list_intersect(c.w, q.qw)) AS BIGINT) AS overlap,
                ${Similarity.cosineSql("q.qv", "c.embedding")} AS cos_score
              FROM corpus c JOIN q ON c.doc_id <> q.query_id
            ), ranked AS (
              SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                  ORDER BY overlap DESC, doc_id ASC) AS rl_all,
                CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                  ORDER BY cos_score DESC, doc_id ASC) AS INTEGER)
                  AS rank_dense
              FROM scored
            ), fused AS (
              SELECT query_id, doc_id, overlap, cos_score,
                CASE WHEN overlap > 0 THEN CAST(rl_all AS INTEGER) END
                  AS rank_lex,
                rank_dense,
                CASE WHEN overlap > 0 THEN 1.0 / ($RrfK + rl_all)
                     ELSE 0.0 END + 1.0 / ($RrfK + rank_dense) AS rrf
              FROM ranked
            )
            SELECT query_id, doc_id, overlap, cos_score, rank_lex,
              rank_dense, rrf, CAST(rn AS INTEGER) AS rn
            FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY rrf DESC, doc_id ASC) AS rn FROM fused)
            WHERE rn <= $RrfTopK"""
    },
    "hybrid RRF fusion of lexical + dense rankers: exact full-row oracle [retrieval]")

  /** Phrase queries for q219 — the bounded user-query side, like
    * [[QueryTerms]].
    */
  private[graft] val Phrases =
    Seq("table scan", "hash join", "merge sort")

  /** q219: exact positional phrase search — the query-side twin of
    * q113's positional inverted index: for each two-word phrase, every
    * document containing the words ADJACENT in order, with the exact
    * occurrence count and first hit position. BM25 (q115) treats a
    * query as a bag of words; decontamination and quote-detection need
    * the phrase form (a doc containing "table" and "scan" separately
    * is not a leak of "table scan").
    *
    * Scale: the corpus pays ONE narrow (doc_id, words) scan and one
    * posexplode whose output is filtered to the phrase VOCABULARY
    * before any exchange — the shuffle carries only postings of the
    * handful of query words, never the corpus. Adjacency is an
    * equi-join on (doc_id, pos+1) over those bounded postings (never
    * an inequality join), and the per-(phrase, doc) rollup rides the
    * same doc-keyed locality. The phrase table is a LocalRelation.
    *
    * Exactness: positions, counts, and the first-position min are pure
    * integers — the oracle compares hash-exact.
    */
  private val q219 = QueryDef(
    (s, d) => {
      val phrases = {
        import s.implicits._
        Phrases.map { p =>
          val Array(w1, w2) = p.split(" "); (p, w1, w2)
        }.toDF("phrase", "w1", "w2")
      }
      val vocab = Phrases.flatMap(_.split(" ")).distinct
      val postings = load(s, d, "documents")
        .select(col("doc_id"), posexplode(words(col("text"))))
        .filter(col("col").isin(vocab: _*))
        .select(col("doc_id"), (col("pos") + 1L).as("pos"),
          col("col").as("term"))
      val first = postings.as("a")
        .join(broadcast(phrases), col("a.term") === col("w1"))
      first
        .join(postings.as("b"),
          col("b.doc_id") === col("a.doc_id") &&
            col("b.pos") === col("a.pos") + 1L &&
            col("b.term") === col("w2"))
        .groupBy(col("phrase"), col("a.doc_id").as("doc_id"))
        .agg(graft.common.Exact.lcountAll.as("n_matches"),
          min(col("a.pos")).cast("long").as("first_pos"))
    },
    Some {
      val WordsSql =
        "string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')"
      val vocab = Phrases.flatMap(_.split(" ")).distinct
        .map(t => s"'$t'").mkString(", ")
      val phraseRows = Phrases.map { p =>
        val Array(w1, w2) = p.split(" ")
        s"('$p', '$w1', '$w2')"
      }.mkString(", ")
      s"""WITH w AS (
            SELECT doc_id, $WordsSql AS w FROM documents
          ), toks AS (
            SELECT doc_id,
              unnest(generate_series(1, len(w))) AS pos, w
            FROM w
          ), postings AS (
            SELECT doc_id, CAST(pos AS BIGINT) AS pos, w[pos] AS term
            FROM toks WHERE w[pos] IN ($vocab)
          ), phrases(phrase, w1, w2) AS (
            VALUES $phraseRows
          )
          SELECT p.phrase, a.doc_id,
            CAST(count(*) AS BIGINT) AS n_matches,
            CAST(MIN(a.pos) AS BIGINT) AS first_pos
          FROM postings a
          JOIN phrases p ON a.term = p.w1
          JOIN postings b ON b.doc_id = a.doc_id
            AND b.pos = a.pos + 1 AND b.term = p.w2
          GROUP BY 1, 2"""
    },
    "exact positional phrase search: vocabulary-filtered postings, " +
      "adjacency equi-join [retrieval]")

  /** Dirichlet-smoothing pseudo-count of q240's query-likelihood
    * scorer (μ = 2000, the standard Zhai–Lafferty setting).
    */
  private val Mu = 2000.0

  /** q240: Dirichlet-smoothed query-likelihood retrieval — the second
    * classic probabilistic ranker beside q115's BM25 (Zhai & Lafferty
    * 2001: rank docs by ln((tf + μ·p_c(w)) / (dl + μ)), where p_c is
    * the term's collection-frequency share). Running BOTH standard
    * scorers over the same posting machinery is what lets a retrieval
    * quality audit (q122's fusion, q230's NDCG) compare ranker
    * families instead of trusting one.
    *
    * Scale: identical plan discipline to q115 — one narrow scan, the
    * explode FILTERED to the probe terms before any exchange, cf as a
    * sum-over-term window riding the SAME term exchange the top-k
    * pays (never a second corpus pass), and the (total_tokens) scalar
    * broadcast. WindowGroupLimit caps the ranked rows per term.
    *
    * Oracle: integer evidence (tf, dl, cf) joins bit-exact; the ln
    * score recomputes under the 1e-9 contract; the rank is re-derived
    * from the EMITTED scores and per-term completeness pinned at
    * least(k, df) surviving rows (q115's full oracle idiom).
    */
  private val q240 = QueryDef(
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = load(s, d, "documents")
        .select(col("doc_id"), words(col("text")).as("w"))
        .select(col("doc_id"), col("w"), size(col("w")).cast("long").as("dl"))
      val stats = docs.agg(sum("dl").cast("long").as("total_tokens"))
      val tf = docs
        .select(col("doc_id"), col("dl"), explode(col("w")).as("term"))
        .filter(col("term").isin(QueryTerms: _*))
        .groupBy("term", "doc_id", "dl")
        .agg(count(lit(1)).as("tf"))
      val scored = tf
        .withColumn("cf", sum(col("tf")).over(
          Window.partitionBy("term")).cast("long"))
        .crossJoin(broadcast(stats))
        .withColumn("score",
          log((col("tf").cast("double") +
            lit(Mu) * (col("cf").cast("double") /
              col("total_tokens").cast("double"))) /
            (col("dl").cast("double") + lit(Mu))))
      scored
        .withColumn("rnk", row_number().over(
          Window.partitionBy("term")
            .orderBy(col("score").desc, col("doc_id"))))
        .filter(col("rnk") <= TopK)
        .select("term", "doc_id", "tf", "dl", "cf", "score", "rnk")
    },
    Some {
      val WordsSql =
        "string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')"
      val terms = QueryTerms.map(t => s"'$t'").mkString(", ")
      s"""WITH emitted AS (
            SELECT * FROM read_parquet(
              '${graft.QueryDef.OutDirToken}/q240_dirichlet_ql/*.parquet')
          ), dl AS (
            SELECT doc_id, CAST(len($WordsSql) AS BIGINT) AS dl
            FROM documents
          ), stats AS (
            SELECT CAST(SUM(dl) AS BIGINT) AS total_tokens FROM dl
          ), t AS (
            SELECT doc_id, unnest($WordsSql) AS term FROM documents
          ), tf AS (
            SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
            FROM t WHERE term IN ($terms) GROUP BY 1, 2
          ), cfx AS (
            SELECT term, CAST(SUM(tf) AS BIGINT) AS cf,
              CAST(count(*) AS BIGINT) AS df
            FROM tf GROUP BY 1
          ), calc AS (
            SELECT tf.term, tf.doc_id, tf.tf, dl.dl, cfx.cf, cfx.df,
              ln((CAST(tf.tf AS DOUBLE) +
                  $Mu * (CAST(cfx.cf AS DOUBLE)
                         / CAST(stats.total_tokens AS DOUBLE)))
                 / (CAST(dl.dl AS DOUBLE) + $Mu)) AS score
            FROM tf
            JOIN dl ON tf.doc_id = dl.doc_id
            JOIN cfx ON tf.term = cfx.term, stats
          ), chk AS (
            SELECT e.term, e.doc_id, e.tf, e.dl, e.cf, e.score, e.rnk,
              c.df
            FROM emitted e
            JOIN calc c ON e.term = c.term AND e.doc_id = c.doc_id
              AND e.tf = c.tf AND e.dl = c.dl AND e.cf = c.cf
            WHERE abs(e.score - c.score) < 1e-9
          ), cnt AS (
            SELECT term, CAST(count(*) AS BIGINT) AS c FROM chk GROUP BY 1
          ), rr AS (
            SELECT chk.*, cnt.c,
              ROW_NUMBER() OVER (PARTITION BY chk.term
                ORDER BY chk.score DESC, chk.doc_id) AS rn
            FROM chk JOIN cnt ON chk.term = cnt.term
          )
          SELECT term, doc_id, tf, dl, cf, score, rnk
          FROM rr WHERE rnk = rn AND c = least($TopK, df)"""
    },
    "Dirichlet query-likelihood top-k: q115's posting discipline, " +
      "tolerance+rank oracle [retrieval]")

  def all: Seq[(String, QueryDef)] = Seq(
    "q115_bm25_topk" -> q115,
    "q122_hybrid_rrf" -> q122,
    "q219_phrase_search" -> q219,
    "q240_dirichlet_ql" -> q240)
}
