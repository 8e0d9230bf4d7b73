package graft.queries

import graft.QueryDef
import graft.common.Tables.load
import graft.functions.Text._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operator family over the `documents` table: token
  * counting, quality scoring, language ID, document fingerprinting.
  * These are the training-data-pipeline extensions (builder brief /
  * SURVEY.md §7.5); the reference itself has no text surface.
  *
  * Scale design: every query is a single narrow projection over the scan —
  * no shuffle at all except the fingerprint's per-doc array fold, which is
  * also shuffle-free. At 100 TB these are pure map jobs that saturate I/O.
  */
object TextOps {

  // DuckDB mirrors of the Text.scala primitives (RE2 needs the 'g' flag
  // on regexp_replace; Spark's regexp_replace is global by default).
  private val NormSql = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
  private val WordsSql = s"string_split($NormSql, ' ')"

  /** Token counting: whitespace tokens + BPE-ish regex tokens + distinct
    * whitespace tokens.
    */
  private val q30 = QueryDef(
    (s, d) => {
      val docs = load(s, d, "documents")
      docs.select(
        col("doc_id"),
        size(words(col("text"))).as("n_words"),
        size(array_distinct(words(col("text")))).as("n_words_distinct"),
        size(regexp_extract_all(col("text"), lit(TokenPattern), lit(0)))
          .as("n_tokens"),
        length(norm(col("text"))).as("n_chars_norm"))
    },
    Some(s"""SELECT doc_id,
              CAST(len($WordsSql) AS INTEGER) AS n_words,
              CAST(len(list_distinct($WordsSql)) AS INTEGER) AS n_words_distinct,
              CAST(len(regexp_extract_all(text, '$TokenPattern')) AS INTEGER) AS n_tokens,
              CAST(length($NormSql) AS INTEGER) AS n_chars_norm
            FROM documents"""),
    "token counting: whitespace + BPE-ish regex tokens [text-analysis]")

  /** Quality scoring: length/punctuation/stopword/distinct ratios and a
    * composite score. All ratios are exact-integer-count / exact-integer-
    * count double divisions — deterministic across engines.
    */
  private val q31 = QueryDef(
    (s, d) => {
      val docs = load(s, d, "documents")
      val w = words(col("text"))
      val nWords = size(w)
      val nChars = length(norm(col("text")))
      val nonAlnum = nChars - length(
        regexp_replace(norm(col("text")), "[^a-z0-9 ]", ""))
      val stopHits = countIn(w, StopwordsEn)
      val distinctWords = size(array_distinct(w))
      docs.select(
        col("doc_id"),
        nChars.as("n_chars_norm"),
        nWords.as("n_words"),
        // single-space normalized text: chars = sum(word lens) + (n-1)
        ((nChars - (nWords - lit(1))).cast("double") / nWords)
          .as("avg_word_len"),
        (nonAlnum.cast("double") / nChars).as("punct_ratio"),
        (stopHits.cast("double") / nWords).as("stopword_ratio"),
        (distinctWords.cast("double") / nWords).as("distinct_ratio"),
        (least(lit(1.0), nWords.cast("double") / lit(100.0)) *
          (lit(1.0) - nonAlnum.cast("double") / nChars) *
          (distinctWords.cast("double") / nWords)).as("quality_score"))
    },
    Some(s"""SELECT doc_id,
              CAST(length($NormSql) AS INTEGER) AS n_chars_norm,
              CAST(len($WordsSql) AS INTEGER) AS n_words,
              CAST(CAST(length($NormSql) - (len($WordsSql) - 1) AS DOUBLE) / len($WordsSql) AS DOUBLE) AS avg_word_len,
              CAST(CAST(length($NormSql) - length(regexp_replace($NormSql, '[^a-z0-9 ]', '', 'g')) AS DOUBLE) / length($NormSql) AS DOUBLE) AS punct_ratio,
              CAST(CAST(len(list_filter($WordsSql, x -> x IN ('the','a','of','to','and','in','is','it','for','on'))) AS DOUBLE) / len($WordsSql) AS DOUBLE) AS stopword_ratio,
              CAST(CAST(len(list_distinct($WordsSql)) AS DOUBLE) / len($WordsSql) AS DOUBLE) AS distinct_ratio,
              CAST(least(1.0, CAST(len($WordsSql) AS DOUBLE) / 100.0) *
                   (1.0 - CAST(length($NormSql) - length(regexp_replace($NormSql, '[^a-z0-9 ]', '', 'g')) AS DOUBLE) / length($NormSql)) *
                   (CAST(len(list_distinct($WordsSql)) AS DOUBLE) / len($WordsSql)) AS DOUBLE) AS quality_score
            FROM documents"""),
    "quality scoring: length/punct/stopword/distinct ratios [text-analysis]")

  /** Language ID: stopword-marker profile scoring with a deterministic
    * argmax tie-break (en > es > de > fr). A real corpus would use char
    * n-gram profiles; the scoring plumbing is identical.
    */
  private val q32 = QueryDef(
    (s, d) => {
      val docs = load(s, d, "documents")
      val w = words(col("text"))
      val c = LangMarkers.map { case (lang, markers) =>
        lang -> countIn(w, markers)
      }.toMap
      docs.select(
        col("doc_id"),
        col("lang").as("declared_lang"),
        c("en").as("score_en"), c("es").as("score_es"),
        c("de").as("score_de"), c("fr").as("score_fr"),
        when(c("en") >= c("es") && c("en") >= c("de") && c("en") >= c("fr"), "en")
          .when(c("es") >= c("de") && c("es") >= c("fr"), "es")
          .when(c("de") >= c("fr"), "de")
          .otherwise("fr").as("predicted_lang"))
    },
    Some {
      val score = LangMarkers.map { case (lang, markers) =>
        val set = markers.map(m => s"'$m'").mkString(",")
        lang -> s"len(list_filter($WordsSql, x -> x IN ($set)))"
      }.toMap
      s"""SELECT doc_id, lang AS declared_lang,
           CAST(${score("en")} AS INTEGER) AS score_en,
           CAST(${score("es")} AS INTEGER) AS score_es,
           CAST(${score("de")} AS INTEGER) AS score_de,
           CAST(${score("fr")} AS INTEGER) AS score_fr,
           CASE WHEN ${score("en")} >= ${score("es")} AND ${score("en")} >= ${score("de")} AND ${score("en")} >= ${score("fr")} THEN 'en'
                WHEN ${score("es")} >= ${score("de")} AND ${score("es")} >= ${score("fr")} THEN 'es'
                WHEN ${score("de")} >= ${score("fr")} THEN 'de'
                ELSE 'fr' END AS predicted_lang
         FROM documents"""
    },
    "language ID via stopword marker profiles [text-analysis]")

  /** Document fingerprinting: content hash (sha256 of canonical text) +
    * min-shingle fingerprint (min sha256 over word 5-grams — the
    * winnowing/minhash idea with k=1, SQL-expressible).
    */
  private val q33 = QueryDef(
    (s, d) => {
      val docs = load(s, d, "documents")
      val grams = wordNgrams(words(col("text")), 5)
      docs.select(
        col("doc_id"),
        sha2(norm(col("text")), 256).as("content_hash"),
        size(grams).as("n_grams"),
        array_min(transform(grams, g => sha2(g, 256))).as("min_shingle_hash"))
    },
    Some(s"""SELECT doc_id,
              sha256($NormSql) AS content_hash,
              CAST(greatest(len($WordsSql) - 4, 0) AS INTEGER) AS n_grams,
              list_min(list_transform(
                [array_to_string(($WordsSql)[i:i+4], ' ')
                 for i in range(1, greatest(len($WordsSql) - 3, 1))],
                g -> sha256(g))) AS min_shingle_hash
            FROM documents"""),
    "content hash + min-shingle fingerprint [text-analysis]")

  /** Distinctive terms per document — the TF-IDF idea with an
    * all-integer ranking (tf desc, document frequency asc, term asc) so
    * the order is a total order both engines agree on bit-for-bit (no
    * float log in the sort key). The shape is the real thing: per-doc
    * term frequencies with map-side combine, a corpus DF table, a keyed
    * join, and a bounded per-doc top-k — at 100 TB the only wide ops are
    * two keyed aggregations and one join on the term.
    */
  /** q63's frame (also the bounded pair source for q83 and q205) is
    * MEMOIZED per corpus, the Graph edge-frame discipline: three
    * registry queries rebuild the identical two-exchange frame
    * otherwise (bench pays it six times per run at min-of-2). The
    * pinned frame is ≤5 rows per document of (long, term, 3 ints) —
    * over an order of magnitude below the token stream it derives
    * from — cached at the default MEMORY_AND_DISK (spills, never
    * OOMs), LRU-bounded at [[TermsMemoCap]] corpora, and released
    * through the session-memo registry like every other pin.
    */
  private val TermsMemoCap = 2
  private val termsMemo = new graft.common.BoundedFrameMemo[DataFrame](
    TermsMemoCap, _.unpersist())
  graft.common.Memos.register("textops.terms")(() => termsMemo.clear())

  private def distinctiveTerms(s: SparkSession, d: String): DataFrame =
    termsMemo.getOrElseUpdate(d) {
      distinctiveTermsUncached(s, d).cache()
    }

  private def distinctiveTermsUncached(s: SparkSession,
      d: String): DataFrame = {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val docs = load(s, d, "documents")
      // per-doc term frequencies are a LOCAL property of the document
      // row — count them in a per-doc hash map instead of exploding one
      // row per token occurrence into a (doc_id, term) exchange (the
      // same narrow-pass discipline as the dedup signatures; the only
      // shuffles left are the term-keyed DF aggregate and the TF⋈DF
      // join, which are inherent)
      val tf = docs.select(col("doc_id"), words(col("text")).as("w"))
        .as[(Long, Seq[String])]
        .mapPartitions { rows =>
          rows.flatMap { case (id, w) =>
            val counts = new java.util.HashMap[String, Long]()
            w.foreach(t => counts.merge(t, 1L, _ + _))
            val it = counts.entrySet().iterator()
            new Iterator[(Long, String, Long)] {
              def hasNext = it.hasNext
              def next() = { val e = it.next(); (id, e.getKey, e.getValue) }
            }
          }
        }.toDF("doc_id", "term", "tf")
      // tf has one row per (doc, term), so DF = row count per term
      val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val w = Window.partitionBy("doc_id")
        .orderBy(col("tf").desc, col("df").asc, col("term").asc)
      tf.join(df, "term")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select(col("doc_id"), col("term"),
          col("tf").cast("int").as("tf"),
          col("df").cast("int").as("df"),
          col("rn").cast("int").as("rn"))
  }

  private val q63 = QueryDef(
    (s, d) => distinctiveTerms(s, d),
    Some(s"""WITH terms AS (
              SELECT doc_id, unnest($WordsSql) AS term FROM documents
            ), tf AS (
              SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2
            ), df AS (
              SELECT term, count(*) AS df FROM tf GROUP BY 1
            )
            SELECT doc_id, term, CAST(tf AS INTEGER) AS tf,
              CAST(df AS INTEGER) AS df, CAST(rn AS INTEGER) AS rn
            FROM (SELECT tf.doc_id, tf.term, tf.tf, df.df,
                    ROW_NUMBER() OVER (PARTITION BY tf.doc_id
                      ORDER BY tf.tf DESC, df.df ASC, tf.term ASC) AS rn
                  FROM tf JOIN df USING (term))
            WHERE rn <= 5"""),
    "top-5 distinctive terms per doc (tf desc, df asc) [text-analysis]")

  /** Term co-occurrence over the distinctive-term sets: which top-5
    * q63 terms appear together in documents, ranked. Restricting the
    * pair expansion to each doc's (already deterministic) top-5 bounds
    * the fan-out at C(5,2)=10 pairs per document BY CONSTRUCTION — the
    * unbounded variant (all distinct-term pairs per doc) is quadratic
    * in document vocabulary and needs a df-cap guard like q35's; this
    * composition needs none. One doc-keyed self-join on 5-row groups,
    * one keyed count, TakeOrdered cut on a total order.
    */
  private val q83 = QueryDef(
    (s, d) => {
      // materialized ONCE: ≤5 rows per doc by construction, and the
      // self-join below otherwise replays the whole tokenize+tf+df+rank
      // lineage for BOTH sides (r16: measured 2 full corpus passes)
      val t = distinctiveTerms(s, d).select("doc_id", "term")
        .localCheckpoint()
      t.as("a").join(t.as("b"),
          col("a.doc_id") === col("b.doc_id") &&
            col("a.term") < col("b.term"))
        .groupBy(col("a.term").as("t1"), col("b.term").as("t2"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("t1").asc, col("t2").asc)
        .limit(50)
    },
    Some(s"""WITH terms AS (
              SELECT doc_id, unnest($WordsSql) AS term FROM documents
            ), tf AS (
              SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2
            ), df AS (
              SELECT term, count(*) AS df FROM tf GROUP BY 1
            ), top5 AS (
              SELECT doc_id, term
              FROM (SELECT tf.doc_id, tf.term,
                      ROW_NUMBER() OVER (PARTITION BY tf.doc_id
                        ORDER BY tf.tf DESC, df.df ASC, tf.term ASC) AS rn
                    FROM tf JOIN df USING (term))
              WHERE rn <= 5
            )
            SELECT a.term AS t1, b.term AS t2,
              CAST(count(*) AS BIGINT) AS n
            FROM top5 a JOIN top5 b
              ON a.doc_id = b.doc_id AND a.term < b.term
            GROUP BY 1, 2
            ORDER BY n DESC, t1 ASC, t2 ASC LIMIT 50"""),
    "top-50 co-occurring distinctive-term pairs [text-analysis]")

  /** Corpus n-gram statistics: top-100 word trigrams by count — the
    * language-model-style corpus profile. One explode + one keyed agg
    * (map-side partial) + TakeOrdered; the (count desc, gram asc) key is
    * a total order, so the cut at 100 is deterministic.
    */
  private val q64 = QueryDef(
    (s, d) => {
      import s.implicits._
      val docs = load(s, d, "documents")
      // tokens come from the same Catalyst norm/split chain as every
      // other text op (oracle-consistent); the gram construction runs as
      // a typed linear loop — the interpreted slice-per-gram HOF chain
      // is O(words^2) per doc and ~10x slower (same pitfall PLANS.md
      // documents for the shingle path)
      docs.select(words(col("text")).as("w")).as[Seq[String]]
        .flatMap { w =>
          if (w.length < 3) Iterator.empty
          else (0 to w.length - 3).iterator
            .map(i => w(i) + " " + w(i + 1) + " " + w(i + 2))
        }
        .toDF("gram")
        .groupBy("gram").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("gram").asc)
        .limit(100)
    },
    Some(s"""WITH g AS (
              SELECT unnest(
                [array_to_string(($WordsSql)[i:i+2], ' ')
                 for i in range(1, greatest(len($WordsSql) - 1, 1))]) AS gram
              FROM documents
            )
            SELECT gram, count(*) AS n FROM g GROUP BY 1
            ORDER BY n DESC, gram ASC LIMIT 100"""),
    "top-100 corpus word trigrams [text-analysis]")

  /** Context-window chunking parameters: 64-token windows advancing by
    * 48 (16-token overlap keeps boundary context in both neighbors —
    * the standard long-doc preprocessing for a fixed-context trainer or
    * a RAG chunk index).
    */
  private[graft] val ChunkLen = 64
  private[graft] val ChunkStride = 48

  /** Sequence chunking: split each document's token stream into
    * fixed-size overlapping windows. Chunk starts are 0, stride, 2·stride
    * … while start < n, so the final window may be short but no token is
    * ever dropped. Pure narrow flatMap — zero shuffle, output rows carry
    * (doc, chunk ordinal, length, text), so at 100 TB this is a map-only
    * job whose output feeds tokenize/embed stages directly. The window
    * construction runs as a typed linear loop for the same reason as q64
    * (Catalyst slice/concat HOFs are interpreted).
    */
  /** Chunking core over an explicit documents frame (q65 + the corpus
    * pipeline's chunk stage).
    */
  private[graft] def chunkDocs(s: SparkSession,
      docs: DataFrame): DataFrame = {
    import s.implicits._
    docs
      .select(col("doc_id"), words(col("text")).as("w"))
      .as[(Long, Seq[String])]
      .flatMap { case (id, w) =>
        val n = w.length
        Iterator.range(0, math.max(n, 1), ChunkStride).map { st =>
          val c = w.slice(st, math.min(st + ChunkLen, n))
          (id, st / ChunkStride, c.length, c.mkString(" "))
        }
      }
      .toDF("doc_id", "chunk_id", "n_tokens", "chunk")
  }

  private val q65 = QueryDef(
    (s, d) => chunkDocs(s, load(s, d, "documents")),
    Some(s"""WITH t AS (
              SELECT doc_id, $WordsSql AS w FROM documents
            ), st AS (
              SELECT doc_id, w,
                unnest(range(0, greatest(len(w), 1), $ChunkStride)) AS s
              FROM t
            )
            SELECT doc_id,
              CAST(s // $ChunkStride AS INTEGER) AS chunk_id,
              CAST(least(s + $ChunkLen, len(w)) - s AS INTEGER) AS n_tokens,
              array_to_string(w[s + 1 : least(s + $ChunkLen, len(w))], ' ')
                AS chunk
            FROM st"""),
    s"$ChunkLen-token chunks, stride $ChunkStride [text-analysis]")

  /** Repetition metrics — the quality-filter signals for boilerplate /
    * degenerate text (the duplicate-n-gram and most-common-word
    * fractions of the published web-corpus filtering recipes): per doc,
    * the most-frequent word's share, the duplicate-word share, and the
    * duplicate-trigram share. All ratios are exact-integer-count
    * divisions (engine-agnostic doubles). One narrow typed pass over
    * the Catalyst token chain — per-doc counting is local, zero shuffle
    * (trigram identity is the exact string, not a hash: these COUNTS
    * are the query's values, so they must match the oracle exactly).
    */
  private val q70 = QueryDef(
    (s, d) => {
      import s.implicits._
      load(s, d, "documents")
        .select(col("doc_id"), words(col("text")).as("w"))
        .as[(Long, Seq[String])]
        .map { case (id, w) =>
          val n = w.length
          val counts = new java.util.HashMap[String, Int]()
          w.foreach(t => counts.merge(t, 1, _ + _))
          var top = 0
          counts.values.forEach(c => if (c > top) top = c)
          val nTri = math.max(n - 2, 0)
          val tris = new java.util.HashSet[String]()
          var i = 0
          while (i < n - 2) {
            tris.add(w(i) + " " + w(i + 1) + " " + w(i + 2)); i += 1
          }
          (id, n, top.toDouble / n,
            (n - counts.size).toDouble / n,
            if (nTri > 0) (nTri - tris.size).toDouble / nTri else 0.0)
        }
        .toDF("doc_id", "n_words", "top_word_frac",
          "dup_word_frac", "dup_trigram_frac")
    },
    Some(s"""WITH t AS (
              SELECT doc_id, $WordsSql AS w FROM documents
            ), wc AS (
              SELECT doc_id, word, count(*) AS c
              FROM (SELECT doc_id, unnest(w) AS word FROM t) GROUP BY 1, 2
            ), topw AS (
              SELECT doc_id, max(c) AS top_c FROM wc GROUP BY 1
            ), tg AS (
              SELECT doc_id, len(w) AS nw,
                greatest(len(w) - 2, 0) AS n_tri,
                len(list_distinct(
                  [array_to_string(w[i:i+2], ' ')
                   for i in range(1, greatest(len(w) - 1, 1))])) AS nd_tri,
                len(list_distinct(w)) AS ndw
              FROM t
            )
            SELECT tg.doc_id, CAST(nw AS INTEGER) AS n_words,
              CAST(top_c AS DOUBLE) / nw AS top_word_frac,
              CAST(nw - ndw AS DOUBLE) / nw AS dup_word_frac,
              CASE WHEN n_tri > 0
                   THEN CAST(n_tri - nd_tri AS DOUBLE) / n_tri
                   ELSE 0.0 END AS dup_trigram_frac
            FROM tg JOIN topw USING (doc_id)"""),
    "repetition metrics: top-word / dup-word / dup-trigram fractions [text-analysis]")

  /** q110: per-doc character-distribution Shannon entropy — the cheap
    * noise detector beside q31's ratio signals (repeated filler scores
    * near 0 bits, random bytes near log2(alphabet), natural English
    * ~4.1). Computed by the engine's native `char_entropy` codegen
    * expression: one local histogram pass per row, summation in fixed
    * character order so the double is bit-deterministic — no explode, no
    * shuffle, a pure map job at any scale.
    *
    * Oracle: DuckDB recomputes the same closed form from exploded
    * characters (its own summation order) and keeps only rows within
    * 1e-9 bits — the float-tolerance derived-contract idiom (any engine
    * drift drops rows and fails the compare).
    */
  private val q110 = QueryDef(
    (s, d) => {
      graft.functions.GraftFunctions.register(s)
      load(s, d, "documents").select(
        col("doc_id"),
        length(col("text")).as("n_chars_total"),
        graft.functions.GraftFunctions.charEntropy(col("text"))
          .as("entropy_bits"))
    },
    Some(s"""WITH emitted AS (
              SELECT * FROM read_parquet(
                '${graft.QueryDef.OutDirToken}/q110_char_entropy/*.parquet')
            ), cnt AS (
              SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS c FROM (
                SELECT doc_id, unnest(string_split(text, '')) AS ch
                FROM documents)
              GROUP BY 1, 2
            ), ent AS (
              SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n,
                log2(CAST(SUM(c) AS DOUBLE)) -
                  SUM(c * log2(CAST(c AS DOUBLE))) / SUM(c) AS h
              FROM cnt GROUP BY 1
            )
            SELECT e.doc_id, e.n_chars_total, e.entropy_bits
            FROM emitted e
            JOIN ent ON e.doc_id = ent.doc_id AND e.n_chars_total = ent.n
            WHERE abs(e.entropy_bits - ent.h) < 1e-9"""),
    "char-distribution entropy: native codegen expr, tolerance oracle [text-analysis]")

  /** q113: inverted text index build — (term → document frequency +
    * the head of the sorted posting list), the retrieval-side artifact
    * a corpus search/dedup service materializes. Emitting the FULL
    * posting list per term is the classic scale trap (a stopword's list
    * is the corpus); the operator caps the emitted postings at the 10
    * smallest doc_ids per term while df stays exact over all postings.
    *
    * Scale: per-doc DISTINCT terms explode from a narrow scan; ONE
    * shuffle on the term key serves both the rank window and the
    * aggregate (same partitioning, no second exchange — PlanShapeSpec
    * pins it). The exact df forces every (term, doc) pair across that
    * one shuffle regardless, so the cap's job is bounding STATE, not
    * the wire: the conditional collect_list buffers ≤10 elements per
    * term instead of a stopword's full corpus-sized posting list.
    */
  private val q113 = QueryDef(
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val terms = load(s, d, "documents")
        .select(col("doc_id"),
          explode(array_distinct(words(col("text")))).as("term"))
      terms
        .withColumn("rn",
          row_number().over(Window.partitionBy("term").orderBy("doc_id")))
        .groupBy("term").agg(
          count(lit(1)).as("df"),
          concat_ws(",",
            sort_array(collect_list(when(col("rn") <= 10, col("doc_id"))))
              .cast("array<string>")).as("postings_head"))
    },
    Some(s"""WITH t AS (
              SELECT doc_id, unnest(list_distinct($WordsSql)) AS term
              FROM documents)
            SELECT term, CAST(count(*) AS BIGINT) AS df,
              array_to_string(list_sort(list(doc_id))[1:10], ',')
                AS postings_head
            FROM t GROUP BY 1"""),
    "inverted index: exact df + capped sorted posting heads [text-analysis]")

  /** Pairs below this document count carry no PMI signal and are the
    * bulk of the pair space — cutting them inside the aggregate bounds
    * the output (the q119 MinSupport discipline).
    */
  private val PmiMinPairs = 3L

  /** q205: pointwise mutual information over the distinctive-term
    * pairs — PMI = ln(P(a,b)/(P(a)P(b))) on document-level presence,
    * the association score collocation extraction / phrase mining
    * reads where q83's raw count conflates "common together" with
    * "common everywhere".
    *
    * Scale: the pair source is q83's — each doc contributes C(5,2)
    * pairs by construction, one doc-keyed self-join on 5-row groups.
    * The marginal df frame is vocabulary-proportional, so its two
    * join-backs are UNHINTED (AQE broadcasts while it fits —
    * BroadcastLintSpec's invariant); only the 1-row doc total is a
    * forced broadcast.
    *
    * Float parity: the one ln() is transcendental, so the oracle is
    * the derived-contract kind — but driven from the full recomputed
    * row set (ref LEFT JOIN emitted), so a MISSING Spark row surfaces
    * as an oracle row with a sentinel pmi (count mismatch), not a
    * silently smaller mirror; integer evidence must match bit-exactly
    * and pmi within 1e-9.
    */
  private val q205 = QueryDef(
    (s, d) => {
      // materialized ONCE (≤5 rows per doc): the pair self-join, both
      // marginal join-backs, and the doc total otherwise each replay
      // the tokenize+tf+df+rank lineage — measured 4 corpus passes and
      // ~76 task-seconds at sf0.1 (r16; guide §2.4)
      val t = distinctiveTerms(s, d).select("doc_id", "term")
        .localCheckpoint()
      val pairs = t.as("a").join(t.as("b"),
          col("a.doc_id") === col("b.doc_id") &&
            col("a.term") < col("b.term"))
        .groupBy(col("a.term").as("term_a"), col("b.term").as("term_b"))
        .agg(count(lit(1)).as("n_pair"))
        .filter(col("n_pair") >= PmiMinPairs)
      val dfm = t.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val nd = t.agg(countDistinct(col("doc_id")).cast("long").as("n_docs"))
      pairs
        .join(dfm.select(col("term").as("term_a"), col("df").as("df_a")),
          "term_a")
        .join(dfm.select(col("term").as("term_b"), col("df").as("df_b")),
          "term_b")
        .crossJoin(broadcast(nd))
        .withColumn("pmi",
          log((col("n_pair") * col("n_docs")).cast("double") /
            (col("df_a") * col("df_b")).cast("double")))
        .select("term_a", "term_b", "n_pair", "df_a", "df_b", "n_docs",
          "pmi")
    },
    Some(s"""WITH terms AS (
              SELECT doc_id, unnest($WordsSql) AS term FROM documents
            ), tf AS (
              SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2
            ), dfq AS (
              SELECT term, count(*) AS df FROM tf GROUP BY 1
            ), top5 AS (
              SELECT doc_id, term
              FROM (SELECT tf.doc_id, tf.term,
                      ROW_NUMBER() OVER (PARTITION BY tf.doc_id
                        ORDER BY tf.tf DESC, dfq.df ASC, tf.term ASC) AS rn
                    FROM tf JOIN dfq USING (term))
              WHERE rn <= 5
            ), pr AS (
              SELECT a.term AS term_a, b.term AS term_b,
                CAST(count(*) AS BIGINT) AS n_pair
              FROM top5 a JOIN top5 b
                ON a.doc_id = b.doc_id AND a.term < b.term
              GROUP BY 1, 2 HAVING count(*) >= $PmiMinPairs
            ), mg AS (
              SELECT term, CAST(count(*) AS BIGINT) AS df
              FROM top5 GROUP BY 1
            ), nd AS (
              SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
              FROM top5
            ), emitted AS (
              SELECT * FROM read_parquet(
                '${QueryDef.OutDirToken}/q205_term_pmi/*.parquet')
            )
            SELECT p.term_a, p.term_b, p.n_pair,
              da.df AS df_a, db.df AS df_b, nd.n_docs,
              CASE WHEN abs(e.pmi -
                  ln(CAST(p.n_pair * nd.n_docs AS DOUBLE) /
                     CAST(da.df * db.df AS DOUBLE))) < 1e-9
                THEN e.pmi ELSE -999.0 END AS pmi
            FROM pr p
            JOIN mg da ON p.term_a = da.term
            JOIN mg db ON p.term_b = db.term
            CROSS JOIN nd
            LEFT JOIN emitted e ON e.term_a = p.term_a
              AND e.term_b = p.term_b AND e.n_pair = p.n_pair
              AND e.df_a = da.df AND e.df_b = db.df
              AND e.n_docs = nd.n_docs"""),
    "term-pair PMI: doc-presence marginals, ref-driven tolerance oracle [text-analysis]")

  /** q226: Flesch reading-ease scoring — the classic readability
    * quality signal (Flesch 1948: 206.835 − 1.015·words/sentences −
    * 84.6·syllables/words) a corpus-curation pass uses beside q31's
    * ratio screens and q70's repetition screens: template spam and
    * keyword-stuffed boilerplate land far outside the natural-prose
    * band. Sentences are maximal `[.!?]+` runs in the RAW text (min 1
    * so fragments stay finite); syllables use the standard vowel-group
    * heuristic — per word, max(1, number of maximal `[aeiouy]+` runs) —
    * summed with an ORDERED array fold so no float ever enters the
    * count. The grade band is the published score-range bucketing.
    *
    * Scale: a pure narrow projection — zero shuffle, the regex counts
    * and the `aggregate` fold are per-row Catalyst expressions inside
    * whole-stage codegen; at 100 TB this is scan-bound map work.
    *
    * Exactness: words/sentences/syllables are exact integers; the
    * score is one fixed IEEE chain (two divisions, two multiplies, two
    * subtractions) over those integers — identical in both engines, so
    * the oracle compares hash-exact, and the band flag's boundary
    * comparisons see identical doubles.
    */
  private val q226 = QueryDef(
    (s, d) => {
      val w = words(col("text"))
      val nWords = size(w).cast("long")
      val nSent = greatest(
        size(regexp_extract_all(col("text"), lit("[.!?]+"), lit(0))),
        lit(1)).cast("long")
      val nSyll = aggregate(
        transform(w, x =>
          greatest(size(regexp_extract_all(x, lit("[aeiouy]+"), lit(0))),
            lit(1)).cast("long")),
        lit(0L), (acc, x) => acc + x)
      val flesch = lit(206.835) -
        lit(1.015) * (nWords.cast("double") / nSent.cast("double")) -
        lit(84.6) * (nSyll.cast("double") / nWords.cast("double"))
      load(s, d, "documents").select(
        col("doc_id"),
        nWords.as("n_words"),
        nSent.as("n_sentences"),
        nSyll.as("n_syllables"),
        flesch.as("flesch"),
        when(flesch >= 90.0, "very_easy")
          .when(flesch >= 70.0, "easy")
          .when(flesch >= 50.0, "medium")
          .when(flesch >= 30.0, "hard")
          .otherwise("very_hard").as("grade_band"))
    },
    Some(s"""WITH m AS (
              SELECT doc_id,
                CAST(len($WordsSql) AS BIGINT) AS n_words,
                CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
                  AS BIGINT) AS n_sentences,
                CAST(list_sum(list_transform($WordsSql,
                  w -> greatest(len(regexp_extract_all(w, '[aeiouy]+')), 1)))
                  AS BIGINT) AS n_syllables
              FROM documents
            ), f AS (
              SELECT doc_id, n_words, n_sentences, n_syllables,
                206.835
                  - 1.015 * (CAST(n_words AS DOUBLE)
                             / CAST(n_sentences AS DOUBLE))
                  - 84.6 * (CAST(n_syllables AS DOUBLE)
                            / CAST(n_words AS DOUBLE)) AS flesch
              FROM m
            )
            SELECT doc_id, n_words, n_sentences, n_syllables, flesch,
              CASE WHEN flesch >= 90.0 THEN 'very_easy'
                   WHEN flesch >= 70.0 THEN 'easy'
                   WHEN flesch >= 50.0 THEN 'medium'
                   WHEN flesch >= 30.0 THEN 'hard'
                   ELSE 'very_hard' END AS grade_band
            FROM f"""),
    "Flesch reading-ease: vowel-group syllables, sentence runs, " +
      "published grade bands [text-analysis]")

  /** q246: Cohen's kappa between the corpus's DECLARED language labels
    * and q32's marker-profile PREDICTION — chance-corrected inter-
    * labeler agreement, the number a labeling pipeline quotes instead
    * of raw accuracy (a majority-class predictor on a skewed corpus
    * scores high accuracy but κ ≈ 0). Treats metadata and model as two
    * raters over the same items; κ = (p_o − p_e)/(1 − p_e).
    *
    * Scale: one narrow map pass scores every document locally (the q32
    * expressions), then the corpus folds to the 5-class marginal
    * frame map-side; everything after is arithmetic on ≤5 rows.
    *
    * Exactness: κ reduces to (N·D − S)/(N² − S) with D = Σ diagonal
    * and S = Σ_l rowₗ·colₗ — all integers. The cross terms reach N²,
    * past i64 at a 10¹⁰-doc corpus, so both engines accumulate them in
    * 128-bit (DECIMAL(38,0)/HUGEINT) and EMIT canonical strings (the
    * q214 surface rule); κ/p_o/p_e are fixed double expressions over
    * those exact integers. Per-language marginals ride along as plain
    * BIGINT evidence.
    */
  private val q246 = QueryDef(
    (s, d) => {
      val docs = load(s, d, "documents")
      val w = words(col("text"))
      val c = LangMarkers.map { case (lang, markers) =>
        lang -> countIn(w, markers)
      }.toMap
      val pred =
        when(c("en") >= c("es") && c("en") >= c("de") && c("en") >= c("fr"),
          "en")
          .when(c("es") >= c("de") && c("es") >= c("fr"), "es")
          .when(c("de") >= c("fr"), "de")
          .otherwise("fr")
      // the LABEL DOMAIN is declared ∪ predictable: the corpus declares
      // a 'zh' class the 4-marker predictor can never emit — kappa must
      // see that whole row of the confusion matrix as disagreement
      // rather than silently dropping those documents
      val langs = LangMarkers.map(_._1) :+ "zh"
      val marginals = docs
        .select(col("lang").as("declared"), pred.as("predicted"))
        .select(explode(array(langs.map { l =>
          struct(lit(l).as("lang"),
            when(col("declared") === l, 1L).otherwise(0L).as("nd"),
            when(col("predicted") === l, 1L).otherwise(0L).as("np"),
            when(col("declared") === l && col("predicted") === l, 1L)
              .otherwise(0L).as("na"))
        }: _*)).as("m"))
        .groupBy(col("m.lang").as("lang"))
        .agg(sum(col("m.nd")).as("n_declared"),
          sum(col("m.np")).as("n_predicted"),
          sum(col("m.na")).as("n_agree"))
      val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
      val tot = marginals.agg(
        sum(col("n_declared")).as("n_total"),
        sum(col("n_agree")).as("d_agree"),
        sum(col("n_declared").cast(dec38) * col("n_predicted").cast(dec38))
          .as("s_cross"))
      marginals.crossJoin(broadcast(tot))
        .withColumn("nd_num",
          col("n_total").cast(dec38) * col("d_agree").cast(dec38) -
            col("s_cross"))
        .withColumn("nn_den",
          col("n_total").cast(dec38) * col("n_total").cast(dec38) -
            col("s_cross"))
        .select(col("lang"), col("n_declared"), col("n_predicted"),
          col("n_agree"), col("n_total"), col("d_agree"),
          col("s_cross").cast("string").as("s_cross"),
          col("nd_num").cast("string").as("kappa_num"),
          col("nn_den").cast("string").as("kappa_den"),
          (col("d_agree").cast("double") / col("n_total").cast("double"))
            .as("p_observed"),
          (col("s_cross").cast("double") /
            (col("n_total").cast(dec38) * col("n_total").cast(dec38))
              .cast("double")).as("p_expected"),
          (col("nd_num").cast("double") / col("nn_den").cast("double"))
            .as("kappa"))
    },
    Some {
      val score = LangMarkers.map { case (lang, markers) =>
        val set = markers.map(m => s"'$m'").mkString(",")
        lang -> s"len(list_filter($WordsSql, x -> x IN ($set)))"
      }.toMap
      val predSql =
        s"""CASE WHEN ${score("en")} >= ${score("es")} AND ${score("en")} >= ${score("de")} AND ${score("en")} >= ${score("fr")} THEN 'en'
              WHEN ${score("es")} >= ${score("de")} AND ${score("es")} >= ${score("fr")} THEN 'es'
              WHEN ${score("de")} >= ${score("fr")} THEN 'de'
              ELSE 'fr' END"""
      s"""WITH scored AS (
            SELECT lang AS declared, $predSql AS predicted
            FROM documents
          ), langs AS (
            SELECT unnest(['en','es','de','fr','zh']) AS lang
          ), marg AS (
            SELECT l.lang,
              CAST(SUM(CASE WHEN s.declared = l.lang THEN 1 ELSE 0 END)
                AS BIGINT) AS n_declared,
              CAST(SUM(CASE WHEN s.predicted = l.lang THEN 1 ELSE 0 END)
                AS BIGINT) AS n_predicted,
              CAST(SUM(CASE WHEN s.declared = l.lang
                AND s.predicted = l.lang THEN 1 ELSE 0 END)
                AS BIGINT) AS n_agree
            FROM langs l CROSS JOIN scored s
            GROUP BY 1
          ), tot AS (
            SELECT CAST(SUM(n_declared) AS BIGINT) AS n_total,
              CAST(SUM(n_agree) AS BIGINT) AS d_agree,
              SUM(CAST(n_declared AS HUGEINT) * n_predicted) AS s_cross
            FROM marg
          )
          SELECT m.lang, m.n_declared, m.n_predicted, m.n_agree,
            t.n_total, t.d_agree,
            CAST(t.s_cross AS VARCHAR) AS s_cross,
            CAST(CAST(t.n_total AS HUGEINT) * t.d_agree - t.s_cross
              AS VARCHAR) AS kappa_num,
            CAST(CAST(t.n_total AS HUGEINT) * t.n_total - t.s_cross
              AS VARCHAR) AS kappa_den,
            CAST(t.d_agree AS DOUBLE) / CAST(t.n_total AS DOUBLE)
              AS p_observed,
            CAST(t.s_cross AS DOUBLE) /
              CAST(CAST(t.n_total AS HUGEINT) * t.n_total AS DOUBLE)
              AS p_expected,
            CAST(CAST(t.n_total AS HUGEINT) * t.d_agree - t.s_cross
                AS DOUBLE) /
              CAST(CAST(t.n_total AS HUGEINT) * t.n_total - t.s_cross
                AS DOUBLE) AS kappa
          FROM marg m, tot t"""
    },
    "Cohen's kappa between declared and predicted language: integer " +
      "confusion marginals, 128-bit cross terms [text-analysis]")

  /** q263's minimum en-marker hits for the simple rule classifier. */
  private val EnRuleMinHits = 2

  /** q263: McNemar's paired test — "is the marker-ARGMAX language
    * classifier (q32) actually better than a dumb en-threshold rule,
    * on the SAME documents?" Comparing two classifiers by their
    * separate accuracies wastes the pairing; McNemar conditions on the
    * discordant pairs only (b = argmax right & rule wrong, c = the
    * reverse) — the standard paired readout a labeling pipeline runs
    * before swapping classifiers. Task: is the document English
    * (truth = declared lang); classifier A = q32's marker argmax;
    * classifier B = "en iff ≥ [[EnRuleMinHits]] en-marker hits".
    *
    * Exactness: the 2×2 discordance cells are one conditional-sum
    * integer fold over a narrow scoring pass (no per-group frame, no
    * fold order); the statistic (b−c)²/(b+c) is a terminal double,
    * NULL when the classifiers never disagree.
    *
    * Scale: one documents scan, one 1-row aggregate — a pure map job.
    */
  private val q263 = QueryDef(
    (s, d) => {
      val docs = load(s, d, "documents")
      val w = words(col("text"))
      val c = LangMarkers.map { case (lang, markers) =>
        lang -> countIn(w, markers)
      }.toMap
      val predA =
        (c("en") >= c("es") && c("en") >= c("de") && c("en") >= c("fr"))
      val predB = c("en") >= EnRuleMinHits
      val truth = col("lang") === "en"
      val scored = docs.select(
        (predA === truth).as("a_right"), (predB === truth).as("b_right"))
      val m = scored.agg(
        graft.common.Exact.lcountAll.as("n"),
        sum(when(col("a_right") && col("b_right"), 1L).otherwise(0L))
          .as("both_right"),
        sum(when(!col("a_right") && !col("b_right"), 1L).otherwise(0L))
          .as("both_wrong"),
        sum(when(col("a_right") && !col("b_right"), 1L).otherwise(0L))
          .as("b_disc"),
        sum(when(!col("a_right") && col("b_right"), 1L).otherwise(0L))
          .as("c_disc"))
      m.select(col("n"), col("both_right"), col("both_wrong"),
        col("b_disc"), col("c_disc"),
        ((col("both_right") + col("b_disc")).cast("double") /
          col("n").cast("double")).as("acc_argmax"),
        ((col("both_right") + col("c_disc")).cast("double") /
          col("n").cast("double")).as("acc_rule"),
        when(col("b_disc") + col("c_disc") > 0L,
          ((col("b_disc") - col("c_disc")) *
            (col("b_disc") - col("c_disc"))).cast("double") /
            (col("b_disc") + col("c_disc")).cast("double"))
          .as("mcnemar_chi2"))
    },
    Some {
      val score = LangMarkers.map { case (lang, markers) =>
        val set = markers.map(m => s"'$m'").mkString(",")
        lang -> s"len(list_filter($WordsSql, x -> x IN ($set)))"
      }.toMap
      val predA = s"(${score("en")} >= ${score("es")} AND " +
        s"${score("en")} >= ${score("de")} AND " +
        s"${score("en")} >= ${score("fr")})"
      val predB = s"(${score("en")} >= $EnRuleMinHits)"
      s"""WITH scored AS (
            SELECT ($predA = (lang = 'en')) AS a_right,
              ($predB = (lang = 'en')) AS b_right
            FROM documents
          ), m AS (
            SELECT CAST(count(*) AS BIGINT) AS n,
              CAST(SUM(CASE WHEN a_right AND b_right THEN 1 ELSE 0 END)
                AS BIGINT) AS both_right,
              CAST(SUM(CASE WHEN NOT a_right AND NOT b_right
                THEN 1 ELSE 0 END) AS BIGINT) AS both_wrong,
              CAST(SUM(CASE WHEN a_right AND NOT b_right
                THEN 1 ELSE 0 END) AS BIGINT) AS b_disc,
              CAST(SUM(CASE WHEN NOT a_right AND b_right
                THEN 1 ELSE 0 END) AS BIGINT) AS c_disc
            FROM scored
          )
          SELECT n, both_right, both_wrong, b_disc, c_disc,
            CAST(both_right + b_disc AS DOUBLE) / CAST(n AS DOUBLE)
              AS acc_argmax,
            CAST(both_right + c_disc AS DOUBLE) / CAST(n AS DOUBLE)
              AS acc_rule,
            CASE WHEN b_disc + c_disc > 0 THEN
              CAST((b_disc - c_disc) * (b_disc - c_disc) AS DOUBLE)
                / CAST(b_disc + c_disc AS DOUBLE) END AS mcnemar_chi2
          FROM m"""
    },
    "McNemar paired classifier test: marker-argmax vs en-threshold " +
      "rule on English ID, exact discordance cells [stats,text-analysis]")

  def all: Seq[(String, QueryDef)] = Seq(
    "q263_mcnemar" -> q263,
    "q30_text_tokens" -> q30,
    "q31_text_quality" -> q31,
    "q32_text_langid" -> q32,
    "q246_labeler_kappa" -> q246,
    "q33_text_fingerprint" -> q33,
    "q63_tfidf_terms" -> q63,
    "q64_corpus_ngrams" -> q64,
    "q65_doc_chunks" -> q65,
    "q70_repetition" -> q70,
    "q83_term_cooccurrence" -> q83,
    "q110_char_entropy" -> q110,
    "q113_inverted_index" -> q113,
    "q205_term_pmi" -> q205,
    "q226_flesch_readability" -> q226)
}
