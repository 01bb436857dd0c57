package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.Tables._

/** Retrieval scoring over the documents corpus (SURVEY.md §2B
  * LLM-data-pipeline extensions): the inverted-index/BM25 shape that a
  * training-data pipeline uses for corpus search, hard-negative mining and
  * retrieval-based filtering.
  *
  * Reference analog: none (the reference's query surface stops at the
  * bronze tables; retrieval is part of the *ext* LLM-curation north star,
  * like q_text_top_terms' tf/idf).
  *
  * Engine-parity design (the q_graph_pagerank lesson, applied to floats):
  * every input to the scoring formula is an exact integer (tf, dl, df, N)
  * or a ratio of exact integers (avgdl), and the per-(doc, term)
  * double-precision BM25 term is converted to integer MICRO-UNITS with an
  * explicit floor(x·1e6 + 0.5) before the per-doc sum — so the only
  * cross-engine float operations are single expressions with identical
  * IEEE semantics (ln, ·, /), and the SUM is over BIGINTs, immune to
  * addition-order differences between Spark partial aggregation and
  * DuckDB's scan order. Ranking ties break on doc_id.
  *
  * Scale shape: tokenize → explode feeds a (doc, term) hash aggregate
  * (map-side partial absorbs the explode inflation) with the doc length
  * CARRIED THROUGH it (max of a doc-functional value), so scoring needs
  * no corpus-sized dl join; the query-term df/idf table is broadcast by
  * construction (|terms| rows); the final top-k is
  * TakeOrderedAndProject, never a global sort. At 100 TB the only
  * corpus-sized work is two scans (a scalar length agg + the postings
  * scan) and the only shuffle is the (doc, term) tf aggregate restricted
  * to query terms — proportional to the query's postings, which is the
  * inverted-index access pattern an external index would serve.
  */
object Search {

  /** BM25 hyperparameters (standard Robertson defaults). */
  private val K1 = 1.2
  private val B = 0.75

  /** Fixed query-term set — present in the synthetic vocab at every SF. */
  private[graft] val queryTerms = Seq("spark", "join", "stream", "vector", "agg")

  private def microBm25(tf: Column, dl: Column, idf: Column, avgdl: Column): Column =
    floor(
      idf * (tf * lit(K1 + 1.0)) / (tf + lit(K1) * (lit(1.0 - B) + lit(B) * dl / avgdl)) * 1e6 + 0.5
    ).cast("long")

  /** The scoring tail shared by the from-text operator below and the
    * arrival-index read path (StreamOps.bm25StoreSearch): df/idf over the
    * query-restricted postings, integer micro-unit per-(doc, term) terms,
    * per-doc BIGINT sum, TakeOrdered top-k. private[graft] so the two
    * paths CANNOT drift — identical postings in ⇒ identical scores out
    * (StreamOpsSpec pins batch-vs-store equality on exactly this).
    * @param tf query-restricted postings: (doc_id, term, tf, dl).
    * @param stats one row: (n_docs, avgdl). */
  private[graft] def bm25Score(tf: DataFrame, stats: DataFrame, k: Int): DataFrame = {
    val s = tf.sparkSession
    import s.implicits._
    // df/idf re-aggregates the tf subtree; its (doc, term) exchange is
    // identical to the scoring branch's, so the shuffle write is shared
    // at runtime (AQE stage reuse) — and the frame is postings-sized
    // regardless
    val idf = tf.groupBy($"term")
      .agg(count(lit(1)).cast("long").as("df"))
      .crossJoin(broadcast(stats))
      .select($"term", $"df",
        log(lit(1.0) + ($"n_docs" - $"df" + 0.5) / ($"df" + 0.5)).as("idf"),
        $"avgdl")
    tf.join(broadcast(idf), "term")
      .select($"doc_id",
        microBm25($"tf", $"dl", $"idf", $"avgdl").as("micro"))
      .groupBy($"doc_id")
      .agg(sum($"micro").as("score_micro"), count(lit(1)).as("n_terms"))
      .select($"doc_id", $"n_terms",
        round($"score_micro" / 1e6, 6).as("score"), $"score_micro")
      .orderBy($"score_micro".desc, $"doc_id")
      .limit(k)
  }

  /** Tokenize a (doc_id, text) frame into the postings shape bm25Score
    * and the arrival index share: whitespace terms, per-doc length
    * carried through (dl is doc-functional, so max(dl) reconstructs it).
    * Restricting `onlyTerms` BEFORE the aggregate keeps the shuffle
    * postings-sized; None (the index builder) keeps every term. */
  private[graft] def bm25Postings(input: DataFrame,
      onlyTerms: Option[Seq[String]]): DataFrame = {
    val s = input.sparkSession
    import s.implicits._
    val exploded = input.filter($"text".isNotNull)
      .select($"doc_id", split($"text", " ").as("toks"))
      .select($"doc_id", size($"toks").cast("long").as("dl"),
        explode($"toks").as("term"))
    onlyTerms.fold(exploded)(t => exploded.filter($"term".isin(t: _*)))
      .groupBy($"doc_id", $"term")
      .agg(count(lit(1)).cast("long").as("tf"), max($"dl").as("dl"))
  }

  /** BM25 top-k over a (doc_id, text) frame for an arbitrary term set —
    * the reusable operator behind q_search_bm25 and the graft_bm25 SQL
    * TVF. See the object scaladoc for the scale shape and the integer
    * micro-unit portability discipline. */
  def bm25(input: DataFrame, terms: Seq[String], k: Int): DataFrame = {
    val s = input.sparkSession
    import s.implicits._
    require(terms.nonEmpty, "bm25: empty query")
    val docs = input.filter($"text".isNotNull)
      .select($"doc_id", split($"text", " ").as("toks"))
    // corpus scalars: ONE narrow scalar-agg scan (map-side partials, no
    // data shuffle beyond the single-row combine)
    val stats = docs.select(size($"toks").cast("long").as("dl"))
      .agg(count(lit(1)).as("n_docs"),
        (sum($"dl") / count(lit(1))).as("avgdl"))
    bm25Score(bm25Postings(input, Some(terms)), stats, k)
  }

  /** A persisted 3-batch BM25 inverted index built from the documents
    * corpus (batch = doc_id % 3) through the REAL arrival body
    * (StreamOps.bm25IngestBatch) into a [[graft.util.FixtureCache]]
    * staging publish — q_search_bm25_arrival then serves the fixed query
    * off it. */
  private def bm25IndexFixture(s: SparkSession, dir: String): String = {
    val out = graft.util.FixtureCache.buildOnce(dir, "documents", "bm25idx") {
      staging =>
        val d = documents(s, dir)
          .select(col("doc_id"), col("text"),
            pmod(col("doc_id"), lit(3)).as("b"))
        for (b <- 0L to 2L)
          graft.streaming.StreamOps.bm25IngestBatch(
            d.filter(col("b") === b).select(col("doc_id"), col("text")),
            b, staging.resolve("index").toString)
    }
    s"$out/index"
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // BM25 top-10 docs for a fixed 5-term disjunctive query.
    "q_search_bm25" -> ((s, dir) =>
      bm25(documents(s, dir).select(col("doc_id"), col("text")),
        queryTerms, k = 10)),

    // The SAME query served off the arrival-built inverted index
    // (StreamOps.bm25StoreSearch over the 3-batch store fixture): the
    // store path must reproduce the from-scratch batch scores exactly —
    // its oracle IS q_search_bm25's oracle, recomputing from the raw
    // documents table. The streaming-only laws (upsert latest-wins,
    // replay idempotence) live in StreamOpsSpec.
    "q_search_bm25_arrival" -> ((s, dir) =>
      graft.streaming.StreamOps.bm25StoreSearch(
        s, bm25IndexFixture(s, dir), queryTerms, k = 10)),

    // ...and the same store reached through spark.sql TEXT alone (the
    // q_tvf_quantiles discipline: the SQL-TVF surface oracle-checked end
    // to end — parser → injectTableFunction resolution → the store read),
    // against the same recompute-from-raw-documents oracle.
    "q_tvf_bm25" -> ((s, dir) => {
      val store = bm25IndexFixture(s, dir)
      s.sql(s"SELECT doc_id, n_terms, score, score_micro FROM " +
        s"graft_bm25_index('$store', '${queryTerms.mkString(" ")}', 10)")
    }),

    // Hybrid retrieval via reciprocal-rank fusion: the lexical arm (BM25
    // top-50 for the fixed 5-term query) and the semantic arm (embedding
    // cosine vs the vec_id-0 probe, top-50) fused by
    // RRF(d) = Σ_arms 1/(60 + rank_arm(d)) — the standard
    // score-scale-free fusion (Cormack et al., and what production
    // retrieval stacks run ahead of reranking / hard-negative mining;
    // k=60 is the canonical constant). Entirely integer arithmetic:
    // ranks are row_numbers over total orders, each arm's contribution is
    // floor(1e9/(60+r)) in BIGINT division, absent arms contribute 0 —
    // no float ever crosses engines.
    //
    // Scale shape: each arm ends in orderBy().limit(50), which Spark
    // plans as TakeOrderedAndProject — a per-partition partial top-k +
    // single tiny merge, never a global sort — and the rank windows +
    // full-outer fusion join then run on ≤50-row frames. The corpus-wide
    // work is exactly one postings-sized BM25 agg and one broadcast-probe
    // cosine scan.
    "q_search_hybrid_rrf" -> ((s, dir) => {
      import s.implicits._
      val W = org.apache.spark.sql.expressions.Window
      val lexTop = bm25(documents(s, dir).select($"doc_id", $"text"),
        queryTerms, k = 50).select($"doc_id", $"score_micro")
      val lexRank = lexTop.select($"doc_id",
        row_number().over(W.orderBy($"score_micro".desc, $"doc_id"))
          .cast("long").as("r_lex"))
      val e = embeddings(s, dir)
      val probe = e.filter($"vec_id" === 0).select($"embedding".as("pv"))
      val semTop = e.crossJoin(broadcast(probe))
        .select($"vec_id".as("doc_id"),
          floor(Sim.cosine($"pv", $"embedding") * 1e6).cast("long").as("cos_e6"))
        .orderBy($"cos_e6".desc, $"doc_id").limit(50)
      val semRank = semTop.select($"doc_id",
        row_number().over(W.orderBy($"cos_e6".desc, $"doc_id"))
          .cast("long").as("r_sem"))
      lexRank.join(semRank, Seq("doc_id"), "full_outer")
        .select($"doc_id", $"r_lex", $"r_sem",
          (coalesce(expr("1000000000L div (60 + r_lex)"), lit(0L)) +
            coalesce(expr("1000000000L div (60 + r_sem)"), lit(0L))).as("rrf_e9"))
        .orderBy($"rrf_e9".desc, $"doc_id")
        .limit(10)
    }),

    // Positional-postings phrase search: docs containing the exact bigram
    // "stream join", ranked by occurrence count. The positional-index
    // shape: per-term postings carry token positions, and phrase matching
    // is an EQUI-join on (doc, adjacent-position) — the second term's
    // postings are shifted by one so adjacency needs no residual
    // predicate. Term filters run BEFORE the join, so the shuffle carries
    // only the two terms' postings (postings-sized, like q_search_bm25),
    // never the full token stream.
    "q_search_phrase" -> ((s, dir) => {
      import s.implicits._
      val tok = documents(s, dir).filter($"text".isNotNull)
        .select($"doc_id", posexplode(split($"text", " ")).as(Seq("pos", "term")))
      val first = tok.filter($"term" === "stream").select($"doc_id", $"pos")
      val second = tok.filter($"term" === "join")
        .select($"doc_id", ($"pos" - 1).as("pos"))
      first.join(second, Seq("doc_id", "pos"))
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_phrase"), min($"pos").as("first_pos"))
        .orderBy($"n_phrase".desc, $"doc_id")
        .limit(10)
    })
  )

  /** The shared DuckDB BM25 CTE chain (docs → dl → stats → tf → idf →
    * scored, one micro-unit row per (doc, matched term)) — ONE definition
    * feeding both the q_search_bm25 oracle and q_search_hybrid_rrf's
    * lexical arm, so the k1/b constants and the floor(x·1e6+0.5)
    * micro-rounding can never silently desynchronize between them. */
  private def bm25CtesSql: String = {
    val terms = queryTerms.map(t => s"'$t'").mkString(", ")
    s"""docs AS (
            SELECT doc_id, string_split(text, ' ') AS toks
            FROM documents WHERE text IS NOT NULL),
          dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM docs),
          stats AS (
            SELECT count(*) AS n_docs,
                   CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
          tf AS (
            SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
            FROM (SELECT doc_id, unnest(toks) AS term FROM docs)
            WHERE term IN ($terms)
            GROUP BY 1, 2),
          idf AS (
            SELECT term, df, ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) AS idf, avgdl
            FROM (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
                  FROM tf GROUP BY 1), stats),
          scored AS (
            SELECT tf.doc_id,
                   CAST(floor(idf.idf * (tf.tf * (1.2 + 1.0))
                              / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / idf.avgdl))
                              * 1e6 + 0.5) AS BIGINT) AS micro
            FROM tf JOIN idf USING (term) JOIN dl USING (doc_id))"""
  }

  private val bm25TopSql =
    s"""WITH $bm25CtesSql
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms,
               round(sum(micro) / 1e6, 6) AS score,
               CAST(sum(micro) AS BIGINT) AS score_micro
        FROM scored
        GROUP BY doc_id
        ORDER BY score_micro DESC, doc_id
        LIMIT 10"""

  val oracle: Map[String, String] = Map(
    "q_search_bm25" -> bm25TopSql,

    // the arrival index must reproduce the batch scores — same oracle,
    // recomputed from the raw documents table (API read and SQL-TVF read).
    "q_search_bm25_arrival" -> bm25TopSql,
    "q_tvf_bm25" -> bm25TopSql,

    "q_search_hybrid_rrf" -> {
      s"""WITH $bm25CtesSql,
          lextop AS (
            SELECT doc_id, CAST(sum(micro) AS BIGINT) AS score_micro
            FROM scored GROUP BY doc_id
            ORDER BY score_micro DESC, doc_id LIMIT 50),
          lexr AS (
            SELECT doc_id,
                   row_number() OVER (ORDER BY score_micro DESC, doc_id) AS r_lex
            FROM lextop),
          cos AS (
            SELECT c.vec_id AS doc_id,
                   CAST(floor(${Sim.dotSql.format("p.embedding", "c.embedding")}
                         / (sqrt(${Sim.normSql("p.embedding")})
                            * sqrt(${Sim.normSql("c.embedding")})) * 1e6) AS BIGINT) AS cos_e6
            FROM embeddings c, (SELECT embedding FROM embeddings WHERE vec_id = 0) p),
          semtop AS (
            SELECT doc_id, cos_e6 FROM cos ORDER BY cos_e6 DESC, doc_id LIMIT 50),
          semr AS (
            SELECT doc_id,
                   row_number() OVER (ORDER BY cos_e6 DESC, doc_id) AS r_sem
            FROM semtop)
          SELECT coalesce(l.doc_id, s.doc_id) AS doc_id,
                 l.r_lex, s.r_sem,
                 CAST(coalesce(1000000000 // (60 + l.r_lex), 0)
                      + coalesce(1000000000 // (60 + s.r_sem), 0) AS BIGINT) AS rrf_e9
          FROM lexr l FULL OUTER JOIN semr s ON l.doc_id = s.doc_id
          ORDER BY rrf_e9 DESC, doc_id LIMIT 10"""
    },

    // generate_subscripts is 1-based where posexplode is 0-based; the
    // adjacency join and min-position output are made offset-invariant
    // (b.pos = a.pos + 1; first_pos emitted 0-based on both sides)
    "q_search_phrase" ->
      """WITH tok AS (
           SELECT doc_id,
                  unnest(string_split(text, ' ')) AS term,
                  generate_subscripts(string_split(text, ' '), 1) AS pos
           FROM documents WHERE text IS NOT NULL)
         SELECT a.doc_id,
                CAST(count(*) AS BIGINT) AS n_phrase,
                CAST(min(a.pos) - 1 AS INT) AS first_pos
         FROM tok a JOIN tok b
           ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
         WHERE a.term = 'stream' AND b.term = 'join'
         GROUP BY a.doc_id
         ORDER BY n_phrase DESC, a.doc_id
         LIMIT 10"""
  )
}
