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
  private[queries] val queryTerms = Seq("spark", "join", "stream", "vector", "agg")

  private def microBm25(tf: Column, dl: Column, idf: Column, avgdl: Column): Column =
    floor(
      idf * (tf * lit(K1 + 1.0)) / (tf + lit(K1) * (lit(1.0 - B) + lit(B) * dl / avgdl)) * 1e6 + 0.5
    ).cast("long")

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
    // postings restricted to the query terms BEFORE the aggregate, and
    // the doc length CARRIED THROUGH it (dl is doc-functional, so
    // max(dl) reconstructs it) — the scoring side needs no corpus-sized
    // dl join, so after this shuffle everything is postings-sized
    val tf = docs
      .select($"doc_id", size($"toks").cast("long").as("dl"),
        explode($"toks").as("term"))
      .filter($"term".isin(terms: _*))
      .groupBy($"doc_id", $"term")
      .agg(count(lit(1)).cast("long").as("tf"), max($"dl").as("dl"))
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // BM25 top-10 docs for a fixed 5-term disjunctive query.
    "q_search_bm25" -> ((s, dir) =>
      bm25(documents(s, dir).select(col("doc_id"), col("text")),
        queryTerms, k = 10)),

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

  val oracle: Map[String, String] = Map(
    "q_search_bm25" -> {
      val terms = queryTerms.map(t => s"'$t'").mkString(", ")
      s"""WITH docs AS (
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
            FROM tf JOIN idf USING (term) JOIN dl USING (doc_id))
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms,
                 round(sum(micro) / 1e6, 6) AS score,
                 CAST(sum(micro) AS BIGINT) AS score_micro
          FROM scored
          GROUP BY doc_id
          ORDER BY score_micro DESC, doc_id
          LIMIT 10"""
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
