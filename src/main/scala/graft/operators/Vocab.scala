package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary induction — the tokenizer-training half
  * of an LLM data pipeline, DataFrame-native.
  *
  * Classic BPE trains on the WORD-FREQUENCY table, not the raw corpus:
  * distinct words with counts are orders of magnitude smaller than the
  * corpus itself (Zipf), so each merge iteration is one aggregation over a
  * small frame regardless of corpus size. The corpus is touched exactly
  * once (word count — one shuffle); each of the k merge rounds is:
  *
  *   1. adjacent-pair counts weighted by word frequency (one groupBy on
  *      the vocab-sized frame),
  *   2. argmax pair with deterministic tie-break (count desc, pair asc),
  *   3. greedy left-to-right merge of that pair inside every word's unit
  *      array (narrow higher-order fold, no shuffle).
  *
  * Only the merge table (k pairs) ever reaches the driver — the same
  * broadcast-scale justification as Ann.kmeans centroids.
  */
object Vocab {

  /** Word → initial character units ("low" → ["l","o","w"]). Spark's
    * split(s, "") emits a trailing "" (Java split with limit −1) — filtered. */
  def charUnits(word: Column): Column =
    filter(split(word, ""), u => u =!= "")

  /** One greedy left-to-right merge pass of the pair (a, b) over a unit
    * array: ["l","o","w"] under ("l","o") → ["lo","w"]; overlaps resolve
    * leftmost-first (["a","a","a"] under ("a","a") → ["aa","a"]). */
  def mergeOnce(units: Column, a: String, b: String): Column = {
    val merged = a + b
    aggregate(
      units,
      struct(array().cast("array<string>").as("acc"), lit("").as("prev")),
      (st, u) => {
        val acc = st.getField("acc")
        val prev = st.getField("prev")
        when(prev === "", struct(acc.as("acc"), u.as("prev")))
          .when(prev === a && u === b,
            struct(concat(acc, array(lit(merged))).as("acc"), lit("").as("prev")))
          .otherwise(struct(concat(acc, array(prev)).as("acc"), u.as("prev")))
      },
      st => when(st.getField("prev") === "", st.getField("acc"))
        .otherwise(concat(st.getField("acc"), array(st.getField("prev")))))
  }

  /** Adjacent unit pairs of an array as structs (a, b). */
  private def adjacentPairs(units: Column): Column =
    zip_with(
      slice(units, lit(1), size(units) - 1),
      slice(units, lit(2), size(units) - 1),
      (x, y) => struct(x.as("a"), y.as("b")))

  /** Learn up to k merges from the corpus' text column. Stops early when
    * no pair reaches minCount. Deterministic: ties break on (a, b) order. */
  def learnMerges(docs: DataFrame, k: Int, minCount: Long = 2L): Seq[(String, String)] = {
    var words = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .select(charUnits(col("w")).as("units"), col("n"))
      .localCheckpoint() // vocab-sized; each round folds on materialized units
    val merges = ArrayBuffer.empty[(String, String)]
    var continue = true
    var round = 0
    while (continue && round < k) {
      val top = words
        .select(explode(adjacentPairs(col("units"))).as("p"), col("n"))
        .groupBy(col("p.a"), col("p.b")).agg(sum(col("n")).as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty || top.head.getAs[Long]("cnt") < minCount) {
        continue = false
      } else {
        val (a, b) = (top.head.getAs[String]("a"), top.head.getAs[String]("b"))
        merges += ((a, b))
        words = words
          .select(mergeOnce(col("units"), a, b).as("units"), col("n"))
          .localCheckpoint()
        round += 1
      }
    }
    merges.toSeq
  }

  /** Apply a learned merge list (in order) to a word column. */
  def applyMerges(word: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(charUnits(word)) { case (c, (a, b)) => mergeOnce(c, a, b) }

  /** Tokenize a text column under the learned vocab: (doc_id, units per
    * word flattened) plus unit counts before/after — the compression the
    * vocabulary buys. */
  def tokenize(docs: DataFrame, merges: Seq[(String, String)]): DataFrame =
    docs.select(
      col("doc_id"),
      flatten(transform(
        filter(split(col("text"), " "), w => w =!= ""),
        w => applyMerges(w, merges))).as("units"))

  /** The FIXED demo merge table of q_text_bpe_apply — multi-level chains
    * ("t a"→…→"table") so merge ORDER is load-bearing, over pairs the
    * synthetic corpus actually contains. */
  val demoMerges: Seq[(String, String)] = Seq(
    ("t", "a"), ("ta", "b"), ("tab", "l"), ("tabl", "e"),
    ("s", "c"), ("sc", "a"), ("sca", "n"),
    ("v", "a"), ("va", "l"), ("r", "o"))

  /** Learn 10 merges on a bounded corpus slice, emit per-doc unit counts
    * and the serialized tokenization. Fully oracle-checked: the iterative
    * learning loop unrolls into [[bpeOracleSql]]'s chained CTEs. */
  val queries: Map[String, (org.apache.spark.sql.SparkSession, String) => DataFrame] = Map(
    "q_vocab_bpe" -> ((s, dir) => {
      val docs = graft.catalog.Tables.documents(s, dir).filter(col("doc_id") < 100)
      val merges = learnMerges(docs, k = 10)
      tokenize(docs, merges)
        .select(col("doc_id"), size(col("units")).as("n_units"),
          array_join(col("units"), "|").as("units_str"))
        .orderBy(col("doc_id"))
    }),

    // The APPLY half of the tokenizer pipeline: q_vocab_bpe trains on a
    // slice; production then encodes the WHOLE corpus under the frozen
    // merge table — embarrassingly parallel (applyMerges is a narrow
    // per-row fold: 10 greedy left-to-right merge passes per word, no
    // shuffle until the per-doc stats agg), which is exactly the shape a
    // 100 TB tokenization pass needs. Fixed demo merges (merge order is
    // load-bearing through the t→ta→tab→tabl→table chain); per-doc
    // token count + merged-unit count. The oracle replays the greedy
    // fold with unit-boundary-safe nested replaces (each unit wrapped
    // |u|, pattern |a||b| — flanking bars cannot be shared between
    // adjacent matches, so leftmost-nonoverlapping replace ≡ the fold).
    "q_text_bpe_apply" -> ((s, dir) => {
      // empty/space-only/NULL texts drop BEFORE tokenizing: the oracle's
      // word unnest emits zero rows for such docs, so they must be absent
      // here too. The predicate runs on the RAW text — filtering on
      // size(units) would duplicate the whole 10-merge fold expression
      // into the filter (measured 0.17 s → 14 s: the tripled giant
      // expression falls out of whole-stage codegen).
      val docs = graft.catalog.Tables.documents(s, dir)
        .filter(col("text").isNotNull && length(trim(col("text"))) > 0)
      tokenize(docs, demoMerges)
        .select(col("doc_id"),
          size(col("units")).cast("long").as("n_units"),
          size(filter(col("units"), u => length(u) > 1)).cast("long").as("n_merged"))
        .orderBy(col("doc_id"))
    }))

  /** The k merge rounds of [[learnMerges]] unrolled into DuckDB SQL — one
    * CTE block per round over the word-frequency state `w{r}(w, n, units)`:
    * position explode with lookahead (f), weighted adjacent-pair counts
    * (pc), argmax with the same (cnt desc, a, b) tie-break and minCount 2
    * (best — empty makes the round a no-op, matching early stop), greedy
    * LEFTMOST overlap resolution as island-detection + even-offset parity
    * (st: a run of consecutive matches keeps positions at even distance
    * from the run head — exactly the left fold's "consume and reset"), and
    * the rebuild (w{r}: merged unit at each start, the consumed position
    * dropped). Tokenization reuses the final state: per-word merge
    * evolution IS applyMerges(word), and every doc word appears in the
    * vocab frame, so a join on w replaces re-deriving units per document.
    * MATERIALIZED pins each round's state: DuckDB otherwise inlines the
    * CTE chain into an exponentially expanded plan (observed as thousands
    * of parquet re-opens at prototype time). Verified cell-identical to
    * the Spark result (100/100 rows, matching column types) at sf0.01. */
  private def bpeOracleSql(k: Int): String = {
    val rounds = (1 to k).map { r =>
      val p = r - 1
      s"""
  e$r AS (SELECT w, n, unnest(list_transform(units, (x, j) -> {'u': x, 'j': j})) AS s, units FROM w$p),
  f$r AS MATERIALIZED (SELECT w, n, s['u'] AS u, s['j'] AS j, units[s['j'] + 1] AS nxt FROM e$r),
  pc$r AS (SELECT u AS a, nxt AS b, sum(n) AS cnt FROM f$r WHERE nxt IS NOT NULL GROUP BY u, nxt),
  best$r AS (SELECT a, b FROM pc$r WHERE cnt >= 2 ORDER BY cnt DESC, a, b LIMIT 1),
  mt$r AS (SELECT f.w, f.j FROM f$r f, best$r b WHERE f.u = b.a AND f.nxt = b.b),
  st$r AS MATERIALIZED (SELECT w, j FROM (
      SELECT w, j, (j - min(j) OVER (PARTITION BY w, g)) % 2 AS par
      FROM (SELECT w, j, j - row_number() OVER (PARTITION BY w ORDER BY j) AS g FROM mt$r)
    ) WHERE par = 0),
  w$r AS MATERIALIZED (
    SELECT f.w AS w, f.n AS n,
           list(CASE WHEN st.j IS NOT NULL THEN f.u || f.nxt ELSE f.u END ORDER BY f.j) AS units
    FROM f$r f
    LEFT JOIN st$r st ON st.w = f.w AND st.j = f.j
    WHERE NOT EXISTS (SELECT 1 FROM st$r s2 WHERE s2.w = f.w AND s2.j = f.j - 1)
    GROUP BY f.w, f.n
  )"""
    }.mkString(",")
    s"""WITH
  words AS MATERIALIZED (
    SELECT w, count(*) AS n FROM (
      SELECT unnest(string_split(text, ' ')) AS w FROM documents WHERE doc_id < 100)
    WHERE w <> '' GROUP BY w),
  w0 AS (SELECT w, n, list_transform(range(1, len(w) + 1), j -> w[j]) AS units FROM words),$rounds,
  dw AS (
    SELECT doc_id, unnest(list_transform(
      list_filter(string_split(text, ' '), x -> x <> ''), (x, k) -> {'w': x, 'k': k})) AS s
    FROM documents WHERE doc_id < 100),
  tk AS (SELECT d.doc_id, d.s['k'] AS k, v.units AS units
         FROM dw d JOIN w$k v ON v.w = d.s['w']),
  fl AS (SELECT doc_id, flatten(list(units ORDER BY k)) AS flat FROM tk GROUP BY doc_id)
SELECT doc_id, CAST(len(flat) AS INT) AS n_units, array_to_string(flat, '|') AS units_str
FROM fl ORDER BY doc_id"""
  }

  val oracle: Map[String, String] = Map(
    "q_vocab_bpe" -> bpeOracleSql(10),

    "q_text_bpe_apply" -> {
      val chain = demoMerges.foldLeft("s") { case (acc, (a, b)) =>
        s"replace($acc, '|$a||$b|', '|$a$b|')"
      }
      s"""WITH w AS (SELECT doc_id,
            unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS wd
          FROM documents),
        u AS (SELECT doc_id,
            array_to_string(list_transform(range(1, len(wd) + 1),
              j -> '|' || wd[j] || '|'), '') AS s
          FROM w),
        m AS (SELECT doc_id, $chain AS s FROM u),
        per AS (SELECT doc_id,
            CAST((len(string_split(s, '|')) - 1) // 2 AS BIGINT) AS nu,
            CAST(len(list_filter(string_split(s, '|'), x -> len(x) > 1)) AS BIGINT) AS nm
          FROM m)
        SELECT doc_id, CAST(sum(nu) AS BIGINT) AS n_units,
               CAST(sum(nm) AS BIGINT) AS n_merged
        FROM per GROUP BY doc_id ORDER BY doc_id"""
    })
}
