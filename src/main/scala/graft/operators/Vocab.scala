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

  /** Rows-only query (BPE learning is iterative — not one-shot
    * SQL-expressible, so no DuckDB oracle; VocabSpec carries correctness):
    * learn 10 merges on a bounded corpus slice, emit per-doc unit counts
    * and the serialized tokenization. */
  val queries: Map[String, (org.apache.spark.sql.SparkSession, String) => DataFrame] = Map(
    "q_vocab_bpe" -> ((s, dir) => {
      val docs = graft.catalog.Tables.documents(s, dir).filter(col("doc_id") < 100)
      val merges = learnMerges(docs, k = 10)
      tokenize(docs, merges)
        .select(col("doc_id"), size(col("units")).as("n_units"),
          array_join(col("units"), "|").as("units_str"))
        .orderBy(col("doc_id"))
    }))

  val oracle: Map[String, String] = Map.empty
}
