package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.Tables._

/** Training-sequence assembly: the step between a curated document corpus
  * and what a trainer actually consumes.
  *
  *   - [[packSequences]] — concat-and-chunk packing: documents in doc_id
  *     order are laid end-to-end on a global token axis and cut into
  *     fixed-budget sequences (the standard LLM-pretraining packing; a doc
  *     may span a sequence boundary). Output per doc: its global token
  *     offset, owning sequence id, and offset within that sequence.
  *   - [[chunk]] — per-document fixed-size token windows with overlap (the
  *     RAG / long-doc-training chunker): narrow explode, no shuffle at all.
  *
  * Scale shape of packSequences: the global running token offset is the
  * same distributed-rank problem as Aggs.percentilesOf — a single window
  * ordered by doc_id would serialize the corpus through ONE partition. So:
  * range-repartition on doc_id, per-partition running sums under a window
  * PARTITIONED by spark_partition_id (parallelism = partition count), then
  * per-partition totals (≤ #partitions rows) prefix-summed and broadcast
  * back as slice offsets. The slice frame is `localCheckpoint`ed before it
  * is read by both the totals branch and the join branch: partition ids
  * from a sampled repartitionByRange are nondeterministic between
  * re-executions, and materializing once makes the offset algebra immune
  * to exchange-reuse divergence (rather than merely guarded, as in
  * percentilesOf where materialization measured slower).
  */
object Pack {

  /** Whitespace token count — same algebra as q_text_tokencount's
    * ws_tokens and the DuckDB `len(string_split(text, ' '))`. */
  private def nTokens(text: org.apache.spark.sql.Column) =
    size(split(text, " ")).cast("long")

  /** (doc_id, n_tokens, start_offset, seq_id, offset_in_seq) for every doc:
    * global concat-and-chunk packing at `budget` tokens per sequence.
    * The distributed cumsum is [[Slices.globalCumsum]] (this operator
    * introduced the decomposition; the shared helper now carries it);
    * start_offset = the EXCLUSIVE prefix = inclusive cum − own tokens. */
  def packSequences(docs: DataFrame, budget: Long): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    val toks = docs.select(col("doc_id"), nTokens(col("text")).as("n_tokens"))
    Slices.globalCumsum(toks, Seq(col("doc_id")), col("n_tokens"), "cum")
      .withColumn("start_offset", col("cum") - col("n_tokens"))
      .select(col("doc_id"), col("n_tokens"), col("start_offset"),
        expr(s"start_offset div $budget").as("seq_id"),
        (col("start_offset") % budget).as("offset_in_seq"))
  }

  /** Fixed-size token windows with overlap: window w starts at token
    * w·(size−overlap); the last window may be short. A doc at or under
    * `width` tokens yields exactly ONE window, and more generally the last
    * window starts only while previous ones haven't already covered the
    * doc — the naive `(n−1) div step + 1` count emits a trailing window
    * fully contained in its predecessor whenever step < n ≤ lastStart +
    * width, double-indexing the same text. Narrow per-row explode —
    * embarrassingly parallel, the chunk text is fingerprinted (md5) so
    * downstream dedup/indexing never re-tokenizes. */
  def chunk(docs: DataFrame, width: Int, overlap: Int): DataFrame = {
    require(width >= 1, s"chunk width must be >= 1, got $width")
    require(overlap >= 0 && overlap < width,
      s"overlap must be in [0, width), got $overlap")
    val step = width - overlap
    docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("n", size(col("toks")).cast("long"))
      // last id = ceil((n − width)/step), guarded so the div numerator
      // never goes negative (Java div truncates, DuckDB // floors — they
      // disagree exactly on negatives)
      .withColumn("chunk_id",
        explode(sequence(lit(0L),
          when(col("n") <= width, lit(0L))
            .otherwise(expr(s"(n - $width + $step - 1) div $step")))))
      .withColumn("chunk_toks",
        slice(col("toks"), (col("chunk_id") * step + 1).cast("int"), lit(width)))
      .select(col("doc_id"), col("chunk_id"),
        size(col("chunk_toks")).as("chunk_len"),
        md5(array_join(col("chunk_toks"), " ")).as("chunk_md5"))
  }

  // ------------------------------------------------------- oracle queries

  private val seqBudget = 128L
  private val chunkSize = 32
  private val chunkOverlap = 8

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pack_sequences" -> ((s, dir) =>
      packSequences(documents(s, dir), seqBudget).orderBy(col("doc_id"))),

    "q_doc_chunks" -> ((s, dir) =>
      chunk(documents(s, dir).filter(col("doc_id") < 200), chunkSize, chunkOverlap)
        .orderBy(col("doc_id"), col("chunk_id")))
  )

  val oracle: Map[String, String] = Map(
    // the oracle's single global window IS the plan packSequences avoids —
    // fine for DuckDB at sf0.01, not for Spark at 100 TB
    "q_pack_sequences" ->
      s"""WITH t AS (SELECT doc_id,
                CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
              FROM documents),
          c AS (SELECT doc_id, n_tokens,
                CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                  AS start_offset
              FROM t)
          SELECT doc_id, n_tokens, start_offset,
                 CAST(start_offset // $seqBudget AS BIGINT) AS seq_id,
                 CAST(start_offset % $seqBudget AS BIGINT) AS offset_in_seq
          FROM c ORDER BY doc_id""",

    "q_doc_chunks" -> {
      val step = chunkSize - chunkOverlap
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks,
                CAST(len(string_split(text, ' ')) AS BIGINT) AS n
              FROM documents WHERE doc_id < 200),
          e AS (SELECT doc_id, toks, n,
                unnest(range(0, CASE WHEN n <= $chunkSize THEN 1
                  ELSE (n - $chunkSize + $step - 1) // $step + 1 END)) AS chunk_id
              FROM t),
          s AS (SELECT doc_id, chunk_id,
                list_slice(toks, CAST(chunk_id * $step + 1 AS BIGINT),
                  CAST(least(chunk_id * $step + $chunkSize, n) AS BIGINT)) AS ct
              FROM e)
          SELECT doc_id, chunk_id,
                 CAST(len(ct) AS INT) AS chunk_len,
                 md5(array_to_string(ct, ' ')) AS chunk_md5
          FROM s ORDER BY doc_id, chunk_id"""
    }
  )
}
