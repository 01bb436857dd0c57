package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.Tables._

/** Text-analysis / LLM-training-data operators over `documents`
  * (SURVEY.md §2B "LLM-data-pipeline extensions" + north-star text ops:
  * language-ID heuristic, quality scoring, token counting, fingerprinting,
  * near-duplicate detection).
  *
  * Scale notes (100 TB posture):
  *   - Word counting / quality scoring are narrow per-row ops + one hash agg.
  *   - The near-dup Jaccard self-join is the classic token-inverted-index
  *     join; unbounded it is O(sum_token df²). Here the oracle query bounds
  *     the candidate set by doc_id (fixed work at every SF); the unbounded
  *     API is Dedup.invertedIndexNearDups (df-capped index, exact verify)
  *     and the sub-linear scale paths (MinHash/LSH banding, SimHash) live
  *     in graft.operators.Dedup — band-bucket joins replace the full
  *     pairwise product.
  *   - Everything uses built-in codegen'd functions; no UDFs.
  */
object Text {

  /** Tiny stopword list for quality scoring (shared with the oracle SQL
    * and with graft.pipeline.TrainingData — one definition). */
  val stopwords: Seq[String] = Seq("the", "a", "an", "and", "or", "of", "to", "in")

  /** quality = uniq_ratio · (1 − stop_ratio) over a text column — the
    * single definition behind q_text_quality and the curation gate. */
  def qualityExpr(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val toks = split(text, " ")
    (size(array_distinct(toks)).cast("double") / size(toks)) *
      (lit(1.0) -
        size(array_intersect(toks, array(stopwords.map(lit): _*))).cast("double") /
          size(toks))
  }

  /** [[qualityExpr]] with the degenerate-document guard (empty or
    * < minTokens docs score 0, not a perfect 1.0) — ONE definition shared
    * by the curation gate (TrainingData.withQuality) and q_sample_budget;
    * [[guardedQualitySql]] is its DuckDB mirror. */
  def guardedQualityExpr(text: org.apache.spark.sql.Column,
      minTokens: Int = 3): org.apache.spark.sql.Column =
    when(length(trim(text)) === 0, 0.0)
      .when(size(split(text, " ")) < minTokens, 0.0)
      .otherwise(qualityExpr(text))

  /** DuckDB mirror of [[guardedQualityExpr]] over a column reference. */
  def guardedQualitySql(col: String, minTokens: Int = 3): String =
    s"""CASE WHEN len(trim($col)) = 0 THEN 0.0
             WHEN len(string_split($col, ' ')) < $minTokens THEN 0.0
             ELSE (CAST(len(list_distinct(string_split($col, ' '))) AS DOUBLE)
                     / len(string_split($col, ' ')))
                  * (1.0 - CAST(len(list_intersect(list_distinct(string_split($col, ' ')),
                        ['the','a','an','and','or','of','to','in'])) AS DOUBLE)
                     / len(string_split($col, ' ')))
        END"""

  /** Token-budget selection (q_sample_budget's operator, reusable so
    * ScaleProbe can replay it on adversarially skewed corpora): keep the
    * highest-quality docs whose cumulative token count fits `budget` —
    * prefix of the (quality desc, doc_id) ordering under a running-sum
    * cap. Docs with null text are out of scope (unscoreable), by rule.
    *
    * Scale shape — NOT a single global ORDER BY window (one-partition
    * sort at 100 TB), and NOT a per-score-group window either
    * (partitionBy(q_e4) serializes each score value through ONE task; a
    * boilerplate-heavy corpus concentrating one quantized score becomes
    * a single-task straggler). [[graft.operators.Slices.globalCumsum]]
    * applied to the full selection ordering (q_e4 desc, doc_id): the
    * range partitioner splits on BOTH keys, so a heavy score group
    * spreads across slices; ties inside one score break by doc_id, so
    * the result is deterministic. ScaleProbe "budget_skew" measures the
    * de-skewed plan on an all-one-score corpus. */
  def budgetSelect(docs: DataFrame, budget: Long): DataFrame = {
    val scored = docs.filter(col("text").isNotNull)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        floor(guardedQualityExpr(col("text")) * 1e4).cast("long").as("q_e4"))
    graft.operators.Slices.globalCumsum(scored,
        Seq(col("q_e4").desc, col("doc_id")), col("n_tokens"), "cum_tokens")
      .filter(col("cum_tokens") <= budget)
      .select(col("doc_id"), col("n_tokens"), col("q_e4"), col("cum_tokens"))
      .orderBy(col("doc_id"))
  }

  /** Corpus text normalization — the cleaning pass that precedes every
    * dedup/quality stage in a training-data pipeline: strip markup, mask
    * emails, collapse whitespace, lowercase, trim. Composed from
    * codegen'd regexp_replace with conservative ASCII character classes so
    * the EXACT same patterns run in Java regex (Spark) and RE2 (DuckDB
    * oracle) with identical semantics. One definition (q_text_clean +
    * any pipeline caller). */
  def cleanExpr(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    trim(lower(regexp_replace(
      regexp_replace(
        regexp_replace(text, "<[^>]+>", " "), // markup tags → space
        "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+", "[email]"), // mask emails
      "[ \\t\\r\\n]+", " "))) // collapse whitespace runs

  /** md5 bucket in [0, 65536) of an id column — the single definition
    * behind q_sample_hash and TrainingData.withSplit. */
  def hashBucketExpr(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(md5(id.cast("string")), 1, 4), 16, 10).cast("int")

  /** q_sample_hash / TrainingData split thresholds (~80/10/10 of 65536). */
  val trainBucket: Int = 52429
  val valBucket: Int = 58982

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // tokenize → explode → global top-20 terms.
    "q_text_wordcount" -> ((s, dir) => {
      import s.implicits._
      documents(s, dir)
        .select(explode(split($"text", " ")).as("token"))
        .groupBy($"token")
        .agg(count(lit(1)).as("n"))
        .orderBy($"n".desc, $"token")
        .limit(20)
    }),

    // per-language corpus stats: doc count, avg/median chars.
    "q_text_stats_lang" -> ((s, dir) => {
      import s.implicits._
      documents(s, dir)
        .groupBy($"lang")
        .agg(
          count(lit(1)).as("n_docs"),
          (sum($"n_chars").cast("double") / count(lit(1))).as("avg_chars"),
          round(median($"n_chars"), 4).as("med_chars"))
        .orderBy($"lang")
    }),

    // n-gram-free language-ID heuristic: marker-token membership. On real
    // corpora the markers would be per-language stopword sets; the synthetic
    // docs share one vocabulary, so the heuristic output is mostly 'und' —
    // the tested semantics are the token-set membership mechanics.
    "q_text_langid" -> ((s, dir) => {
      import s.implicits._
      val toks = split($"text", " ")
      documents(s, dir)
        .select(
          $"doc_id", $"lang",
          when(array_contains(toks, "the") && array_contains(toks, "and"), "en")
            .when(array_contains(toks, "el") || array_contains(toks, "la"), "es")
            .otherwise("und").as("lang_guess"))
        .orderBy($"doc_id")
    }),

    // quality scoring: token count, distinct ratio, stopword ratio, mean
    // token length — composited into one score (qualityExpr, shared with
    // the TrainingData curation gate).
    "q_text_quality" -> ((s, dir) => {
      import s.implicits._
      val toks = split($"text", " ")
      documents(s, dir)
        .select(
          $"doc_id",
          size(toks).as("n_tokens"),
          (size(array_distinct(toks)).cast("double") / size(toks)).as("uniq_ratio"),
          (size(array_intersect(toks, array(stopwords.map(lit): _*))).cast("double") / size(toks))
            .as("stop_ratio"),
          ($"n_chars".cast("double") / size(toks)).as("chars_per_tok"),
          qualityExpr($"text").as("quality"))
        // raw doubles, not round(x,4): these are small-denominator rationals
        // that land exactly on .00005 boundaries, where Spark (shortest-
        // string HALF_UP) and DuckDB (multiply+round) legitimately disagree;
        // the unrounded single-op divisions/products are IEEE-identical.
        .orderBy($"doc_id")
    }),

    // token counting: whitespace tokens + a BPE-ish subword estimate
    // (ceil(len/4) units per token, the ~4-chars-per-BPE-token rule).
    "q_text_tokencount" -> ((s, dir) => {
      import s.implicits._
      val toks = split($"text", " ")
      documents(s, dir)
        .select(
          $"doc_id",
          size(toks).as("ws_tokens"),
          aggregate(
            transform(toks, t => ceil(length(t).cast("double") / 4.0)),
            lit(0L), (acc, x) => acc + x).as("bpe_units"),
          size(array_distinct(toks)).as("vocab"))
        .orderBy($"doc_id")
    }),

    // document fingerprint: canonicalize (distinct tokens, sorted) + hash.
    // Exact-dedup key that survives token reordering/repetition.
    // Feature hashing (the HashingVectorizer trick): token → fixed 64-dim
    // bucket by the md5 recipe behind hashBucketExpr, per-doc sparse
    // (bucket, count) vectors — bounded-width features with NO vocabulary
    // pass, the property that matters at 100 TB (a vocab dictionary is a
    // full extra aggregate + broadcast; the hash needs neither). Same
    // conv(md5) ⇔ CAST('0x'||…) portability as q_sample_hash.
    "q_text_hash_vectorize" -> ((s, dir) => {
      import s.implicits._
      documents(s, dir)
        .filter($"doc_id" < 50)
        .select($"doc_id", explode(split($"text", " ")).as("token"))
        .filter($"token" =!= "")
        .withColumn("bucket",
          pmod(conv(substring(md5($"token"), 1, 4), 16, 10).cast("int"), lit(64)))
        .groupBy($"doc_id", $"bucket")
        .agg(count(lit(1)).as("n"))
        .orderBy($"doc_id", $"bucket")
    }),

    "q_text_fingerprint" -> ((s, dir) => {
      import s.implicits._
      val canon = array_join(array_sort(array_distinct(split($"text", " "))), " ")
      documents(s, dir)
        .select($"doc_id", md5(canon).as("fingerprint"))
        .orderBy($"doc_id")
    }),

    // Sequential Poisson sampling [Ohlsson, 1998], the weighted member of
    // the hash-sampling family: priority = u/w where u is a 48-bit md5
    // draw and w the document's size weight, keep the bottom-k — longer
    // documents are proportionally likelier, the whole draw is a pure
    // function of doc_id (reproducible across runs/engines, no rand()),
    // and at 100 TB the bottom-k is a TakeOrdered (no global sort, no
    // second pass; the (k+1)-th priority is the threshold that makes
    // Horvitz–Thompson subset-sum estimates unbiased [Duffield et al.,
    // priority sampling]). Integer u div w keeps every engine bit-equal.
    "q_sample_priority" -> ((s, dir) => {
      import s.implicits._
      documents(s, dir).filter($"text".isNotNull)
        .select($"doc_id", (length($"text") + 1).cast("long").as("w"),
          conv(substring(md5($"doc_id".cast("string")), 1, 12), 16, 10)
            .cast("long").as("u"))
        .select($"doc_id", $"w", expr("u div w").as("pri"))
        .orderBy($"pri", $"doc_id")
        .limit(200)
    }),

    // reproducible sampling: md5-bucket assignment (NOT rand() — hash-based
    // sampling is replayable, engine-portable, and stable under
    // repartitioning; the standard trick for train/val/test splits at
    // scale). Bucket = first 4 md5 hex chars of the key → [0, 65536).
    "q_sample_hash" -> ((s, dir) => {
      import s.implicits._
      documents(s, dir)
        .withColumn("bucket", hashBucketExpr($"doc_id"))
        .withColumn("split",
          when($"bucket" < trainBucket, "train") // ~80%
            .when($"bucket" < valBucket, "val") // ~10%
            .otherwise("test")) // ~10%
        .filter($"split" =!= "train") // output the held-out 20%
        .select($"doc_id", $"lang", $"bucket", $"split")
        .orderBy($"doc_id")
    }),

    // Per-doc keyword extraction: top-3 terms by TF-IDF — the classic
    // "what is this document about" summarizer (retrieval indexing,
    // dataset cards, topic drill-down). idf is floor-e4-quantized BEFORE
    // the tf multiply (ln() is libm-ULP-dependent; the q_text_collocations
    // recipe), so the ranking score tf·idf_e4 is an exact BIGINT and the
    // per-doc top-3 is deterministic (ties by term). Cost: one
    // postings-sized (doc, term) agg, a vocab-sized df agg broadcast
    // back, and a doc-keyed window — the ranking never shuffles more
    // than the postings.
    "q_text_keywords" -> ((s, dir) => {
      import s.implicits._
      val docs = documents(s, dir).filter($"text".isNotNull)
      // n_docs stays INSIDE the plan (a broadcast 1-row aggregate crossed
      // into the vocab-sized df frame — the oracle's `n` CTE, exactly):
      // a driver-side docs.count() here would run a full corpus scan every
      // time the plan is BUILT, including plan-only inspection (PlanSpec /
      // EXPLAIN), and a second one when it runs.
      val nDocs = docs.agg(count(lit(1)).as("n_docs"))
      val tf = docs
        .select($"doc_id",
          explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("term"))
        .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
      val df = tf.groupBy($"term").agg(count(lit(1)).as("df"))
        .crossJoin(broadcast(nDocs))
        .withColumn("idf_e4",
          floor(log($"n_docs".cast("double") / $"df") * 1e4).cast("long"))
        .drop("n_docs")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"doc_id")
        .orderBy(($"tf" * $"idf_e4").desc, $"term")
      tf.join(broadcast(df), "term")
        .withColumn("score_e4", $"tf" * $"idf_e4")
        .withColumn("rank", row_number().over(w))
        .filter($"rank" <= 3)
        .select($"doc_id", $"rank", $"term", $"tf", $"df", $"score_e4")
        .orderBy($"doc_id", $"rank")
    }),

    // Per-doc n-gram NOVELTY: the fraction of a doc's 3-gram shingles
    // whose global FIRST occurrence (min doc_id) is this doc — the
    // diversity/novelty score data-selection uses to prefer documents
    // that add new content over ones re-treading the corpus (the scoring
    // complement of the dedup tier: dedup REMOVES repeats, novelty
    // QUANTIFIES contribution). One shuffle on the shingle key builds
    // the first-occurrence index (one row per distinct shingle); the
    // per-doc tally joins against that index — shingle-stream-sized,
    // never doc×doc. Score is exact integer permille-e4
    // (n_novel·10000 div n_shingles): no float anywhere.
    "q_text_novelty" -> ((s, dir) => {
      import s.implicits._
      val docs = documents(s, dir)
      // the shingle explode feeds BOTH the first-occurrence index and
      // the per-doc tally join — materialize it once (optimization
      // round 19, the bigram-logprob fusion; the shingles3 expression
      // is the query's dominant per-row cost)
      val shg = docs.select($"doc_id",
        explode(graft.operators.Dedup.shingles3($"text")).as("sh"))
        .localCheckpoint()
      val firstOcc = shg.groupBy($"sh").agg(min($"doc_id").as("first_doc"))
      val perDoc = shg.join(firstOcc, "sh")
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_shingles"),
          sum(when($"first_doc" === $"doc_id", 1L).otherwise(0L)).as("n_novel"))
      docs.select($"doc_id")
        .join(perDoc, Seq("doc_id"), "left")
        .select($"doc_id",
          coalesce($"n_shingles", lit(0L)).as("n_shingles"),
          coalesce($"n_novel", lit(0L)).as("n_novel"),
          when(coalesce($"n_shingles", lit(0L)) === 0, lit(null).cast("long"))
            .otherwise(expr("n_novel * 10000 div n_shingles")).as("novelty_e4"))
        .orderBy($"doc_id")
    }),

    // Token-budget selection — the data-mixing primitive behind "take
    // the best N tokens of this source" curation (quality-ranked greedy
    // selection; DoReMi/mix-weight pipelines execute exactly this per
    // source). Plan and de-skew rationale: [[budgetSelect]].
    "q_sample_budget" -> ((s, dir) =>
      budgetSelect(documents(s, dir), budget = 10000L)),

    // normalization pass: markup strip + email mask + whitespace collapse
    // + lowercase/trim, fingerprinted so the output stays small while the
    // whole cleaned string is still value-checked (md5).
    "q_text_clean" -> ((s, dir) => {
      import s.implicits._
      documents(s, dir)
        .select(
          $"doc_id",
          md5(cleanExpr($"text")).as("clean_md5"),
          length(cleanExpr($"text")).as("clean_len"))
        .orderBy($"doc_id")
    }),

    // stratified rebalancing: per-language sampling RATES via the same
    // deterministic md5 bucket as q_sample_hash — the data-mixing op
    // (downsample the dominant language, keep the rest): en keeps 50%,
    // everything else 100%. Hash-based ⇒ replayable and repartition-stable,
    // unlike rand()-based sample().
    "q_sample_stratified" -> ((s, dir) => {
      import s.implicits._
      val rate = when($"lang" === "en", 0.5).otherwise(1.0)
      documents(s, dir)
        .withColumn("bucket", hashBucketExpr($"doc_id"))
        .filter($"bucket" < rate * 65536)
        .select($"doc_id", $"lang", $"bucket")
        .orderBy($"doc_id")
    }),

    // Collocation extraction via pointwise mutual information: adjacent
    // word pairs scored by PMI = ln(n_bigrams·c_ab / (c_a·c_b)) — the
    // "which words belong together" corpus statistic (phrase induction,
    // tokenizer merge candidates). All counts exact integers from two
    // hash aggs (bigrams, unigrams) + two broadcast-scale joins on the
    // vocab-sized frames; ln() is libm-ULP-dependent so the score is
    // floor-quantized e4 (unigram_logprob recipe). Support ≥ 20 keeps
    // the report to statistically meaningful pairs.
    "q_text_collocations" -> ((s, dir) => {
      import s.implicits._
      val toks = documents(s, dir)
        .select(filter(split(lower($"text"), " "), w => w =!= "").as("ws"))
      val bi = toks.select(explode(zip_with(
          slice($"ws", lit(1), size($"ws") - 1),
          slice($"ws", lit(2), size($"ws") - 1),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
        .groupBy($"p.w1", $"p.w2").agg(count(lit(1)).as("c_ab"))
      val uni = toks.select(explode($"ws").as("w"))
        .groupBy($"w").agg(count(lit(1)).as("c"))
      val nBi = bi.agg(sum($"c_ab").as("n"))
      bi.filter($"c_ab" >= 20)
        .join(broadcast(uni.select($"w".as("w1"), $"c".as("c_a"))), "w1")
        .join(broadcast(uni.select($"w".as("w2"), $"c".as("c_b"))), "w2")
        .crossJoin(broadcast(nBi))
        .select($"w1", $"w2", $"c_ab",
          floor(log($"n".cast("double") * $"c_ab" / ($"c_a" * $"c_b")) * 1e4)
            .cast("long").as("pmi_e4"))
        .orderBy($"pmi_e4".desc, $"w1", $"w2")
        .limit(30)
    }),

    // Class-balanced downsampling: every event_type thinned toward the
    // MINORITY class size by a per-class md5-bucket threshold
    // (65536·n_min div n_c, exact integer math). Threshold balancing is
    // the 100 TB shape — one broadcast of per-class thresholds, no
    // per-class rank window; class sizes land within binomial noise of
    // n_min (exact-count balancing would need the distributed-rank
    // machinery, q_agg_gini's shape). Deterministic: the kept set is a
    // pure predicate of (event_id, event_type).
    "q_sample_class_balance" -> ((s, dir) => {
      import s.implicits._
      val e = events(s, dir).select($"event_id", $"event_type")
      val counts = e.groupBy($"event_type").agg(count(lit(1)).as("n_c"))
      val thr = counts
        .crossJoin(broadcast(counts.agg(min($"n_c").as("n_min"))))
        .select($"event_type", expr("(65536 * n_min) div n_c").as("thr"))
      e.withColumn("bucket", hashBucketExpr($"event_id"))
        .join(broadcast(thr), "event_type")
        .filter($"bucket" < $"thr")
        .select($"event_id", $"event_type")
        .orderBy($"event_id")
    }),

    // intra-document repetition signals — the "remove repetitive documents"
    // quality filter: adjacent duplicate tokens and the repeated-phrase
    // fraction (1 − distinct 3-grams / total 3-grams). Raw double division
    // (small-denominator rational — round(,4) is the non-portable hazard).
    "q_text_repetition" -> ((s, dir) => {
      import s.implicits._
      val toks = split($"text", " ")
      val l = slice(toks, lit(1), size(toks) - 1)
      val r = slice(toks, lit(2), size(toks) - 1)
      val adj = size(filter(zip_with(l, r, (a, b) => a === b), x => x))
      val nSh = greatest(size(toks) - 2, lit(0))
      documents(s, dir)
        .select(
          $"doc_id",
          adj.as("n_adj_repeats"),
          when(nSh === 0, 0.0)
            .otherwise(lit(1.0) -
              size(graft.operators.Dedup.shingles3($"text")).cast("double") / nSh)
            .as("rep3_fraction"))
        .orderBy($"doc_id")
    }),

    // Keyword extraction: top-3 terms per document ranked by term frequency
    // with rarity (ascending document frequency) then term as tie-breaks —
    // a fully integer-valued ranking (no float score can flip rank order
    // between engines); ln(N/df) idf is carried as an informational column
    // (irrational-valued → round(,4) is portable). Scale shape: two hash
    // aggs (doc×term, then term) + one window over the tf table — the fact
    // rows are touched once by the explode.
    // Zipf rank-frequency fit per language — the vocabulary-distribution
    // diagnostic an LLM-corpus curation pass runs (a healthy natural-
    // language corpus slopes ≈ −1 in log-log; templated/synthetic text
    // flattens or cliffs). OLS slope over (ln rank, ln tf) of the top
    // 200 corpus terms: the lns are floor-quantized e3 BIGINTs per row
    // (the idf_e4 convention — transcendental outputs never ship as
    // round(double, n)), every sum after that exact integer, and the
    // final slope a VARIABLE-divisor bias-shifted integer division
    // (numerator is negative for a falling curve, where Spark's
    // truncating div and DuckDB's flooring // would split). One token
    // explode + one (lang, term) aggregate + one windowed top-200 —
    // postings-shaped, never doc×doc.
    "q_text_zipf" -> ((s, dir) => {
      import s.implicits._
      val B = 1048576L
      val tf = documents(s, dir)
        .filter($"text".isNotNull)
        .select($"lang", explode(split($"text", " ")).as("term"))
        .filter($"term" =!= "")
        .groupBy($"lang", $"term").agg(count(lit(1)).as("tf"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"lang").orderBy($"tf".desc, $"term")
      tf.withColumn("rank", row_number().over(w).cast("long"))
        .filter($"rank" <= 200)
        .select($"lang",
          floor(log($"rank".cast("double")) * 1e3).cast("long").as("x"),
          floor(log($"tf".cast("double")) * 1e3).cast("long").as("y"))
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_terms"),
          sum($"x").as("sx"), sum($"y").as("sy"),
          sum($"x" * $"y").as("sxy"), sum($"x" * $"x").as("sxx"))
        .filter($"n_terms" >= 20)
        .select($"lang", $"n_terms",
          expr(s"""((n_terms * sxy - sx * sy) * 10000L
                    + ${B}L * (n_terms * sxx - sx * sx))
                   div (n_terms * sxx - sx * sx) - ${B}L""").as("slope_e4"))
        .orderBy($"lang")
    }),

    "q_text_top_terms" -> ((s, dir) => {
      import s.implicits._
      val docs = documents(s, dir)
      val tf = docs
        .select($"doc_id", explode(split($"text", " ")).as("term"))
        .filter($"term" =!= "")
        .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
      val df = tf.groupBy($"term").agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("n_docs"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"doc_id").orderBy($"tf".desc, $"df".asc, $"term")
      tf.join(df, Seq("term"))
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= 3)
        .crossJoin(broadcast(n))
        // idf runs through ln() — transcendental, libm-dependent in the
        // last ULP — so the output is the floor-quantized BIGINT
        // convention (avg_nll_e4 recipe), never round(double, 4)
        .select($"doc_id", $"rn", $"term", $"tf", $"df",
          floor(log($"n_docs".cast("double") / $"df") * 1e4)
            .cast("long").as("idf_e4"))
        .orderBy($"doc_id", $"rn")
    }),

    // near-dup detection: token-set Jaccard >= 0.5 over a bounded candidate
    // set (doc_id < 300 — fixed work at every SF; LSH is the scale path).
    "q_text_dedup_near" -> ((s, dir) => {
      import s.implicits._
      val docs = documents(s, dir).filter($"doc_id" < 300)
      val toks = docs.select($"doc_id",
        explode(array_distinct(split($"text", " "))).as("tok"))
      val sizes = toks.groupBy($"doc_id").agg(count(lit(1)).as("n_tok"))
      val common = toks.as("a")
        .join(toks.as("b"), col("a.tok") === col("b.tok") &&
          col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .agg(count(lit(1)).as("common"))
      common
        .join(sizes.select($"doc_id".as("d1"), $"n_tok".as("n1")), "d1")
        .join(sizes.select($"doc_id".as("d2"), $"n_tok".as("n2")), "d2")
        .select($"d1", $"d2",
          ($"common".cast("double") / ($"n1" + $"n2" - $"common")).as("jaccard"))
        .filter($"jaccard" >= 0.5)
        .orderBy($"d1", $"d2")
    }),

    // PII detection + redaction — the privacy pass every training-data
    // pipeline runs before release. The synthetic corpus carries no PII,
    // so the fixture deterministically plants emails/IPv4s/phones derived
    // from doc_id (identical construction in the oracle SQL); the OPERATOR
    // under test is the detect+redact expression chain: count each class,
    // then mask in sequence. Narrow per-row codegen'd regexps — no
    // shuffle, embarrassingly parallel at any scale.
    "q_pii_redact" -> ((s, dir) => {
      import s.implicits._
      val planted = documents(s, dir)
        .select($"doc_id", concat($"text",
          when($"doc_id" % 3 === 0,
            concat(lit(" contact user"), $"doc_id", lit("@example.com")))
            .otherwise(lit("")),
          when($"doc_id" % 5 === 0,
            concat(lit(" host 10.0."), ($"doc_id" % 256).cast("string"),
              lit("."), ($"doc_id" % 100).cast("string"))).otherwise(lit("")),
          when($"doc_id" % 7 === 0,
            concat(lit(" call +"), ($"doc_id" % 90 + 10).cast("string"),
              lit("-"), ($"doc_id" % 900 + 100).cast("string"),
              lit("-"), ($"doc_id" % 9000 + 1000).cast("string")))
            .otherwise(lit(""))).as("text"))
      val redacted = Seq(piiEmail -> "<EMAIL>", piiIp -> "<IP>", piiPhone -> "<PHONE>")
        .foldLeft($"text": org.apache.spark.sql.Column)(
          (c, p) => regexp_replace(c, p._1, p._2))
      planted.select($"doc_id",
          regexp_count($"text", lit(piiEmail)).cast("int").as("n_emails"),
          regexp_count($"text", lit(piiIp)).cast("int").as("n_ips"),
          regexp_count($"text", lit(piiPhone)).cast("int").as("n_phones"),
          md5(redacted).as("clean_md5"))
        .orderBy($"doc_id")
    }),

    // Deterministic weighted sampling WITHOUT replacement
    // (Efraimidis–Spirakis): each doc draws u from its md5 bucket
    // (replayable, repartition-stable — no rand()), keys on ln(u)/w with
    // w = n_chars, and the k largest keys ARE the weighted sample. At
    // scale this is a TakeOrdered top-k — no shuffle of the corpus, no
    // per-row state; longer docs win proportionally to their weight.
    "q_sample_weighted" -> ((s, dir) => {
      import s.implicits._
      // Determinism: ln() is NOT bit-identical across math libraries, and
      // (round-4 lesson) round(key, 4) is WORSE here, not safer — the
      // top-50 keys sit at ~1e-4, so 4-dp rounding boundaries are dense at
      // the value scale and the .00005-tie divergence fired. Instead the
      // key is quantized to an exact BIGINT micro-key: floor(key * 1e6).
      // A last-ulp ln divergence moves the scaled key by ~2e-9/w, so the
      // probability either engine lands across an integer boundary is
      // ~1e-10 per doc; both engines then order, cut, and EMIT the same
      // exact integer. No double leaves the query.
      documents(s, dir)
        .withColumn("u",
          (hashBucketExpr($"doc_id") + 0.5) / 65536.0)
        .withColumn("sample_key",
          floor(log($"u") / $"n_chars" * 1e6).cast("long"))
        .orderBy($"sample_key".desc, $"doc_id")
        .limit(50)
        .select($"doc_id", $"lang", $"n_chars", $"sample_key")
    }),

    // Domain-mixing weights: per-language token share and the upsampling
    // factor that would equalize shares (uniform target) — the numbers a
    // data-mixing step feeds into q_sample_stratified's per-group rates.
    // Both ratios are emitted as RAW doubles: the divisions run on exact
    // integer aggregates, so the IEEE result is bit-identical in both
    // engines — while round(double, 4) near a .00005 tie is NOT portable
    // (the repo's recorded DuckDB↔Spark rounding divergence). Two tiny
    // hash aggs; the per-language frame is broadcast-joined to its total.
    "q_mix_weights" -> ((s, dir) => {
      import s.implicits._
      val t = documents(s, dir)
        .select($"lang", size(split($"text", " ")).cast("long").as("n_tokens"))
      val per = t.groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"), sum($"n_tokens").as("toks"))
      val tot = per.agg(sum($"toks").as("total"), count(lit(1)).as("n_langs"))
      per.crossJoin(broadcast(tot))
        .select($"lang", $"n_docs", $"toks".as("n_tokens"),
          ($"toks".cast("double") / $"total").as("token_share"),
          ($"total".cast("double") / ($"n_langs" * $"toks"))
            .as("uniform_weight"))
        .orderBy($"lang")
    }),

    // Unigram negative-log-likelihood quality score — the perplexity-proxy
    // filter (docs of corpus-rare vocabulary score high; boilerplate of
    // corpus-common tokens scores low) that LLM curation runs when no
    // model is in the loop. Shape at scale: one token hash agg builds the
    // unigram table (vocab-sized → broadcast back), one scalar total, one
    // per-doc agg — the fact rows are touched twice, never shuffled wide.
    "q_text_unigram_logprob" -> ((s, dir) => {
      import s.implicits._
      val tok = documents(s, dir)
        .select($"doc_id", explode(split($"text", " ")).as("term"))
        .filter($"term" =!= "")
      val freqs = tok.groupBy($"term").agg(count(lit(1)).as("tf"))
      val total = freqs.agg(sum($"tf").as("n"))
      // Portability hardening (round-4 q_sample_weighted lesson): emit a
      // floor-quantized BIGINT, not round(double, 4). floor() is identical
      // in both engines while round() diverges at exact .00005 ties; what
      // remains is a last-ulp ln() divergence crossing an integer
      // boundary (~1e-12 per doc) instead of a dense rounding hazard.
      tok.join(broadcast(freqs), "term")
        .crossJoin(broadcast(total))
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          floor(avg(-log($"tf".cast("double") / $"n".cast("double"))) * 1e4)
            .cast("long").as("avg_nll_e4"))
        .orderBy($"doc_id")
    }),

    // DSIR-shaped importance weighting [Xie et al. 2023, arXiv:2302.03169]:
    // per-doc importance = Σ_tokens ln(p_target(w) / p_base(w)), target =
    // the 'en' slice, base = the whole corpus, both unigram LMs Laplace-
    // smoothed over the base vocab (+0.5 / +0.5·V — OOV-proof for tokens
    // the target never saw). The data-selection primitive: pick raw-pool
    // docs that look most like the target domain. Per-token log-ratios are
    // floored into 1e-6 integer units; per-doc sums are BIGINT
    // (order-proof); top-50 by (weight desc, doc_id). Scale shape: two
    // vocab-bounded term aggregates (broadcast at closed vocab, key
    // shuffle at open), one token-stream join, TakeOrdered — the same
    // envelope as q_text_unigram_logprob plus one broadcast.
    "q_sample_dsir" -> ((s, dir) => {
      import s.implicits._
      val tok = documents(s, dir).filter($"text".isNotNull)
        .select($"doc_id", $"lang", explode(split($"text", " ")).as("term"))
        .filter($"term" =!= "")
      val base = tok.groupBy($"term").agg(count(lit(1)).as("cb"))
      val tgt = tok.filter($"lang" === "en")
        .groupBy($"term").agg(count(lit(1)).as("ct"))
      val scal = base.agg(count(lit(1)).as("v"), sum($"cb").as("nb"))
        .crossJoin(tok.filter($"lang" === "en").agg(count(lit(1)).as("nt")))
      val ratio = base.join(tgt, Seq("term"), "left")
        .crossJoin(broadcast(scal))
        .select($"term",
          floor((log((coalesce($"ct", lit(0L)) + 0.5) / ($"nt" + $"v" * 0.5))
            - log(($"cb" + 0.5) / ($"nb" + $"v" * 0.5))) * 1e6 + 0.5)
            .cast("long").as("lr_micro"))
      tok.join(broadcast(ratio), "term")
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_tokens"), sum($"lr_micro").as("weight_micro"))
        .select($"doc_id", $"n_tokens", $"weight_micro",
          round($"weight_micro" / 1e6, 6).as("weight"))
        .orderBy($"weight_micro".desc, $"doc_id")
        .limit(50)
    }),

    // Interpolated BIGRAM negative log-likelihood — the next quality-filter
    // tier above q_text_unigram_logprob (a KenLM-shaped fluency score
    // without a model artifact): p(w2|w1) = 0.8·c12/c1 + 0.2·c2/Nb, all
    // counts from the corpus's own bigram table. Per-bigram NLL terms are
    // floored into 1e-6 integer units BEFORE the per-doc sum (the
    // q_search_bm25 discipline — strictly addition-order-proof where the
    // unigram query's avg-of-doubles accepts a last-ulp hazard). Scale
    // shape: one explode → (w1, w2) hash agg for the LM table; scoring
    // joins the doc bigram stream to the table on the bigram key (vocab²-
    // bounded — broadcast here, a key-shuffle at open-vocab scale); the
    // per-doc result is a map-side-absorbable hash agg.
    "q_text_bigram_logprob" -> ((s, dir) => {
      import s.implicits._
      val toks = documents(s, dir).filter($"text".isNotNull)
        .select($"doc_id", split($"text", " ").as("toks"))
      // Fused (optimization round 19, guide §2.3/§2.4): the tokenize +
      // zip_with-explode subtree fed FOUR count aggregates plus the
      // final scoring join — five evaluations of the explode per action.
      // It now materializes ONCE (inside the timed region), and the
      // marginal counts DERIVE from the joint one: c1(w1) = Σ_w2 c12,
      // c2(w2) = Σ_w1 c12, nb = Σ c12 — exact count algebra, so three
      // full-corpus explode+aggregate passes become two tiny aggregates
      // over the (w1, w2) count frame (vocabulary²-bounded, not
      // corpus-bounded — the at-scale win).
      val big = toks
        .select($"doc_id", explode(zip_with(
          slice($"toks", lit(1), size($"toks") - 1),
          slice($"toks", lit(2), size($"toks") - 1),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
        .select($"doc_id", $"bg.w1".as("w1"), $"bg.w2".as("w2"))
        .filter($"w1" =!= "" && $"w2" =!= "")
        .localCheckpoint()
      val c12 = big.groupBy($"w1", $"w2").agg(count(lit(1)).as("c12"))
        .localCheckpoint()
      val c1 = c12.groupBy($"w1").agg(sum($"c12").as("c1"))
      val c2 = c12.groupBy($"w2").agg(sum($"c12").as("c2"))
      val nb = c12.agg(sum($"c12").as("nb"))
      val lm = c12.join(c1, "w1").join(c2, "w2").crossJoin(broadcast(nb))
        .select($"w1", $"w2",
          floor(-log(lit(0.8) * ($"c12".cast("double") / $"c1".cast("double"))
            + lit(0.2) * ($"c2".cast("double") / $"nb".cast("double"))) * 1e6 + 0.5)
            .cast("long").as("nll_micro"))
      big.join(broadcast(lm), Seq("w1", "w2"))
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          sum($"nll_micro").as("nll_micro_sum"))
        .select($"doc_id", $"n_bigrams", $"nll_micro_sum",
          round($"nll_micro_sum" / $"n_bigrams" / 1e6, 6).as("avg_nll"))
        .orderBy($"doc_id")
    })
  )

  /** PII patterns — Java-regex and RE2 (DuckDB) compatible subset: no
    * backreferences, no lookaround; `\b` and bounded repetition are safe
    * in both. One definition, interpolated into the oracle SQL. */
  val piiEmail = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val piiIp = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val piiPhone = "\\+\\d{2}-\\d{3}-\\d{4}"

  val oracle: Map[String, String] = Map(
    "q_sample_weighted" ->
      """SELECT doc_id, lang, n_chars, sample_key FROM (
           SELECT doc_id, lang, n_chars,
                  CAST(floor(ln((CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS INT) + 0.5)
                     / 65536.0) / n_chars * 1e6) AS BIGINT) AS sample_key
           FROM documents)
         ORDER BY sample_key DESC, doc_id
         LIMIT 50""",

    "q_mix_weights" ->
      """WITH t AS (SELECT lang, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
                    FROM documents),
          per AS (SELECT lang, count(*) AS n_docs,
                         CAST(sum(n_tokens) AS BIGINT) AS toks
                  FROM t GROUP BY lang),
          tot AS (SELECT CAST(sum(toks) AS BIGINT) AS total,
                         count(*) AS n_langs FROM per)
          SELECT lang, n_docs, toks AS n_tokens,
                 CAST(toks AS DOUBLE) / total AS token_share,
                 CAST(total AS DOUBLE) / (n_langs * toks) AS uniform_weight
          FROM per, tot
          ORDER BY lang""",

    "q_text_unigram_logprob" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                      FROM documents),
          tok2 AS (SELECT * FROM tok WHERE term <> ''),
          freqs AS (SELECT term, count(*) AS tf FROM tok2 GROUP BY term),
          tot AS (SELECT sum(tf) AS n FROM freqs)
          SELECT doc_id, count(*) AS n_tokens,
                 CAST(floor(avg(-ln(CAST(tf AS DOUBLE) / CAST(n AS DOUBLE))) * 1e4) AS BIGINT) AS avg_nll_e4
          FROM tok2 JOIN freqs USING (term), tot
          GROUP BY doc_id
          ORDER BY doc_id""",

    "q_sample_dsir" ->
      """WITH tok AS (
           SELECT doc_id, lang, unnest(string_split(text, ' ')) AS term
           FROM documents WHERE text IS NOT NULL),
         tok2 AS (SELECT * FROM tok WHERE term <> ''),
         base AS (SELECT term, CAST(count(*) AS BIGINT) AS cb FROM tok2 GROUP BY 1),
         tgt AS (SELECT term, CAST(count(*) AS BIGINT) AS ct
                 FROM tok2 WHERE lang = 'en' GROUP BY 1),
         scal AS (
           SELECT (SELECT CAST(count(*) AS BIGINT) FROM base) AS v,
                  (SELECT CAST(sum(cb) AS BIGINT) FROM base) AS nb,
                  (SELECT CAST(count(*) AS BIGINT) FROM tok2 WHERE lang = 'en') AS nt),
         ratio AS (
           SELECT term,
                  CAST(floor((ln((coalesce(ct, 0) + 0.5) / (nt + v * 0.5))
                              - ln((cb + 0.5) / (nb + v * 0.5))) * 1e6 + 0.5)
                       AS BIGINT) AS lr_micro
           FROM base LEFT JOIN tgt USING (term), scal)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                CAST(sum(lr_micro) AS BIGINT) AS weight_micro,
                round(CAST(sum(lr_micro) AS BIGINT) / 1e6, 6) AS weight
         FROM tok2 JOIN ratio USING (term)
         GROUP BY doc_id
         ORDER BY weight_micro DESC, doc_id
         LIMIT 50""",

    "q_text_bigram_logprob" ->
      """WITH big AS (
           SELECT doc_id, u[1] AS w1, u[2] AS w2
           FROM (SELECT doc_id,
                        unnest(list_zip(toks[1:len(toks)-1], toks[2:len(toks)])) AS u
                 FROM (SELECT doc_id, string_split(text, ' ') AS toks
                       FROM documents WHERE text IS NOT NULL))
           WHERE u[1] <> '' AND u[2] <> ''),
         c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM big GROUP BY 1, 2),
         c1 AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM big GROUP BY 1),
         c2 AS (SELECT w2, CAST(count(*) AS BIGINT) AS c2 FROM big GROUP BY 1),
         nb AS (SELECT CAST(count(*) AS BIGINT) AS nb FROM big),
         lm AS (
           SELECT w1, w2,
                  CAST(floor(-ln(0.8 * (CAST(c12 AS DOUBLE) / CAST(c1 AS DOUBLE))
                                 + 0.2 * (CAST(c2 AS DOUBLE) / CAST(nb AS DOUBLE)))
                             * 1e6 + 0.5) AS BIGINT) AS nll_micro
           FROM c12 JOIN c1 USING (w1) JOIN c2 USING (w2), nb)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
                CAST(sum(nll_micro) AS BIGINT) AS nll_micro_sum,
                round(CAST(sum(nll_micro) AS BIGINT) / count(*) / 1e6, 6) AS avg_nll
         FROM big JOIN lm USING (w1, w2)
         GROUP BY doc_id
         ORDER BY doc_id""",

    // same deterministic PII planting, then count + sequential global
    // redaction ('g' flag: DuckDB defaults to first-match, Spark to all)
    "q_pii_redact" ->
      s"""WITH planted AS (
            SELECT doc_id, text ||
              CASE WHEN doc_id % 3 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END ||
              CASE WHEN doc_id % 5 = 0 THEN ' host 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.' || CAST(doc_id % 100 AS VARCHAR) ELSE '' END ||
              CASE WHEN doc_id % 7 = 0 THEN ' call +' || CAST(doc_id % 90 + 10 AS VARCHAR) || '-' || CAST(doc_id % 900 + 100 AS VARCHAR) || '-' || CAST(doc_id % 9000 + 1000 AS VARCHAR) ELSE '' END
              AS text
            FROM documents)
          SELECT doc_id,
                 CAST(len(regexp_extract_all(text, '$piiEmail')) AS INT) AS n_emails,
                 CAST(len(regexp_extract_all(text, '$piiIp')) AS INT) AS n_ips,
                 CAST(len(regexp_extract_all(text, '$piiPhone')) AS INT) AS n_phones,
                 md5(regexp_replace(regexp_replace(regexp_replace(text,
                   '$piiEmail', '<EMAIL>', 'g'),
                   '$piiIp', '<IP>', 'g'),
                   '$piiPhone', '<PHONE>', 'g')) AS clean_md5
          FROM planted ORDER BY doc_id""",

    "q_text_wordcount" ->
      """SELECT token, count(*) AS n
         FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
         GROUP BY token
         ORDER BY n DESC, token
         LIMIT 20""",

    "q_text_stats_lang" ->
      """SELECT lang,
                count(*) AS n_docs,
                CAST(sum(n_chars) AS DOUBLE) / count(*) AS avg_chars,
                round(CAST(median(n_chars) AS DOUBLE), 4) AS med_chars
         FROM documents GROUP BY lang ORDER BY lang""",

    "q_text_langid" ->
      """SELECT doc_id, lang,
                CASE WHEN list_contains(string_split(text, ' '), 'the')
                      AND list_contains(string_split(text, ' '), 'and') THEN 'en'
                     WHEN list_contains(string_split(text, ' '), 'el')
                       OR list_contains(string_split(text, ' '), 'la') THEN 'es'
                     ELSE 'und' END AS lang_guess
         FROM documents ORDER BY doc_id""",

    "q_text_quality" ->
      """SELECT doc_id, n_tokens, uniq_ratio, stop_ratio, chars_per_tok,
                uniq_ratio * (1.0 - stop_ratio) AS quality
         FROM (
           SELECT doc_id,
                  CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
                  CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                        / len(string_split(text, ' ')) AS uniq_ratio,
                  CAST(len(list_intersect(list_distinct(string_split(text, ' ')),
                                 ['the','a','an','and','or','of','to','in'])) AS DOUBLE)
                        / len(string_split(text, ' ')) AS stop_ratio,
                  CAST(n_chars AS DOUBLE) / len(string_split(text, ' ')) AS chars_per_tok
           FROM documents)
         ORDER BY doc_id""",

    "q_text_tokencount" ->
      """SELECT doc_id,
                CAST(len(string_split(text, ' ')) AS INT) AS ws_tokens,
                CAST(list_sum(list_transform(string_split(text, ' '),
                  t -> CAST(ceil(CAST(length(t) AS DOUBLE) / 4.0) AS BIGINT))) AS BIGINT) AS bpe_units,
                CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS vocab
         FROM documents ORDER BY doc_id""",

    "q_text_hash_vectorize" ->
      """SELECT doc_id, bucket, CAST(count(*) AS BIGINT) AS n
         FROM (
           SELECT doc_id,
                  CAST('0x' || substr(md5(token), 1, 4) AS INT) % 64 AS bucket
           FROM (
             SELECT doc_id, unnest(string_split(text, ' ')) AS token
             FROM documents WHERE doc_id < 50)
           WHERE token <> '')
         GROUP BY doc_id, bucket
         ORDER BY doc_id, bucket""",

    "q_text_fingerprint" ->
      """SELECT doc_id,
                md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fingerprint
         FROM documents ORDER BY doc_id""",

    "q_sample_priority" ->
      """SELECT doc_id, w, u // w AS pri
         FROM (
           SELECT doc_id, CAST(length(text) + 1 AS BIGINT) AS w,
                  CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12) AS BIGINT) AS u
           FROM documents WHERE text IS NOT NULL)
         ORDER BY pri, doc_id
         LIMIT 200""",

    "q_sample_hash" ->
      """SELECT doc_id, lang, bucket, split
         FROM (
           SELECT doc_id, lang, bucket,
                  CASE WHEN bucket < 52429 THEN 'train'
                       WHEN bucket < 58982 THEN 'val'
                       ELSE 'test' END AS split
           FROM (
             SELECT doc_id, lang,
                    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS INT) AS bucket
             FROM documents))
         WHERE split <> 'train'
         ORDER BY doc_id""",

    "q_text_keywords" ->
      """WITH docs AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
         n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM docs),
         tf AS (
           SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
           FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
                 FROM docs)
           GROUP BY 1, 2),
         df AS (
           SELECT term, CAST(count(*) AS BIGINT) AS df,
                  CAST(floor(ln(n_docs / count(*)) * 10000) AS BIGINT) AS idf_e4
           FROM tf, n GROUP BY term, n_docs),
         ranked AS (
           SELECT tf.doc_id, tf.term, tf.tf, df.df,
                  tf.tf * df.idf_e4 AS score_e4,
                  row_number() OVER (PARTITION BY tf.doc_id
                    ORDER BY tf.tf * df.idf_e4 DESC, tf.term) AS rank
           FROM tf JOIN df USING (term))
         SELECT doc_id, CAST(rank AS INT) AS rank, term, tf, df,
                CAST(score_e4 AS BIGINT) AS score_e4
         FROM ranked WHERE rank <= 3
         ORDER BY doc_id, rank""",

    "q_text_novelty" ->
      s"""WITH shg AS (
            SELECT doc_id, unnest(${graft.operators.Dedup.shingleSql}) AS sh
            FROM documents),
          first_occ AS (SELECT sh, min(doc_id) AS first_doc FROM shg GROUP BY 1),
          per_doc AS (
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
                   CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
            FROM shg JOIN first_occ USING (sh) GROUP BY 1)
          SELECT d.doc_id,
                 coalesce(p.n_shingles, 0) AS n_shingles,
                 coalesce(p.n_novel, 0) AS n_novel,
                 CAST(CASE WHEN coalesce(p.n_shingles, 0) = 0 THEN NULL
                      ELSE p.n_novel * 10000 // p.n_shingles END AS BIGINT) AS novelty_e4
          FROM documents d LEFT JOIN per_doc p USING (doc_id)
          ORDER BY d.doc_id""",

    // oracle = the straightforward single global cumsum; the engine's
    // range-slice decomposition must reproduce its prefix sums exactly
    "q_sample_budget" ->
      s"""WITH scored AS (
           SELECT doc_id,
                  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                  CAST(floor(10000 * ${guardedQualitySql("text")}) AS BIGINT) AS q_e4
           FROM documents WHERE text IS NOT NULL),
         cum AS (
           SELECT doc_id, n_tokens, q_e4,
                  sum(n_tokens) OVER (ORDER BY q_e4 DESC, doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
           FROM scored)
         SELECT doc_id, n_tokens, q_e4, CAST(cum_tokens AS BIGINT) AS cum_tokens
         FROM cum WHERE cum_tokens <= 10000
         ORDER BY doc_id""",

    "q_sample_stratified" ->
      """SELECT doc_id, lang, bucket
         FROM (SELECT doc_id, lang,
                      CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS INT) AS bucket
               FROM documents)
         WHERE bucket < (CASE WHEN lang = 'en' THEN 0.5 ELSE 1.0 END) * 65536
         ORDER BY doc_id""",

    "q_text_collocations" ->
      """WITH toks AS (
           SELECT list_filter(string_split(lower(text), ' '), w -> w <> '') AS ws
           FROM documents),
         bi AS (
           SELECT ws[i] AS w1, ws[i + 1] AS w2
           FROM toks, unnest(generate_series(1, len(ws) - 1)) t(i)),
         bic AS (SELECT w1, w2, count(*) AS c_ab FROM bi GROUP BY 1, 2),
         unic AS (
           SELECT w, count(*) AS c
           FROM (SELECT unnest(ws) AS w FROM toks) GROUP BY w),
         nbi AS (SELECT sum(c_ab) AS n FROM bic)
         SELECT b.w1, b.w2, CAST(b.c_ab AS BIGINT) AS c_ab,
                CAST(floor(ln(CAST(n.n AS DOUBLE) * b.c_ab / (a.c * c.c)) * 10000)
                  AS BIGINT) AS pmi_e4
         FROM bic b
         JOIN unic a ON a.w = b.w1
         JOIN unic c ON c.w = b.w2
         CROSS JOIN nbi n
         WHERE b.c_ab >= 20
         ORDER BY pmi_e4 DESC, w1, w2
         LIMIT 30""",

    "q_sample_class_balance" ->
      """WITH counts AS (
           SELECT event_type, count(*) AS n_c FROM events GROUP BY 1),
         thr AS (
           SELECT event_type,
                  (65536 * (SELECT min(n_c) FROM counts)) // n_c AS thr
           FROM counts)
         SELECT e.event_id, e.event_type
         FROM (SELECT event_id, event_type,
                      CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 4) AS INT)
                        AS bucket
               FROM events) e
         JOIN thr USING (event_type)
         WHERE e.bucket < thr.thr
         ORDER BY e.event_id""",

    "q_text_repetition" ->
      """SELECT doc_id,
                CAST(len(list_filter(
                  list_zip(toks[1:len(toks)-1], toks[2:len(toks)]),
                  p -> p[1] = p[2])) AS INT) AS n_adj_repeats,
                CASE WHEN greatest(len(toks) - 2, 0) = 0 THEN 0.0
                     ELSE 1.0 - CAST(len(list_distinct(list_transform(
                            range(1, greatest(len(toks) - 2, 0) + 1),
                            i -> concat(toks[i], ' ', toks[i + 1], ' ', toks[i + 2])))) AS DOUBLE)
                          / greatest(len(toks) - 2, 0) END AS rep3_fraction
         FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
         ORDER BY doc_id""",

    "q_text_clean" ->
      """SELECT doc_id,
                md5(trim(lower(regexp_replace(
                  regexp_replace(
                    regexp_replace(text, '<[^>]+>', ' ', 'g'),
                    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+', '[email]', 'g'),
                  '[ \t\r\n]+', ' ', 'g')))) AS clean_md5,
                CAST(length(trim(lower(regexp_replace(
                  regexp_replace(
                    regexp_replace(text, '<[^>]+>', ' ', 'g'),
                    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+', '[email]', 'g'),
                  '[ \t\r\n]+', ' ', 'g')))) AS INT) AS clean_len
         FROM documents ORDER BY doc_id""",

    "q_text_zipf" ->
      """WITH tf AS (
           SELECT lang, term, CAST(count(*) AS BIGINT) AS tf FROM (
             SELECT lang, unnest(string_split(text, ' ')) AS term
             FROM documents WHERE text IS NOT NULL)
           WHERE term <> ''
           GROUP BY lang, term),
         ranked AS (
           SELECT lang,
                  CAST(floor(ln(CAST(rank AS DOUBLE)) * 1e3) AS BIGINT) AS x,
                  CAST(floor(ln(CAST(tf AS DOUBLE)) * 1e3) AS BIGINT) AS y
           FROM (SELECT lang, tf,
                        row_number() OVER (PARTITION BY lang
                          ORDER BY tf DESC, term) AS rank
                 FROM tf)
           WHERE rank <= 200),
         mo AS (
           SELECT lang, CAST(count(*) AS BIGINT) AS n_terms,
                  CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
                  CAST(sum(x * y) AS BIGINT) AS sxy,
                  CAST(sum(x * x) AS BIGINT) AS sxx
           FROM ranked GROUP BY lang
           HAVING count(*) >= 20)
         SELECT lang, n_terms,
                CAST(((n_terms * sxy - sx * sy) * 10000
                       + 1048576 * (n_terms * sxx - sx * sx))
                     // (n_terms * sxx - sx * sx) - 1048576 AS BIGINT) AS slope_e4
         FROM mo
         ORDER BY lang""",

    "q_text_top_terms" ->
      """WITH tf AS (
           SELECT doc_id, term, count(*) AS tf FROM (
             SELECT doc_id, unnest(string_split(text, ' ')) AS term
             FROM documents)
           WHERE term <> ''
           GROUP BY doc_id, term),
         df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         n AS (SELECT count(*) AS n_docs FROM documents)
         SELECT doc_id, rn, term, tf, df,
                CAST(floor(ln(CAST(n_docs AS DOUBLE) / df) * 1e4) AS BIGINT) AS idf_e4
         FROM (
           SELECT tf.doc_id, tf.term, tf.tf, df.df,
                  CAST(row_number() OVER (PARTITION BY tf.doc_id
                    ORDER BY tf.tf DESC, df.df ASC, tf.term) AS INT) AS rn
           FROM tf JOIN df USING (term)) t
         CROSS JOIN n
         WHERE rn <= 3
         ORDER BY doc_id, rn""",

    "q_text_dedup_near" ->
      """WITH toks AS (
           SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
           FROM documents WHERE doc_id < 300),
         sizes AS (SELECT doc_id, count(*) AS n_tok FROM toks GROUP BY doc_id),
         common AS (
           SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS common
           FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id
           GROUP BY a.doc_id, b.doc_id)
         SELECT d1, d2,
                CAST(common AS DOUBLE) / (s1.n_tok + s2.n_tok - common) AS jaccard
         FROM common
         JOIN sizes s1 ON s1.doc_id = d1
         JOIN sizes s2 ON s2.doc_id = d2
         WHERE CAST(common AS DOUBLE) / (s1.n_tok + s2.n_tok - common) >= 0.5
         ORDER BY d1, d2"""
  )
}
