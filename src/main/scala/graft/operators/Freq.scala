package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate heavy hitters (frequent items) via the Misra–Gries summary —
  * the frequency-analytics member of the sketch tier beside HLL
  * (q_agg_approx_distinct / q_agg_sketch_rollup) and KLL-style quantiles
  * (q_agg_approx_quantile).
  *
  * Why not just groupBy(item).count().orderBy(...).limit(m)? At 100 TB the
  * exact plan shuffles ONE ROW PER DISTINCT KEY — a URL/token/address
  * domain of billions — before the top-k can run. The MG path never
  * shuffles the key domain:
  *
  *   1. per-partition Misra–Gries summary of k counters (mapPartitions,
  *      O(k) memory, one pass);
  *   2. the ≤ partitions·k surviving candidates collect to the driver —
  *      bounded by construction, like a k-means codebook — and broadcast
  *      back as a semi-join filter;
  *   3. exact counts for candidate rows only: the map side drops every
  *      non-candidate row BEFORE the exchange, so the shuffle carries
  *      ≤ partitions·candidates partial sums.
  *
  * Cost shape (ScaleProbe "heavy_hitters", 8M rows, D = 1e4→1e6): the
  * candidate set stays bounded (29 → 110 items for 100× the domain, vs
  * the partitions·k = 2048 ceiling) and the MG wall is flat; the exact
  * plan is still FASTER at D ≤ 1e6 on local[32] because its shuffle isn't
  * yet the bottleneck there. MG trades a second source scan for the
  * shuffle: exact = 1 scan + a one-row-per-distinct-key exchange, MG =
  * 2 scans + a candidates-only exchange. The crossover is where the key
  * domain stops fitting comfortably in the exchange — exactly the 100 TB
  * token/URL regime this operator exists for, and why it is NOT the
  * default top-k (q_topk_global / q_text_top_terms stay exact).
  *
  * Correctness: MG guarantees any item with global frequency > n/k
  * survives in at least one partition's summary (pigeonhole over the
  * per-partition guarantee freq_p > n_p/k ⇒ kept), so the candidate set
  * is a SUPERSET of the true heavy hitters; exact counting then makes the
  * final top-m identical to the exact plan whenever the m-th frequency
  * exceeds n/k (the margin FreqSpec pins on adversarial Zipf data and the
  * fixture words: c_20 = 888 vs n/k = 425 at sf0.01, k = 64). Output is
  * deterministic — exact counts, ties broken by item — unlike reporting
  * the (partition-order-dependent) MG estimates themselves.
  */
object Freq {

  /** Per-partition Misra–Gries survivors for a single string column
    * `item`: (item, mg_count) with ≤ k rows per partition. Estimates are
    * per-partition lower bounds; their only contract is the superset
    * guarantee above. */
  def mgPartials(items: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = items.sparkSession
    import spark.implicits._
    items.select(col("item").cast("string")).as[String]
      .mapPartitions { it =>
        val counts = scala.collection.mutable.HashMap.empty[String, Long]
        it.foreach { w =>
          counts.get(w) match {
            case Some(c) => counts.update(w, c + 1)
            case None if counts.size < k => counts.update(w, 1L)
            case None =>
              // decrement-all step: every counter pays one, zeros evict
              val dead = List.newBuilder[String]
              counts.foreach { case (kk, c) =>
                if (c == 1L) dead += kk else counts.update(kk, c - 1L)
              }
              dead.result().foreach(counts.remove)
          }
        }
        counts.iterator
      }
      .toDF("item", "mg_count")
  }

  /** Exact top-m frequent items restricted to the MG candidate set:
    * (item, n) ordered by (n desc, item). Equals the exact global top-m
    * whenever the m-th frequency > n/k. */
  def heavyHitters(items: DataFrame, m: Int, k: Int): DataFrame = {
    val spark = items.sparkSession
    val cand = candidates(items, k)
    items.join(broadcast(cand), Seq("item"), "left_semi")
      .groupBy(col("item")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("item"))
      .limit(m)
  }

  /** The ≤ partitions·k candidate items (bounded by construction — safe to
    * broadcast by the same argument as an ANN codebook). */
  def candidates(items: DataFrame, k: Int): DataFrame =
    mgPartials(items, k).select(col("item")).distinct()

  // ---- driver contract ----------------------------------------------------

  private def words(s: SparkSession, dir: String): DataFrame =
    graft.catalog.Tables.documents(s, dir)
      .select(explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("item"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact-counted top-10 words through the MG candidate path. The oracle
    // is the plain exact top-10: identical output, different plan — the
    // sketch prunes the key domain before the only wide shuffle.
    "q_agg_heavy_hitters" -> ((s, dir) => heavyHitters(words(s, dir), m = 10, k = 64))
  )

  val oracle: Map[String, String] = Map(
    "q_agg_heavy_hitters" ->
      """SELECT w AS item, CAST(count(*) AS BIGINT) AS n
         FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
               FROM documents)
         GROUP BY w
         ORDER BY n DESC, item
         LIMIT 10"""
  )
}
