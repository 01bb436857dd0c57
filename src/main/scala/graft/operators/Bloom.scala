package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-prefiltered joins — the scale path BETWEEN broadcast-hash and
  * shuffled sort-merge.
  *
  * At 100 TB a semi join against a large key set has two standard plans:
  * broadcast-hash (dim must fit as a hash relation — tens of GB per 10⁹
  * keys: it doesn't) or shuffle both sides (the fact side pays full
  * shuffle even though most rows won't match). The bloom filter is the
  * third point on the curve: ~1.2 GB per 10⁹ keys at 1% fpp ships to every
  * executor as a plan constant, the fact side is pre-filtered AT THE SCAN
  * (graft.functions.BloomMightContain is codegen'd into the scan stage's
  * projection), and only surviving rows — true matches plus the fpp tail —
  * enter the shuffle. The exact join afterwards removes false positives,
  * so results are IDENTICAL to the unfiltered join (q_join_bloom's oracle
  * is the plain semi-join SQL).
  *
  * This is the manual form of Spark's runtime-injected bloom
  * (spark.sql.optimizer.runtime.bloomFilter.*), for paths the optimizer
  * won't cover: a dim computed by an earlier job, a filter reused across
  * many queries (build once, ship bytes), or a non-planner consumer.
  */
object Bloom {

  /** Serialized bloom over `dim`'s long key column. One count (sizes the
    * filter) + one sketch aggregation — both dim-sized, run once, reusable
    * across any number of probe queries. */
  def buildBloom(dim: DataFrame, key: String, fpp: Double = 0.01): Array[Byte] = {
    val n = math.max(dim.count(), 1L)
    val bf = dim.stat.bloomFilter(key, n, fpp)
    val out = new ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  /** Predicate: `keyCol` might be in the serialized bloom. */
  def mightContain(keyCol: Column, bloomBytes: Array[Byte]): Column =
    call_function("graft_bloom_might_contain", keyCol, lit(bloomBytes))

  /** Exact semi join with a bloom prefilter on the fact side: rows
    * rejected by the bloom (the vast majority under a selective dim) never
    * shuffle; the residual exact join keeps the result identical. */
  def semiJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, fpp: Double = 0.01): DataFrame = {
    val bytes = buildBloom(dim.select(col(dimKey)), dimKey, fpp)
    // no distinct() on the dim: left_semi already emits each fact row at
    // most once whatever the dim's duplication — deduping a
    // hundreds-of-millions-key dim would add a full extra exchange+agg.
    // Alias the dim key so factKey == dimKey can't resolve ambiguously.
    val dimAliased = dim.select(col(dimKey).as("__graft_dim_key"))
    fact.filter(mightContain(col(factKey), bytes))
      .join(dimAliased, col(factKey) === col("__graft_dim_key"), "left_semi")
  }
}
