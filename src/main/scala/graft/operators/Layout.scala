package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout operators for 100 TB scale: bucketed co-located joins
  * (elide the shuffle entirely for repeated fact⋈fact joins on the same
  * key) and salted joins (split heavy-hitter keys so no single task owns a
  * skewed partition).
  *
  * Reference analog: none — the reference's sink is row-at-a-time Postgres
  * (`/root/reference/src/streams/consumers/evm_consumer.rs:37-59`); these
  * operators are what its bronze tables need once they are parquet at
  * scale: blocks/transactions bucketed by block_number make the
  * blocks⋈transactions FK join (`0001_initial.sql:39`) shuffle-free, and
  * salting covers pathological heights (a chain halt producing millions of
  * txs in one block).
  */
object Layout {

  /** Write `df` bucketed+sorted by `key` as a managed table. Joins between
    * tables bucketed the same way (same key, same bucket count) plan as
    * SortMergeJoin with NO Exchange on either side. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Salted equi-join for skewed keys. The left (skewed) side gets a
    * uniform salt in [0, salt); the right side is replicated `salt` times;
    * the join key becomes (key, salt) so a heavy hitter spreads over
    * `salt` tasks. Semantically identical to `left.join(right, key)` for
    * any 1:N join (right unique on key). AQE's skew handling covers the
    * common case at runtime; explicit salting is for planned-ahead heavy
    * hitters where even one AQE sub-partition would be too large.
    *
    * (A deterministic salt — hash of a unique column — keeps replays
    * byte-stable; pass `saltExpr` accordingly.) */
  def saltedJoin(
      left: DataFrame, right: DataFrame, key: String, salt: Int,
      saltExpr: Column): DataFrame = {
    val l = left.withColumn("__salt", pmod(saltExpr, lit(salt)))
    l.join(replicate(right, salt), Seq(key, "__salt")).drop("__salt")
  }

  /** Replicate `df` `salt` times, tagging copies 0..salt-1 as __salt. */
  def replicate(df: DataFrame, salt: Int): DataFrame =
    df.withColumn("__salt", explode(sequence(lit(0), lit(salt - 1))))
}
