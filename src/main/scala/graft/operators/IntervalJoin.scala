package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed interval-overlap join WITHOUT an equi key.
  *
  * `a.start <= b.end AND b.start <= a.end` has no equality Spark's planner
  * can hash on, so the naive form plans as BroadcastNestedLoopJoin (when one
  * side fits) or CartesianProduct (when neither does) — |a|·|b| comparisons,
  * the canonical scale killer for range predicates (cf. the as-of join's
  * fan-out problem, solved in graft.plans.AsOf by a merge operator; here
  * neither side is keyed at all).
  *
  * Bucket decomposition turns it into an equi-join: each interval explodes
  * into the coarse time buckets it covers, candidates meet on equal bucket
  * id, and the true `overlap` predicate filters inside the join. Two
  * overlapping intervals share EVERY bucket between max(starts) and
  * min(ends), so without care a pair surfaces once per shared bucket; the
  * ATTRIBUTION predicate — count the pair only in the bucket containing
  * max(starts), which both intervals provably cover — makes the join emit
  * each pair exactly once with no downstream dedup (a distinct would be a
  * second shuffle over the pair set).
  *
  * Scale shape: shuffle keys are time buckets, so parallelism is the time
  * span over the bucket width, independent of row count per bucket; work is
  * Σ_bucket |a_bucket|·|b_bucket| — the local quadratic term is bounded by
  * choosing `bucketSeconds` near the typical interval length (wider buckets
  * = fewer replicas per interval but denser buckets; narrower = the
  * reverse). A hot bucket (skewed hour) composes with Layout.saltedJoin the
  * same way any skewed equi key does. Reference analog: block-time interval
  * scans (`/root/reference/src/streams/producers/evm_producer.rs:58-69`)
  * where per-chain feeds are windowed by block timestamp ranges.
  */
object IntervalJoin {

  /** Overlap-join two interval frames. `a` and `b` must carry timestamp
    * columns named by (aStart, aEnd) / (bStart, bEnd); every output row is
    * one overlapping (a, b) pair, emitted exactly once. Closed intervals:
    * touching endpoints (a.end == b.start) DO pair, matching the SQL
    * `a.s <= b.e AND b.s <= a.e` oracle form. */
  def overlap(a: DataFrame, b: DataFrame,
      aStart: String, aEnd: String, bStart: String, bEnd: String,
      bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    // TIMESTAMP_NTZ has no direct BIGINT cast; hop through TimestampType
    // (session timezone is pinned UTC in GraftSession, so the hop is a
    // relabel, not a shift — and bucket ids only need consistency anyway)
    def secs(c: Column): Column = c.cast("timestamp").cast("long")
    def bucketsOf(s: String, e: String): Column =
      sequence(
        floor(secs(col(s)) / bucketSeconds),
        floor(secs(col(e)) / bucketSeconds))
    val aB = a.withColumn("gj_bucket", explode(bucketsOf(aStart, aEnd)))
    val bB = b.withColumn("gj_bucket", explode(bucketsOf(bStart, bEnd)))
    val overlapCond =
      col(aStart) <= col(bEnd) && col(bStart) <= col(aEnd)
    // both intervals cover the bucket of max(starts) whenever they overlap,
    // so exactly one replica pair per true pair satisfies this equality
    val attribution =
      col("gj_bucket") ===
        floor(secs(greatest(col(aStart), col(bStart))) / bucketSeconds)
    aB.join(bB, Seq("gj_bucket"))
      .filter(overlapCond && attribution)
      .drop("gj_bucket")
  }
}
