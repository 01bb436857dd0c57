package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed total-order primitives — ONE implementation of the
  * decomposition that packSequences introduced and the budget selector,
  * the quantile-rollup exact anchor and the NN-descent seed ranks all
  * need: a single global window over a corpus ordering is a
  * one-partition wall at 100 TB (ScaleProbe "percentiles" measured the
  * grouped form of that wall at 73.8 s where the decomposition takes
  * 13.9 s), so both primitives range-repartition on the ordering, do
  * per-slice local work (parallelism = slice count), and prefix-sum the
  * per-slice totals (≤ #partitions rows) in-plan, broadcasting them back
  * as slice offsets. Heavy sort-key groups spread across slices because
  * the range partitioner splits on the FULL ordering — no single key
  * value serializes through one task (ScaleProbe "budget_skew": flat
  * wall on an all-one-score corpus).
  *
  * The slice frame is localCheckpoint'ed before its two readers (the
  * totals branch and the join branch): pids from a sampled
  * repartitionByRange are nondeterministic between re-executions, and
  * both branches must observe ONE assignment — Pack's discipline.
  * (Aggs.percentilesOf keeps its own GROUPED variant: it relies on
  * exchange reuse plus a loud bracket guard instead, because
  * materialization measured slower there.) The checkpoint's blocks live
  * until the session's cleanup; callers needing eager release can pass
  * the returned frame to Frames.releaseCheckpoint once consumed.
  */
object Slices {

  /** Input columns + `posName` = 0-based global ordinal under `sort`.
    * The in-slice ordinal is a NARROW in-partition sort +
    * monotonically_increasing_id (low 33 bits = within-partition
    * position in sort order; the function's nondeterministic flag stops
    * Catalyst reordering it past the sort). Rows equal under `sort` take
    * arbitrary adjacent positions — value-at-position reads are
    * unaffected (the value at a rank is deterministic across
    * permutations of equal values). */
  def globalOrdinal(df: DataFrame, sort: Seq[Column], posName: String): DataFrame = {
    val ranged = df.repartitionByRange(sort: _*)
      .withColumn("_pid", spark_partition_id())
    val local = ranged.sortWithinPartitions(sort: _*)
      .withColumn("_ord",
        monotonically_increasing_id().bitwiseAND(lit((1L << 33) - 1)))
      .localCheckpoint()
    val wOff = Window.orderBy(col("_pid")).rowsBetween(Window.unboundedPreceding, -1)
    val offs = local.groupBy(col("_pid")).agg(count(lit(1)).as("_pn"))
      .withColumn("_off", coalesce(sum(col("_pn")).over(wOff), lit(0L)))
      .select(col("_pid"), col("_off"))
    local.join(broadcast(offs), "_pid")
      .withColumn(posName, col("_ord") + col("_off"))
      .drop("_pid", "_ord", "_off")
  }

  /** Input columns + `cumName` = INCLUSIVE global running sum of `value`
    * under `sort` (exclusive prefix = cum − value, computed by the
    * caller where needed). `value` is materialized as a column before
    * the exchange so per-slice totals aggregate the identical
    * evaluation the local window saw. */
  def globalCumsum(df: DataFrame, sort: Seq[Column], value: Column,
      cumName: String): DataFrame = {
    val ranged = df.withColumn("_val", value)
      .repartitionByRange(sort: _*)
      .withColumn("_pid", spark_partition_id())
    val wLocal = Window.partitionBy(col("_pid")).orderBy(sort: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = ranged.withColumn("_lcum", sum(col("_val")).over(wLocal))
      .localCheckpoint()
    val wOff = Window.orderBy(col("_pid")).rowsBetween(Window.unboundedPreceding, -1)
    val offs = local.groupBy(col("_pid")).agg(sum(col("_val")).as("_pn"))
      .withColumn("_off", coalesce(sum(col("_pn")).over(wOff), lit(0L)))
      .select(col("_pid"), col("_off"))
    local.join(broadcast(offs), "_pid")
      .withColumn(cumName, col("_lcum") + col("_off"))
      .drop("_pid", "_lcum", "_val", "_off")
  }
}
