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

  /** Write `df` bucketed+sorted by `key` as a catalog table (managed, or
    * external at `path`). Joins between tables bucketed the same way (same
    * key, same bucket count) plan as SortMergeJoin with NO Exchange on
    * either side. The repartition on the bucket key uses the same Murmur3
    * hash as the bucket-id assignment, so each task holds exactly one
    * bucket's rows → ONE file per bucket, which is what lets the reader
    * treat the per-bucket sort as global within the bucket (multi-file
    * buckets forfeit the read-side sort elimination). */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
      path: Option[String] = None): Unit = {
    val w = df.repartition(buckets, col(key)).write
      .mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
    path.fold(w.saveAsTable(table))(p => w.option("path", p).saveAsTable(table))
  }

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

  /** Morton (Z-order) key over integer dimensions: each dimension is
    * scaled into [0, 2^bits) against its [min, max] bounds, then the
    * dimensions' bits are interleaved (dim 0 in the LOW lane). Rows close
    * in EVERY dimension land close on the 1-D z axis — the multi-column
    * clustering that makes min/max-stat data skipping work for filters on
    * ANY dimension subset, where a lexicographic sort only serves its
    * leading column. Pure `Column` arithmetic (codegen'd, no UDF).
    */
  def zorderKey(dims: Seq[(Column, Long, Long)], bits: Int = 8): Column = {
    require(dims.nonEmpty, "zorderKey needs at least one dimension")
    require(bits >= 1 && bits * dims.size <= 62,
      s"bits*dims must fit a positive Long, got $bits*${dims.size}")
    val d = dims.size
    val buckets = dims.map { case (c, mn, mx) =>
      require(mx >= mn, s"empty dimension bounds [$mn, $mx]")
      val clamped = least(greatest(c.cast("long"), lit(mn)), lit(mx))
      // magnitudes here keep the double division exact (< 2^53)
      floor(((clamped - lit(mn)) * lit(1L << bits)) / lit(mx - mn + 1L))
        .cast("long")
    }
    (for {
      b <- 0 until bits
      (bk, di) <- buckets.zipWithIndex
    } yield shiftleft(shiftright(bk, b).bitwiseAND(lit(1L)), b * d + di))
      .reduce(_ bitwiseOR _)
  }

  /** Write `df` z-order-clustered on `dimCols` (bounds discovered with one
    * aggregate): range-partition by the z key into `files` output files,
    * sort by z within each, drop the key. Every file then owns a compact
    * z-range = a small hyper-rectangle of the dim space, so its per-column
    * min/max stats (parquet row-group/file footers, or a lakehouse stats
    * catalog) exclude it for most selective filters on any dim — the
    * layout does for unpartitioned fact tables what partitionBy does for
    * low-cardinality keys. LayoutSpec measures the effect directly:
    * files-touched by box filters, z-order vs single-column sort. */
  def zorderWrite(df: DataFrame, path: String, dimCols: Seq[String],
      bits: Int = 8, files: Int = 32): Unit = {
    val bounds = df.agg(
      dimCols.flatMap(c => Seq(min(col(c).cast("long")).as(s"mn_$c"),
        max(col(c).cast("long")).as(s"mx_$c"))).head,
      dimCols.flatMap(c => Seq(min(col(c).cast("long")).as(s"mn_$c"),
        max(col(c).cast("long")).as(s"mx_$c"))).tail: _*).collect()(0)
    val dims = dimCols.zipWithIndex.map { case (c, i) =>
      (col(c), bounds.getLong(2 * i), bounds.getLong(2 * i + 1))
    }
    df.withColumn("__z", zorderKey(dims, bits))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Small-files compaction — the daily maintenance op behind every
    * streaming/bronze layout: micro-batch sinks (StreamOps.toParquet,
    * BlockIngest.writeBronze) accrete a file per (batch, task), and at
    * 100 TB a million 1 MB files cost more in footer reads, scheduler
    * tasks, and NameNode/liststore pressure than the data itself. Rewrite
    * to ~`targetFileRows` rows per file; with `sortCols` the rewrite also
    * re-clusters, so each output file owns a compact key range and
    * min/max skipping works on the compacted copy (the zorderWrite
    * argument at 1-D). The row count is one cheap count() action used
    * only to size the job — the data moves through one range/round-robin
    * repartition, and maxRecordsPerFile caps any straggler partition. */
  def compact(df: DataFrame, outPath: String, targetFileRows: Long,
      sortCols: Seq[String] = Nil): Unit = {
    require(targetFileRows > 0, s"targetFileRows must be > 0, got $targetFileRows")
    val n = df.count()
    val files = math.max(1L, (n + targetFileRows - 1) / targetFileRows).toInt
    val arranged =
      if (sortCols.nonEmpty)
        df.repartitionByRange(files, sortCols.map(col): _*)
          .sortWithinPartitions(sortCols.map(col): _*)
      else df.repartition(files)
    arranged.write
      .option("maxRecordsPerFile", targetFileRows)
      .mode("overwrite").parquet(outPath)
  }
}
