package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers over the driver's parquet testdata (TESTDATA.md / FIXTURES.md §A).
  *
  * Parquet is self-describing, so no schema inference happens on read; the
  * expected schemas are documented in FIXTURES.md. Filters/projections applied
  * by callers are pushed to the parquet scan by Catalyst (verified via
  * `.explain("formatted")` — `PushedFilters` / `ReadSchema`).
  */
object Tables {
  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  /** Opt-in in-memory table cache (set -Dgraft.cacheTables=true): the
    * buffer-pool analog for repeated-query workloads — Bench enables it so
    * per-query time measures compute, not re-scanning the same parquet 76
    * times. Off by default: Verify and tests read cold like the driver. */
  private val cached = scala.collection.concurrent.TrieMap.empty[(String, String, String), DataFrame]

  /** Stable per-session cache key: a DataFrame cached under a stopped or
    * replaced session must never be handed to a new one (it would fail at
    * execution) — each session gets its own cache entries. A UUID is
    * minted into the session's conf on first use (identityHashCode is NOT
    * unique — a GC'd session's hash can recur on a successor and revive
    * its dead cache entries). Synchronized: Verify runs queries from a
    * thread pool, and an unsynchronized check-then-set could mint two
    * keys for one session — splitting its cache and double-persisting
    * every table. */
  private[graft] def sessionKey(s: SparkSession): String = synchronized {
    val confKey = "graft.cache.sessionKey"
    s.conf.getOption(confKey).getOrElse {
      val v = java.util.UUID.randomUUID().toString
      s.conf.set(confKey, v)
      v
    }
  }

  def t(s: SparkSession, dir: String, name: String): DataFrame =
    if (java.lang.Boolean.getBoolean("graft.cacheTables"))
      cached.getOrElseUpdate((sessionKey(s), dir, name),
        s.read.parquet(path(dir, name)).persist())
    else s.read.parquet(path(dir, name))

  def region(s: SparkSession, dir: String): DataFrame   = t(s, dir, "region")
  def nation(s: SparkSession, dir: String): DataFrame   = t(s, dir, "nation")
  def customer(s: SparkSession, dir: String): DataFrame = t(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame = t(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame     = t(s, dir, "part")
  def orders(s: SparkSession, dir: String): DataFrame   = t(s, dir, "orders")
  def lineitem(s: SparkSession, dir: String): DataFrame = t(s, dir, "lineitem")
  /** events.ts is ns-precision in parquet; Spark reads it as long nanos
    * (spark.sql.legacy.parquet.nanosAsLong). Convert to TimestampType (µs,
    * floor like DuckDB's ns→µs cast) so downstream ops see a real timestamp. */
  def events(s: SparkSession, dir: String): DataFrame = {
    val raw = t(s, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      case _ => raw
    }
  }
  def documents(s: SparkSession, dir: String): DataFrame  = t(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = t(s, dir, "embeddings")
}
