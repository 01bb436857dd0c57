package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Dedup
import graft.queries._

/** Session settings every graft SparkSession needs (Verify/Bench/tests). */
object GraftSession {
  /** events.parquet stores ns-precision timestamps, which Spark 4 refuses to
    * read as TimestampType; read them as long nanos and convert in the
    * catalog reader (Tables.events). */
  val configs: Map[String, String] = Map(
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.session.timeZone" -> "UTC",
    "spark.sql.adaptive.enabled" -> "true",
    // native codegen'd vector kernels (graft_dot / graft_cosine)
    "spark.sql.extensions" -> "graft.plans.GraftExtensions"
  )
}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates the per-category query groups (SURVEY.md §2B); every
  * Oracle=Y query also appears in `oracleSql` with DuckDB-runnable ANSI SQL.
  * Column names are aliased identically on both sides (driver compare sorts
  * columns by name before hashing).
  */
object SparkEntry {

  /** Flagship query (q_agg_pricing_summary) on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Aggs.pricingSummary(spark, "/root/testdata/sf0.001")

  private val groups: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (Scans.queries, Scans.oracle),
      (Aggs.queries, Aggs.oracle),
      (Joins.queries, Joins.oracle),
      (Windows.queries, Windows.oracle),
      (SortsSets.queries, SortsSets.oracle),
      (Funcs.queries, Funcs.oracle),
      (Text.queries, Text.oracle),
      (Search.queries, Search.oracle),
      (Drift.queries, Drift.oracle),
      (Sim.queries, Sim.oracle),
      (MediaQ.queries, MediaQ.oracle),
      (UDx.queries, UDx.oracle),
      (Streams.queries, Streams.oracle),
      (Behavior.queries, Behavior.oracle),
      (Timeseries.queries, Timeseries.oracle),
      (Tpch.queries, Tpch.oracle),
      (Logs.queries, Logs.oracle),
      (IngestQ.queries, IngestQ.oracle),
      (Dedup.queries, Dedup.oracle),
      (graft.operators.Ann.queries, graft.operators.Ann.oracle),
      (graft.operators.Cluster.queries, graft.operators.Cluster.oracle),
      (graft.operators.Freq.queries, graft.operators.Freq.oracle),
      (graft.operators.Graph.queries, graft.operators.Graph.oracle),
      (graft.operators.Vocab.queries, graft.operators.Vocab.oracle),
      (graft.operators.Pack.queries, graft.operators.Pack.oracle),
      (graft.operators.Merge.queries, graft.operators.Merge.oracle),
      (graft.operators.Quality.queries, graft.operators.Quality.oracle),
      (graft.pipeline.TrainingData.queries, graft.pipeline.TrainingData.oracle)
    )

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    groups.iterator.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    groups.iterator.map(_._2).reduce(_ ++ _)
}
