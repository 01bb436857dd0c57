package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL surface: registers every testdata table (and any bronze output) as a
  * temp view so users can run plain `spark.sql` — the reference's declared
  * north star ("Advanced Querying… custom SQL queries",
  * `/root/reference/README.md:202-205`). Combined with GraftExtensions the
  * SQL dialect includes the graft_* native functions. */
object GraftCatalog {

  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** Register all testdata tables for `dir` as temp views. */
  def registerAll(spark: SparkSession, dir: String): Unit = {
    tableNames.foreach {
      case "events" => Tables.events(spark, dir).createOrReplaceTempView("events")
      case n => Tables.t(spark, dir, n).createOrReplaceTempView(n)
    }
  }

  /** Register bronze blockchain tables produced by BlockIngest.writeBronze
    * (+ the logs table when writeBronzeLogs has run). */
  def registerBronze(spark: SparkSession, bronzeDir: String): Unit = {
    spark.read.parquet(s"$bronzeDir/blocks").createOrReplaceTempView("blocks")
    spark.read.parquet(s"$bronzeDir/transactions")
      .createOrReplaceTempView("transactions")
    // Hadoop FS probe, not java.io.File: bronzeDir may be a URI-qualified
    // path (file:/, hdfs:/, s3a:/) that only Spark's filesystem resolves.
    val logsPath = new org.apache.hadoop.fs.Path(s"$bronzeDir/logs")
    val fs = logsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(logsPath)) {
      spark.read.parquet(s"$bronzeDir/logs").createOrReplaceTempView("logs")
    }
  }

  def sql(spark: SparkSession, query: String): DataFrame = spark.sql(query)
}
