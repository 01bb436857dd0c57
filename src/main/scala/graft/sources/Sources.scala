package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Generic file sources with the engine's schema discipline (SURVEY.md
  * §1.1: schemas are static & declared — never inferred; corrupt records
  * are quarantined, not stream-aborting — the PERMISSIVE analog of the
  * reference's deserialize-error path
  * `/root/reference/src/streams/consumers/evm_consumer.rs:118-121`).
  *
  * Each reader returns a [[SourceRead]]: clean rows, quarantined raw
  * records, and a `release()` that unpersists the shared parse cache.
  * The cache is REQUIRED (Spark disallows queries whose referenced columns
  * are only the internal corrupt-record column, and it guarantees one
  * parse for both branches) but it pins executor storage — call
  * `release()` once both branches are consumed, or the entries live for
  * the application lifetime.
  */
object Sources {

  /** One source read: consume `clean`/`quarantine`, then `release()`. */
  case class SourceRead(clean: DataFrame, quarantine: DataFrame,
      release: () => Unit)

  private val corruptCol = "_corrupt_record"

  private def withCorrupt(schema: StructType): StructType =
    StructType(schema.fields :+ StructField(corruptCol, StringType))

  /** Shared clean/quarantine split over a PERMISSIVE-parsed frame. */
  private def split(raw: DataFrame): SourceRead = {
    val cached = raw.cache()
    SourceRead(
      clean = cached.filter(col(corruptCol).isNull).drop(corruptCol),
      quarantine = cached.filter(col(corruptCol).isNotNull)
        .select(col(corruptCol).as("raw")),
      release = () => { cached.unpersist(); () })
  }

  /** JSON-lines with explicit schema. */
  def readJson(spark: SparkSession, path: String, schema: StructType): SourceRead =
    split(spark.read
      .schema(withCorrupt(schema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path))

  /** CSV with explicit schema + header. */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true, delimiter: String = ","): SourceRead =
    split(spark.read
      .schema(withCorrupt(schema))
      .option("header", header.toString)
      .option("sep", delimiter)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .csv(path))

  /** XML with explicit schema + row tag — Spark 4 ships the (formerly
    * spark-xml) datasource natively in spark-sql. Same PERMISSIVE
    * quarantine split as JSON/CSV. */
  def readXml(spark: SparkSession, path: String, schema: StructType,
      rowTag: String = "row"): SourceRead =
    split(spark.read
      .schema(withCorrupt(schema))
      .option("rowTag", rowTag)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .xml(path))

  /** Parquet is self-describing; validation happens via
    * Quality.expectSchema rather than read-time inference. */
  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** ORC — the second columnar interchange format (Spark ships native
    * support); same self-describing contract as parquet. Predicate
    * pushdown and column pruning work identically (SourcesSpec checks the
    * round trip; the scan operator is OrcScan). */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)
}
