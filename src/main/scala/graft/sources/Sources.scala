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
  * Each reader returns (clean rows, quarantined raw records). Quarantine is
  * a DataFrame so it can be persisted/alerted on rather than logged away.
  *
  * Scale notes: all formats split by file/offset ranges for parallel read;
  * the corrupt-record column is projected only into the quarantine branch
  * so the clean path carries no extra bytes.
  */
object Sources {

  private val corruptCol = "_corrupt_record"

  private def withCorrupt(schema: StructType): StructType =
    StructType(schema.fields :+ StructField(corruptCol, StringType))

  /** JSON-lines with explicit schema → (clean, quarantine). */
  def readJson(spark: SparkSession, path: String, schema: StructType)
      : (DataFrame, DataFrame) = {
    val raw = spark.read
      .schema(withCorrupt(schema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path)
      .cache() // one parse, both branches
    val clean = raw.filter(col(corruptCol).isNull).drop(corruptCol)
    val quarantine = raw.filter(col(corruptCol).isNotNull).select(col(corruptCol).as("raw"))
    (clean, quarantine)
  }

  /** CSV with explicit schema + header → (clean, quarantine). */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true, delimiter: String = ",")
      : (DataFrame, DataFrame) = {
    val raw = spark.read
      .schema(withCorrupt(schema))
      .option("header", header.toString)
      .option("sep", delimiter)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .csv(path)
      .cache()
    val clean = raw.filter(col(corruptCol).isNull).drop(corruptCol)
    val quarantine = raw.filter(col(corruptCol).isNotNull).select(col(corruptCol).as("raw"))
    (clean, quarantine)
  }

  /** Parquet is self-describing; validation happens via
    * Quality.expectSchema rather than read-time inference. */
  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
