package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Pluggable message-queue boundary — the reference hard-wires Pulsar
  * (client + producer/consumer factories,
  * `/root/reference/src/streams/message_queue/pulsar.rs:14-37`); this
  * trait is that boundary made swappable so a Kafka/Pulsar transport can
  * drop in where the environment has the jars, while tests and this
  * sandbox use the file-backed implementation.
  *
  * Semantics mirrored from the reference:
  *   - topics are named `{chain}-{schema}[-historical]`
  *     (`lib.rs:61,83,93`) — the `persistent://public/default/` prefix is
  *     the transport's namespace concern, not the topology's;
  *   - `append` = producer send (A8);
  *   - `stream` = subscribe-from-Earliest consume (A9) — offsets/acks are
  *     the CONSUMER'S checkpoint, exactly as Structured Streaming models
  *     them (`startingOffsets=earliest` ⇔ `InitialPosition::Earliest`,
  *     `pulsar.rs:31-32`);
  *   - `replay` = batch re-read of the full topic (the Earliest-replay
  *     behavior a new subscription gets).
  *
  * Messages are single-string-column frames (column `value`), the JSON
  * wire shape of A7/A10.
  */
trait MessageQueue {

  /** Reference topic naming: `{chain}-{schema}` + historical suffix. */
  final def topicOf(chain: String, schema: String,
      historical: Boolean = false): String =
    s"$chain-$schema" + (if (historical) "-historical" else "")

  /** A8: append messages (single `value` string column) to a topic. */
  def append(topic: String, messages: DataFrame): Unit

  /** A9: unbounded subscription from Earliest as a streaming DataFrame. */
  def stream(spark: SparkSession, topic: String): DataFrame

  /** Batch replay of everything currently in the topic. */
  def replay(spark: SparkSession, topic: String): DataFrame
}

/** File-backed queue: one directory per topic, JSON-lines files as
  * messages. Appends are atomic at file granularity, and Spark's file
  * stream source + checkpoint provide the committed-offset (ack) behavior.
  * This is the transport used by tests and the sandbox (no queue brokers
  * here); it is also a legitimate production pattern (landing-zone
  * ingestion). */
final class FileQueue(root: String) extends MessageQueue {

  private val valueSchema = StructType(Seq(StructField("value", StringType)))

  private def dir(topic: String) = s"$root/$topic"

  override def append(topic: String, messages: DataFrame): Unit = {
    // fail fast on multi-column frames: silently serializing only the first
    // column would drop the rest — the wire contract is ONE string column
    require(messages.columns.length == 1,
      s"MessageQueue.append expects a single-string-column frame " +
        s"(the A7/A10 JSON wire shape); got ${messages.columns.mkString(", ")}")
    messages.select(col(messages.columns.head).cast(StringType).as("value"))
      .write.mode("append").text(dir(topic))
  }

  override def stream(spark: SparkSession, topic: String): DataFrame = {
    // the topic directory must exist before a subscription can start
    new java.io.File(dir(topic)).mkdirs()
    spark.readStream.schema(valueSchema).text(dir(topic))
  }

  override def replay(spark: SparkSession, topic: String): DataFrame =
    spark.read.schema(valueSchema).text(dir(topic))
}
