package graft.ingest

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The pluggable queue boundary (A8/A9): produce → subscribe → bronze via
  * the file transport, Earliest replay, reference topic naming. */
class MessageQueueSpec extends SparkSpec {

  private def block(n: Long, chain: String = "Q"): String =
    s"""{"number":"$n","chain_name":"$chain","hash":"0xq$n","parent_hash":"0xq${n - 1}","timestamp":${1704067200 + n},"transactions":[{"hash":"0xqt$n","chain_name":"$chain","nonce":"0","block_hash":"0xq$n","block_number":"$n","transaction_index":"0","from":"0xa","to":"0xb","value":"1","gas_price":"2","gas":"21000","input":"0x"}],"uncles":[]}"""

  test("topic naming mirrors the reference (lib.rs:61,83,93)") {
    val q = new FileQueue("/tmp/unused")
    assert(q.topicOf("ARB", "blocks") === "ARB-blocks")
    assert(q.topicOf("ARB", "blocks", historical = true) === "ARB-blocks-historical")
  }

  test("produce → subscribe → bronze round trip; replay sees everything") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("mq").toString
    val queue = new FileQueue(s"$tmp/queue")
    val topic = queue.topicOf("Q", "blocks")
    // producer half (A8): two appends, like two producer sends
    queue.append(topic, Seq(block(1), block(2)).toDF("value"))
    queue.append(topic, Seq(block(3)).toDF("value"))
    // consumer half (A9): subscription drains into bronze with checkpoints
    val sub = BlockIngest.streamBronze(
      queue.stream(spark, topic), s"$tmp/bronze", s"$tmp/ckpt")
    try {
      sub.processAllAvailable()
      val blocks = spark.read.parquet(s"$tmp/bronze/blocks")
      assert(blocks.count() === 3)
      // new message after the subscription started is still consumed
      queue.append(topic, Seq(block(4)).toDF("value"))
      sub.processAllAvailable()
      assert(spark.read.parquet(s"$tmp/bronze/blocks").count() === 4)
    } finally sub.stop()
    // Earliest replay (pulsar.rs:31-32): a fresh batch read sees all 4
    assert(queue.replay(spark, topic).count() === 4)
    // and a REUSED checkpoint does not reprocess (the ack analog)
    val sub2 = BlockIngest.streamBronze(
      queue.stream(spark, topic), s"$tmp/bronze", s"$tmp/ckpt")
    try {
      sub2.processAllAvailable()
      assert(spark.read.parquet(s"$tmp/bronze/blocks").count() === 4)
    } finally sub2.stop()
  }

  test("non-string message column is coerced to the value wire shape") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("mq2").toString
    val queue = new FileQueue(s"$tmp/queue")
    queue.append("nums", Seq(7L, 8L).toDF("n"))
    assert(queue.replay(spark, "nums").select(col("value"))
      .collect().map(_.getString(0)).toSet === Set("7", "8"))
  }
}
