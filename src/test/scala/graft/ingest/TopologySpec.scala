package graft.ingest

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Config-driven topology (A1/A18): TOML parse + env interpolation, chain
  * routing (non-EVM skipped), historical+realtime fan-out per chain. */
class TopologySpec extends SparkSpec {

  private val toml =
    """# reference blockchains.toml shape
      |[blockchains.arbitrum]
      |chain_name = "ARB"
      |adapter_type = "EVM"
      |enabled = true
      |start_block = 10
      |end_block = 14
      |schemas = ["blocks", "transactions"]
      |http_url = "${ARB_HTTP}"
      |
      |[blockchains.solana]
      |chain_name = "SOL"
      |adapter_type = "SVM"
      |enabled = true
      |
      |[blockchains.base]
      |chain_name = "BASE"
      |adapter_type = "EVM"
      |enabled = false
      |""".stripMargin

  test("parseConfig: sections, env interpolation, schemas list, range") {
    val cfgs = Topology.parseConfig(toml, Map("ARB_HTTP" -> "http://x"))
    assert(cfgs.map(_.chainName) === Seq("ARB", "SOL", "BASE"))
    val arb = cfgs.head
    assert(arb.adapterType === "EVM" && arb.enabled)
    assert(arb.startBlock === Some(10L) && arb.endBlock === Some(14L))
    assert(arb.schemas === Seq("blocks", "transactions"))
  }

  test("retry: transient failures retried with backoff, then success (README.md:132)") {
    val calls = scala.collection.mutable.ArrayBuffer.empty[Long]
    val delays = scala.collection.mutable.ArrayBuffer.empty[Long]
    // fail twice with a 429, then succeed
    var failures = 2
    val flaky: Long => Option[String] = { n =>
      calls += n
      if (failures > 0) { failures -= 1; throw new RuntimeException("HTTP 429") }
      Some(s"block-$n")
    }
    val wrapped = Retry.withRetry(maxRetries = 3, baseDelayMs = 100,
      sleep = delays += _)(flaky)
    assert(wrapped(7L) === Some("block-7"))
    assert(calls.size === 3) // 2 failures + 1 success
    assert(delays.toSeq === Seq(100L, 200L)) // exponential backoff
  }

  test("retry: give-up after bounded attempts is skip-and-log, None never retried") {
    var calls = 0
    val gaveUp = scala.collection.mutable.ArrayBuffer.empty[Long]
    val alwaysDown: Long => Option[String] = { _ => calls += 1; throw new RuntimeException("boom") }
    val wrapped = Retry.withRetry(maxRetries = 2, sleep = _ => (),
      onGiveUp = (n, _) => gaveUp += n)(alwaysDown)
    assert(wrapped(9L) === None) // skip, not throw: the stream survives
    assert(calls === 3) // 1 + maxRetries, strictly bounded
    assert(gaveUp.toSeq === Seq(9L))
    // a None result is a genuine absence (past the tip), not a failure
    var probes = 0
    val absent = Retry.withRetry(maxRetries = 5, sleep = _ => ())({ _ => probes += 1; None })
    assert(absent(1L) === None && probes === 1)
  }

  test("retry: composes with backfillRange — flaky fetch still lands all blocks") {
    // per-block transient failure on first attempt; retry recovers every one
    val flaky: Long => Option[String] = { n =>
      // deterministic per-call state must live OUTSIDE the executor closure;
      // use a thread-local attempt marker keyed by block number
      if (TopologySpec.firstAttempt.add(n)) throw new RuntimeException("HTTP 429")
      Some(s"""{"number":"$n","chain_name":"R","hash":"0xr$n","parent_hash":"0xr${n - 1}","timestamp":${1704067200 + n},"transactions":[],"uncles":[]}""")
    }
    val df = BlockIngest.backfillRange(spark, 1L, 8L, parallelism = 2)(
      Retry.withRetry(maxRetries = 2, sleep = _ => ())(flaky))
    assert(BlockIngest.parse(df).count() === 8)
  }

  test("launch: EVM chains ingest historical+realtime; others skipped (lib.rs:125-128)") {
    val tmp = java.nio.file.Files.createTempDirectory("topo").toString
    val in = s"$tmp/in/ARB"
    new java.io.File(in).mkdirs()
    // realtime tail: one new block arrives as a file
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$in/tip.jsonl"),
      """{"number":"15","chain_name":"ARB","hash":"0xf15","parent_hash":"0xf14","timestamp":1704067300,"transactions":[],"uncles":[]}""")
    val cfgs = Topology.parseConfig(toml, Map("ARB_HTTP" -> "http://x"))
    val (queries, skipped) = Topology.launch(
      spark, cfgs,
      inDirFor = c => s"$tmp/in/$c",
      outDir = s"$tmp/bronze",
      checkpointRoot = s"$tmp/ckpt",
      fetch = (chain, n) => Some(
        s"""{"number":"$n","chain_name":"$chain","hash":"0xf$n","parent_hash":"0xf${n - 1}","timestamp":${1704067200 + n},"transactions":[],"uncles":[]}"""))
    try {
      assert(queries.length === 1) // only ARB runs
      assert(skipped.exists(_.contains("SOL")) && skipped.exists(_.contains("BASE")))
      queries.foreach(_.processAllAvailable())
      val blocks = spark.read.parquet(s"$tmp/bronze/blocks")
      // backfill 10..14 + streamed tip 15
      assert(blocks.count() === 6)
      assert(blocks.agg(max(col("block_number"))).collect().head.getLong(0) === 15L)
      assert(blocks.select("chain_name").distinct().collect().map(_.getString(0)).toSeq === Seq("ARB"))
    } finally queries.foreach(_.stop())
  }
}

object TopologySpec {
  /** Blocks already attempted once by the flaky backfill fake — a
    * concurrent set because mapPartitions runs it from executor threads
    * (local mode: same JVM). */
  val firstAttempt: java.util.concurrent.ConcurrentHashMap.KeySetView[java.lang.Long, java.lang.Boolean] =
    java.util.concurrent.ConcurrentHashMap.newKeySet[java.lang.Long]()
}
