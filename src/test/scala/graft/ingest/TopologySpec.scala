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
