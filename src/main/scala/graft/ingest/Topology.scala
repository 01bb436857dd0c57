package graft.ingest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery

/** Config-driven ingest topology — the reference's `blockchains.toml` →
  * task-DAG expansion (`/root/reference/src/lib.rs:47-130`, §2A A1/A18),
  * Spark-first: each enabled chain becomes one checkpointed streaming query
  * (the Spark scheduler replaces the reference's hand-spawned
  * runtime-per-task, `lib.rs:100-121`); historical ranges become parallel
  * batch backfills (A6). Unknown adapter types are logged and skipped, like
  * `lib.rs:125-128`. */
object Topology {

  /** Per-chain config — `blockchains.toml:10-16` + `lib.rs:27-40`. */
  case class ChainConfig(
    chainName: String,
    adapterType: String, // "EVM" supported; others skipped
    enabled: Boolean,
    startBlock: Option[Long], // historical backfill start (lib.rs:33)
    endBlock: Option[Long], // default u64::MAX ⇒ None = open-ended
    schemas: Seq[String]) // ("blocks", "transactions")

  /** Parse the reference's TOML shape (minimal, dependency-free: section
    * headers + key = value lines; env interpolation like lib.rs:53-58). */
  def parseConfig(toml: String, env: Map[String, String] = sys.env): Seq[ChainConfig] = {
    val sections = scala.collection.mutable.LinkedHashMap.empty[String, scala.collection.mutable.Map[String, String]]
    var current: Option[String] = None
    toml.linesIterator.map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#")).foreach {
      case l if l.startsWith("[") =>
        val name = l.stripPrefix("[").stripSuffix("]")
        current = Some(name)
        sections.getOrElseUpdate(name, scala.collection.mutable.Map.empty)
      case l if l.contains("=") =>
        val Array(k, v) = l.split("=", 2).map(_.trim)
        val raw = v.stripPrefix("\"").stripSuffix("\"")
        // ${VAR} env interpolation (lib.rs:53-58)
        val resolved = "\\$\\{([A-Z0-9_]+)}".r.replaceAllIn(raw,
          m => env.getOrElse(m.group(1), ""))
        current.foreach(c => sections(c)(k) = resolved)
      case _ =>
    }
    sections.collect {
      // reference shape: [blockchains.<name>]
      case (section, kv) if section.startsWith("blockchains.") =>
        ChainConfig(
          chainName = kv.getOrElse("chain_name", section.stripPrefix("blockchains.")),
          adapterType = kv.getOrElse("adapter_type", "EVM"),
          enabled = kv.get("enabled").forall(_.toBoolean),
          startBlock = kv.get("start_block").map(_.toLong),
          endBlock = kv.get("end_block").map(_.toLong),
          schemas = kv.get("schemas")
            .map(_.stripPrefix("[").stripSuffix("]").split(",").map(
              _.trim.stripPrefix("\"").stripSuffix("\"")).toSeq.filter(_.nonEmpty))
            .getOrElse(Seq("blocks", "transactions")))
    }.toSeq
  }

  /** Expand configs into running ingest work: one streaming query per
    * enabled EVM chain (realtime path) + one batch backfill per configured
    * range (historical path). Returns the streaming handles; skipped chains
    * are returned in the second element (adapter_type ≠ EVM or disabled). */
  def launch(
      spark: SparkSession,
      configs: Seq[ChainConfig],
      inDirFor: String => String,
      outDir: String,
      checkpointRoot: String,
      fetch: (String, Long) => Option[String] = (_, _) => None,
      tipOf: String => Option[Long] = _ => None)
      : (Seq[StreamingQuery], Seq[String]) = {
    val (evm, skipped) = configs.partition(c => c.enabled && c.adapterType == "EVM")
    val queries = evm.map { c =>
      // historical backfill first (parent data lands before the tail).
      // end_block absent ⇔ the reference's open-ended u64::MAX default
      // (lib.rs:99): backfill to the chain tip (A5 probe) — and if no tip
      // probe is available either, say so instead of silently skipping.
      c.startBlock.foreach { start =>
        c.endBlock.orElse(tipOf(c.chainName)) match {
          case Some(end) =>
            val raw = BlockIngest.backfillRange(spark, start, end,
              parallelism = spark.sparkContext.defaultParallelism)(n => fetch(c.chainName, n))
            BlockIngest.writeBronze(BlockIngest.parse(raw), outDir)
          case None =>
            org.slf4j.LoggerFactory.getLogger(getClass)
              .warn(s"${c.chainName}: start_block=$start but no end_block and no " +
                "tip probe — historical backfill SKIPPED")
        }
      }
      BlockIngest.streamBronze(spark, inDirFor(c.chainName), outDir,
        s"$checkpointRoot/${c.chainName}")
    }
    (queries, skipped.map(c => s"${c.chainName} (${c.adapterType}, enabled=${c.enabled})"))
  }
}
