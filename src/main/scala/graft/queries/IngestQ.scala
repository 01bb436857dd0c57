package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.catalog.Tables
import graft.ingest.BlockIngest

/** The bronze ingest chain (§2A A10–A13, the reference's signature
  * semantics) as an ORACLE-CHECKED query — round-14 verdict "What's
  * missing #2": the PERMISSIVE parse → normalize/cast/default → dedup →
  * reorg keep-canonical → parent-before-child write path was unit-tested
  * but never driven by the DuckDB oracle.
  *
  * Construction (the q_scan_jsonl export-then-reread discipline,
  * `Scans.exportedEvents`): JSON block messages are DERIVED
  * DETERMINISTICALLY from the `orders` table — every order is a
  * transaction, block_number = o_orderkey div 10 — with every failure
  * mode the chain exists to absorb injected by o_orderkey/bn arithmetic:
  *
  *   - bn % 97 == 0  → the message line is corrupt JSON (PERMISSIVE skip,
  *                     `evm_consumer.rs:118-121` fixed: skip-and-log, not
  *                     break-the-stream)
  *   - bn % 89 == 0  → `number` is a non-numeric string (try_cast drop at
  *                     normalize — the A13 narrow)
  *   - bn % 13 == 0  → a REORG: a second message for the same height,
  *                     newer timestamp, different hash, EMPTY transaction
  *                     list (keepCanonical must pick it; the orphaned
  *                     original's transactions must NOT survive —
  *                     `0001_initial.sql:23,39` semantics)
  *   - bn % 5 == 0   → the message is emitted twice (dedup-on-write,
  *                     SURVEY §0.2.5)
  *   - ok % 7/11/5/19 → null value / bad nonce / null input / null `to`
  *                     (the A12 unwrap_or_default coalesce rules,
  *                     `evm_consumer.rs:46-50`)
  *
  * The chain runs ONCE into an mtime-stamped tmp bronze store (writeBronze
  * is append-mode — the guard keeps Verify re-runs idempotent); the query
  * reads bronze BACK and aggregates integer-only per-chain stats. The
  * oracle recomputes the same stats straight from `orders` by replaying
  * the injection arithmetic in SQL — if any stage (parse filter, cast
  * drop, default, dedup, canonical pick, orphan-tx removal) misbehaves,
  * a count or sum moves.
  */
object IngestQ {

  /** Build the message lines, run the bronze chain once, return the
    * bronze root. Cached per (dir, orders mtime) through
    * [[graft.util.FixtureCache]] — staging-dir publish, so a kill during
    * the append-mode writeBronze can never leave a partial tree the next
    * run appends onto (the round-15 review finding). */
  private[queries] def bronzeDir(s: SparkSession, dir: String): String = {
    val out = graft.util.FixtureCache.buildOnce(dir, "orders", "bronze") {
      staging =>
        import s.implicits._
        val base = Tables.orders(s, dir)
          .select($"o_orderkey".as("ok"), $"o_custkey".as("ck"),
            expr("o_orderkey div 10").as("bn"))
        val chain = when($"bn" % 2 === 0, "eth").otherwise("poly")
        val txStruct = struct(
          concat(lit("tx"), $"ok".cast("string")).as("hash"),
          when($"ok" % 11 === 0, "xx")
            .otherwise(($"ok" % 100 + 1).cast("string")).as("nonce"),
          concat(lit("f"), $"ck".cast("string")).as("from"),
          when($"ok" % 19 === 0, lit(null).cast("string"))
            .otherwise(concat(lit("a"), $"ck".cast("string"))).as("to"),
          when($"ok" % 7 === 0, lit(null).cast("string"))
            .otherwise(concat($"ok".cast("string"), lit("000"))).as("value"),
          lit("1").as("gas_price"),
          when($"ok" % 23 === 0, lit(null).cast("string"))
            .otherwise(lit("21000")).as("gas"),
          when($"ok" % 5 === 0, lit(null).cast("string"))
            .otherwise(lit("0xdata")).as("input"))
        val blocks = base
          .groupBy($"bn")
          .agg(collect_list(txStruct).as("transactions"))
          .select($"bn", chain.as("chain_name"), $"transactions")
        def blockJson(txs: org.apache.spark.sql.Column,
            hashSuffix: String, tsDelta: Long, gasDelta: Long) = to_json(struct(
          when($"bn" % 89 === 0, concat(lit("N"), $"bn".cast("string")))
            .otherwise($"bn".cast("string")).as("number"),
          $"chain_name",
          concat(lit("b"), $"bn".cast("string"), lit(hashSuffix)).as("hash"),
          concat(lit("b"), ($"bn" - 1).cast("string")).as("parent_hash"),
          lit("0").as("nonce"),
          lit("r").as("receipts_root"),
          concat(lit("m"), ($"bn" % 10).cast("string")).as("miner"),
          lit("1").as("difficulty"),
          lit("2").as("total_difficulty"),
          ($"bn" % 1000).cast("string").as("size"),
          lit("30000000").as("gas_limit"),
          ($"bn" % 5000 + gasDelta).cast("string").as("gas_used"),
          (lit(1600000000L) + $"bn" + tsDelta).as("timestamp"),
          txs.as("transactions")))
        val mainLine = when($"bn" % 97 === 0, lit("{corrupt"))
          .otherwise(blockJson($"transactions", "", 0L, 0L))
        val lines = blocks.select($"bn", mainLine.as("value"))
        val dups = lines.filter($"bn" % 5 === 0)
        val variants = blocks
          .filter($"bn" % 13 === 0 && $"bn" % 97 =!= 0 && $"bn" % 89 =!= 0)
          .select($"bn",
            blockJson(array().cast("array<struct<hash:string>>"), "x", 1000L, 1L)
              .as("value"))
        lines.unionAll(dups).unionAll(variants)
          .select($"value")
          .write.mode("overwrite").text(staging.resolve("messages").toString)
        val raw = s.read.schema(StructType(Seq(StructField("value", StringType))))
          .text(staging.resolve("messages").toString)
        BlockIngest.writeBronze(BlockIngest.parse(raw),
          staging.resolve("bronze").toString)
    }
    s"$out/bronze"
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ingest_bronze" -> ((s, dir) => {
      import s.implicits._
      val root = bronzeDir(s, dir)
      val blk = s.read.parquet(s"$root/blocks")
        .groupBy($"chain_name")
        .agg(count(lit(1)).as("n_blocks"),
          sum($"tx_count").as("sum_tx_count"),
          sum($"gas_used").as("sum_gas_used"))
      val txs = s.read.parquet(s"$root/transactions")
        .groupBy($"chain_name")
        .agg(count(lit(1)).as("n_txs"),
          sum(when($"value" === "0", 1L).otherwise(0L)).as("n_value_def"),
          sum(when($"nonce" === 0L, 1L).otherwise(0L)).as("n_nonce_def"),
          sum(when($"to_address".isNull, 1L).otherwise(0L)).as("n_to_null"),
          sum(when($"input" === "0x", 1L).otherwise(0L)).as("n_input_def"),
          sum(when($"gas" === "0", 1L).otherwise(0L)).as("n_gas_def"),
          sum($"nonce").as("sum_nonce"))
      blk.join(txs, Seq("chain_name"))
        .select($"chain_name", $"n_blocks", $"sum_tx_count", $"sum_gas_used",
          $"n_txs", $"n_value_def", $"n_nonce_def", $"n_to_null",
          $"n_input_def", $"n_gas_def", $"sum_nonce")
        .orderBy($"chain_name")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_ingest_bronze" ->
      """WITH base AS (
           SELECT o_orderkey AS ok, o_orderkey // 10 AS bn FROM orders),
         valid AS (
           SELECT bn, CASE WHEN bn % 2 = 0 THEN 'eth' ELSE 'poly' END AS chain_name
           FROM (SELECT DISTINCT bn FROM base)
           WHERE bn % 97 <> 0 AND bn % 89 <> 0),
         blk AS (
           SELECT v.chain_name,
             count(*) AS n_blocks,
             CAST(sum(CASE WHEN v.bn % 13 = 0 THEN 0 ELSE t.cnt END) AS BIGINT) AS sum_tx_count,
             CAST(sum(CASE WHEN v.bn % 13 = 0 THEN v.bn % 5000 + 1 ELSE v.bn % 5000 END) AS BIGINT) AS sum_gas_used
           FROM valid v
           JOIN (SELECT bn, count(*) AS cnt FROM base GROUP BY bn) t USING (bn)
           GROUP BY v.chain_name),
         tx AS (
           SELECT v.chain_name,
             count(*) AS n_txs,
             CAST(sum(CASE WHEN ok % 7 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_value_def,
             CAST(sum(CASE WHEN ok % 11 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_nonce_def,
             CAST(sum(CASE WHEN ok % 19 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_to_null,
             CAST(sum(CASE WHEN ok % 5 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_input_def,
             CAST(sum(CASE WHEN ok % 23 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_gas_def,
             CAST(sum(CASE WHEN ok % 11 = 0 THEN 0 ELSE ok % 100 + 1 END) AS BIGINT) AS sum_nonce
           FROM base b JOIN valid v USING (bn)
           WHERE b.bn % 13 <> 0
           GROUP BY v.chain_name)
         SELECT b.chain_name, b.n_blocks, b.sum_tx_count, b.sum_gas_used,
                t.n_txs, t.n_value_def, t.n_nonce_def, t.n_to_null,
                t.n_input_def, t.n_gas_def, t.sum_nonce
         FROM blk b JOIN tx t USING (chain_name)
         ORDER BY chain_name"""
  )
}
