package graft.ingest

import org.apache.spark.sql.{DataFrame, Dataset}

/** Typed record layer (SURVEY.md §1.2: typed `Dataset[T]` in the ingest
  * normalize path, mirroring the reference's serde structs
  * `/root/reference/src/streams/schemas/evm.rs:8-47`; untyped DataFrame
  * everywhere else to match the analytics/oracle surface). */

/** Bronze block row — `0001_initial.sql:6-24`. */
case class BlockRec(
  block_number: Long,
  chain_name: String,
  hash: String,
  parent_hash: String,
  timestamp: java.sql.Timestamp,
  miner: String,
  difficulty: String,
  total_difficulty: String,
  gas_used: Long,
  gas_limit: Long,
  size: Option[Long],
  receipts_root: String,
  tx_count: Long)

/** Bronze transaction row — `0001_initial.sql:27-40`. */
case class TxRec(
  chain_name: String,
  block_number: Long,
  tx_hash: String,
  from_address: String,
  to_address: Option[String],
  value: String,
  gas_price: String,
  gas: String,
  input: String,
  nonce: Long)

object Typed {
  /** Normalized blocks as a typed Dataset (drops the nested transactions
    * array — the child rows live in Dataset[TxRec]). */
  def blocks(normalized: DataFrame): Dataset[BlockRec] = {
    val s = normalized.sparkSession
    import s.implicits._
    normalized.drop("transactions").as[BlockRec]
  }

  def txs(normalized: DataFrame): Dataset[TxRec] = {
    val s = normalized.sparkSession
    import s.implicits._
    normalized.as[TxRec]
  }
}
