package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.Tables._

/** Logs-model analytics — the queries a user of the reference's logs/events
  * slice runs over its bronze table (`/root/reference/README.md:187-196`:
  * log_index, address, topics, data, decoded_event, transaction_hash,
  * block_number):
  *
  *   - q_logs_topics: explode the `topics` array, count logs per
  *     (address, topic) — the "which contracts emit which events" query;
  *   - q_logs_decoded: JSON-extract the `decoded_event` payload and
  *     aggregate per decoded event name — the downstream-of-decoding query.
  *
  * The logs frame is DERIVED deterministically from the `events` table (the
  * oracle can only see the shared parquet tables, and the derivation is the
  * same md5/CASE algebra on both sides): address buckets users as contract
  * addresses, topic0 is the event-signature hash (md5 of the type), topic1
  * the indexed-user hash, and high-value events carry an extra data topic —
  * mirroring how EVM logs carry 1–4 topics of which topic0 is the
  * signature. decoded_event is a JSON document rebuilt from the event's
  * fields (the reference leaves decoding downstream; normalizeLogs keeps it
  * nullable — here it is present so extraction is exercised).
  */
object Logs {

  /** Deterministic logs-model frame over `events` — shared by both queries
    * (and mirrored 1:1 in logsSql for the oracle). */
  def logsFrame(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    events(s, dir).select(
      $"event_id".as("log_index"),
      concat(lit("0x"), substring(md5(($"user_id" % 50).cast("string")), 1, 8))
        .as("address"),
      when($"value" >= 10.0,
        array(md5($"event_type"), md5($"user_id".cast("string")), md5($"props")))
        .otherwise(array(md5($"event_type"), md5($"user_id".cast("string"))))
        .as("topics"),
      $"props".as("data"),
      concat(lit("{\"event\":\""), $"event_type", lit("\",\"k\":"),
        get_json_object($"props", "$.k"), lit("}")).as("decoded_event"),
      md5(concat($"event_id".cast("string"), lit("tx"))).as("transaction_hash"),
      floor($"event_id" / lit(10)).cast("long").as("block_number"))
  }

  /** DuckDB mirror of [[logsFrame]] as a CTE body. JSON k is pulled with
    * the same regexp the q_json_extract oracle uses (portable across the
    * engines' JSON implementations). */
  private val logsSql: String =
    """SELECT event_id AS log_index,
              '0x' || substr(md5(CAST(user_id % 50 AS VARCHAR)), 1, 8) AS address,
              CASE WHEN value >= 10.0
                THEN [md5(event_type), md5(CAST(user_id AS VARCHAR)), md5(props)]
                ELSE [md5(event_type), md5(CAST(user_id AS VARCHAR))] END AS topics,
              props AS data,
              '{"event":"' || event_type || '","k":' ||
                regexp_extract(props, '"k":\s*(-?\d+)', 1) || '}' AS decoded_event,
              md5(CAST(event_id AS VARCHAR) || 'tx') AS transaction_hash,
              CAST(floor(event_id / 10) AS BIGINT) AS block_number
       FROM events"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Explode the topics array: log count and block span per (address,
    // topic). Scale shape: generate (narrow) + ONE hash agg — partial
    // aggregation absorbs the 2–3× explode inflation map-side.
    "q_logs_topics" -> ((s, dir) => {
      import s.implicits._
      logsFrame(s, dir)
        .select($"address", explode($"topics").as("topic"), $"block_number")
        .groupBy($"address", $"topic")
        .agg(count(lit(1)).as("n_logs"),
          min($"block_number").as("first_block"),
          max($"block_number").as("last_block"))
        .orderBy($"address", $"topic")
    }),

    // JSON-extract the decoded_event payload: per decoded event name,
    // volume and the sum/extremes of the decoded numeric field. Narrow
    // extraction + one hash agg. from_json with an explicit schema
    // parses each row ONCE — two get_json_object calls each re-parse the
    // document, doubling the dominant (allocation-heavy) cost; at 100 TB
    // the JSON parse IS this query, and the single-parse form also
    // halved its exposure to this sandbox's page-fault-collapse episodes
    // (the two-parse form measured 100s+ during them, its neighbors ~3s).
    "q_logs_decoded" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(
        StructField("event", StringType), StructField("k", LongType)))
      logsFrame(s, dir)
        .select(from_json($"decoded_event", schema).as("j"))
        .select($"j.event".as("event_name"), $"j.k".as("k"))
        .groupBy($"event_name")
        .agg(count(lit(1)).as("n"), sum($"k").as("sum_k"),
          min($"k").as("min_k"), max($"k").as("max_k"))
        .orderBy($"event_name")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_logs_topics" ->
      s"""WITH logs AS ($logsSql),
          t AS (SELECT address, unnest(topics) AS topic, block_number FROM logs)
          SELECT address, topic, count(*) AS n_logs,
                 min(block_number) AS first_block,
                 max(block_number) AS last_block
          FROM t
          GROUP BY address, topic
          ORDER BY address, topic""",

    "q_logs_decoded" ->
      s"""WITH logs AS ($logsSql)
          SELECT regexp_extract(decoded_event, '"event":"([a-z_]+)"', 1) AS event_name,
                 count(*) AS n,
                 CAST(sum(CAST(regexp_extract(decoded_event, '"k":(-?\\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
                 min(CAST(regexp_extract(decoded_event, '"k":(-?\\d+)', 1) AS BIGINT)) AS min_k,
                 max(CAST(regexp_extract(decoded_event, '"k":(-?\\d+)', 1) AS BIGINT)) AS max_k
          FROM logs
          GROUP BY 1
          ORDER BY event_name"""
  )
}
