package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Encoder, Encoders}

import graft.catalog.Tables._

/** UDF / UDAF / UDTF surface (SURVEY.md §2B "UDF / UDAF / UDTF").
  *
  * Reference analogs: U256 TEXT value columns
  * (`/root/reference/migrations/0001_initial.sql:34-37`) motivate
  * `wei_to_eth` on decimal strings; the block→txs explode
  * (`/root/reference/src/streams/consumers/evm_consumer.rs:124-126`)
  * motivates the generator (posexplode — Spark's built-in Generator, no
  * custom UDTF class needed).
  *
  * Scale notes: the scalar UDF is the one deliberately non-codegen operator
  * in the library (it black-boxes Catalyst). It stays correct at scale
  * (narrow, no shuffle) but the upgrade path is a codegen'd Catalyst
  * Expression — tracked as future work, perf-only. The UDAF buffer is an
  * exact BigDecimal sum, so partial aggregation merges are order-insensitive
  * across any executor count.
  */
object UDx {

  /** wei→eth: U256-ish decimal string / 1e18, exact decimal arithmetic —
    * mirrors the reference's TEXT wei columns. Returns the canonical plain
    * string of the scaled value (no scientific notation). */
  val weiToEth: String => String = { wei =>
    if (wei == null) null
    else new java.math.BigDecimal(wei)
      .divide(new java.math.BigDecimal("1000000000000000000"))
      .setScale(4, java.math.RoundingMode.HALF_UP)
      .toPlainString
  }

  /** Geometric mean over positive values: exp(avg(ln x)). The ln terms are
    * fixed to DECIMAL(28,18) per row so the partial sums merge exactly
    * (order-insensitive) — double summation across partitions would not be
    * bit-deterministic. */
  object GeoMean extends Aggregator[Double, (BigDecimal, Long), Double] {
    private val S = 18
    def zero: (BigDecimal, Long) = (BigDecimal(0).setScale(S), 0L)
    def reduce(b: (BigDecimal, Long), x: Double): (BigDecimal, Long) =
      if (x > 0)
        (b._1 + BigDecimal(math.log(x)).setScale(S, BigDecimal.RoundingMode.HALF_UP), b._2 + 1)
      else b
    def merge(a: (BigDecimal, Long), b: (BigDecimal, Long)): (BigDecimal, Long) =
      (a._1 + b._1, a._2 + b._2)
    def finish(b: (BigDecimal, Long)): Double =
      if (b._2 == 0) Double.NaN else math.exp(b._1.toDouble / b._2)
    def bufferEncoder: Encoder[(BigDecimal, Long)] = Encoders.product[(BigDecimal, Long)]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Scalar UDF: wei-string → eth-string. The wei string is derived from
    // totalprice via floor(x*10000) (identical double math both sides) +
    // 14 zeros, i.e. totalprice*1e18 wei.
    "q_udf_scalar" -> ((s, dir) => {
      import s.implicits._
      val wei2eth = udf(weiToEth)
      orders(s, dir)
        .select(
          $"o_orderkey",
          concat(floor($"o_totalprice" * 10000).cast("long").cast("string"),
            lit("0" * 14)).as("wei"))
        .select($"o_orderkey", $"wei", wei2eth($"wei").as("eth"))
        .orderBy($"o_orderkey")
    }),

    // UDAF: geometric mean of positive prices per priority bucket.
    "q_udaf_geomean" -> ((s, dir) => {
      import s.implicits._
      val geomean = udaf(GeoMean)
      orders(s, dir)
        .filter($"o_totalprice" > 0)
        .groupBy($"o_orderpriority")
        // floor(x*1e4) BIGINT micro-key: exp() can differ by an ulp
        // between the JVM and DuckDB's libm, and round(double,4)
        // tie-breaking differs between the engines; the floor key has a
        // single quantization boundary instead of round's two
        .agg(floor(geomean($"o_totalprice") * 1e4).cast("long").as("geo_price_e4"),
          count(lit(1)).as("n_orders"))
        .orderBy($"o_orderpriority")
    }),

    // Generator (UDTF-shape): text → (pos, token) rows.
    "q_udtf_expand" -> ((s, dir) => {
      import s.implicits._
      documents(s, dir)
        .filter($"doc_id" < 50)
        .select($"doc_id", posexplode(split($"text", " ")).as(Seq("pos", "token")))
        .orderBy($"doc_id", $"pos")
    })
  )

  val oracle: Map[String, String] = Map(
    // DuckDB decimal÷decimal lowers to DOUBLE (probed: 1e23/1e18 →
    // '99999.99999999999'), so the oracle does exact digit surgery instead:
    // pad to 40 digits, split integer part (leading-zero-trimmed via a
    // DECIMAL round trip) and the first 4 fraction digits.
    "q_udf_scalar" ->
      """SELECT o_orderkey, wei,
                concat(CAST(CAST(substr(w, 1, 22) AS DECIMAL(38,0)) AS VARCHAR),
                       '.', substr(w, 23, 4)) AS eth
         FROM (SELECT o_orderkey, wei, lpad(wei, 40, '0') AS w
               FROM (SELECT o_orderkey,
                            concat(CAST(CAST(floor(o_totalprice * 10000) AS BIGINT) AS VARCHAR),
                                   '00000000000000') AS wei
                     FROM orders))
         ORDER BY o_orderkey""",

    "q_udaf_geomean" ->
      """SELECT o_orderpriority,
                CAST(floor(exp(CAST(sum(CAST(ln(o_totalprice) AS DECIMAL(28,18))) AS DOUBLE) / count(*)) * 10000) AS BIGINT) AS geo_price_e4,
                count(*) AS n_orders
         FROM orders
         WHERE o_totalprice > 0
         GROUP BY o_orderpriority
         ORDER BY o_orderpriority""",

    "q_udtf_expand" ->
      """SELECT doc_id,
                CAST(p.i - 1 AS INT) AS pos,
                p.tok AS token
         FROM (SELECT doc_id,
                      unnest(list_transform(string_split(text, ' '),
                        (x, i) -> struct_pack(i := i, tok := x))) AS p
               FROM documents WHERE doc_id < 50)
         ORDER BY doc_id, pos"""
  )
}
