package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.Tables._
import graft.util.D._

/** Composite TPC-H-shape analytics (Q3 / Q5 / Q10 adapted to the synthetic
  * schema) — the end-to-end check that multi-join + filter + agg + top-k
  * COMPOSITIONS plan well, not just the operators in isolation:
  * Catalyst's join reordering, filter pushdown through three-to-six-way
  * joins, partial aggregation over the joined fact, and
  * TakeOrderedAndProject for the LIMIT — all in one plan per query.
  *
  * Scale notes (100 TB posture): each query filters its dimensions BEFORE
  * the fact join (pushdown puts the mktsegment/region/date predicates at
  * the scans), aggregates with map-side partials, and takes top-k without
  * a global sort. The revenue algebra is the exact-decimal pipeline of
  * q_agg_pricing_summary — one shared convention (graft.util.D).
  */
object Tpch {

  private def revenue = sum(dec4(col("l_extendedprice")) *
    (lit(1) - dec4(col("l_discount"))))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q3: shipping priority — unshipped high-revenue BUILDING orders.
    "q_tpch_q3" -> ((s, dir) => {
      val cutoff = lit("1997-03-15").cast("timestamp")
      customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
        .join(orders(s, dir), col("c_custkey") === col("o_custkey"))
        .join(lineitem(s, dir), col("l_orderkey") === col("o_orderkey"))
        .filter(col("o_orderdate") < cutoff && col("l_shipdate") > cutoff)
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(r4(revenue).as("revenue"))
        .select(col("l_orderkey"), col("revenue"),
          col("o_orderdate").cast("date").as("o_orderdate"),
          col("o_orderpriority"))
        .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
        .limit(20)
    }),

    // Q5: local supplier volume — revenue where the supplier serves a
    // customer of its own nation, per ASIA nation, one order year.
    "q_tpch_q5" -> ((s, dir) => {
      region(s, dir).filter(col("r_name") === "ASIA")
        .join(nation(s, dir), col("n_regionkey") === col("r_regionkey"))
        .join(supplier(s, dir), col("s_nationkey") === col("n_nationkey"))
        .join(lineitem(s, dir), col("l_suppkey") === col("s_suppkey"))
        .join(orders(s, dir), col("o_orderkey") === col("l_orderkey"))
        .join(customer(s, dir),
          col("c_custkey") === col("o_custkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .groupBy(col("n_name"))
        .agg(r4(revenue).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // Q10: returned-item reporting — top customers by revenue lost to
    // returns in one quarter, with nation context.
    "q_tpch_q10" -> ((s, dir) => {
      customer(s, dir)
        .join(orders(s, dir), col("c_custkey") === col("o_custkey"))
        .join(lineitem(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(nation(s, dir), col("c_nationkey") === col("n_nationkey"))
        .filter(col("l_returnflag") === "R" &&
          col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
        .agg(r4(revenue).as("revenue"))
        .select(col("c_custkey"), col("c_name"), col("revenue"),
          col("c_acctbal"), col("n_name"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    })
  )

  private val revSql =
    "round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE), 4)"

  val oracle: Map[String, String] = Map(
    "q_tpch_q3" ->
      s"""SELECT l_orderkey, $revSql AS revenue,
                 CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority
          FROM customer
          JOIN orders ON c_custkey = o_custkey
          JOIN lineitem ON l_orderkey = o_orderkey
          WHERE c_mktsegment = 'BUILDING'
            AND o_orderdate < TIMESTAMP '1997-03-15'
            AND l_shipdate > TIMESTAMP '1997-03-15'
          GROUP BY l_orderkey, o_orderdate, o_orderpriority
          ORDER BY revenue DESC, o_orderdate, l_orderkey
          LIMIT 20""",

    "q_tpch_q5" ->
      s"""SELECT n_name, $revSql AS revenue
          FROM region
          JOIN nation ON n_regionkey = r_regionkey
          JOIN supplier ON s_nationkey = n_nationkey
          JOIN lineitem ON l_suppkey = s_suppkey
          JOIN orders ON o_orderkey = l_orderkey
          JOIN customer ON c_custkey = o_custkey AND c_nationkey = s_nationkey
          WHERE r_name = 'ASIA'
            AND o_orderdate >= TIMESTAMP '1996-01-01'
            AND o_orderdate < TIMESTAMP '1997-01-01'
          GROUP BY n_name
          ORDER BY revenue DESC, n_name""",

    "q_tpch_q10" ->
      s"""SELECT c_custkey, c_name, $revSql AS revenue, c_acctbal, n_name
          FROM customer
          JOIN orders ON c_custkey = o_custkey
          JOIN lineitem ON l_orderkey = o_orderkey
          JOIN nation ON c_nationkey = n_nationkey
          WHERE l_returnflag = 'R'
            AND o_orderdate >= TIMESTAMP '1996-01-01'
            AND o_orderdate < TIMESTAMP '1996-04-01'
          GROUP BY c_custkey, c_name, c_acctbal, n_name
          ORDER BY revenue DESC, c_custkey
          LIMIT 20"""
  )
}
