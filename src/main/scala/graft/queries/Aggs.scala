package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.Tables._
import graft.util.D._

/** Aggregations (SURVEY.md §2B "Aggregations").
  *
  * Reference analogs: derived tx_count (`evm_consumer.rs:72-73`), UNIQUE
  * constraints (`0001_initial.sql:22-23`). Everything else is north-star
  * analytics surface.
  *
  * Scale notes: all groupBy aggregations here are hash aggregates with
  * map-side partial aggregation (one shuffle on the group keys); grouping
  * cardinality is tiny relative to input so the shuffle payload is the
  * partial-aggregate map, not the data. Decimal casts keep partial+final
  * merge order-insensitive (bit-deterministic across any executor count).
  */
object Aggs {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Flagship — TPC-H Q1 style pricing summary.
    "q_agg_pricing_summary" -> ((s, dir) => pricingSummary(s, dir)),

    "q_agg_distinct" -> ((s, dir) => {
      import s.implicits._
      orders(s, dir)
        .groupBy($"o_orderpriority")
        .agg(
          countDistinct($"o_custkey").as("n_cust"),
          sum_distinct($"o_custkey").as("sum_cust"))
        .orderBy($"o_orderpriority")
    }),

    "q_agg_multi_distinct" -> ((s, dir) => {
      import s.implicits._
      orders(s, dir)
        .groupBy($"o_orderpriority")
        .agg(
          countDistinct($"o_custkey").as("n_cust"),
          countDistinct($"o_orderstatus").as("n_status"),
          count(lit(1)).as("n_orders"))
        .orderBy($"o_orderpriority")
    }),

    "q_agg_having" -> ((s, dir) => {
      import s.implicits._
      lineitem(s, dir)
        .groupBy($"l_partkey")
        .agg(sum(dec4($"l_quantity")).as("sq"), count(lit(1)).as("n_items"))
        .filter($"sq" > 900)                  // HAVING on exact decimal
        .select($"l_partkey", r4($"sq").as("sum_qty"), $"n_items")
        .orderBy($"l_partkey")
    }),

    "q_agg_rollup" -> ((s, dir) => {
      import s.implicits._
      val c = customer(s, dir)
        .join(nation(s, dir), $"c_nationkey" === $"n_nationkey")
        .join(region(s, dir), $"n_regionkey" === $"r_regionkey")
      c.rollup($"r_name", $"n_name")
        .agg(
          grouping($"r_name").cast("int").as("gr"),
          grouping($"n_name").cast("int").as("gn"),
          count(lit(1)).as("n_cust"),
          r4(sum(dec4($"c_acctbal"))).as("sum_bal"))
        .select($"gr", $"gn", $"r_name", $"n_name", $"n_cust", $"sum_bal")
        .orderBy($"gr", $"gn", $"r_name".asc_nulls_first, $"n_name".asc_nulls_first)
    }),

    "q_agg_cube" -> ((s, dir) => {
      import s.implicits._
      lineitem(s, dir)
        .cube($"l_returnflag", $"l_linestatus")
        .agg(
          grouping($"l_returnflag").cast("int").as("gf"),
          grouping($"l_linestatus").cast("int").as("gs"),
          count(lit(1)).as("n_items"),
          r4(sum(dec4($"l_quantity"))).as("sum_qty"))
        .select($"gf", $"gs", $"l_returnflag", $"l_linestatus", $"n_items", $"sum_qty")
        .orderBy($"gf", $"gs",
          $"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
    }),

    "q_agg_grouping_sets" -> ((s, dir) => {
      lineitem(s, dir).createOrReplaceTempView("li_gs")
      s.sql("""
        SELECT CAST(grouping(l_returnflag) AS INT) AS gf,
               CAST(grouping(l_linestatus) AS INT) AS gs,
               l_returnflag, l_linestatus,
               count(1) AS n_items,
               round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_qty
        FROM li_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY gf, gs, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")
    }),

    "q_agg_stats" -> ((s, dir) => {
      import s.implicits._
      lineitem(s, dir)
        .groupBy($"l_returnflag")
        .agg(
          r4(min($"l_quantity")).as("min_qty"),
          r4(max($"l_quantity")).as("max_qty"),
          round(sum(dec4($"l_quantity")).cast("double") / count(lit(1)), 4).as("avg_qty"),
          r4(stddev_samp($"l_quantity")).as("sd_qty"),
          r4(var_samp($"l_quantity")).as("var_qty"),
          count(lit(1)).as("n_items"))
        .orderBy($"l_returnflag")
    }),

    "q_agg_collect" -> ((s, dir) => {
      import s.implicits._
      lineitem(s, dir)
        .filter($"l_orderkey" < 100)
        .groupBy($"l_orderkey")
        .agg(
          // collect_list/collect_set + array_sort stay under test; the
          // output is array_join-serialized because the driver's pandas
          // comparator cannot sort/hash raw ARRAY columns.
          array_join(array_sort(collect_list($"l_linenumber")).cast("array<string>"), "|").as("lns"),
          array_join(array_sort(collect_set($"l_returnflag")), "|").as("flags"))
        .orderBy($"l_orderkey")
    }),

    "q_agg_conditional" -> ((s, dir) => {
      import s.implicits._
      lineitem(s, dir)
        .groupBy($"l_returnflag")
        .agg(
          count_if($"l_quantity" > 25).as("n_bulk"),
          r4(sum(when($"l_linestatus" === "O", dec4($"l_extendedprice"))
            .otherwise(dec4(lit(0))))).as("open_price"),
          count_if($"l_discount" === 0.0).as("n_nodisc"))
        .orderBy($"l_returnflag")
    }),

    // Pearson correlation from EXACT decimal component sums — built-in
    // corr() uses engine-specific streaming algorithms (Welford vs
    // sum-of-products) whose float results differ across engines; the
    // hand-rolled algebra is bit-portable: exact Σx Σy Σxy Σx² Σy² then
    // one identical double formula on both sides.
    "q_agg_corr" -> ((s, dir) => {
      import s.implicits._
      lineitem(s, dir)
        .groupBy($"l_returnflag")
        .agg(
          count(lit(1)).as("n"),
          sum(dec4($"l_quantity")).as("sx"),
          sum(dec4($"l_extendedprice")).as("sy"),
          sum(dec4($"l_quantity") * dec4($"l_extendedprice")).as("sxy"),
          sum(dec4($"l_quantity") * dec4($"l_quantity")).as("sxx"),
          sum(dec4($"l_extendedprice") * dec4($"l_extendedprice")).as("syy"))
        // every exact decimal sum → double FIRST (identical nearest-double
        // on both engines), THEN one shared double formula: products of two
        // Σ-terms overflow DECIMAL(38) and precision-loss handling is
        // engine-specific, so the decimal domain must end here.
        .select($"l_returnflag", $"n".cast("double").as("nd"), $"n",
          $"sx".cast("double").as("sxd"), $"sy".cast("double").as("syd"),
          $"sxy".cast("double").as("sxyd"), $"sxx".cast("double").as("sxxd"),
          $"syy".cast("double").as("syyd"))
        .select($"l_returnflag", $"n",
          round(
            ($"nd" * $"sxyd" - $"sxd" * $"syd") /
              (sqrt($"nd" * $"sxxd" - $"sxd" * $"sxd") *
               sqrt($"nd" * $"syyd" - $"syd" * $"syd")), 4).as("corr_qty_price"))
        .orderBy($"l_returnflag")
    }),

    // pivot: one column per linestatus value (values pinned explicitly —
    // implicit value discovery would scan twice and order arbitrarily).
    "q_agg_pivot" -> ((s, dir) => {
      import s.implicits._
      lineitem(s, dir)
        .groupBy($"l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(r4(sum(dec4($"l_quantity"))))
        .withColumnsRenamed(Map("F" -> "qty_f", "O" -> "qty_o"))
        .orderBy($"l_returnflag")
    }),

    // unpivot/melt: wide metric columns → long (metric, value) rows.
    "q_reshape_unpivot" -> ((s, dir) => {
      import s.implicits._
      orders(s, dir)
        .select($"o_orderkey", $"o_totalprice",
          $"o_custkey".cast("double").as("custkey_d"))
        .unpivot(
          ids = Array($"o_orderkey"),
          values = Array($"o_totalprice", $"custkey_d"),
          variableColumnName = "metric",
          valueColumnName = "value")
        .orderBy($"o_orderkey", $"metric")
    }),

    // Exact interpolated quantiles via PORTABLE algebra: built-in
    // percentile()/quantile_cont() interpolate with engine-specific
    // formula/order (ULP divergence), so both sides compute rank selection
    // + the SAME interpolation expression `a + (b - a) * g` on the SAME
    // double inputs — bit-identical, no rounding needed. g is exact: p ∈
    // {.25,.5,.75} and n−1 integer make p·(n−1) and its fraction exact
    // doubles.
    //
    // Scale shape: ONE shuffle + ONE per-group sort window. Group sizes
    // come from a parallel hash agg on the base table, broadcast onto the
    // ranked rows (a second count-over-partition Window would buffer every
    // partition again for a number the 3-row dim already knows); every row
    // then knows (rn, n), decides locally whether it brackets any requested
    // quantile, and the survivors (≤ 2·|p| rows per group) feed a tiny hash
    // agg. The earlier two-bracket-join form executed the sort window
    // TWICE — a 2× constant on the heaviest stage that flips hard at 100×.
    // The production approximation remains percentile_approx (sketch, one
    // pass — tolerance unit-tested in AggToleranceSpec).
    "q_agg_percentiles" -> ((s, dir) => {
      import s.implicits._
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"l_returnflag").orderBy($"x")
      val counts = lineitem(s, dir).groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n"))
      val ranked = lineitem(s, dir)
        .select($"l_returnflag", $"l_extendedprice".as("x"))
        .withColumn("rn", row_number().over(w))
        .join(broadcast(counts), Seq("l_returnflag"))
      ranked
        // 3× narrow row inflation (one per requested p), all codegen; the
        // bracket filter immediately cuts it to ≤ 6 rows per group
        .select($"l_returnflag", $"x", $"rn", $"n",
          explode(array(Seq(0.25, 0.5, 0.75).map(lit): _*)).as("p"))
        .withColumn("h", $"p" * ($"n" - 1))
        .withColumn("lo", floor($"h").cast("long") + 1)
        .withColumn("hi", least(floor($"h").cast("long") + 2, $"n"))
        .withColumn("g", $"h" - floor($"h"))
        .filter($"rn" === $"lo" || $"rn" === $"hi")
        .groupBy($"l_returnflag", $"p")
        .agg(
          max(when($"rn" === $"lo", $"x")).as("a"),
          max(when($"rn" === $"hi", $"x")).as("b"),
          first($"g").as("gg"))
        .select($"l_returnflag", $"p", ($"a" + ($"b" - $"a") * $"gg").as("q"))
        .orderBy($"l_returnflag", $"p")
    }),

    // Fixed-bin histogram via portable bucket algebra: floor of a scaled
    // double (identical IEEE op both engines) with a capped overflow
    // bucket — width_bucket() exists in both engines but with different
    // edge conventions, so the shared formula is used instead.
    "q_agg_histogram" -> ((s, dir) => {
      import s.implicits._
      orders(s, dir)
        .select(least(floor($"o_totalprice" / 25000.0), lit(15.0)).cast("int").as("bucket"))
        .groupBy($"bucket").agg(count(lit(1)).as("n"))
        .orderBy($"bucket")
    }),

    // HLL sketch — no exact SQL oracle; driver records a rows-only check.
    // Unit test asserts ±5% vs exact countDistinct.
    "q_agg_approx_distinct" -> ((s, dir) => {
      import s.implicits._
      events(s, dir)
        .groupBy($"event_type")
        .agg(approx_count_distinct($"user_id").as("approx_users"))
        .orderBy($"event_type")
    })
  )

  /** TPC-H-Q1-style pricing summary. Exact decimal pipeline:
    * (18,4)*(19,4) products stay within precision 38 (no Spark precision-loss
    * rewrite), the (1-d)*(1+t) factor is cast to DECIMAL(18,8) (exact — inputs
    * have ≤4 decimals), giving a charge of scale 12 still ≤ precision 38.
    */
  def pricingSummary(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val qty   = dec4($"l_quantity")
    val price = dec4($"l_extendedprice")
    val disc  = dec4($"l_discount")
    val tax   = dec4($"l_tax")
    val discPrice = price * (lit(1) - disc)
    val factor    = dec8((lit(1) - disc) * (lit(1) + tax))
    val charge    = price * factor
    lineitem(s, dir)
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        r4(sum(qty)).as("sum_qty"),
        r4(sum(price)).as("sum_base_price"),
        r4(sum(discPrice)).as("sum_disc_price"),
        r4(sum(charge)).as("sum_charge"),
        round(sum(qty).cast("double") / count(lit(1)), 4).as("avg_qty"),
        round(sum(price).cast("double") / count(lit(1)), 4).as("avg_price"),
        round(sum(disc).cast("double") / count(lit(1)), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val oracle: Map[String, String] = Map(
    "q_agg_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
                round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_qty,
                round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_base_price,
                round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE), 4) AS sum_disc_price,
                round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST((1 - CAST(l_discount AS DECIMAL(18,4))) * (1 + CAST(l_tax AS DECIMAL(18,4))) AS DECIMAL(18,8))) AS DOUBLE), 4) AS sum_charge,
                round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*), 4) AS avg_qty,
                round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / count(*), 4) AS avg_price,
                round(CAST(sum(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / count(*), 4) AS avg_disc,
                count(*) AS count_order
         FROM lineitem
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",

    "q_agg_distinct" ->
      """SELECT o_orderpriority,
                count(DISTINCT o_custkey) AS n_cust,
                CAST(sum(DISTINCT o_custkey) AS BIGINT) AS sum_cust
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "q_agg_multi_distinct" ->
      """SELECT o_orderpriority,
                count(DISTINCT o_custkey) AS n_cust,
                count(DISTINCT o_orderstatus) AS n_status,
                count(*) AS n_orders
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "q_agg_having" ->
      """SELECT l_partkey,
                round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_qty,
                count(*) AS n_items
         FROM lineitem
         GROUP BY l_partkey
         HAVING sum(CAST(l_quantity AS DECIMAL(18,4))) > 900
         ORDER BY l_partkey""",

    "q_agg_rollup" ->
      """SELECT CAST(grouping(r_name) AS INT) AS gr,
                CAST(grouping(n_name) AS INT) AS gn,
                r_name, n_name,
                count(*) AS n_cust,
                round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_bal
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY ROLLUP (r_name, n_name)
         ORDER BY gr, gn, r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""",

    "q_agg_cube" ->
      """SELECT CAST(grouping(l_returnflag) AS INT) AS gf,
                CAST(grouping(l_linestatus) AS INT) AS gs,
                l_returnflag, l_linestatus,
                count(*) AS n_items,
                round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_qty
         FROM lineitem
         GROUP BY CUBE (l_returnflag, l_linestatus)
         ORDER BY gf, gs, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""",

    "q_agg_grouping_sets" ->
      """SELECT CAST(grouping(l_returnflag) AS INT) AS gf,
                CAST(grouping(l_linestatus) AS INT) AS gs,
                l_returnflag, l_linestatus,
                count(*) AS n_items,
                round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_qty
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
         ORDER BY gf, gs, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""",

    "q_agg_stats" ->
      """SELECT l_returnflag,
                round(CAST(min(l_quantity) AS DOUBLE), 4) AS min_qty,
                round(CAST(max(l_quantity) AS DOUBLE), 4) AS max_qty,
                round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*), 4) AS avg_qty,
                round(CAST(stddev_samp(l_quantity) AS DOUBLE), 4) AS sd_qty,
                round(CAST(var_samp(l_quantity) AS DOUBLE), 4) AS var_qty,
                count(*) AS n_items
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q_agg_collect" ->
      """SELECT l_orderkey,
                array_to_string(list(l_linenumber ORDER BY l_linenumber), '|') AS lns,
                array_to_string(list_sort(list(DISTINCT l_returnflag)), '|') AS flags
         FROM lineitem
         WHERE l_orderkey < 100
         GROUP BY l_orderkey ORDER BY l_orderkey""",

    "q_agg_corr" ->
      """SELECT l_returnflag, n,
                round((nd * sxyd - sxd * syd)
                      / (sqrt(nd * sxxd - sxd * sxd)
                         * sqrt(nd * syyd - syd * syd)), 4) AS corr_qty_price
         FROM (
           SELECT l_returnflag,
                  count(*) AS n,
                  CAST(count(*) AS DOUBLE) AS nd,
                  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sxd,
                  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS syd,
                  -- DECIMAL(19,4): int128 storage so the product doesn't
                  -- overflow DuckDB's int64 decimal multiply; 19+19=38 ≤ max
                  CAST(sum(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_extendedprice AS DECIMAL(19,4))) AS DOUBLE) AS sxyd,
                  CAST(sum(CAST(l_quantity AS DECIMAL(19,4)) * CAST(l_quantity AS DECIMAL(19,4))) AS DOUBLE) AS sxxd,
                  CAST(sum(CAST(l_extendedprice AS DECIMAL(19,4)) * CAST(l_extendedprice AS DECIMAL(19,4))) AS DOUBLE) AS syyd
           FROM lineitem GROUP BY l_returnflag)
         ORDER BY l_returnflag""",

    "q_agg_pivot" ->
      """SELECT l_returnflag,
                round(CAST(sum(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,4)) END) AS DOUBLE), 4) AS qty_f,
                round(CAST(sum(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,4)) END) AS DOUBLE), 4) AS qty_o
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q_reshape_unpivot" ->
      """SELECT o_orderkey, 'o_totalprice' AS metric, o_totalprice AS value FROM orders
         UNION ALL
         SELECT o_orderkey, 'custkey_d' AS metric, CAST(o_custkey AS DOUBLE) AS value FROM orders
         ORDER BY o_orderkey, metric""",

    "q_agg_conditional" ->
      """SELECT l_returnflag,
                CAST(sum(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END) AS BIGINT) AS n_bulk,
                round(CAST(sum(CASE WHEN l_linestatus = 'O' THEN CAST(l_extendedprice AS DECIMAL(18,4)) ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE), 4) AS open_price,
                CAST(sum(CASE WHEN l_discount = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_nodisc
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q_agg_histogram" ->
      """SELECT CAST(least(floor(o_totalprice / 25000.0), 15.0) AS INT) AS bucket,
                count(*) AS n
         FROM orders GROUP BY 1 ORDER BY bucket""",

    "q_agg_percentiles" ->
      """WITH ranked AS (
           SELECT l_returnflag, l_extendedprice AS x,
                  row_number() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS rn
           FROM lineitem),
         counts AS (SELECT l_returnflag, count(*) AS n FROM ranked GROUP BY l_returnflag),
         ps AS (SELECT unnest(CAST([0.25, 0.5, 0.75] AS DOUBLE[])) AS p),
         pos AS (
           SELECT l_returnflag, p, n,
                  CAST(floor(p * (n - 1)) AS BIGINT) + 1 AS lo,
                  least(CAST(floor(p * (n - 1)) AS BIGINT) + 2, n) AS hi,
                  p * (n - 1) - floor(p * (n - 1)) AS g
           FROM counts CROSS JOIN ps)
         SELECT pos.l_returnflag, p, a.x + (b.x - a.x) * g AS q
         FROM pos
         JOIN ranked a ON a.l_returnflag = pos.l_returnflag AND a.rn = pos.lo
         JOIN ranked b ON b.l_returnflag = pos.l_returnflag AND b.rn = pos.hi
         ORDER BY pos.l_returnflag, p"""
  )
}
