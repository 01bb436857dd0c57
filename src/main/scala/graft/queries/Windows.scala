package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.catalog.Tables._
import graft.util.D._

/** Window functions (SURVEY.md §2B "Window functions").
  *
  * Reference analogs (loose): block-height monotonicity
  * (`/root/reference/src/streams/schemas/evm.rs:10`) for running windows,
  * the parent_hash chain (`evm.rs:13`) for lead/lag. The rest is north-star.
  *
  * Scale notes: every window here partitions by a high-cardinality key
  * (custkey/orderkey), so state per partition is bounded (orders-per-customer,
  * lines-per-order); one shuffle on the partition key, sort within partitions.
  * No un-partitioned windows — a global `Window.orderBy` would serialize the
  * whole dataset through one task at 100 TB.
  */
object Windows {

  /** Deterministic window ordering: tie-break every orderBy to a unique key
    * so rank/lag values don't depend on partition-internal arrival order. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Gaps-and-islands STREAKS: longest run of consecutive active DAYS per
    // user — the date − row_number() constant-per-island device (distinct
    // from q_scd2_intervals' lead() validity ranges and q_stream_session's
    // gap windows: islands group by arithmetic, not adjacency joins). All
    // arithmetic is exact integer/date; the window partitions by user so
    // state is bounded per key.
    "q_win_streaks" -> ((s, dir) => {
      import s.implicits._
      val days = events(s, dir)
        .select($"user_id", to_date($"ts").as("d")).distinct()
      val w = Window.partitionBy($"user_id").orderBy($"d")
      val islands = days
        .select($"user_id", $"d",
          date_sub($"d", row_number().over(w)).as("grp"))
        .groupBy($"user_id", $"grp")
        .agg(count(lit(1)).as("len"))
      islands.groupBy($"user_id")
        .agg(max($"len").as("longest_streak"),
          sum($"len").as("n_active_days"),
          count(lit(1)).as("n_streaks"))
        .orderBy($"user_id")
    }),

    "q_win_rank" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
      orders(s, dir)
        .select(
          $"o_custkey", $"o_orderkey", $"o_totalprice",
          row_number().over(w).as("rn"),
          rank().over(w).as("rk"),
          dense_rank().over(w).as("drk"))
        .orderBy($"o_custkey", $"o_orderkey")
    }),

    // Distribution ranks: percent_rank = (rank-1)/(n-1) and cume_dist =
    // rank_to_last/n are exact small-integer ratios — the division is one
    // correctly-rounded IEEE op on identical operands in both engines, so
    // round(·, 6) is portable (unlike ln/exp, where libm implementations
    // differ). Ordering is tie-broken to the unique order key.
    "q_win_cume_dist" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_orderpriority")
        .orderBy($"o_totalprice", $"o_orderkey")
      orders(s, dir)
        .select(
          $"o_orderpriority", $"o_orderkey", $"o_totalprice",
          round(percent_rank().over(w), 6).as("pr"),
          round(cume_dist().over(w), 6).as("cd"))
        .orderBy($"o_orderpriority", $"o_orderkey")
    }),

    "q_win_running" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_orderdate", $"o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      orders(s, dir)
        .select(
          $"o_custkey", $"o_orderkey", $"o_orderdate",
          r4(sum(dec4($"o_totalprice")).over(w)).as("run_spent"),
          count(lit(1)).over(w).as("run_orders"))
        .orderBy($"o_custkey", $"o_orderkey")
    }),

    // Moving MEDIAN (7-row trailing window) of daily order counts — the
    // robust smoother (one spike day shifts a moving average but not the
    // median). The window value list is collected frame-ordered, sorted,
    // and the LOWER median element picked — an actual data value, so no
    // interpolation/rounding portability hazards; the frame is ≤7 rows
    // regardless of scale, and the window runs on the date-grain daily
    // aggregate, never fact rows.
    "q_win_moving_median" -> ((s, dir) => {
      import s.implicits._
      val daily = orders(s, dir)
        .groupBy($"o_orderdate".cast("date").as("day"))
        .agg(count(lit(1)).as("n_orders"))
      val w = Window.orderBy($"day").rowsBetween(-6, 0)
      daily
        .withColumn("win", sort_array(collect_list($"n_orders").over(w)))
        .select($"day", $"n_orders",
          element_at($"win", expr("(size(win) + 1) div 2").cast("int")).as("mov_median"))
        .orderBy($"day")
    }),

    // Share-of-total (ratio_to_report): each order's fraction of its
    // priority class's spend — the contribution/market-share window. The
    // denominator is an EXACT decimal window sum (order-insensitive
    // across partials); numerator and denominator cast to double once,
    // one shared division under r4 on both engines.
    "q_win_share" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_orderpriority")
      orders(s, dir)
        .select(
          $"o_orderpriority", $"o_orderkey", $"o_totalprice",
          r4(dec4($"o_totalprice").cast("double") /
             sum(dec4($"o_totalprice")).over(w).cast("double")).as("share"))
        .orderBy($"o_orderpriority", $"o_orderkey")
    }),

    "q_win_lead_lag" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      orders(s, dir)
        .select(
          $"o_custkey", $"o_orderkey", $"o_orderdate",
          lag($"o_orderdate", 1).over(w).as("prev_date"),
          lead($"o_orderdate", 1).over(w).as("next_date"),
          first($"o_orderdate").over(w).as("first_date"),
          last($"o_orderdate").over(
            w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
            .as("last_date"))
        .orderBy($"o_custkey", $"o_orderkey")
    }),

    "q_win_moving" -> ((s, dir) => {
      import s.implicits._
      val rows3 = Window.partitionBy($"o_custkey")
        .orderBy($"o_orderdate", $"o_orderkey")
        .rowsBetween(-3, 0)
      // RANGE frame over the int day-offset of the order date: orders within
      // the previous 30 days (inclusive) of the current row's date.
      val byDay = Window.partitionBy($"o_custkey")
        .orderBy(datediff($"o_orderdate", lit("1990-01-01").cast("date")))
        .rangeBetween(-30, 0)
      orders(s, dir)
        .select(
          $"o_custkey", $"o_orderkey", $"o_orderdate",
          round(avg(dec4($"o_totalprice")).over(rows3).cast("double"), 4).as("mavg4"),
          count(lit(1)).over(byDay).as("n_30d"))
        .orderBy($"o_custkey", $"o_orderkey")
    }),

    "q_win_ntile" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_orderpriority")
        .orderBy($"o_totalprice", $"o_orderkey")
      orders(s, dir)
        .select(
          $"o_orderpriority", $"o_orderkey", $"o_totalprice",
          ntile(4).over(w).as("quartile"),
          r4(percent_rank().over(w)).as("pr"),
          r4(cume_dist().over(w)).as("cd"))
        .orderBy($"o_orderpriority", $"o_orderkey")
    }),

    // nth_value over the full-partition frame (needs both bounds — the
    // default running frame would make nth_value order-dependent garbage).
    "q_win_nth" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      orders(s, dir)
        .select($"o_custkey", $"o_orderkey", $"o_totalprice",
          nth_value($"o_orderkey", 2).over(w).as("second_best"))
        .orderBy($"o_custkey", $"o_orderkey")
    }),

    "q_topk_per_group" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
      orders(s, dir)
        .select($"o_custkey", $"o_orderkey", $"o_totalprice",
          row_number().over(w).as("rn"))
        .filter($"rn" <= 2)
        .orderBy($"o_custkey", $"rn")
    }),

    // VALUE-based frame (RANGE BETWEEN): per-customer trailing-30-day
    // order total — the frame is bounded by the ORDER value (day number),
    // not a row count, so ties and gaps behave calendar-correctly. Same
    // single per-key window shuffle as the rows-frame queries.
    "q_win_range_frame" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"dn")
        .rangeBetween(-30, Window.currentRow)
      orders(s, dir)
        .select($"o_orderkey", $"o_custkey",
          datediff(to_date($"o_orderdate"), lit("1990-01-01")).as("dn"),
          $"o_totalprice")
        .withColumn("sum_30d", r4(sum(dec4($"o_totalprice")).over(w)))
        .drop("o_totalprice")
        .orderBy($"o_orderkey")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_win_streaks" ->
      """WITH days AS (
           SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
         islands AS (
           SELECT user_id,
                  d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d) AS INT) AS grp
           FROM days),
         lens AS (
           SELECT user_id, grp, CAST(count(*) AS BIGINT) AS len
           FROM islands GROUP BY 1, 2)
         SELECT user_id,
                max(len) AS longest_streak,
                CAST(sum(len) AS BIGINT) AS n_active_days,
                CAST(count(*) AS BIGINT) AS n_streaks
         FROM lens
         GROUP BY user_id
         ORDER BY user_id""",

    "q_win_range_frame" ->
      """SELECT o_orderkey, o_custkey, dn,
                round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER
                  (PARTITION BY o_custkey ORDER BY dn
                   RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE), 4) AS sum_30d
         FROM (SELECT o_orderkey, o_custkey,
                      CAST(date_diff('day', DATE '1990-01-01',
                        CAST(o_orderdate AS DATE)) AS INT) AS dn,
                      o_totalprice
               FROM orders)
         ORDER BY o_orderkey""",

    "q_win_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
                CAST(row_number() OVER w AS INT) AS rn,
                CAST(rank() OVER w AS INT) AS rk,
                CAST(dense_rank() OVER w AS INT) AS drk
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
         ORDER BY o_custkey, o_orderkey""",

    "q_win_cume_dist" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice,
                round(percent_rank() OVER w, 6) AS pr,
                round(cume_dist() OVER w, 6) AS cd
         FROM orders
         WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
         ORDER BY o_orderpriority, o_orderkey""",

    "q_win_moving_median" ->
      """WITH daily AS (
           SELECT CAST(o_orderdate AS DATE) AS day,
                  CAST(count(*) AS BIGINT) AS n_orders
           FROM orders GROUP BY 1),
         w AS (
           SELECT day, n_orders,
                  list_sort(list(n_orders) OVER win) AS arr
           FROM daily
           WINDOW win AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
         SELECT day, n_orders, arr[(len(arr) + 1) // 2] AS mov_median
         FROM w ORDER BY day""",

    "q_win_share" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice,
                round(CAST(CAST(o_totalprice AS DECIMAL(18,4)) AS DOUBLE) /
                      CAST(sum(CAST(o_totalprice AS DECIMAL(18,4)))
                           OVER (PARTITION BY o_orderpriority) AS DOUBLE), 4) AS share
         FROM orders
         ORDER BY o_orderpriority, o_orderkey""",

    "q_win_running" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
                round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER w AS DOUBLE), 4) AS run_spent,
                count(*) OVER w AS run_orders
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         ORDER BY o_custkey, o_orderkey""",

    "q_win_lead_lag" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
                lag(o_orderdate, 1) OVER w AS prev_date,
                lead(o_orderdate, 1) OVER w AS next_date,
                first_value(o_orderdate) OVER w AS first_date,
                last_value(o_orderdate) OVER
                  (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_date
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
         ORDER BY o_custkey, o_orderkey""",

    "q_win_moving" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
                round(CAST(avg(CAST(o_totalprice AS DECIMAL(18,4))) OVER
                  (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE), 4) AS mavg4,
                count(*) OVER
                  (PARTITION BY o_custkey
                   ORDER BY datediff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE))
                   RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS n_30d
         FROM orders
         ORDER BY o_custkey, o_orderkey""",

    "q_win_ntile" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice,
                CAST(ntile(4) OVER w AS INT) AS quartile,
                round(CAST(percent_rank() OVER w AS DOUBLE), 4) AS pr,
                round(CAST(cume_dist() OVER w AS DOUBLE), 4) AS cd
         FROM orders
         WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
         ORDER BY o_orderpriority, o_orderkey""",

    "q_win_nth" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
                nth_value(o_orderkey, 2) OVER
                  (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_best
         FROM orders
         ORDER BY o_custkey, o_orderkey""",

    "q_topk_per_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn
         FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                      CAST(row_number() OVER (PARTITION BY o_custkey
                        ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
               FROM orders)
         WHERE rn <= 2
         ORDER BY o_custkey, rn"""
  )
}
