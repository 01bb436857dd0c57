package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.catalog.Tables._
import graft.util.D._

/** User-behavior analytics over the `events` stream — the product-analytics
  * query family (funnel conversion, cohort retention, slowly-changing
  * dimension history) layered on the same event model the reference's
  * realtime feed produces.
  *
  * Scale notes (100 TB posture):
  *   - q_funnel: three join+agg stages keyed on user_id; every stage's
  *     frame SHRINKS (users who reached the stage), so the joins get
  *     cheaper monotonically. All shuffles are user_id-hash equi-joins —
  *     co-partitioned after the first shuffle, no broadcast needed because
  *     both sides stay keyed on the same column.
  *   - q_cohort_retention: one min-per-user agg + one self-join on
  *     user_id + one (cohort, offset) hash agg. count(DISTINCT user_id)
  *     shuffles (cohort, offset, user_id) — Spark's Expand-based distinct
  *     keeps it partial-aggregated map-side.
  *   - q_scd2_intervals: lead() under a user_id-partitioned window —
  *     parallelism = user count, the natural key grain of dimension
  *     history. No global sort; the output ORDER BY is presentation-only.
  */
object Behavior {

  private val stages = Seq("view", "click", "purchase")

  /** Per-user earliest qualifying timestamp for each funnel stage, each
    * stage constrained to STRICTLY AFTER the user's previous stage (the
    * ordered funnel, not a bag-of-events filter). */
  /** Per-stage first-qualifying-time frames; `withinHours` adds the
    * conversion deadline (stage k within N hours of the user's stage-k−1
    * time) — the time-boxed funnel product analytics actually reports.
    * Timestamps are µs-exact in both engines, so the interval bound is an
    * exact comparison, no float time arithmetic. */
  private def funnelStages(e: DataFrame,
      withinHours: Option[Int] = None): Seq[DataFrame] = {
    val first = e.filter(col("event_type") === stages.head)
      .groupBy(col("user_id")).agg(min(col("ts")).as("t"))
    stages.tail.scanLeft(first) { (prev, stage) =>
      val deadline = withinHours
        .map(h => col("ts") <= col("pt") + expr(s"INTERVAL $h HOURS"))
        .getOrElse(lit(true))
      e.filter(col("event_type") === stage)
        .join(prev.select(col("user_id"), col("t").as("pt")), "user_id")
        .filter(col("ts") > col("pt") && deadline)
        .groupBy(col("user_id")).agg(min(col("ts")).as("t"))
    }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Ordered conversion funnel view → click → purchase: a user counts at
    // stage k only with a stage-k event after their stage-(k−1) time.
    "q_funnel" -> ((s, dir) => {
      val e = events(s, dir).select(col("user_id"), col("event_type"), col("ts"))
      funnelStages(e).zip(stages).zipWithIndex.map { case ((df, stage), i) =>
        df.agg(count(lit(1)).as("n_users"))
          .select(lit(s"${i + 1}_$stage").as("stage"), col("n_users"))
      }.reduce(_ unionAll _).orderBy(col("stage"))
    }),

    // Time-boxed funnel: each stage must land within 24 h of the user's
    // previous-stage time — the conversion-deadline form (same shrinking
    // equi-join chain as q_funnel; the deadline is an exact µs interval
    // comparison, portable by construction, and bites: stage-2 users drop
    // 150 → 60 at sf0.01 vs the unbounded funnel).
    "q_funnel_windowed" -> ((s, dir) => {
      val e = events(s, dir).select(col("user_id"), col("event_type"), col("ts"))
      funnelStages(e, withinHours = Some(24)).zip(stages).zipWithIndex
        .map { case ((df, stage), i) =>
          df.agg(count(lit(1)).as("n_users"))
            .select(lit(s"${i + 1}_$stage").as("stage"), col("n_users"))
        }.reduce(_ unionAll _).orderBy(col("stage"))
    }),

    // Weekly cohort retention: users bucketed by first-seen ISO week,
    // activity counted per (cohort, weeks-since-cohort).
    "q_cohort_retention" -> ((s, dir) => {
      val e = events(s, dir)
        .select(col("user_id"), date_trunc("week", col("ts")).cast("date").as("wk"))
      val cohorts = e.groupBy(col("user_id")).agg(min(col("wk")).as("cohort_week"))
      e.join(cohorts, "user_id")
        .select(col("user_id"), col("cohort_week"),
          expr("CAST(datediff(wk, cohort_week) / 7 AS INT)").as("week_offset"))
        .groupBy(col("cohort_week"), col("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("cohort_week"), col("week_offset"))
    }),

    // SCD type-2 intervals: each user's event history becomes validity
    // ranges [valid_from, valid_to) via lead(); open-ended row = current.
    // Path analysis: each user's first five event types in time order as
    // a ">"-joined path string, top-20 paths by user count — the "what do
    // users DO first" product-analytics view (distinct from the funnel,
    // which tests ONE fixed ordering). One user_id window for the first-5
    // filter, then path-string hash agg + TakeOrdered; the per-user state
    // is capped at 5 structs regardless of history length — the property
    // that keeps the collect bounded at 100 TB.
    "q_path_sequences" -> ((s, dir) => {
      import s.implicits._
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy($"ts", $"event_id")
      events(s, dir)
        .select($"user_id", $"event_type", $"ts", $"event_id")
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= 5)
        .groupBy($"user_id")
        // collect_list is partition-order-dependent: sort the (rn, type)
        // structs before joining so the path is rank-ordered
        .agg(array_join(
          transform(array_sort(collect_list(struct($"rn", $"event_type"))),
            x => x.getField("event_type")), ">").as("path"))
        .groupBy($"path").agg(count(lit(1)).as("n_users"))
        .orderBy($"n_users".desc, $"path")
        .limit(20)
    }),

    // Markov transition matrix over per-user event streams: count of
    // each (src → dst) consecutive-event pair plus the row-normalized
    // transition probability in exact e4 integer units (n·10⁴ div
    // row_n — BIGINT floor division, no float crosses engines). One
    // user-keyed window for the lag, one (src, dst) aggregate; the
    // row-total normalization is a window over the transition frame
    // itself, which is |event_type|²-bounded (dim-sized at any corpus
    // scale) — never a second pass over the events fact.
    "q_path_transitions" -> ((s, dir) => {
      import s.implicits._
      val wu = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy($"ts", $"event_id")
      val t = events(s, dir)
        .select($"user_id", $"event_type", $"ts", $"event_id")
        .withColumn("src", lag($"event_type", 1).over(wu))
        .filter($"src".isNotNull)
        .groupBy($"src", $"event_type".as("dst"))
        .agg(count(lit(1)).as("n"))
      val wrow = org.apache.spark.sql.expressions.Window.partitionBy($"src")
      t.withColumn("row_n", sum($"n").over(wrow))
        .select($"src", $"dst", $"n",
          expr("n * 10000 div row_n").as("p_e4"))
        .orderBy($"src", $"dst")
    }),

    "q_scd2_intervals" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("valid_from"), col("event_id"))
      // `value` passes through RAW: both engines read the same parquet
      // double, so emitting it unrounded is bit-identical — while
      // round(double, 4) near a .00005 tie is NOT portable between
      // Spark and DuckDB (r4 is for derived aggregates, not pass-throughs)
      events(s, dir).filter(col("user_id") < 50)
        .select(col("user_id"), col("event_id"), col("value"),
          col("ts").as("valid_from"))
        .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
        .withColumn("is_current", col("valid_to").isNull)
        .orderBy(col("user_id"), col("valid_from"), col("event_id"))
    }),

    // CDC snapshot diff: previous vs current table version → one row per
    // changed key tagged insert/delete/update with old/new values. The two
    // versions are deterministic slices of orders (prev drops %97 keys =
    // "inserted since"; cur drops %89 keys = "deleted since"; %13 keys
    // carry a price bump = "updated"), so both engines derive identical
    // snapshots from one source. Plan: ONE full outer equi-join on the
    // key, change classification as a post-join projection — at 100 TB
    // this is the audit/regression-diff between two table versions, a
    // single co-partitioned shuffle per side (and zero shuffles when both
    // versions are bucketed on the key — the q_join_bucketed layout).
    // value compare: +1.0 on a sub-2^52 double is exact in both engines.
    "q_cdc_diff" -> ((s, dir) => {
      import s.implicits._
      val o = orders(s, dir).select($"o_orderkey", $"o_totalprice")
      val prev = o.filter($"o_orderkey" % 97 =!= 0)
        .select($"o_orderkey".as("k"),
          when($"o_orderkey" % 13 === 0, $"o_totalprice" - 1.0)
            .otherwise($"o_totalprice").as("prev_price"))
      val cur = o.filter($"o_orderkey" % 89 =!= 0)
        .select($"o_orderkey".as("k"), $"o_totalprice".as("cur_price"))
      prev.join(cur, Seq("k"), "full_outer")
        .withColumn("change",
          when($"prev_price".isNull, "insert")
            .when($"cur_price".isNull, "delete")
            .when($"prev_price" =!= $"cur_price", "update"))
        .filter($"change".isNotNull)
        .select($"k".as("o_orderkey"), $"change", $"prev_price", $"cur_price")
        .orderBy($"o_orderkey")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_funnel" ->
      """WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
         v AS (SELECT user_id, min(ts) AS t FROM e WHERE event_type = 'view' GROUP BY 1),
         c AS (SELECT e.user_id, min(ts) AS t FROM e JOIN v USING (user_id)
               WHERE event_type = 'click' AND ts > v.t GROUP BY 1),
         p AS (SELECT e.user_id, min(ts) AS t FROM e JOIN c USING (user_id)
               WHERE event_type = 'purchase' AND ts > c.t GROUP BY 1)
         SELECT stage, n_users FROM (
           SELECT '1_view' AS stage, count(*) AS n_users FROM v
           UNION ALL SELECT '2_click', count(*) FROM c
           UNION ALL SELECT '3_purchase', count(*) FROM p)
         ORDER BY stage""",

    "q_funnel_windowed" ->
      """WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
         v AS (SELECT user_id, min(ts) AS t FROM e WHERE event_type = 'view' GROUP BY 1),
         c AS (SELECT e.user_id, min(ts) AS t FROM e JOIN v USING (user_id)
               WHERE event_type = 'click' AND ts > v.t
                 AND ts <= v.t + INTERVAL 24 HOUR GROUP BY 1),
         p AS (SELECT e.user_id, min(ts) AS t FROM e JOIN c USING (user_id)
               WHERE event_type = 'purchase' AND ts > c.t
                 AND ts <= c.t + INTERVAL 24 HOUR GROUP BY 1)
         SELECT stage, n_users FROM (
           SELECT '1_view' AS stage, count(*) AS n_users FROM v
           UNION ALL SELECT '2_click', count(*) FROM c
           UNION ALL SELECT '3_purchase', count(*) FROM p)
         ORDER BY stage""",

    "q_cohort_retention" ->
      """WITH e AS (SELECT user_id,
                CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS wk
              FROM events),
         cohorts AS (SELECT user_id, min(wk) AS cohort_week FROM e GROUP BY 1)
         SELECT cohort_week,
                CAST(date_diff('day', cohort_week, wk) / 7 AS INT) AS week_offset,
                count(DISTINCT user_id) AS n_users
         FROM e JOIN cohorts USING (user_id)
         GROUP BY 1, 2
         ORDER BY cohort_week, week_offset""",

    "q_path_sequences" ->
      """WITH seq AS (
           SELECT user_id,
                  array_to_string(
                    (list(event_type ORDER BY ts, event_id))[1:5], '>') AS path
           FROM events GROUP BY user_id)
         SELECT path, CAST(count(*) AS BIGINT) AS n_users
         FROM seq
         GROUP BY path
         ORDER BY n_users DESC, path
         LIMIT 20""",

    "q_path_transitions" ->
      """WITH seq AS (
           SELECT user_id, event_type,
                  lag(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS prev
           FROM events),
         t AS (SELECT prev AS src, event_type AS dst,
                      CAST(count(*) AS BIGINT) AS n
               FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2),
         tot AS (SELECT src, CAST(sum(n) AS BIGINT) AS row_n
                 FROM t GROUP BY 1)
         SELECT t.src, t.dst, n, CAST(n * 10000 // row_n AS BIGINT) AS p_e4
         FROM t JOIN tot USING (src)
         ORDER BY src, dst""",

    "q_scd2_intervals" ->
      """WITH e AS (SELECT user_id, event_id, value,
                CAST(ts AS TIMESTAMP) AS valid_from
              FROM events WHERE user_id < 50)
         SELECT user_id, event_id, value, valid_from,
                lead(valid_from) OVER w AS valid_to,
                lead(valid_from) OVER w IS NULL AS is_current
         FROM e
         WINDOW w AS (PARTITION BY user_id ORDER BY valid_from, event_id)
         ORDER BY user_id, valid_from, event_id""",

    "q_cdc_diff" ->
      """WITH prev AS (
           SELECT o_orderkey AS k,
                  CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice - 1.0
                       ELSE o_totalprice END AS prev_price
           FROM orders WHERE o_orderkey % 97 <> 0),
         cur AS (
           SELECT o_orderkey AS k, o_totalprice AS cur_price
           FROM orders WHERE o_orderkey % 89 <> 0),
         d AS (
           SELECT COALESCE(prev.k, cur.k) AS o_orderkey,
                  CASE WHEN prev.k IS NULL THEN 'insert'
                       WHEN cur.k IS NULL THEN 'delete'
                       WHEN prev_price <> cur_price THEN 'update' END AS change,
                  prev_price, cur_price
           FROM prev FULL OUTER JOIN cur ON prev.k = cur.k)
         SELECT o_orderkey, change, prev_price, cur_price
         FROM d WHERE change IS NOT NULL
         ORDER BY o_orderkey"""
  )
}
