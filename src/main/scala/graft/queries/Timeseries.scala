package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.catalog.Tables._
import graft.util.D._

/** Event-time series analytics over `events` — batch sessionization,
  * exponentially-weighted smoothing, and bar/OHLC resampling: the
  * time-series family a realtime ingestion feed (the reference's
  * block/transaction stream, `/root/reference/src/streams/producers/
  * evm_producer.rs:33-55`) is queried with downstream. q_stream_session
  * covers the *streaming* session window; q_sessionize_gap is its batch
  * replay twin over the full history.
  *
  * Scale notes (100 TB posture):
  *   - q_sessionize_gap: ONE shuffle on user_id. The lag window, the
  *     running-sum window, and the (user_id, session_no) aggregate all
  *     cluster by user_id, and HashPartitioning(user_id) satisfies
  *     ClusteredDistribution(user_id, session_no), so Catalyst plans the
  *     whole query on a single exchange (pinned in PlanSpec). Parallelism
  *     = user count — the natural grain; no global sort anywhere (the
  *     output ORDER BY is presentation-only).
  *   - q_timeseries_ewma: the smoothing runs on the DAILY aggregate, not
  *     the raw events — at 100 TB the band self-join touches one row per
  *     (key, day), orders of magnitude below the fact table, and the
  *     20-day horizon bounds the join fan-out to exactly 20x that. An
  *     unbounded-history recursive EWMA would need a sequential scan per
  *     key; the truncated form keeps the whole plan a bounded range
  *     equi-join ((1-α)^20 ≈ 1.2% residual weight at α=0.2).
  *   - q_timeseries_resample: one window + one aggregate over the same
  *     (event_type, week) keys — the window's hash partitioning is reused
  *     by the aggregate, single exchange. open/close via frame-ordered
  *     first/last_value (ties broken by event_id) — no argmin UDF, stays
  *     in whole-stage codegen.
  */
object Timeseries {

  /** 30-minute inactivity gap, in microseconds (timestamps are µs-exact
    * in both engines, so the gap comparison is exact integer math). */
  private val GapUs = 1800L * 1000000L

  /** q_timeseries_periodogram's trig table: (period p, residue r,
    * round(cos(2πr/p)·1e3), round(sin(2πr/p)·1e3)) for p = 2..14 —
    * computed ONCE here and inlined into BOTH engines (the Spark
    * literal frame and the oracle's VALUES list), so neither engine
    * evaluates a transcendental at query time and the whole statistic
    * is exact BIGINT arithmetic. e3 (not e4) keeps the squared
    * demeaned sums inside BIGINT out to ~sf10 (documented bound). */
  private val periodogramTrig: Seq[(Long, Long, Long, Long)] =
    for {
      p <- 2L to 14L
      r <- 0L until p
    } yield {
      val th = 2.0 * math.Pi * r / p
      (p, r, math.round(math.cos(th) * 1000), math.round(math.sin(th) * 1000))
    }

  /** The same table as a SQL VALUES body (p, r, c_e3, s_e3). */
  private def periodogramTrigSql: String =
    periodogramTrig
      .map { case (p, r, c, s) => s"($p, $r, $c, $s)" }
      .mkString(",\n             ")

  /** q_timeseries_backtest's frame — shared by the queries entry and the
    * graft_backtest TVF (round 18: the SQL-surface member of the time
    * series family). Pure plan, no embedded checkpoints — safe to build
    * inside the analyzer. */
  private[graft] def backtestFrame(s: SparkSession, dir: String): org.apache.spark.sql.DataFrame = {

      import s.implicits._
      val B = "4398046511104L"
      val OFF = "1099511627776L"
      val lv = s"(x * 10000L + 3L * (a.lv + a.tr) + $B) div 4L - $OFF"
      val tr = s"(($lv) - a.lv + 3L * a.tr + $B) div 4L - $OFF"
      val holtAgg = s"""aggregate(transform(sx, e -> e.x),
          named_struct('n', 0L, 'lv', 0L, 'tr', 0L,
            'fs', CAST(array() AS ARRAY<BIGINT>)),
          (a, x) -> IF(a.n = 0L,
            named_struct('n', 1L, 'lv', x * 10000L, 'tr', 0L,
              'fs', array(x * 10000L)),
            named_struct('n', a.n + 1L, 'lv', $lv, 'tr', $tr,
              'fs', concat(a.fs, array(($lv) + ($tr))))),
          a -> a.fs)"""
      val tot = s"(a.ss[0]+a.ss[1]+a.ss[2]+a.ss[3]+a.ss[4]+a.ss[5]+x*10000L)"
      val lv0 = s"($tot div 7L)"
      val sOld = "a.ss[CAST(a.n % 7L AS INT)]"
      val lvN = s"((x*10000L - $sOld + 3L*(a.lv + a.tr) + $B) div 4L - $OFF)"
      val trN = s"(($lvN - a.lv + 3L*a.tr + $B) div 4L - $OFF)"
      val sN = s"((x*10000L - $lvN + 3L*$sOld + $B) div 4L - $OFF)"
      // f1 after state t = a.n+1 reads slot t mod 7, which this step did
      // NOT rewrite (consecutive mods differ) — so it reads a.ss; at the
      // init step the algebra collapses to the raw first value a.ss[0]
      val f1N = s"($lvN + $trN + a.ss[CAST((a.n + 1L) % 7L AS INT)])"
      val hwAgg = s"""aggregate(transform(sx, e -> e.x),
          named_struct('n', 0L, 'lv', 0L, 'tr', 0L,
            'ss', array(0L, 0L, 0L, 0L, 0L, 0L, 0L),
            'fs', CAST(array() AS ARRAY<BIGINT>)),
          (a, x) -> IF(a.n < 6L,
            named_struct('n', a.n + 1L, 'lv', 0L, 'tr', 0L,
              'ss', transform(a.ss,
                (v, j) -> IF(CAST(j AS BIGINT) = a.n, x*10000L, v)),
              'fs', concat(a.fs, array(0L))),
            IF(a.n = 6L,
              named_struct('n', 7L, 'lv', $lv0, 'tr', 0L,
                'ss', transform(a.ss,
                  (v, j) -> IF(j = 6, x*10000L, v) - $lv0),
                'fs', concat(a.fs, array(a.ss[0]))),
              named_struct('n', a.n + 1L, 'lv', $lvN, 'tr', $trN,
                'ss', transform(a.ss,
                  (v, j) -> IF(CAST(j AS BIGINT) = a.n % 7L, $sN, v)),
                'fs', concat(a.fs, array($f1N))))),
          a -> a.fs)"""
      def smape(f: String) =
        s"sum((2L * abs($f - act) * 10000L) div (abs($f) + abs(act))) div count(1)"
      events(s, dir)
        .groupBy($"event_type", $"ts".cast("timestamp").cast("date").as("day"))
        .agg(count(lit(1)).as("x"))
        .groupBy($"event_type")
        .agg(sort_array(collect_list(struct($"day", $"x"))).as("sx"))
        // ≥ 22 days: every origin t ≥ 8 has a live HW state (t ≥ 7) and
        // a naive reference (t − 6 ≥ 1)
        .filter(size($"sx") >= 22)
        .select($"event_type", size($"sx").cast("long").as("n_days"),
          expr("transform(sx, e -> e.x)").as("xs"),
          expr(holtAgg).as("fh"), expr(hwAgg).as("fw"))
        .select($"event_type", $"n_days",
          explode(sequence($"n_days" - 14, $"n_days" - 1)).as("t"),
          $"xs", $"fh", $"fw")
        .select($"event_type", $"n_days",
          (element_at($"xs", ($"t" + 1).cast("int")) * 10000L).as("act"),
          element_at($"fh", $"t".cast("int")).as("f_holt"),
          element_at($"fw", $"t".cast("int")).as("f_hw"),
          (element_at($"xs", ($"t" - 6).cast("int")) * 10000L).as("f_naive"))
        .groupBy($"event_type", $"n_days")
        .agg(count(lit(1)).as("n_origins"),
          expr("sum(abs(f_holt - act)) div count(1)").as("mae_holt_e4"),
          expr("sum(abs(f_hw - act)) div count(1)").as("mae_hw_e4"),
          expr("sum(abs(f_naive - act)) div count(1)").as("mae_naive_e4"),
          expr(smape("f_holt")).as("smape_holt_e4"),
          expr(smape("f_hw")).as("smape_hw_e4"),
          expr(smape("f_naive")).as("smape_naive_e4"))
        .withColumn("best_model",
          when($"smape_holt_e4" <= $"smape_hw_e4" &&
              $"smape_holt_e4" <= $"smape_naive_e4", "holt")
            .when($"smape_hw_e4" <= $"smape_naive_e4", "holtwinters")
            .otherwise("seasonal_naive"))
        .orderBy($"event_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Gap-based batch sessionization: a new session starts when the user
    // is idle >= 30 min. lag → boundary flag → running sum = session id,
    // then per-session stats. All integer/µs arithmetic — no doubles.
    // The boundary is >= (not >) to match session_window's half-open
    // [start, last+gap) semantics exactly — an event at precisely
    // last_ts + 30:00.000000 falls OUTSIDE the streaming window and must
    // open a new session here too, or the batch/stream equivalence in
    // TimeseriesSpec would hold only while no fixture has a gap of
    // exactly 1,800.000000 s.
    "q_sessionize_gap" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
      events(s, dir)
        .select($"user_id", $"event_id", unix_micros($"ts".cast("timestamp")).as("ts_us"))
        .withColumn("new_s",
          when(lag($"ts_us", 1).over(w).isNull ||
               $"ts_us" - lag($"ts_us", 1).over(w) >= GapUs, 1L).otherwise(0L))
        .withColumn("session_no", sum($"new_s").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy($"user_id", $"session_no")
        .agg(count(lit(1)).as("n_events"),
          min($"ts_us").as("start_us"), max($"ts_us").as("end_us"),
          (max($"ts_us") - min($"ts_us")).as("dur_us"))
        .orderBy($"user_id", $"session_no")
    }),

    // Truncated EWMA (α=0.2, 20-day horizon) of the daily event count per
    // type, as a band self-join on the daily frame: weight (1-α)^(Δdays),
    // ewma = Σ w·x / Σ w. Daily x is an exact BIGINT count, so the only
    // float math is the 20-term weighted sum — identical IEEE doubles on
    // both engines under r4.
    "q_timeseries_ewma" -> ((s, dir) => {
      import s.implicits._
      val daily = events(s, dir)
        .groupBy($"event_type", $"ts".cast("timestamp").cast("date").as("day"))
        .agg(count(lit(1)).as("x"))
      val a = daily.select($"event_type", $"day", $"x")
      val b = daily.select($"event_type".as("bt"), $"day".as("bday"), $"x".as("bx"))
      a.join(b,
          $"event_type" === $"bt" && $"bday" <= $"day" &&
          date_add($"bday", 20) > $"day")
        .groupBy($"event_type", $"day")
        .agg(r4(sum(pow(lit(0.8), datediff($"day", $"bday")) * $"bx") /
                sum(pow(lit(0.8), datediff($"day", $"bday")))).as("ewma"))
        .orderBy($"event_type", $"day")
    }),

    // Holt's linear-trend double exponential smoothing (α = β = 1/4) of
    // the daily event count per type — the EWMA's trend-aware sibling
    // (level + trend state, 3-day-ahead forecast). The interlocked
    // recursion can't be truncated into a band join the way EWMA's
    // single state could, so it runs as an integer fold over the
    // per-type daily array: state in e4 micro-units, every division a
    // BIAS-SHIFTED `div 4` ((x + 2^42) div 4 − 2^40 ≡ floor(x/4) on
    // both engines even for the NEGATIVE trend values, where Spark's
    // truncating div and DuckDB's flooring // would otherwise split).
    // Scale: the fold is a narrow per-row expression over the DAILY
    // AGGREGATE (day-count-sized arrays, never fact rows) — the
    // embarrassingly-parallel per-key shape of every sequential-state
    // pass here; the oracle mirrors it as a recursive CTE.
    "q_timeseries_holt" -> ((s, dir) => {
      import s.implicits._
      val lv = "(x * 10000L + 3L * (a.lv + a.tr) + 4398046511104L) div 4L - 1099511627776L"
      val tr = s"(($lv) - a.lv + 3L * a.tr + 4398046511104L) div 4L - 1099511627776L"
      events(s, dir)
        .groupBy($"event_type", $"ts".cast("timestamp").cast("date").as("day"))
        .agg(count(lit(1)).as("x"))
        .groupBy($"event_type")
        .agg(sort_array(collect_list(struct($"day", $"x"))).as("sx"))
        // the base case keys on an explicit seen-counter, NOT a level
        // value sentinel — a declining series can legitimately drive the
        // level through any value, including a would-be sentinel
        .select($"event_type", size($"sx").as("n_days"),
          expr(s"""aggregate(transform(sx, e -> e.x),
                     named_struct('n', 0L, 'lv', 0L, 'tr', 0L),
                     (a, x) -> IF(a.n = 0L,
                       named_struct('n', 1L, 'lv', x * 10000L, 'tr', 0L),
                       named_struct('n', a.n + 1L, 'lv', $lv, 'tr', $tr)))""").as("hw"))
        .select($"event_type", $"n_days", $"hw.lv".as("level_e4"),
          $"hw.tr".as("trend_e4"),
          ($"hw.lv" + lit(3L) * $"hw.tr").as("forecast3_e4"))
        .orderBy($"event_type")
    }),

    // Holt-Winters ADDITIVE seasonality (α = β = γ = 1/4, period m = 7):
    // the seasonal member q_timeseries_acf's weekly bump motivates and
    // q_timeseries_holt's level+trend model lacks. State = (level,
    // trend, 7 seasonal offsets) in e4 micro-units, folded over the
    // per-type daily array with the same bias-shifted `div 4` recipe
    // ((x + 2^42) div 4 − 2^40 ≡ floor(x/4) on both engines even for
    // negative level/trend/season values). Init at t = 7: level = mean
    // of the first week (non-negative sum → plain div 7 is floor on
    // both engines), trend = 0, s_i = x_i − level; then the standard
    // interlocked recurrences with s_{t−7} read/written at slot
    // (t−1) mod 7. Output: final state + 1-day and 7-day-ahead
    // forecasts (l + h·b + s_{t+h−7}). Scale: same shape as holt — a
    // narrow per-key fold over the DAILY aggregate (day-count-sized
    // arrays, never fact rows), embarrassingly parallel per key; the
    // oracle mirrors the recurrence as a recursive CTE carrying the 7
    // seasonal slots as scalar columns.
    "q_timeseries_holtwinters" -> ((s, dir) => {
      import s.implicits._
      val B = "4398046511104L"
      val OFF = "1099511627776L"
      // init at the 7th value: slots 0..5 hold raw x_i·e4, x_7 arrives now
      val tot = s"(a.ss[0]+a.ss[1]+a.ss[2]+a.ss[3]+a.ss[4]+a.ss[5]+x*10000L)"
      val lv0 = s"($tot div 7L)"
      // recurrence at t = a.n+1 > 7: seasonal slot (t−1) mod 7 = a.n mod 7
      val sOld = "a.ss[CAST(a.n % 7L AS INT)]"
      val lvN = s"((x*10000L - $sOld + 3L*(a.lv + a.tr) + $B) div 4L - $OFF)"
      val trN = s"(($lvN - a.lv + 3L*a.tr + $B) div 4L - $OFF)"
      val sN = s"((x*10000L - $lvN + 3L*$sOld + $B) div 4L - $OFF)"
      events(s, dir)
        .groupBy($"event_type", $"ts".cast("timestamp").cast("date").as("day"))
        .agg(count(lit(1)).as("x"))
        .groupBy($"event_type")
        .agg(sort_array(collect_list(struct($"day", $"x"))).as("sx"))
        .select($"event_type", size($"sx").as("n_days"),
          expr(s"""aggregate(transform(sx, e -> e.x),
                     named_struct('n', 0L, 'lv', 0L, 'tr', 0L,
                       'ss', array(0L, 0L, 0L, 0L, 0L, 0L, 0L)),
                     (a, x) -> IF(a.n < 6L,
                       named_struct('n', a.n + 1L, 'lv', 0L, 'tr', 0L,
                         'ss', transform(a.ss,
                           (v, j) -> IF(CAST(j AS BIGINT) = a.n, x*10000L, v))),
                       IF(a.n = 6L,
                         named_struct('n', 7L, 'lv', $lv0, 'tr', 0L,
                           'ss', transform(a.ss,
                             (v, j) -> IF(j = 6, x*10000L, v) - $lv0)),
                         named_struct('n', a.n + 1L, 'lv', $lvN, 'tr', $trN,
                           'ss', transform(a.ss,
                             (v, j) -> IF(CAST(j AS BIGINT) = a.n % 7L, $sN, v))))))""")
            .as("hw"))
        .filter($"n_days" >= 7)
        .select($"event_type", $"n_days".cast("long").as("n_days"),
          $"hw.lv".as("level_e4"), $"hw.tr".as("trend_e4"),
          ($"hw.lv" + $"hw.tr" +
            expr("hw.ss[CAST(n_days % 7 AS INT)]")).as("forecast1_e4"),
          ($"hw.lv" + lit(7L) * $"hw.tr" +
            expr("hw.ss[CAST((n_days + 6) % 7 AS INT)]")).as("forecast7_e4"))
        .orderBy($"event_type")
    }),

    // Classical seasonal DECOMPOSITION (the moving-average STL-lite:
    // trend = centered 7-day MA, seasonal = per-weekday mean of the
    // detrended series, residual = x − trend − seasonal) — the
    // diagnostic counterpart of q_timeseries_holtwinters' forecasting
    // model. All window/aggregate functions over the DAILY frame, no
    // recursion. Exact integers: trend_e4 = 7-day window sum · 1e4
    // div 7 (defined only where the window is FULL — count = 7 — so
    // the div is over non-negative operands); the seasonal mean
    // divides a NEGATIVE-capable detrended sum by a variable count,
    // so it uses the variable-divisor bias shift
    // (x + B·cnt) div cnt − B ≡ floor(x/cnt) on both engines, valid
    // while mean(detr) > −B. B = 2^40 e4 ≈ 1.1e11 counts of headroom:
    // detrended noise grows ~√(daily count), so the margin holds to
    // absurd scale (self-review r16 raised it from 2^20, whose ~105
    // counts of headroom would already crack around sf 2–10).
    // Season index = epoch-days mod 7 (engine-neutral weekday — no
    // dayofweek() convention mismatch).
    "q_timeseries_decompose" -> ((s, dir) => {
      import s.implicits._
      val wOrd = Window.partitionBy($"event_type").orderBy($"day")
      val ma = wOrd.rowsBetween(-3, 3)
      val daily = events(s, dir)
        .groupBy($"event_type", $"ts".cast("timestamp").cast("date").as("day"))
        .agg(count(lit(1)).as("x"))
        .withColumn("w_n", count(lit(1)).over(ma))
        .withColumn("trend_e4",
          when($"w_n" === 7, expr("(sum(x) OVER (PARTITION BY event_type ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) * 10000L) div 7L")))
        .withColumn("dow", datediff($"day", lit("1970-01-01").cast("date")) % 7)
        .withColumn("detr", $"x" * 10000L - $"trend_e4")
      val season = daily.filter($"trend_e4".isNotNull)
        .groupBy($"event_type", $"dow")
        .agg(expr(
          "(sum(detr) + 1099511627776L * count(1)) div count(1) - 1099511627776L")
          .as("seasonal_e4"))
      daily
        .join(broadcast(season), Seq("event_type", "dow"), "left")
        .select($"event_type", $"day", $"x", $"trend_e4", $"seasonal_e4",
          ($"detr" - $"seasonal_e4").as("resid_e4"))
        .orderBy($"event_type", $"day")
    }),

    // Tabular CUSUM changepoint detection [Page, Biometrika'54] over the
    // daily per-type counts: reference mean μ0 from a 14-day burn-in,
    // allowance k = μ0/20, threshold h = μ0/4 (flags ~5 days of
    // sustained ≥10% drift; fixture-discriminating — some types alarm,
    // others stay quiet), then the one-sided pair
    //   S⁺_t = max(0, S⁺_{t−1} + x_t − μ0 − k)
    //   S⁻_t = max(0, S⁻_{t−1} + μ0 − k − x_t).
    // The clamped recursion needs NO recursive fold: with C = cumsum(d),
    // S_t = C_t − min(0, min_{j≤t} C_j) — two window functions, so the
    // whole detector is one type-partitioned window pass over the DAILY
    // aggregate on both engines (the embarrassingly-parallel per-key
    // shape; no day-count-sized arrays, no recursion anywhere). All
    // exact e4 integers: μ0 = burn-in sum·1e4 div count (non-negative —
    // plain div floors identically), d/C/S plain sums.
    "q_timeseries_cusum" -> ((s, dir) => {
      import s.implicits._
      val wOrd = Window.partitionBy($"event_type")
        .orderBy($"day")
      val pre = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val daily = events(s, dir)
        .groupBy($"event_type", $"ts".cast("timestamp").cast("date").as("day"))
        .agg(count(lit(1)).as("x"))
        .withColumn("rn", row_number().over(wOrd))
      val burn = daily.filter($"rn" <= 14)
        .groupBy($"event_type")
        .agg(expr("(sum(x) * 10000L) div count(1)").as("mu0_e4"))
      daily.filter($"rn" >= 15)
        .join(broadcast(burn), Seq("event_type"))
        .withColumn("k_e4", expr("mu0_e4 div 20L"))
        .withColumn("dpos", $"x" * 10000L - $"mu0_e4" - $"k_e4")
        .withColumn("dneg", $"mu0_e4" - $"k_e4" - $"x" * 10000L)
        .withColumn("cpos", sum($"dpos").over(pre))
        .withColumn("cneg", sum($"dneg").over(pre))
        .withColumn("spos_e4", $"cpos" - least(lit(0L), min($"cpos").over(pre)))
        .withColumn("sneg_e4", $"cneg" - least(lit(0L), min($"cneg").over(pre)))
        .select($"event_type", $"day", $"x", $"mu0_e4",
          $"spos_e4", $"sneg_e4",
          ($"spos_e4" > expr("mu0_e4 div 4L") ||
            $"sneg_e4" > expr("mu0_e4 div 4L")).as("alarm"))
        .orderBy($"event_type", $"day")
    }),

    // Rolling-origin one-step-ahead forecast BACKTEST (verdict r17 #5)
    // — the model-selection diagnostic that justifies the seasonal
    // model's existence: for each of the last 14 origins t, forecast
    // day t+1 with (a) Holt level+trend, (b) Holt-Winters additive
    // seasonal, (c) seasonal-naive (the value 7 positions back — the
    // same position-based week the HW slots use), and score MAE and
    // sMAPE per type in exact e4 integers. The per-origin forecasts
    // come from ONE fold per model that APPENDS its one-step forecast
    // after every step (the prefix states the rolling origin needs,
    // without refolding per origin); sMAPE's per-origin quotient
    // (2·|f−a|·1e4) div (|f|+|a|) and both means divide non-negative
    // operands, so div ≡ // everywhere. Same per-key daily-aggregate
    // fold shape as holt/holtwinters; the oracle reads the SAME
    // recursions at every rn instead of only the last.
    "q_timeseries_backtest" -> ((s, dir) => backtestFrame(s, dir)),

    // Forward-fill imputation (LOCF): daily per-type count of high-value
    // events (value > 250 — 96 of the 150 (type, day) cells are empty at
    // sf0.01), date-spined so gaps surface as nulls, then last-observation-
    // carried-forward via last_value(IGNORE NULLS) over the type-keyed
    // window. The window runs on the AGGREGATED date-grain series (≤ a few
    // thousand rows per key even for decades of days), partitioned by the
    // series key — never an unpartitioned scan of fact rows. Leading nulls
    // (before the first observation) stay null on both engines.
    "q_timeseries_ffill" -> ((s, dir) => {
      import s.implicits._
      val e = events(s, dir)
      val daily = e.filter($"value" > 250)
        .groupBy($"event_type", $"ts".cast("timestamp").cast("date").as("day"))
        .agg(count(lit(1)).as("n_critical"))
      val bounds = e.agg(
        min($"ts".cast("timestamp").cast("date")).as("d0"),
        max($"ts".cast("timestamp").cast("date")).as("d1"))
      val spine = bounds
        .select(explode(sequence($"d0", $"d1", expr("INTERVAL 1 DAY"))).as("day"))
        .crossJoin(e.select($"event_type").distinct())
      val w = Window.partitionBy($"event_type").orderBy($"day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spine.join(daily, Seq("event_type", "day"), "left")
        .select($"event_type", $"day", $"n_critical",
          last($"n_critical", ignoreNulls = true).over(w).as("n_filled"))
        .orderBy($"event_type", $"day")
    }),

    // Rolling anomaly detection: days whose count leaves the PRIOR week's
    // ±2σ band, per event type — the monitoring primitive on any ingest
    // metric (the streaming drift gates test DISTRIBUTIONS; this flags
    // individual points against their own trailing baseline, which the
    // point itself does not contaminate: frame = 7 PRECEDING .. 1
    // PRECEDING). ENTIRELY integer: |x−μ| > 2s cross-multiplies to
    // (n·x − Σx)²·(n−1) > 4·n·(n·Σx² − (Σx)²), so no division, sqrt, or
    // float ever happens — engine-identical by construction, no r4/ULP
    // caveats at all. The squared terms are carried in DECIMAL(38,0):
    // BIGINT wraps silently (non-ANSI Spark) once daily counts reach
    // ~5e8 ((n·x−Σx)² passes Long.Max), while DuckDB's HUGEINT keeps
    // going — decimal(38,0) (≈1e38 < 2^127) keeps both engines exact up
    // to daily counts of ~1e8·√n ≈ 1e9, far past any real per-day count;
    // the witness columns stay BIGINT. Windows run on the daily
    // aggregate (one row per
    // (type, day)); the first 7 days of each series are excluded
    // (baseline not yet full). Witness sums are emitted so the oracle
    // checks the algebra, not just the verdict bit.
    "q_timeseries_anomaly" -> ((s, dir) => {
      import s.implicits._
      val daily = events(s, dir)
        .groupBy($"event_type", $"ts".cast("timestamp").cast("date").as("day"))
        .agg(count(lit(1)).as("x"))
      val w = Window.partitionBy($"event_type").orderBy($"day")
        .rowsBetween(-7, -1)
      val wn = Window.partitionBy($"event_type").orderBy($"day")
      val framed = daily.select($"event_type", $"day", $"x",
        count(lit(1)).over(w).as("n"),
        sum($"x").over(w).as("sx"),
        sum($"x" * $"x").over(w).as("sxx"),
        row_number().over(wn).as("rn"))
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      framed.filter($"rn" >= 8)
        .filter((dec($"n" * $"x" - $"sx") * dec($"n" * $"x" - $"sx")) * dec($"n" - 1) >
          dec(lit(4) * $"n") * (dec($"n") * dec($"sxx") - dec($"sx") * dec($"sx")))
        .select($"event_type", $"day", $"x", $"sx", $"sxx")
        .orderBy($"event_type", $"day")
    }),

    // Lag-k autocorrelation (k = 1..3) of the daily event count per type —
    // the periodicity diagnostic (weekly seasonality shows as an ACF bump
    // at lag 7). Pairs come from lag-shifted equi-joins ON THE DAILY
    // AGGREGATE (like q_timeseries_ewma, never raw facts); all six
    // correlation sums are exact BIGINT products of integer counts, and
    // the Pearson formula is ONE shared double expression — the
    // q_agg_corr portability recipe.
    // Integer PERIODOGRAM (DFT power at candidate periods 2..14) of the
    // daily per-type counts — the frequency-domain sibling of
    // q_timeseries_acf's lag correlations: power(p) = (Σ y_t·cos(2πt/p))²
    // + (Σ y_t·sin(2πt/p))² over the demeaned series, peak period
    // flagged per type. EXACT cross-engine by construction:
    // the trig values are e3-scaled BIGINT literals generated ONCE in
    // Scala (cos is periodic, so only (p, t mod p) cells exist — 104
    // literals) and inlined into BOTH the Spark literal frame and the
    // oracle's VALUES list, so no engine evaluates a transcendental and
    // every sum is exact integer arithmetic (the squared demeaned sums
    // stay inside BIGINT out to ~sf10 — the periodogramTrig scaladoc's
    // bound; past it the honest fix is e2 trig, not bigger integers).
    // Work: one broadcast join of the daily frame against a 104-row
    // literal table + one (type, p) aggregate.
    "q_timeseries_periodogram" -> ((s, dir) => {
      import s.implicits._
      val wOrd = Window.partitionBy($"event_type").orderBy($"day")
      val wAll = Window.partitionBy($"event_type")
      val trig = periodogramTrig.toDF("p", "r", "c_e3", "s_e3")
      // demean EXACTLY in integers: y = n·x − Σx (the per-type scaling
      // by n is uniform across periods, so peaks are unaffected) —
      // without it, DC leakage at non-integer cycle counts swamps the
      // true weekly line
      val daily = events(s, dir)
        .groupBy($"event_type", $"ts".cast("timestamp").cast("date").as("day"))
        .agg(count(lit(1)).as("x"))
        .withColumn("t", row_number().over(wOrd).cast("long") - 1L)
        .withColumn("y", count(lit(1)).over(wAll) * $"x" - sum($"x").over(wAll))
      daily
        // explode the 13 candidate periods FIRST so the trig lookup is
        // a true equi-join on (p, r = t mod p) — BroadcastHashJoin, not
        // the nested-loop a theta-condition (t % p = r) would plan
        .withColumn("p", explode(lit((2 to 14).map(_.toLong).toArray)))
        .withColumn("r", $"t" % $"p")
        .join(broadcast(trig), Seq("p", "r"))
        .groupBy($"event_type", $"p")
        .agg(sum($"y" * $"c_e3").as("a_e3"), sum($"y" * $"s_e3").as("b_e3"))
        .select($"event_type", $"p",
          ($"a_e3" * $"a_e3" + $"b_e3" * $"b_e3").as("power_e6"))
        .withColumn("is_peak",
          $"power_e6" === max($"power_e6").over(
            Window.partitionBy($"event_type")))
        .orderBy($"event_type", $"p")
    }),

    "q_timeseries_acf" -> ((s, dir) => {
      import s.implicits._
      val daily = events(s, dir)
        .groupBy($"event_type", $"ts".cast("timestamp").cast("date").as("day"))
        .agg(count(lit(1)).as("x"))
      val pairs = Seq(1, 2, 3).map { l =>
        daily.join(
            daily.select($"event_type", date_add($"day", l).as("day"), $"x".as("y")),
            Seq("event_type", "day"))
          .select($"event_type", lit(l).as("lag"), $"x", $"y")
      }.reduce(_ unionAll _)
      pairs.groupBy($"event_type", $"lag")
        .agg(count(lit(1)).as("n"),
          sum($"x").as("sx"), sum($"y").as("sy"), sum($"x" * $"y").as("sxy"),
          sum($"x" * $"x").as("sxx"), sum($"y" * $"y").as("syy"))
        .select($"event_type", $"lag", $"n",
          r4(($"n" * $"sxy" - $"sx" * $"sy").cast("double") /
             sqrt(($"n" * $"sxx" - $"sx" * $"sx").cast("double") *
                  ($"n" * $"syy" - $"sy" * $"sy").cast("double"))).as("acf"))
        .orderBy($"event_type", $"lag")
    }),

    // Weekly OHLC bars per event type: open/close = first/last value in
    // the week (frame-ordered by ts, event_id), high/low = max/min. The
    // value doubles pass through untouched (no cross-row float sums).
    "q_timeseries_resample" -> ((s, dir) => {
      import s.implicits._
      val wk = Window.partitionBy($"event_type", $"week")
        .orderBy($"ts_us", $"event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      events(s, dir)
        .select($"event_type",
          date_trunc("week", $"ts".cast("timestamp")).cast("date").as("week"),
          unix_micros($"ts".cast("timestamp")).as("ts_us"), $"event_id", $"value")
        .withColumn("o", first($"value").over(wk))
        .withColumn("c", last($"value").over(wk))
        .groupBy($"event_type", $"week")
        .agg(count(lit(1)).as("n"),
          r4(min($"o")).as("open"), r4(max($"value")).as("high"),
          r4(min($"value")).as("low"), r4(min($"c")).as("close"))
        .orderBy($"event_type", $"week")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_sessionize_gap" ->
      """WITH flags AS (
           SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
                  CASE WHEN lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER w IS NULL
                         OR epoch_us(CAST(ts AS TIMESTAMP))
                            - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER w >= 1800000000
                       THEN 1 ELSE 0 END AS new_s
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         sess AS (
           SELECT user_id, ts_us,
                  sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS session_no
           FROM flags)
         SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
                CAST(count(*) AS BIGINT) AS n_events,
                min(ts_us) AS start_us, max(ts_us) AS end_us,
                max(ts_us) - min(ts_us) AS dur_us
         FROM sess GROUP BY 1, 2
         ORDER BY user_id, session_no""",

    "q_timeseries_anomaly" ->
      """WITH daily AS (
           SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
                  CAST(count(*) AS BIGINT) AS x
           FROM events GROUP BY 1, 2),
         framed AS (
           SELECT event_type, day, x,
                  CAST(count(*) OVER w AS BIGINT) AS n,
                  sum(x) OVER w AS sx,
                  sum(x*x) OVER w AS sxx,
                  row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
           FROM daily
           WINDOW w AS (PARTITION BY event_type ORDER BY day
                        ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
         SELECT event_type, day, x, CAST(sx AS BIGINT) AS sx, CAST(sxx AS BIGINT) AS sxx
         FROM framed
         WHERE rn >= 8
           AND (n*x - sx)*(n*x - sx)*(n-1) > 4*n*(n*sxx - sx*sx)
         ORDER BY event_type, day""",

    "q_timeseries_holt" ->
      """WITH RECURSIVE daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS x,
                  row_number() OVER (PARTITION BY event_type ORDER BY CAST(ts AS DATE)) AS rn
           FROM events GROUP BY 1, 2),
         hw AS (
           SELECT event_type, rn, x * 10000 AS lv, CAST(0 AS BIGINT) AS tr
           FROM daily WHERE rn = 1
           UNION ALL
           SELECT d.event_type, d.rn,
                  (d.x * 10000 + 3 * (hw.lv + hw.tr) + 4398046511104) // 4 - 1099511627776,
                  ((d.x * 10000 + 3 * (hw.lv + hw.tr) + 4398046511104) // 4 - 1099511627776
                    - hw.lv + 3 * hw.tr + 4398046511104) // 4 - 1099511627776
           FROM hw JOIN daily d
             ON d.event_type = hw.event_type AND d.rn = hw.rn + 1),
         fin AS (
           SELECT event_type, rn, lv, tr,
                  row_number() OVER (PARTITION BY event_type ORDER BY rn DESC) AS rr
           FROM hw)
         SELECT event_type, CAST(rn AS INTEGER) AS n_days, lv AS level_e4,
                tr AS trend_e4, lv + 3 * tr AS forecast3_e4
         FROM fin WHERE rr = 1
         ORDER BY event_type""",

    // same Scala-generated trig literals — neither engine computes trig
    "q_timeseries_periodogram" ->
      s"""WITH trig(p, r, c_e3, s_e3) AS (
           VALUES $periodogramTrigSql),
         daily0 AS (
           SELECT event_type, CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS x,
                  CAST(row_number() OVER (PARTITION BY event_type ORDER BY CAST(ts AS DATE)) - 1 AS BIGINT) AS t
           FROM events GROUP BY 1, 2),
         daily AS (
           SELECT event_type, day, t,
                  CAST(count(*) OVER w * x - sum(x) OVER w AS BIGINT) AS y
           FROM daily0
           WINDOW w AS (PARTITION BY event_type)),
         pw AS (
           SELECT d.event_type, CAST(tr.p AS BIGINT) AS p,
                  CAST(sum(d.y * tr.c_e3) AS BIGINT) AS a_e3,
                  CAST(sum(d.y * tr.s_e3) AS BIGINT) AS b_e3
           FROM daily d JOIN trig tr ON d.t % tr.p = tr.r
           GROUP BY 1, 2),
         fin AS (
           SELECT event_type, p,
                  CAST(a_e3 * a_e3 + b_e3 * b_e3 AS BIGINT) AS power_e6
           FROM pw)
         SELECT event_type, p, power_e6,
                power_e6 = max(power_e6) OVER (PARTITION BY event_type) AS is_peak
         FROM fin
         ORDER BY event_type, p""",

    "q_timeseries_decompose" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS x
           FROM events GROUP BY 1, 2),
         ma AS (
           SELECT event_type, day, x,
                  count(*) OVER w AS w_n,
                  CASE WHEN count(*) OVER w = 7
                       THEN CAST((sum(x) OVER w * 10000) // 7 AS BIGINT) END AS trend_e4,
                  CAST((day - DATE '1970-01-01') % 7 AS BIGINT) AS dow
           FROM daily
           WINDOW w AS (PARTITION BY event_type ORDER BY day
                        ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
         detr AS (
           SELECT *, x * 10000 - trend_e4 AS detr FROM ma),
         season AS (
           SELECT event_type, dow,
                  CAST((sum(detr) + 1099511627776 * count(*)) // count(*) - 1099511627776 AS BIGINT)
                    AS seasonal_e4
           FROM detr WHERE trend_e4 IS NOT NULL
           GROUP BY 1, 2)
         SELECT d.event_type, d.day, d.x, d.trend_e4, s.seasonal_e4,
                CAST(d.detr - s.seasonal_e4 AS BIGINT) AS resid_e4
         FROM detr d LEFT JOIN season s
           ON s.event_type = d.event_type AND s.dow = d.dow
         ORDER BY d.event_type, d.day""",

    // window-function mirror of the CUSUM prefix-sum reformulation:
    // S_t = C_t − min(0, running min of C) — no recursion on either side
    "q_timeseries_cusum" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS x,
                  row_number() OVER (PARTITION BY event_type ORDER BY CAST(ts AS DATE)) AS rn
           FROM events GROUP BY 1, 2),
         burn AS (
           SELECT event_type,
                  CAST(sum(x) * 10000 // count(*) AS BIGINT) AS mu0_e4
           FROM daily WHERE rn <= 14 GROUP BY 1),
         scored AS (
           SELECT d.event_type, d.day, d.x, b.mu0_e4,
                  d.x * 10000 - b.mu0_e4 - b.mu0_e4 // 20 AS dpos,
                  b.mu0_e4 - b.mu0_e4 // 20 - d.x * 10000 AS dneg
           FROM daily d JOIN burn b USING (event_type)
           WHERE d.rn >= 15),
         c AS (
           SELECT event_type, day, x, mu0_e4,
                  sum(dpos) OVER w AS cpos, sum(dneg) OVER w AS cneg
           FROM scored
           WINDOW w AS (PARTITION BY event_type ORDER BY day
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         s AS (
           SELECT event_type, day, x, mu0_e4,
                  CAST(cpos - least(0, min(cpos) OVER w) AS BIGINT) AS spos_e4,
                  CAST(cneg - least(0, min(cneg) OVER w) AS BIGINT) AS sneg_e4
           FROM c
           WINDOW w AS (PARTITION BY event_type ORDER BY day
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         SELECT event_type, day, x, mu0_e4, spos_e4, sneg_e4,
                (spos_e4 > mu0_e4 // 4 OR sneg_e4 > mu0_e4 // 4) AS alarm
         FROM s
         ORDER BY event_type, day""",

    // recursive-CTE mirror of the Holt-Winters fold: 7 seasonal slots as
    // scalar columns, lateral aliases (lvn/trn) carry the interlocked
    // level→trend→season order within each recursion step
    "q_timeseries_holtwinters" ->
      """WITH RECURSIVE daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS x,
                  row_number() OVER (PARTITION BY event_type ORDER BY CAST(ts AS DATE)) AS rn
           FROM events GROUP BY 1, 2),
         init AS (
           SELECT event_type, CAST(7 AS BIGINT) AS rn,
                  CAST(sum(x * 10000) // 7 AS BIGINT) AS lv, CAST(0 AS BIGINT) AS tr,
                  CAST(max(CASE WHEN rn = 1 THEN x END) * 10000 - sum(x * 10000) // 7 AS BIGINT) AS s0,
                  CAST(max(CASE WHEN rn = 2 THEN x END) * 10000 - sum(x * 10000) // 7 AS BIGINT) AS s1,
                  CAST(max(CASE WHEN rn = 3 THEN x END) * 10000 - sum(x * 10000) // 7 AS BIGINT) AS s2,
                  CAST(max(CASE WHEN rn = 4 THEN x END) * 10000 - sum(x * 10000) // 7 AS BIGINT) AS s3,
                  CAST(max(CASE WHEN rn = 5 THEN x END) * 10000 - sum(x * 10000) // 7 AS BIGINT) AS s4,
                  CAST(max(CASE WHEN rn = 6 THEN x END) * 10000 - sum(x * 10000) // 7 AS BIGINT) AS s5,
                  CAST(max(CASE WHEN rn = 7 THEN x END) * 10000 - sum(x * 10000) // 7 AS BIGINT) AS s6
           FROM daily WHERE rn <= 7 GROUP BY 1 HAVING count(*) = 7),
         hw AS (
           SELECT * FROM init
           UNION ALL
           SELECT d.event_type, d.rn,
                  (d.x * 10000 - (CASE (d.rn - 1) % 7
                       WHEN 0 THEN hw.s0 WHEN 1 THEN hw.s1 WHEN 2 THEN hw.s2
                       WHEN 3 THEN hw.s3 WHEN 4 THEN hw.s4 WHEN 5 THEN hw.s5
                       ELSE hw.s6 END)
                    + 3 * (hw.lv + hw.tr) + 4398046511104) // 4 - 1099511627776 AS lvn,
                  (lvn - hw.lv + 3 * hw.tr + 4398046511104) // 4 - 1099511627776 AS trn,
                  CASE WHEN (d.rn - 1) % 7 = 0
                       THEN (d.x * 10000 - lvn + 3 * hw.s0 + 4398046511104) // 4 - 1099511627776
                       ELSE hw.s0 END,
                  CASE WHEN (d.rn - 1) % 7 = 1
                       THEN (d.x * 10000 - lvn + 3 * hw.s1 + 4398046511104) // 4 - 1099511627776
                       ELSE hw.s1 END,
                  CASE WHEN (d.rn - 1) % 7 = 2
                       THEN (d.x * 10000 - lvn + 3 * hw.s2 + 4398046511104) // 4 - 1099511627776
                       ELSE hw.s2 END,
                  CASE WHEN (d.rn - 1) % 7 = 3
                       THEN (d.x * 10000 - lvn + 3 * hw.s3 + 4398046511104) // 4 - 1099511627776
                       ELSE hw.s3 END,
                  CASE WHEN (d.rn - 1) % 7 = 4
                       THEN (d.x * 10000 - lvn + 3 * hw.s4 + 4398046511104) // 4 - 1099511627776
                       ELSE hw.s4 END,
                  CASE WHEN (d.rn - 1) % 7 = 5
                       THEN (d.x * 10000 - lvn + 3 * hw.s5 + 4398046511104) // 4 - 1099511627776
                       ELSE hw.s5 END,
                  CASE WHEN (d.rn - 1) % 7 = 6
                       THEN (d.x * 10000 - lvn + 3 * hw.s6 + 4398046511104) // 4 - 1099511627776
                       ELSE hw.s6 END
           FROM hw JOIN daily d
             ON d.event_type = hw.event_type AND d.rn = hw.rn + 1),
         fin AS (
           SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY rn DESC) AS rr
           FROM hw)
         SELECT event_type, CAST(rn AS BIGINT) AS n_days, lv AS level_e4, tr AS trend_e4,
                lv + tr + (CASE rn % 7
                    WHEN 0 THEN s0 WHEN 1 THEN s1 WHEN 2 THEN s2 WHEN 3 THEN s3
                    WHEN 4 THEN s4 WHEN 5 THEN s5 ELSE s6 END) AS forecast1_e4,
                lv + 7 * tr + (CASE (rn + 6) % 7
                    WHEN 0 THEN s0 WHEN 1 THEN s1 WHEN 2 THEN s2 WHEN 3 THEN s3
                    WHEN 4 THEN s4 WHEN 5 THEN s5 ELSE s6 END) AS forecast7_e4
         FROM fin WHERE rr = 1
         ORDER BY event_type""",

    // the holt + holtwinters recursions verbatim, read at EVERY rn
    // (each origin's forecast is the prefix state) instead of the last
    "q_timeseries_backtest" ->
      """WITH RECURSIVE daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS x,
                  row_number() OVER (PARTITION BY event_type ORDER BY CAST(ts AS DATE)) AS rn
           FROM events GROUP BY 1, 2),
         ho AS (
           SELECT event_type, rn, x * 10000 AS lv, CAST(0 AS BIGINT) AS tr
           FROM daily WHERE rn = 1
           UNION ALL
           SELECT d.event_type, d.rn,
                  (d.x * 10000 + 3 * (ho.lv + ho.tr) + 4398046511104) // 4 - 1099511627776,
                  ((d.x * 10000 + 3 * (ho.lv + ho.tr) + 4398046511104) // 4 - 1099511627776
                    - ho.lv + 3 * ho.tr + 4398046511104) // 4 - 1099511627776
           FROM ho JOIN daily d
             ON d.event_type = ho.event_type AND d.rn = ho.rn + 1),
         init AS (
           SELECT event_type, CAST(7 AS BIGINT) AS rn,
                  CAST(sum(x * 10000) // 7 AS BIGINT) AS lv, CAST(0 AS BIGINT) AS tr,
                  CAST(max(CASE WHEN rn = 1 THEN x END) * 10000 - sum(x * 10000) // 7 AS BIGINT) AS s0,
                  CAST(max(CASE WHEN rn = 2 THEN x END) * 10000 - sum(x * 10000) // 7 AS BIGINT) AS s1,
                  CAST(max(CASE WHEN rn = 3 THEN x END) * 10000 - sum(x * 10000) // 7 AS BIGINT) AS s2,
                  CAST(max(CASE WHEN rn = 4 THEN x END) * 10000 - sum(x * 10000) // 7 AS BIGINT) AS s3,
                  CAST(max(CASE WHEN rn = 5 THEN x END) * 10000 - sum(x * 10000) // 7 AS BIGINT) AS s4,
                  CAST(max(CASE WHEN rn = 6 THEN x END) * 10000 - sum(x * 10000) // 7 AS BIGINT) AS s5,
                  CAST(max(CASE WHEN rn = 7 THEN x END) * 10000 - sum(x * 10000) // 7 AS BIGINT) AS s6
           FROM daily WHERE rn <= 7 GROUP BY 1 HAVING count(*) = 7),
         hws AS (
           SELECT * FROM init
           UNION ALL
           SELECT d.event_type, d.rn,
                  (d.x * 10000 - (CASE (d.rn - 1) % 7
                       WHEN 0 THEN hws.s0 WHEN 1 THEN hws.s1 WHEN 2 THEN hws.s2
                       WHEN 3 THEN hws.s3 WHEN 4 THEN hws.s4 WHEN 5 THEN hws.s5
                       ELSE hws.s6 END)
                    + 3 * (hws.lv + hws.tr) + 4398046511104) // 4 - 1099511627776 AS lvn,
                  (lvn - hws.lv + 3 * hws.tr + 4398046511104) // 4 - 1099511627776 AS trn,
                  CASE WHEN (d.rn - 1) % 7 = 0
                       THEN (d.x * 10000 - lvn + 3 * hws.s0 + 4398046511104) // 4 - 1099511627776
                       ELSE hws.s0 END,
                  CASE WHEN (d.rn - 1) % 7 = 1
                       THEN (d.x * 10000 - lvn + 3 * hws.s1 + 4398046511104) // 4 - 1099511627776
                       ELSE hws.s1 END,
                  CASE WHEN (d.rn - 1) % 7 = 2
                       THEN (d.x * 10000 - lvn + 3 * hws.s2 + 4398046511104) // 4 - 1099511627776
                       ELSE hws.s2 END,
                  CASE WHEN (d.rn - 1) % 7 = 3
                       THEN (d.x * 10000 - lvn + 3 * hws.s3 + 4398046511104) // 4 - 1099511627776
                       ELSE hws.s3 END,
                  CASE WHEN (d.rn - 1) % 7 = 4
                       THEN (d.x * 10000 - lvn + 3 * hws.s4 + 4398046511104) // 4 - 1099511627776
                       ELSE hws.s4 END,
                  CASE WHEN (d.rn - 1) % 7 = 5
                       THEN (d.x * 10000 - lvn + 3 * hws.s5 + 4398046511104) // 4 - 1099511627776
                       ELSE hws.s5 END,
                  CASE WHEN (d.rn - 1) % 7 = 6
                       THEN (d.x * 10000 - lvn + 3 * hws.s6 + 4398046511104) // 4 - 1099511627776
                       ELSE hws.s6 END
           FROM hws JOIN daily d
             ON d.event_type = hws.event_type AND d.rn = hws.rn + 1),
         nn AS (
           SELECT event_type, CAST(max(rn) AS BIGINT) AS n_days
           FROM daily GROUP BY 1 HAVING max(rn) >= 22),
         org AS (
           SELECT event_type, n_days, unnest(range(n_days - 14, n_days)) AS t
           FROM nn),
         per AS (
           SELECT o.event_type, o.n_days,
                  da.x * 10000 AS act,
                  ho.lv + ho.tr AS f_holt,
                  hws.lv + hws.tr + (CASE o.t % 7
                      WHEN 0 THEN hws.s0 WHEN 1 THEN hws.s1 WHEN 2 THEN hws.s2
                      WHEN 3 THEN hws.s3 WHEN 4 THEN hws.s4 WHEN 5 THEN hws.s5
                      ELSE hws.s6 END) AS f_hw,
                  dn.x * 10000 AS f_naive
           FROM org o
           JOIN daily da ON da.event_type = o.event_type AND da.rn = o.t + 1
           JOIN daily dn ON dn.event_type = o.event_type AND dn.rn = o.t - 6
           JOIN ho ON ho.event_type = o.event_type AND ho.rn = o.t
           JOIN hws ON hws.event_type = o.event_type AND hws.rn = o.t)
         SELECT event_type, n_days, CAST(count(*) AS BIGINT) AS n_origins,
                CAST(sum(abs(f_holt - act)) // count(*) AS BIGINT) AS mae_holt_e4,
                CAST(sum(abs(f_hw - act)) // count(*) AS BIGINT) AS mae_hw_e4,
                CAST(sum(abs(f_naive - act)) // count(*) AS BIGINT) AS mae_naive_e4,
                CAST(sum((2 * abs(f_holt - act) * 10000) // (abs(f_holt) + abs(act))) // count(*) AS BIGINT) AS smape_holt_e4,
                CAST(sum((2 * abs(f_hw - act) * 10000) // (abs(f_hw) + abs(act))) // count(*) AS BIGINT) AS smape_hw_e4,
                CAST(sum((2 * abs(f_naive - act) * 10000) // (abs(f_naive) + abs(act))) // count(*) AS BIGINT) AS smape_naive_e4,
                CASE WHEN smape_holt_e4 <= smape_hw_e4 AND smape_holt_e4 <= smape_naive_e4 THEN 'holt'
                     WHEN smape_hw_e4 <= smape_naive_e4 THEN 'holtwinters'
                     ELSE 'seasonal_naive' END AS best_model
         FROM per
         GROUP BY event_type, n_days
         ORDER BY event_type""",

    "q_timeseries_ewma" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS x
           FROM events GROUP BY 1, 2)
         SELECT a.event_type, a.day,
                round(CAST(sum(power(0.8, date_diff('day', b.day, a.day)) * b.x) /
                      sum(power(0.8, date_diff('day', b.day, a.day))) AS DOUBLE), 4) AS ewma
         FROM daily a JOIN daily b
           ON a.event_type = b.event_type AND b.day <= a.day AND b.day + 20 > a.day
         GROUP BY 1, 2
         ORDER BY a.event_type, a.day""",

    "q_timeseries_ffill" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day,
                  CAST(count(*) AS BIGINT) AS n_critical
           FROM events WHERE value > 250 GROUP BY 1, 2),
         bounds AS (
           SELECT min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1
           FROM events),
         spine AS (
           SELECT t.event_type, CAST(s.day AS DATE) AS day
           FROM (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
                 FROM bounds) s
           CROSS JOIN (SELECT DISTINCT event_type FROM events) t)
         SELECT s.event_type, s.day, d.n_critical,
                last_value(d.n_critical IGNORE NULLS) OVER (
                  PARTITION BY s.event_type ORDER BY s.day
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_filled
         FROM spine s LEFT JOIN daily d
           ON s.event_type = d.event_type AND s.day = d.day
         ORDER BY s.event_type, s.day""",

    "q_timeseries_acf" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS x
           FROM events GROUP BY 1, 2),
         pairs AS (
           SELECT a.event_type, l.lag, a.x, b.x AS y
           FROM daily a
           CROSS JOIN (VALUES (1), (2), (3)) l(lag)
           JOIN daily b
             ON b.event_type = a.event_type AND b.day + l.lag = a.day),
         sums AS (
           SELECT event_type, lag, CAST(count(*) AS BIGINT) AS n,
                  sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
                  sum(x * x) AS sxx, sum(y * y) AS syy
           FROM pairs GROUP BY 1, 2)
         SELECT event_type, CAST(lag AS INT) AS lag, n,
                round(CAST(n * sxy - sx * sy AS DOUBLE) /
                      sqrt(CAST(n * sxx - sx * sx AS DOUBLE) *
                           CAST(n * syy - sy * sy AS DOUBLE)), 4) AS acf
         FROM sums
         ORDER BY event_type, lag""",

    "q_timeseries_resample" ->
      """WITH w AS (
           SELECT event_type, CAST(date_trunc('week', ts) AS DATE) AS week, value,
                  first_value(value) OVER (PARTITION BY event_type, date_trunc('week', ts)
                    ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS o,
                  last_value(value) OVER (PARTITION BY event_type, date_trunc('week', ts)
                    ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS c
           FROM events)
         SELECT event_type, week, CAST(count(*) AS BIGINT) AS n,
                round(CAST(min(o) AS DOUBLE), 4) AS open,
                round(CAST(max(value) AS DOUBLE), 4) AS high,
                round(CAST(min(value) AS DOUBLE), 4) AS low,
                round(CAST(min(c) AS DOUBLE), 4) AS close
         FROM w GROUP BY 1, 2
         ORDER BY event_type, week"""
  )
}
