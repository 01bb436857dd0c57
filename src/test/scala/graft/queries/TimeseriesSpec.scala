package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.catalog.Tables

/** Semantics of the time-series family (q_sessionize_gap,
  * q_timeseries_ewma, q_timeseries_resample) + q_outlier_mad + the XML
  * round trip — invariants the DuckDB oracle can't see (partition-count
  * properties, window-input bounds, quarantine behavior). */
class TimeseriesSpec extends SparkSpec {

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf())

  test("sessionize: sessions partition the events exactly") {
    val total = Tables.events(spark, sf()).count()
    val sess = q("q_sessionize_gap").cache()
    assert(sess.agg(sum(col("n_events"))).head.getLong(0) === total)
    // session ids are 1..k contiguous per user
    val bad = sess.groupBy(col("user_id"))
      .agg(min(col("session_no")).as("lo"), max(col("session_no")).as("hi"),
        count(lit(1)).as("k"))
      .filter(col("lo") =!= 1L || col("hi") =!= col("k"))
    assert(bad.isEmpty, "session_no must be dense 1..k per user")
    sess.unpersist()
  }

  test("sessionize: consecutive sessions of a user are >= 30 min apart, events inside < 30 min") {
    // boundary is session_window's half-open semantics: a gap of exactly
    // 30:00.000000 SPLITS (so adjacent sessions are >= gap apart, and
    // within-session inter-event gaps are strictly < gap)
    val sess = q("q_sessionize_gap")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("session_no"))
    val gaps = sess
      .withColumn("prev_end", lag(col("end_us"), 1).over(w))
      .filter(col("prev_end").isNotNull)
      .filter(col("start_us") - col("prev_end") < 1800L * 1000000L)
    assert(gaps.isEmpty, "adjacent sessions must be separated by at least the gap")
  }

  test("ewma: first day equals the raw count; all values within window min/max") {
    val daily = Tables.events(spark, sf())
      .groupBy(col("event_type"), col("ts").cast("timestamp").cast("date").as("day"))
      .agg(count(lit(1)).cast("double").as("x"))
    val firstDay = daily.groupBy(col("event_type")).agg(min(col("day")).as("day"))
      .join(daily, Seq("event_type", "day"))
    val ew = q("q_timeseries_ewma")
    val head = ew.join(firstDay, Seq("event_type", "day"))
      .filter(abs(col("ewma") - col("x")) > 1e-9)
    assert(head.isEmpty, "EWMA with a single observation must equal it")
    // a weighted mean can't leave the [min, max] of its inputs
    val bounds = daily.groupBy(col("event_type"))
      .agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
    val out = ew.join(bounds, "event_type")
      .filter(col("ewma") < col("lo") - 1e-9 || col("ewma") > col("hi") + 1e-9)
    assert(out.isEmpty)
  }

  test("resample: bars partition events; high/low bound open/close") {
    val total = Tables.events(spark, sf()).count()
    val bars = q("q_timeseries_resample").cache()
    assert(bars.agg(sum(col("n"))).head.getLong(0) === total)
    val bad = bars.filter(
      col("open") > col("high") || col("open") < col("low") ||
      col("close") > col("high") || col("close") < col("low"))
    assert(bad.isEmpty)
    bars.unpersist()
  }

  test("outlier_mad: flags agree with a driver-side lower-median recomputation") {
    val e = Tables.events(spark, sf())
      .select(col("event_id"), col("event_type"), col("value")).collect()
    def lowerMedian(xs: Seq[Double]): Double = {
      val s = xs.sorted; s((s.size + 1) / 2 - 1)
    }
    val expect = e.groupBy(_.getString(1)).toSeq.flatMap { case (_, rows) =>
      val vals = rows.map(_.getDouble(2)).toSeq
      val med = lowerMedian(vals)
      val mad = lowerMedian(vals.map(v => math.abs(v - med)))
      rows.filter(r => math.abs(0.6745 * (r.getDouble(2) - med) / mad) > 3.5)
        .map(_.getLong(0)).toSeq
    }.toSet
    val got = q("q_outlier_mad").select(col("event_id"))
      .collect().map(_.getLong(0)).toSet
    assert(got === expect)
    assert(got.nonEmpty, "fixture should contain robust outliers")
  }

  test("sessionize batch ≡ session_window streaming operator (independent implementations)") {
    // q_sessionize_gap (lag + running sum) and q_stream_session
    // (session_window) implement the SAME 30-min-gap semantics through
    // disjoint code paths — their session inventories must agree exactly.
    val batch = q("q_sessionize_gap")
      .select(col("user_id"), col("start_us"), col("end_us"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val sw = graft.SparkEntry.queries("q_stream_session")(spark, sf())
      .select(col("user_id"),
        unix_micros(col("first_ts").cast("timestamp")),
        unix_micros(col("last_ts").cast("timestamp")), col("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(batch === sw)
  }

  test("anomaly: integer verdict ⇔ float |x−μ|>2s on a driver-side replay; all flagged, only flagged") {
    val daily = Tables.events(spark, sf())
      .groupBy(col("event_type"), col("ts").cast("timestamp").cast("date").as("day"))
      .agg(count(lit(1)).as("x"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    val flagged = q("q_timeseries_anomaly").collect()
      .map(r => (r.getString(0), r.getDate(1).toString)).toSet
    assert(flagged.nonEmpty, "fixture must contain anomalies")
    // expected set from the exact integer predicate (same algebra, so the
    // set compare can't flake on a boundary); the float formula is then
    // cross-checked on every NON-boundary day — asserting the
    // cross-multiplication really is |x−μ| > 2s, without letting an
    // exact-equality day (where sqrt rounding could disagree with the
    // engine's strict integer >) poison the comparison
    var boundary = 0
    val expected = daily.groupBy(_._1).toSeq.flatMap { case (t, rows) =>
      val xs = rows.sortBy(_._2).map(x => (x._2, x._3))
      xs.zipWithIndex.drop(7).flatMap { case ((day, x), i) =>
        val base = xs.slice(i - 7, i).map(_._2)
        val n = base.length.toLong
        val sx = base.sum
        val sxx = base.map(v => v * v).sum
        val lhs = (n * x - sx) * (n * x - sx) * (n - 1)
        val rhs = 4 * n * (n * sxx - sx * sx)
        if (lhs != rhs) {
          val mu = sx.toDouble / n
          val s2 = (n * sxx - sx * sx).toDouble / (n * (n - 1))
          assert((math.abs(x - mu) > 2 * math.sqrt(s2)) === (lhs > rhs),
            s"integer and float verdicts disagree off-boundary at ($t, $day)")
        } else boundary += 1
        if (lhs > rhs) Some((t, day)) else None
      }
    }.toSet
    assert(flagged === expected,
      s"flag set mismatch: only-engine=${(flagged -- expected).take(3)} only-replay=${(expected -- flagged).take(3)}")
  }

  test("ffill: gaps exist, filled value equals most recent observation, leading nulls stay") {
    val r = q("q_timeseries_ffill").collect()
    assert(r.exists(x => x.isNullAt(2)), "fixture must have gap cells")
    assert(r.exists(x => x.isNullAt(2) && !x.isNullAt(3)), "some gap must be filled")
    // replay LOCF row by row per type and compare
    r.groupBy(_.getString(0)).foreach { case (_, rows) =>
      var lastSeen: Option[Long] = None
      rows.sortBy(_.getDate(1).toString).foreach { row =>
        if (!row.isNullAt(2)) lastSeen = Some(row.getLong(2))
        val filled = if (row.isNullAt(3)) None else Some(row.getLong(3))
        assert(filled === lastSeen, s"LOCF mismatch at $row")
      }
    }
  }

  test("xml round trip: clean rows = all rows, quarantine empty") {
    val p = Scans.exportedEvents(spark, sf(), "xml")
    val r = graft.sources.Sources.readXml(spark, p, Scans.eventExportSchema,
      rowTag = "event")
    assert(r.clean.count() === Tables.events(spark, sf()).count())
    assert(r.quarantine.isEmpty)
    r.release()
  }
}
