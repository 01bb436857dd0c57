package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.catalog.Tables

/** The raw HLL estimate has no cross-engine SQL oracle (sketch internals
  * differ); q_agg_approx_distinct folds it into a ±5% tolerance predicate
  * the DuckDB oracle pins to TRUE, and this spec pins the raw estimate
  * values behind that predicate. */
class AggToleranceSpec extends SparkSpec {

  test("approx_count_distinct within 5% of exact per event_type") {
    val e = Tables.events(spark, sf())
    // rsd 0.01, matching the query: at the 0.05 default the 5% bound is
    // one sigma and fails routinely (observed at sf0.1)
    val approx = e.groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), 0.01).as("a"))
    val exact = e.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("x"))
    val joined = approx.join(exact, "event_type").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val a = r.getAs[Long]("a").toDouble
      val x = r.getAs[Long]("x").toDouble
      assert(math.abs(a - x) / x <= 0.05,
        s"${r.getAs[String]("event_type")}: approx $a vs exact $x")
    }
  }

  test("q_agg_percentiles portable algebra ≡ built-in percentile() (1e-9)") {
    val ours = graft.SparkEntry.queries("q_agg_percentiles")(spark, sf())
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val builtin = Tables.lineitem(spark, sf())
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, array(0.25, 0.5, 0.75))").as("qs"))
      .collect().flatMap { r =>
        r.getSeq[Double](1).zip(Seq(0.25, 0.5, 0.75)).map { case (q, p) =>
          (r.getString(0), p) -> q
        }
      }.toMap
    assert(ours.keySet === builtin.keySet)
    ours.foreach { case (k, v) =>
      assert(math.abs(v - builtin(k)) <= 1e-9 * math.max(1.0, math.abs(v)),
        s"$k: portable $v vs builtin ${builtin(k)}")
    }
  }

  test("percentile_approx within 5% of exact percentile on order totals") {
    val o = Tables.orders(spark, sf())
    val r = o.agg(
      expr("percentile_approx(o_totalprice, 0.5)").as("approx"),
      expr("percentile(o_totalprice, 0.5)").as("exact")).collect().head
    val a = r.getAs[Double]("approx"); val x = r.getAs[Double]("exact")
    assert(math.abs(a - x) / x <= 0.05, s"approx $a vs exact $x")
  }

  test("q_agg_sketch_rollup: merged daily sketches land well inside the 5% bound") {
    // union of per-day HLL sketches vs exact distinct — lgConfigK 14 gives
    // rsd ~0.4%; pin the estimate inside 2% (the query's bound is 5%)
    val rows = graft.SparkEntry.queries("q_agg_sketch_rollup")(spark, sf())
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getBoolean(4)), "approx_ok must hold for every type")
    val est = Tables.events(spark, sf())
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id"), lit(14)).as("sk"))
      .groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false))).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    rows.foreach { r =>
      val exact = r.getLong(3).toDouble
      val e = est(r.getString(0))
      assert(math.abs(e - exact) / exact <= 0.02,
        s"${r.getString(0)}: merged estimate $e vs exact $exact past 2%")
    }
  }

  test("q_agg_approx_quantile: tolerance predicate true with margin, not borderline") {
    // the oracle pins approx_ok to TRUE at the query's 1% bound; this spec
    // pins the raw sketch estimate well inside it (0.2%), so SF growth or a
    // sketch re-tune shows up here long before the driver compare flips
    val rows = graft.SparkEntry.queries("q_agg_approx_quantile")(spark, sf())
      .collect()
    assert(rows.length === 3)
    assert(rows.forall(_.getBoolean(2)), "approx_ok must hold for every group")
    val approx = Tables.lineitem(spark, sf())
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile_approx(l_extendedprice, 0.5, 10000)").as("a"))
      .collect().map(r => r.getString(0) -> r.getAs[Double]("a")).toMap
    rows.foreach { r =>
      val exact = r.getDouble(1)
      val a = approx(r.getString(0))
      assert(math.abs(a - exact) / exact <= 0.002,
        s"${r.getString(0)}: sketch $a vs exact $exact drifted past 0.2%")
    }
  }
}
