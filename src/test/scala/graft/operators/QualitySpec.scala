package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.catalog.Tables

/** Data-quality operators: UNIQUE/FK/NOT NULL/schema checks + observed
  * metrics (reference A15/A16 + README.md:42 semantics). */
class QualitySpec extends SparkSpec {

  test("checkUnique: clean key passes, duplicate-injected key fails") {
    val o = Tables.orders(spark, sf())
    assert(Quality.checkUnique(o, Seq("o_orderkey")).count() === 0)
    val dup = o.unionAll(o.limit(5))
    val viol = Quality.checkUnique(dup, Seq("o_orderkey"))
    assert(viol.count() === 5)
    assert(viol.agg(max(col("n_rows"))).collect().head.getLong(0) === 2L)
  }

  test("checkFk: lineitem→orders holds; a truncated parent set yields orphans") {
    val li = Tables.lineitem(spark, sf())
    val o = Tables.orders(spark, sf())
    assert(Quality.checkFk(li, o, Seq("l_orderkey"), Seq("o_orderkey")).count() === 0)
    val truncated = o.filter(col("o_orderkey") < 100)
    val orphans = Quality.checkFk(li, truncated, Seq("l_orderkey"), Seq("o_orderkey"))
    assert(orphans.count() > 0)
    assert(orphans.filter(col("l_orderkey") < 100).count() === 0)
  }

  test("checkFk: null-keyed child rows satisfy the constraint (MATCH SIMPLE)") {
    import spark.implicits._
    val child = Seq((Some(1L), "a"), (None, "b"), (Some(99L), "c"))
      .toDF("fk", "payload")
    val parent = Seq(1L).toDF("pk")
    val orphans = Quality.checkFk(child, parent, Seq("fk"), Seq("pk"))
    // only the non-null missing key is an orphan; the null-FK row passes
    assert(orphans.collect().map(_.getAs[String]("payload")).toSeq === Seq("c"))
  }

  test("checkNotNull: counts nulls per required column") {
    import spark.implicits._
    val df = Seq((1L, Some("a")), (2L, None), (3L, None))
      .toDF("id", "v")
    val r = Quality.checkNotNull(df, Seq("id", "v")).collect().head
    assert(r.getAs[Long]("id_nulls") === 0L)
    assert(r.getAs[Long]("v_nulls") === 2L)
  }

  test("expectSchema: conforming table is clean; drift is itemized") {
    val o = Tables.orders(spark, sf())
    val expected = StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_custkey", LongType),
      StructField("o_orderstatus", StringType),
      StructField("o_totalprice", DoubleType),
      StructField("o_orderdate", TimestampNTZType), // parquet isAdjustedToUTC=false
      StructField("o_orderpriority", StringType)))
    assert(Quality.expectSchema(o, expected).isEmpty)
    val drifted = StructType(expected.fields.toSeq.map {
      case f if f.name == "o_totalprice" => f.copy(dataType = StringType)
      case f => f
    } :+ StructField("o_missing", IntegerType))
    val diffs = Quality.expectSchema(o, drifted)
    assert(diffs.exists(_.contains("type mismatch: o_totalprice")))
    assert(diffs.exists(_.contains("missing column: o_missing")))
  }

  test("observed: metrics ride along with the action, no second scan") {
    val li = Tables.lineitem(spark, sf())
    val (df, obs) = Quality.observed(li, "li_metrics", Seq("l_quantity"))
    val n = df.count()
    val metrics = obs.get
    assert(metrics("n_rows") === n)
    assert(metrics("l_quantity_nulls") === 0L)
  }

  test("checkRules: one scan, every rule a column — counts match per-rule filters") {
    val o = Tables.orders(spark, sf())
    val rules = Seq(
      "neg_price" -> (org.apache.spark.sql.functions.col("o_totalprice") < 0),
      "big_price" -> (org.apache.spark.sql.functions.col("o_totalprice") > 100000))
    val report = Quality.checkRules(o, rules)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val n = o.count()
    val big = o.filter(org.apache.spark.sql.functions.col("o_totalprice") > 100000).count()
    assert(report("neg_price") === (n, 0L))
    assert(report("big_price") === (n, big))
    assert(big > 0, "fixture should have expensive orders")
    // one scan: the aggregate plan reads orders exactly once
    val p = Quality.checkRules(o, rules).queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(p).size === 1,
      s"rule suite must evaluate in one scan:\n$p")
  }

  test("q_dq_checks: firing rules fire, passing rules pass") {
    val report = graft.SparkEntry.queries("q_dq_checks")(spark, sf())
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(report("orders_totalprice_nonneg") === 0L)
    assert(report("orders_custkey_fk") === 0L)
    assert(report("events_event_id_unique") === 0L)
    assert(report("lineitem_discount_policy") > 0L, "policy rule should fire on fixtures")
    assert(report("lineitem_ship_not_before_order") > 0L, "temporal rule should fire")
  }
}
