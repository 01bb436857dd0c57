package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.catalog.Tables

/** Layout operators: bucketed co-located joins must elide the shuffle;
  * salted joins must be result-identical to plain joins. */
class LayoutSpec extends SparkSpec {

  test("bucketed join: no Exchange on either side (co-located sort-merge)") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Layout.writeBucketed(
        Tables.orders(spark, sf()).select("o_orderkey", "o_totalprice"),
        "orders_b", "o_orderkey", 4)
      Layout.writeBucketed(
        Tables.lineitem(spark, sf()).select("l_orderkey", "l_quantity"),
        "lineitem_b", "l_orderkey", 4)
      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected sort-merge join:\n$plan")
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      // and it computes the right thing
      assert(joined.count() ===
        Tables.lineitem(spark, sf()).join(Tables.orders(spark, sf()),
          col("l_orderkey") === col("o_orderkey")).count())
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("salted join ≡ plain join (skewed fact against unique dim)") {
    val li = Tables.lineitem(spark, sf()).select("l_orderkey", "l_linenumber", "l_quantity")
    val ord = Tables.orders(spark, sf())
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    val plain = li.join(ord, "l_orderkey")
    val salted = Layout.saltedJoin(li, ord, "l_orderkey", salt = 8,
      saltExpr = abs(hash(col("l_linenumber"), col("l_quantity"))))
    assert(salted.count() === plain.count())
    assert(salted.select("l_orderkey", "l_linenumber", "l_quantity", "o_totalprice")
      .except(plain.select("l_orderkey", "l_linenumber", "l_quantity", "o_totalprice"))
      .count() === 0)
  }

  test("replicate tags every copy: count multiplies by salt") {
    val r = Layout.replicate(Tables.region(spark, sf()), 3)
    assert(r.count() === 15)
    assert(r.groupBy("__salt").count().count() === 3)
  }

  test("salted join ≡ plain join under heavy key skew (90% one key)") {
    import spark.implicits._
    // 10k rows, 90% sharing key 1 — the pathological-height scenario
    val skewed = spark.range(10000)
      .select(
        when(col("id") % 10 =!= 0, 1L).otherwise(col("id")).as("k"),
        col("id").as("payload"))
    val dim = spark.range(5000).select(col("id").as("k"), (col("id") * 2).as("v"))
    val plain = skewed.join(dim, "k")
    val salted = Layout.saltedJoin(skewed, dim, "k", salt = 16,
      saltExpr = abs(hash(col("payload"))))
    assert(salted.count() === plain.count())
    assert(salted.select("k", "payload", "v").except(plain.select("k", "payload", "v")).count() === 0)
  }
}
