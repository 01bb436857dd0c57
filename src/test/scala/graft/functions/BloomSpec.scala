package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.catalog.Tables
import graft.operators.Bloom

/** Bloom-prefiltered semi join: exactness (no-false-negative law), real
  * pruning on a selective dim, and the codegen path of the custom
  * expression. */
class BloomSpec extends SparkSpec {

  test("bloom semiJoin ≡ plain semi join (false positives removed exactly)") {
    val li = Tables.lineitem(spark, sf())
    val dim = Tables.orders(spark, sf())
      .filter(col("o_orderpriority") === "1-URGENT").select(col("o_orderkey"))
    val viaBloom = Bloom.semiJoin(li, dim, "l_orderkey", "o_orderkey")
      .select(col("l_orderkey"), col("l_linenumber"))
    val plain = li.join(dim, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .select(col("l_orderkey"), col("l_linenumber"))
    assert(viaBloom.exceptAll(plain).isEmpty && plain.exceptAll(viaBloom).isEmpty)
  }

  test("bloom never rejects a true member; prefilter actually prunes") {
    val li = Tables.lineitem(spark, sf())
    val dim = Tables.orders(spark, sf())
      .filter(col("o_orderpriority") === "1-URGENT").select(col("o_orderkey"))
    val bytes = Bloom.buildBloom(dim, "o_orderkey", fpp = 0.01)
    val pruned = li.filter(Bloom.mightContain(col("l_orderkey"), bytes))
    // no false negatives: every true match survives the prefilter
    val trueMatches = li.join(dim, col("l_orderkey") === col("o_orderkey"), "left_semi")
    assert(trueMatches.exceptAll(pruned.select(trueMatches.columns.map(col): _*))
      .isEmpty)
    // real pruning: a ~20%-selective dim must cut the fact side well below
    // half (1% fpp adds ≈1% of non-matches back)
    val (n, kept) = (li.count(), pruned.count())
    assert(kept < n / 2, s"bloom kept $kept of $n rows — not pruning")
  }

  test("graft_bloom_might_contain evaluates in whole-stage codegen") {
    val dim = Tables.orders(spark, sf())
      .filter(col("o_orderpriority") === "1-URGENT").select(col("o_orderkey"))
    val bytes = Bloom.buildBloom(dim, "o_orderkey")
    val df = Tables.lineitem(spark, sf())
      .filter(Bloom.mightContain(col("l_orderkey"), bytes))
      .select(col("l_orderkey"))
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" prefixes a whole-stage-codegen'd operator in plan toString:
    // the probe filter must carry it (no CodegenFallback), and it must sit
    // in the SCAN stage (directly over ColumnarToRow → FileScan), i.e. the
    // prune happens before any exchange.
    assert(raw"\*\(\d+\) Filter graft_bloom_might_contain".r.findFirstIn(plan).isDefined,
      s"bloom probe fell out of codegen or out of the scan stage:\n$plan")
    assert(!plan.contains("Exchange"), s"probe-only plan must not shuffle:\n$plan")
  }
}
