package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.catalog.Tables

/** Bit-parity of the one-pass graft_minhash kernel against the composable
  * HOF reference (the algebra the DuckDB oracle mirrors). */
class HashExprsSpec extends SparkSpec {

  test("graft_minhash ≡ array_min(transform(md5)) reference on the corpus, every seed") {
    val docs = Tables.documents(spark, sf())
    def toks = array_distinct(split(col("text"), " "))
    // the ONE reference definition — Dedup.minhashReference, not a copy
    def ref(seed: Int) = graft.operators.Dedup.minhashReference(toks, seed)
    val both = docs.select(
      col("doc_id") +:
        ((0 until 8).map(i => element_at(
          call_function("graft_minhash", toks, lit(8)), i + 1).as(s"k$i")) ++
          (0 until 8).map(i => ref(i).as(s"r$i"))): _*)
    val mismatched = both.filter(
      (0 until 8).map(i => !(col(s"k$i") <=> col(s"r$i"))).reduce(_ || _))
    assert(mismatched.count() === 0, "kernel diverged from the HOF reference")
  }

  test("signature kernel evaluates ONCE per row — projection not collapsed") {
    // the m0..m7 columns each reference the sig array; if CollapseProject
    // ever inlined the non-cheap kernel call into all eight, the one-pass
    // win silently became an eight-pass loss (still correct, 8× slower)
    val plan = graft.operators.Dedup
      .minhashSignatures(Tables.documents(spark, sf()))
      .queryExecution.optimizedPlan.toString
    val n = "graft_minhash".r.findAllIn(plan).size
    assert(n === 1, s"expected one kernel call in the optimized plan, got $n:\n$plan")
  }

  test("empty / all-null token sets yield null components; singleton matches md5") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq.empty[String]),
      (2L, Seq[String](null)),
      (3L, Seq("a"))).toDF("id", "toks")
      .select(col("id"), call_function("graft_minhash", col("toks"), lit(2)).as("sig"))
    val rows = df.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(rows(1L) === Seq(null, null), "empty set must produce null components")
    assert(rows(2L) === Seq(null, null), "all-null set must produce null components")
    val expect = Seq("a_s0", "a_s1").map { s =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    assert(rows(3L) === expect)
  }
}
