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

  test("graft_minhash_sh3 ≡ graft_minhash ∘ shingles3 on the corpus, every seed") {
    // the fused rolling-3-gram kernel must match the composed form the
    // DuckDB oracle mirrors — including docs with < 3 tokens (null
    // components) and duplicate shingles (min over multiset = min over set)
    val docs = Tables.documents(spark, sf())
    val composed = graft.operators.Dedup
      .minhashSignatures(docs, graft.operators.Dedup.shingles3)
    val fused = graft.operators.Dedup.shingleSignatures(docs)
    val joined = composed.alias("c").join(fused.alias("f"), "doc_id")
    val mismatched = joined.filter(
      (0 until 8).map(i => !(col(s"c.m$i") <=> col(s"f.m$i"))).reduce(_ || _))
    assert(mismatched.count() === 0, "fused shingle kernel diverged from composed form")
    assert(composed.count() === fused.count())
  }

  test("graft_minhash_sh3: short docs null out; 3 tokens = one shingle = its md5") {
    import spark.implicits._
    val df = Seq(
      (1L, "only two"),
      (2L, "exactly three tokens"),
      (3L, "")).toDF("doc_id", "text")
      .select(col("doc_id"),
        call_function("graft_minhash_sh3", split(col("text"), " "), lit(2)).as("sig"))
    val rows = df.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(rows(1L) === Seq(null, null), "< 3 tokens must produce null components")
    assert(rows(3L) === Seq(null, null), "empty text must produce null components")
    val expect = Seq("exactly three tokens_s0", "exactly three tokens_s1").map { s =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    assert(rows(2L) === expect)
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
