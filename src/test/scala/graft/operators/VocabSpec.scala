package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** BPE vocabulary induction: deterministic merges, greedy-left application,
  * compression monotonicity, early stop. */
class VocabSpec extends SparkSpec {

  test("learnMerges: most frequent pair first, deterministic ties, early stop") {
    import spark.implicits._
    // "ab" dominates: appears in every word; then "abc" from (ab, c)
    val docs = Seq(
      (1L, "abc abc abd"),
      (2L, "abc abd ab"),
      (3L, "abc abc")).toDF("doc_id", "text")
    val merges = Vocab.learnMerges(docs, k = 10, minCount = 2)
    assert(merges.nonEmpty)
    assert(merges.head === ("a", "b")) // df("ab")=8 beats every other pair
    assert(merges.contains(("ab", "c"))) // df("abc")=5 next
    // early stop: merge count is bounded by pairs meeting minCount, not k
    assert(merges.size < 10)
    // determinism
    assert(Vocab.learnMerges(docs, k = 10, minCount = 2) === merges)
  }

  test("mergeOnce: greedy leftmost under overlaps") {
    import spark.implicits._
    val got = Seq("aaa").toDF("w")
      .select(Vocab.mergeOnce(Vocab.charUnits(col("w")), "a", "a").as("u"))
      .collect().head.getSeq[String](0)
    assert(got === Seq("aa", "a"))
  }

  test("tokenize: learned vocab compresses units, round-trip concat preserves text") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark spark table table"),
      (2L, "spark table scan scan"),
      (3L, "spark scan table spark")).toDF("doc_id", "text")
    val merges = Vocab.learnMerges(docs, k = 8, minCount = 2)
    val tok = Vocab.tokenize(docs, merges)
    val charCounts = docs.select(col("doc_id"),
      size(flatten(transform(
        filter(split(col("text"), " "), w => w =!= ""),
        w => Vocab.charUnits(w)))).as("nc"))
    val joined = tok.select(col("doc_id"), size(col("units")).as("nu"),
        concat_ws("", col("units")).as("flat"))
      .join(charCounts, "doc_id")
      .join(docs, "doc_id")
      .collect()
    joined.foreach { r =>
      // merges never add units; frequent words compress strictly
      assert(r.getAs[Int]("nu") <= r.getAs[Int]("nc"))
      // lossless: concatenated units == original text without spaces
      assert(r.getAs[String]("flat") === r.getAs[String]("text").replace(" ", ""))
    }
    // "spark" (df 5) must have become a single unit within 8 merges
    val sparkUnits = Seq((9L, "spark")).toDF("doc_id", "text")
    val one = Vocab.tokenize(sparkUnits, merges).collect().head.getSeq[String](1)
    assert(one === Seq("spark"))
  }
}
