package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.catalog.Tables

/** End-to-end curation: quality gate, near-dedup keeps cluster
  * representatives, features joined, splits reproducible and exhaustive. */
class TrainingDataSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf()).cache()
  private lazy val embs = Tables.embeddings(spark, sf()).cache()

  test("curate: full pipeline output shape and invariants") {
    val cfg = TrainingData.Config(minQuality = 0.2, dedupJaccard = 0.8)
    val out = TrainingData.curate(docs, embs, cfg).cache()
    val n = out.count()
    assert(n > 0 && n <= docs.count())
    // quality gate held
    assert(out.filter(col("quality") < 0.2).count() === 0)
    // split exhaustive + deterministic re-run
    assert(out.filter(!col("split").isin("train", "val", "test")).count() === 0)
    val again = TrainingData.curate(docs, embs, cfg)
    assert(out.select("doc_id", "split").except(again.select("doc_id", "split")).count() === 0)
    // doc_id unique after dedup
    assert(out.groupBy("doc_id").count().filter(col("count") > 1).count() === 0)
  }

  test("dropNearDups: injected exact duplicate is removed, original kept") {
    val dup = docs.limit(1).select((col("doc_id") + 1000000L).as("doc_id"),
      col("text"), col("lang"), col("source"), col("n_chars"))
    val withDup = docs.unionByName(dup)
    val cleaned = TrainingData.dropNearDups(withDup, 0.95)
    // the high-id copy lost to the original
    assert(cleaned.filter(col("doc_id") >= 1000000L).count() === 0)
    assert(cleaned.count() <= docs.count())
  }

  test("withQuality: degenerate documents score 0, never a perfect 1.0") {
    import spark.implicits._
    val weird = Seq((1L, ""), (2L, "word"), (3L, "two words"),
      (4L, "a real document with several distinct tokens")).toDF("doc_id", "text")
    val q = TrainingData.withQuality(weird).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("quality")).toMap
    assert(q(1L) === 0.0 && q(2L) === 0.0 && q(3L) === 0.0)
    assert(q(4L) > 0.5)
  }

  test("dropNearDups: transitive chain keeps ONLY the cluster minimum") {
    import spark.implicits._
    // a–b and b–c are near-dups, a–c share less: pair-local dropping would
    // keep both a and c; component semantics keep only a.
    val base = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (10L, base + " one two three four"), // a
      (20L, base + " one two three five"), // b: near a and c
      (30L, base + " one two six five") // c: near b, farther from a
    ).toDF("doc_id", "text")
    val cleaned = TrainingData.dropNearDups(docs, 0.6)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(cleaned === Set(10L), s"expected only cluster-min 10, got $cleaned")
  }

  test("curate with benchmark: contaminated docs drop, clean docs survive") {
    import spark.implicits._
    // a benchmark doc whose text is a verbatim slice of one corpus doc
    val leakedFrom = docs.orderBy(col("doc_id")).limit(1).collect().head
    val leakedId = leakedFrom.getAs[Long]("doc_id")
    val bench = Seq((900000L, leakedFrom.getAs[String]("text")))
      .toDF("doc_id", "text")
    val cfg = TrainingData.Config(minQuality = 0.0, dedupJaccard = 1.1) // isolate the stage
    val out = TrainingData.curate(docs, embs, cfg, benchmark = Some(bench),
      minSharedShingles = 3)
    assert(out.filter(col("doc_id") === leakedId).count() === 0)
    assert(out.count() > 0)
  }

  test("withSplit: ~80/10/10 proportions at corpus scale") {
    val split = TrainingData.withSplit(docs, TrainingData.Config())
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = split.values.sum.toDouble
    assert(split("train") / total > 0.7 && split("train") / total < 0.9)
    assert(split.getOrElse("val", 0L) / total < 0.2)
    assert(split.getOrElse("test", 0L) / total < 0.2)
  }
}
