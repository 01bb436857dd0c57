package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Laws for the MERGE INTO primitive: exact hand-case over all four
  * action classes, replay idempotence, and delete semantics. */
class MergeSpec extends SparkSpec {

  import org.apache.spark.sql.DataFrame

  private def target: DataFrame = {
    import spark.implicits._
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "v", "x")
  }

  private def source: DataFrame = {
    import spark.implicits._
    Seq(
      (2L, "B", 99.0, false),  // matched → update
      (3L, "c", 30.0, true),   // matched + delete → gone
      (4L, "d", 40.0, false),  // unmatched → insert
      (5L, "e", 50.0, true)    // unmatched delete → no-op
    ).toDF("k", "v", "x", "is_delete")
  }

  test("merge: update/insert/delete/keep classified exactly") {
    val out = Merge.merge(target, source, Seq("k")).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2), r.getString(3))))
      .toMap
    assert(out === Map(
      1L -> (("a", 10.0, "keep")),
      2L -> (("B", 99.0, "update")),
      4L -> (("d", 40.0, "insert"))))
  }

  test("merge: replaying the same source is a no-op (idempotence)") {
    val once = Merge.merge(target, source, Seq("k")).drop("_action")
    val twice = Merge.merge(once, source, Seq("k")).drop("_action")
    assert(twice.exceptAll(once).isEmpty && once.exceptAll(twice).isEmpty,
      "second application must not change the snapshot (deletes must not resurrect)")
  }

  test("merge: empty source returns the target unchanged, all 'keep'") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String, Double, Boolean)]
      .toDF("k", "v", "x", "is_delete")
    val out = Merge.merge(target, empty, Seq("k"))
    assert(out.filter(col("_action") =!= "keep").count() === 0)
    assert(out.drop("_action").exceptAll(target).isEmpty)
  }

  test("merge: requires the source to carry every target column") {
    import spark.implicits._
    val bad = Seq((1L, "z")).toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      Merge.merge(target, bad, Seq("k"))
    }
    assert(e.getMessage.contains("x"))
  }
}
