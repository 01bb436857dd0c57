package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.catalog.Tables

/** IntervalJoin: the bucket-decomposed overlap join must be pair-for-pair
  * identical to the naive theta join, across bucket widths (the attribution
  * predicate's exactly-once guarantee is width-independent), including the
  * edge shapes — touching endpoints, containment, multi-bucket spans. */
class IntervalJoinSpec extends SparkSpec {

  private def intervals(p: String, rows: Seq[(Long, Long, Long)]) = {
    val s = spark
    import s.implicits._
    rows.toDF(s"${p}_id", "s_sec", "e_sec").select(
      col(s"${p}_id"),
      timestamp_seconds(col("s_sec")).as(s"${p}_s"),
      timestamp_seconds(col("e_sec")).as(s"${p}_e"))
  }

  private def naive(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame) =
    a.crossJoin(b)
      .filter(col("a_s") <= col("b_e") && col("b_s") <= col("a_e"))
      .select(col("a_id"), col("b_id"))

  test("bucket overlap join ≡ naive theta join on edge shapes, any bucket width") {
    // touching endpoints (1), containment (2⊃20), multi-bucket span (3),
    // disjoint (4), zero-length instant (5)
    val a = intervals("a", Seq(
      (1L, 100L, 200L), (2L, 0L, 10000L), (3L, 500L, 5000L),
      (4L, 20000L, 20010L), (5L, 300L, 300L)))
    val b = intervals("b", Seq(
      (10L, 200L, 250L), (20L, 1000L, 1500L), (30L, 4999L, 30000L),
      (40L, 299L, 301L)))
    for (w <- Seq(60L, 600L, 7L)) {
      val got = IntervalJoin
        .overlap(a, b, "a_s", "a_e", "b_s", "b_e", bucketSeconds = w)
        .select(col("a_id"), col("b_id"))
      val want = naive(a, b)
      assert(got.exceptAll(want).count() === 0, s"false pairs at width $w")
      assert(want.exceptAll(got).count() === 0, s"missed pairs at width $w")
      assert(got.count() === got.distinct().count(), s"duplicate pairs at width $w")
    }
  }

  test("q_join_interval matches the naive form on real events") {
    val s = spark
    import s.implicits._
    val ev = Tables.events(s, sf())
    def iv(t: String, p: String) = ev.filter($"event_type" === t).select(
      $"event_id".as(s"${p}_id"), $"ts".as(s"${p}_s"),
      ($"ts" + expr("INTERVAL 10 MINUTES")).as(s"${p}_e"))
    val got = graft.SparkEntry.queries("q_join_interval")(s, sf())
      .select($"a_id", $"b_id")
    val want = naive(iv("error", "a"), iv("purchase", "b"))
    assert(got.exceptAll(want).count() === 0)
    assert(want.exceptAll(got).count() === 0)
  }
}
