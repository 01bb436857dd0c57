package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The custom merge-based as-of operator: semantics (inclusive boundary,
  * left-outer, null keys/ts), equivalence to the composable join+max
  * formulation, and the declaratively-planned physical shape. */
class AsOfJoinSpec extends SparkSpec {

  test("as-of merge: latest-prior match, inclusive boundary, left outer, nulls") {
    import spark.implicits._
    val probes = Seq(
      (1L, "u1", 100L), // after two signups → latest (90)
      (2L, "u1", 50L),  // after one signup (40)
      (3L, "u1", 40L),  // exactly AT a signup ts → inclusive match (40)
      (4L, "u2", 10L),  // before u2's only signup → no match
      (5L, "u3", 99L),  // user with no signups at all → no match
      (6L, null, 50L),  // null key → never matches
      (7L, "u1", -5L))  // before every signup → no match
      .toDF("event_id", "user_id", "ts")
    val builds = Seq(
      ("u1", 40L, "a"), ("u1", 90L, "b"), ("u2", 20L, "c"),
      (null, 1L, "x")) // null build key joins nothing
      .toDF("s_user", "s_ts", "tag")
    val got = AsOf.join(probes, builds, "user_id", "s_user", "ts", "s_ts")
      .select($"event_id", $"s_ts", $"tag")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getLong(1),
        r.getString(2))).toSet
    assert(got === Set(
      (1L, 90L, "b"), (2L, 40L, "a"), (3L, 40L, "a"),
      (4L, null, null), (5L, null, null), (6L, null, null), (7L, null, null)))
  }

  test("as-of merge ≡ composable join+max on pseudo-random multi-partition data") {
    import spark.implicits._
    // deterministic pseudo-random ts from md5 — no Random, replayable
    def hts(c: org.apache.spark.sql.Column, salt: String) =
      expr(s"CAST(conv(substring(md5(concat(CAST(${c.toString} AS STRING), '$salt')), 1, 6), 16, 10) AS BIGINT) % 10000")
    val probes = spark.range(0, 500, 1, 7)
      .select($"id".as("event_id"), ($"id" % 37).as("k"), hts($"id", "p").as("ts"))
    val builds = spark.range(0, 300, 1, 5)
      .select(($"id" % 41).as("bk"), hts($"id", "b").as("bts"))
    val merged = AsOf.join(probes, builds, "k", "bk", "ts", "bts")
      .select($"event_id", $"bts".as("m"))
    val composed = probes.join(builds, $"k" === $"bk" && $"bts" <= $"ts", "left")
      .groupBy($"event_id").agg(max($"bts").as("m"))
    val diff = merged.join(composed, Seq("event_id"))
      .filter(!(merged("m") <=> composed("m")))
    assert(diff.count() === 0)
    assert(merged.count() === 500) // every probe row survives
  }

  test("construction guards: shared lineage and mismatched types fail fast") {
    import spark.implicits._
    val ev = Seq((1L, "u", 10L, "purchase"), (2L, "u", 5L, "signup"))
      .toDF("event_id", "user_id", "ts", "event_type")
    // both sides from the same frame WITHOUT aliasing → same exprIds →
    // right columns would silently mirror the left; must throw instead
    val unaliased = intercept[IllegalArgumentException] {
      AsOf.join(
        ev.filter($"event_type" === "purchase").select($"event_id", $"user_id", $"ts"),
        ev.filter($"event_type" === "signup").select($"user_id", $"ts"),
        "user_id", "user_id", "ts", "ts")
    }
    assert(unaliased.getMessage.contains("share lineage"))
    // mismatched ts types → no implicit coercion exists; fail at build
    val probes = Seq((1L, "u", 10L)).toDF("event_id", "k", "ts")
    val builds = Seq(("u", 5)).toDF("bk", "bts") // Int, not Long
    val mismatched = intercept[IllegalArgumentException] {
      AsOf.join(probes, builds, "k", "bk", "ts", "bts")
    }
    assert(mismatched.getMessage.contains("ts types differ"))
  }

  test("physical plan: AsOfJoinExec with planned exchanges+sorts, no window, no fan-out join") {
    import spark.implicits._
    val probes = Seq((1L, "u", 1L)).toDF("event_id", "user_id", "ts")
    val builds = Seq(("u", 1L)).toDF("s_user", "s_ts")
    val df = AsOf.join(probes, builds, "user_id", "s_user", "ts", "s_ts")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"custom operator missing in:\n$plan")
    assert(!plan.contains("Window"), "merge as-of must not plan a window")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      "merge as-of must not plan a generic join")
    // Catalyst planned the merge preconditions declaratively
    assert(plan.contains("Sort"), "expected planner-inserted sorts")
  }
}
