package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Laws for the shared distributed total-order primitives: both must be
  * EXACTLY the single-global-window ground truth on any input, under any
  * incoming partitioning — including the adversarial shapes the
  * decomposition exists for (all rows equal under the sort prefix, one
  * row per partition, everything in one partition). The four operator
  * call sites (Pack, budgetSelect, the quantile-rollup anchor, the
  * NN-descent seed) inherit these guarantees from one implementation. */
class SlicesSpec extends SparkSpec {

  import org.apache.spark.sql.DataFrame

  /** Deterministic pseudo-random rows (id, k, v): k is a low-cardinality
    * skewed sort key (heavy value 7), v a positive weight. */
  private def rows(n: Int, parts: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map { i =>
      val k = if (i % 3 == 0) 7L else (i * 2654435761L % 11).abs
      (i.toLong, k, (i * 1315423911L % 17).abs + 1)
    }.toDF("id", "k", "v").repartition(parts)
  }

  private def groundCumsum(df: DataFrame): Map[Long, Long] = {
    val w = Window.orderBy(col("k").desc, col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cum", sum(col("v")).over(w))
      .select(col("id"), col("cum")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("globalCumsum == single-window ground truth (skewed key, several partitionings)") {
    for (parts <- Seq(1, 3, 16)) {
      val df = rows(500, parts)
      val got = Slices.globalCumsum(df,
          Seq(col("k").desc, col("id")), col("v"), "cum")
        .select(col("id"), col("cum")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === groundCumsum(df), s"diverged at parts=$parts")
    }
  }

  test("globalCumsum: ALL rows one sort-key value (the budget_skew shape) stays exact") {
    import spark.implicits._
    val df = (0 until 2000).map(i => (i.toLong, 1L, 3L)).toDF("id", "k", "v")
      .repartition(8)
    val got = Slices.globalCumsum(df, Seq(col("k").desc, col("id")), col("v"), "cum")
      .select(col("id"), col("cum")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0 until 2000).foreach { i =>
      assert(got(i.toLong) === 3L * (i + 1), s"row $i")
    }
  }

  test("globalCumsum materializes derived value expressions once (expression value arg)") {
    import spark.implicits._
    val df = (0 until 100).map(i => (i.toLong, s"w$i word" * (i % 4 + 1)))
      .toDF("id", "text")
    // value is an EXPRESSION over a column that survives into the output
    val got = Slices.globalCumsum(df, Seq(col("id")),
        size(split(col("text"), " ")).cast("long"), "cum")
      .orderBy(col("id")).select(col("cum")).collect().map(_.getLong(0))
    val expect = (0 until 100).map(i => s"w$i word" * (i % 4 + 1))
      .map(_.split(" ").length.toLong).scanLeft(0L)(_ + _).tail
    assert(got.toSeq === expect)
  }

  test("output schema contract: exactly input columns + the named column") {
    val df = rows(50, 3)
    assert(Slices.globalOrdinal(df, Seq(col("id")), "p").columns.toSet ===
      (df.columns.toSet + "p"), "globalOrdinal leaked internal columns")
    assert(Slices.globalCumsum(df, Seq(col("id")), col("v"), "c").columns.toSet ===
      (df.columns.toSet + "c"), "globalCumsum leaked internal columns")
  }

  test("globalOrdinal is a permutation of 0..n-1 consistent with the sort") {
    val df = rows(700, 5)
    val got = Slices.globalOrdinal(df, Seq(col("k"), col("id")), "p")
      .select(col("k"), col("id"), col("p")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._3).sorted.toSeq === (0L until 700L),
      "positions must be a permutation of 0..n-1")
    // position order must agree with (k, id) order
    assert(got.sortBy(_._3).map(t => (t._1, t._2)).toSeq ===
      got.map(t => (t._1, t._2)).sortBy(identity).toSeq)
  }

  test("globalOrdinal: value-at-position is stable under ties in the sort key") {
    import spark.implicits._
    // many duplicate sort values: positions among equals are arbitrary,
    // but the VALUE at each position is deterministic
    val df = (0 until 300).map(i => (i.toLong, (i % 5).toLong)).toDF("id", "v")
    def valueAt(parts: Int): Seq[Long] =
      Slices.globalOrdinal(df.repartition(parts), Seq(col("v")), "p")
        .orderBy(col("p")).select(col("v")).collect().map(_.getLong(0)).toSeq
    assert(valueAt(2) === valueAt(13),
      "value-at-position must not depend on the incoming partitioning")
  }
}
