package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Misra–Gries heavy-hitters contract: the candidate superset guarantee on
  * adversarial skewed data, the bounded candidate cardinality, and
  * exactness of the final top-m when the margin holds. */
class FreqSpec extends SparkSpec {

  /** Zipf-ish skew: item i contributes ~N/i copies, interleaved (round-
    * robin by rank) so heavy items are NOT clustered in one partition —
    * the layout that stresses per-partition summaries hardest. */
  private def zipfItems(n: Int, distinct: Int) = {
    // row r maps to item (r mod H) where H grows with r: early items
    // recur throughout the stream, tail items appear once (`div` = integer
    // division; Column./ would be double)
    spark.range(n.toLong)
      .select(expr(s"concat('w', id % (id div $distinct + 1))").as("item"))
      .repartition(7)
  }

  test("candidates are a superset of every item with freq > n/k") {
    val items = zipfItems(20000, 400).cache()
    val n = items.count()
    val k = 50
    val heavy = items.groupBy(col("item")).agg(count(lit(1)).as("c"))
      .filter(col("c") > n / k)
      .collect().map(_.getString(0)).toSet
    assert(heavy.nonEmpty, "fixture must contain heavy items")
    val cand = Freq.candidates(items, k).collect().map(_.getString(0)).toSet
    assert(heavy.subsetOf(cand),
      s"missing heavy items: ${heavy -- cand}")
    items.unpersist()
  }

  test("candidate cardinality is bounded by partitions x k") {
    val items = zipfItems(20000, 400)
    val k = 20
    val parts = items.rdd.getNumPartitions
    val c = Freq.candidates(items, k).count()
    assert(c <= parts.toLong * k, s"$c candidates > $parts x $k")
  }

  test("heavyHitters equals the exact top-m when the m-th count clears n/k") {
    val items = zipfItems(20000, 400).cache()
    val exact = items.groupBy(col("item")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("item")).limit(5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val mg = Freq.heavyHitters(items, m = 5, k = 50)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(mg === exact)
    items.unpersist()
  }

  test("CMS: estimates overestimate-only, exact when collision-free (adversarial Zipf)") {
    val items = zipfItems(20000, 400).cache()
    val d = 4; val w = 64 // narrow grid so collisions actually occur
    val sketch = Freq.cmsSketch(items, d, w).cache()
    val truth = items.groupBy(col("item")).agg(count(lit(1)).as("n"))
    val est = Freq.cmsEstimate(sketch, truth.select(col("item")), d, w)
    val joined = truth.join(est, "item").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(joined.nonEmpty)
    // the CMS contract: never underestimates
    val under = joined.filter { case (_, n, e) => e < n }
    assert(under.isEmpty, s"CMS underestimated: ${under.take(5).toSeq}")
    // and the grid is genuinely bounded
    assert(sketch.count() <= d.toLong * w)
    // total mass conservation per row j: cells of each row sum to |items|
    val n = items.count()
    val rows = sketch.groupBy(col("j")).agg(sum(col("c")).as("s")).collect()
    assert(rows.length === d && rows.forall(_.getLong(1) == n))
    items.unpersist(); sketch.unpersist()
  }

  test("CMS: never-seen terms estimate 0 (empty cells are zero, not absent)") {
    import spark.implicits._
    val items = Seq("a").toDF("item")
    val d = 4; val w = 65536 // wide grid: "zz" almost surely misses all of a's cells
    val sketch = Freq.cmsSketch(items, d, w)
    val est = Freq.cmsEstimate(sketch, Seq("zz").toDF("item"), d, w)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.get("zz").contains(0L),
      s"a term hashing to empty cells must estimate 0, got $est")
  }

  test("CMS: counts-based sketch equals the item-stream sketch exactly") {
    val items = zipfItems(20000, 400).cache()
    val d = 4; val w = 64
    val fromItems = Freq.cmsSketch(items, d, w).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val counts = items.groupBy(col("item")).agg(count(lit(1)).as("n"))
    val fromCounts = Freq.cmsSketchFromCounts(counts, d, w).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(fromItems === fromCounts)
    items.unpersist()
  }

  test("CMS merge law: sketch of a disjoint union = elementwise sum of shard sketches") {
    val all = zipfItems(20000, 400).cache()
    val a = all.limit(9000) // deterministic split of the generated frame
    // exceptAll is multiset subtraction, so b = all ⊎ -a exactly
    val b = all.exceptAll(a)
    val d = 4; val w = 64
    def grid(df: org.apache.spark.sql.DataFrame): Map[(Int, Int), Long] =
      Freq.cmsSketch(df, d, w).collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val ga = grid(a); val gb = grid(b); val gAll = grid(all)
    val merged = (ga.keySet ++ gb.keySet).map { k =>
      k -> (ga.getOrElse(k, 0L) + gb.getOrElse(k, 0L))
    }.toMap
    assert(merged === gAll, "shard sketches must merge to the union's sketch")
    all.unpersist()
  }

  test("grid merge law: per-key sketches merge by bucket addition to the union's grid") {
    // two "days" with overlapping value ranges and different shapes
    val a = spark.range(0L, 5000L)
      .select(lit("d1").as("day"), (col("id") * 3 % 7919).as("v"))
    val b = spark.range(0L, 3000L)
      .select(lit("d2").as("day"), (col("id") * 11 % 4096).as("v"))
    val width = 64L
    def grid(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      Freq.gridMerge(Freq.gridSketch(df, width)).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ga = grid(a); val gb = grid(b)
    val merged = (ga.keySet ++ gb.keySet).map { k =>
      k -> (ga.getOrElse(k, 0L) + gb.getOrElse(k, 0L))
    }.toMap
    assert(merged === grid(a.unionAll(b)),
      "per-day grids must merge to the union corpus's grid")
    // and the per-day sketch of the union IS the two days' sketches side
    // by side (day is a key, not an aggregation casualty)
    val perDay = Freq.gridSketch(a.unionAll(b), width)
    assert(perDay.filter(col("day") === "d1").count() === ga.size)
    assert(perDay.filter(col("day") === "d2").count() === gb.size)
  }

  test("grid quantile containment: the rank-q element lies in the selected bucket") {
    // adversarially clumped values: heavy spike in one bucket + sparse tail
    val vals = spark.range(0L, 10000L)
      .select(lit("d").as("day"),
        when(col("id") < 9000, col("id") % 10 + 1000).otherwise(col("id")).as("v"))
    val width = 64L
    val g = Freq.gridMerge(Freq.gridSketch(vals, width)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val n = g.map(_._2).sum
    val sorted = vals.select(col("v")).collect().map(_.getLong(0)).sorted
    for (q <- Seq(50, 90, 99)) {
      val r = (n * q + 99) / 100
      // grid pick: first bucket whose cumulative reaches r
      var cum = 0L
      val bkt = g.find { case (_, c) => cum += c; cum >= r }.get._1
      val exact = sorted((r - 1).toInt)
      assert(exact >= bkt * width && exact < (bkt + 1) * width,
        s"p$q: exact $exact outside bucket $bkt (width $width)")
    }
  }

  test("fixture words: q_agg_heavy_hitters margin holds (c_m > n/k) at EVERY harness sf") {
    // The query equals its exact oracle only while the 10th word frequency
    // clears n/k — a precondition of the data, not the code. English Zipf
    // puts rank-10 frequency near the 1/64 line, so pin the margin at all
    // three scale factors the verification harness runs: a violation at a
    // new sf must surface HERE as a precondition failure, not as an
    // inscrutable oracle mismatch in CORRECTNESS_rN.
    for (sfDir <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      // absent fixture = precondition out of scope here, not a failure:
      // environments carrying only the default sf0.001 fixture must skip
      // the larger scale factors with a visible note instead of dying on
      // a missing-path read error
      if (!new java.io.File(sf(sfDir)).isDirectory) {
        info(s"[$sfDir] fixture directory absent — margin check skipped")
      } else {
      val words = graft.catalog.Tables.documents(spark, sf(sfDir))
        .select(explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("item"))
        .cache()
      val n = words.count()
      val cm = words.groupBy(col("item")).agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("item")).limit(10)
        .collect().map(_.getLong(1)).min
      assert(cm > n / 64, s"[$sfDir] 10th word count $cm must exceed n/k = ${n / 64}")
      words.unpersist()
      }
    }
  }

  test("grid sketch buckets by FLOOR division: negatives get their own cells") {
    // advice-12 regression: `div` truncates toward zero, so every v in
    // (-width, width) shared bucket 0 — a double-width cell breaking the
    // one-cell containment bound for negative domains (and diverging
    // from the oracle's floor `//`)
    import spark.implicits._
    val vals = Seq(-25L, -10L, -1L, 0L, 1L, 9L, 10L, 25L)
      .map(("d1", _)).toDF("day", "v")
    val got = Freq.gridSketch(vals, width = 10L)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    // floor semantics: -25,-21..? → bucket -3 {-25}, -2 {-10..-11}? exact:
    // -25/10 floor = -3; -10 → -1? floor(-10/10) = -1; -1 → -1; 0,1,9 → 0;
    // 10 → 1; 25 → 2
    assert(got === Map(-3L -> 1L, -1L -> 2L, 0L -> 3L, 1L -> 1L, 2L -> 1L),
      s"got $got")
  }

  test("quantile summary: Σw = n per day, ≤ k+1 rows, weights bounded by step") {
    import spark.implicits._
    // adversarial mix: one heavily-skewed day (power-law), one uniform,
    // one tiny (n < k: every row its own block)
    val rows =
      (1 to 997).map(i => ("skew", (math.pow(i, 3) / 7).toLong)) ++
      (1 to 640).map(i => ("unif", i.toLong * 13 % 1000)) ++
      (1 to 5).map(i => ("tiny", i.toLong))
    val vals = rows.toDF("day", "v")
    val summ = Freq.quantileSummary(vals, k = 64).cache()
    val perDay = summ.groupBy("day")
      .agg(sum(col("w")).as("sw"), count(lit(1)).as("rows"), max(col("w")).as("mw"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(perDay("skew")._1 === 997L && perDay("unif")._1 === 640L
      && perDay("tiny")._1 === 5L, s"per-day weights must sum to n: $perDay")
    assert(perDay("skew")._2 <= 65 && perDay("unif")._2 <= 65)
    assert(perDay("tiny")._2 === 5, "n < k day keeps every row at weight 1")
    assert(perDay("skew")._3 <= 16 && perDay("tiny")._3 === 1L)
    summ.unpersist()
  }

  test("quantile merged read: rank error within n/k + D on an adversarial union") {
    import spark.implicits._
    val rows =
      (1 to 997).map(i => ("skew", (math.pow(i, 3) / 7).toLong)) ++
      (1 to 640).map(i => ("unif", i.toLong * 13 % 1000))
    val vals = rows.toDF("day", "v").cache()
    val n = rows.length
    val k = 64
    val tol = n / k + 2 // D = 2 days
    val summ = Freq.quantileSummary(vals, k)
    val sorted = rows.map(_._2).sorted
    for (q <- Seq(10, 50, 90, 99)) {
      val r = (n.toLong * q + 99) / 100
      val est = Freq.quantileMergedRead(summ,
          Seq((q, r)).toDF("q_pct", "r"))
        .collect()(0).getLong(2)
      val lo = sorted((math.max(1L, r - tol) - 1).toInt)
      val hi = sorted((math.min(n.toLong, r + tol) - 1).toInt)
      assert(est >= lo && est <= hi,
        s"q$q: est $est outside exact-rank tolerance [$lo, $hi] (r=$r tol=$tol)")
    }
    vals.unpersist()
  }

  test("quantile summaries merge by concatenation: disjoint halves ≡ one sketch of the union, within bound") {
    import spark.implicits._
    // the mergeability law the operator exists for: sketch each half
    // under DIFFERENT day keys, union the summary ROWS (no re-bucketing,
    // no shared domain), and the merged read must still land within the
    // documented rank tolerance of the union's exact quantile
    val h1 = (1 to 800).map(i => ("a", i.toLong * 7 % 2000))
    val h2 = (1 to 700).map(i => ("b", 100000L + i.toLong * 11 % 3000))
    val s1 = Freq.quantileSummary(h1.toDF("day", "v"), 64)
    val s2 = Freq.quantileSummary(h2.toDF("day", "v"), 64)
    val merged = s1.unionAll(s2)
    val n = h1.length + h2.length
    val tol = n / 64 + 2
    val sorted = (h1 ++ h2).map(_._2).sorted
    for (q <- Seq(50, 95)) {
      val r = (n.toLong * q + 99) / 100
      val est = Freq.quantileMergedRead(merged, Seq((q, r)).toDF("q_pct", "r"))
        .collect()(0).getLong(2)
      val lo = sorted((math.max(1L, r - tol) - 1).toInt)
      val hi = sorted((math.min(n.toLong, r + tol) - 1).toInt)
      assert(est >= lo && est <= hi,
        s"q$q: merged-half est $est outside [$lo, $hi]")
    }
  }

  test("quantile summary: heavy-day ordinal routing is bit-identical to the windowed path") {
    import spark.implicits._
    // mixed load: one day over the (tiny, test-forced) threshold, one
    // under, duplicates included — the routed union must reproduce the
    // windowed operator's output EXACTLY (the tie argument: rank ties
    // pick different rows, the selected (day, v, rnk, w) multiset is
    // invariant), so the checked query's hash cannot move at any SF
    val rows =
      (1 to 900).map(i => ("fat", (i * 13 % 200).toLong)) ++
      (1 to 80).map(i => ("thin", (i * 7 % 50).toLong))
    val vals = rows.toDF("day", "v")
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._3))
    val routed = canon(Freq.quantileSummary(vals, 16, heavyDayRows = 500L))
    val windowed = canon(Freq.quantileSummary(vals, 16, heavyDayRows = Long.MaxValue))
    assert(routed === windowed,
      "ordinal-routed heavy day must reproduce the windowed summary exactly")
    assert(routed.nonEmpty && routed.count(_._1 == "fat") <= 17)
    // every-day-heavy degenerate: pure ordinal path, same law
    val allHeavy = canon(Freq.quantileSummary(vals, 16, heavyDayRows = 10L))
    assert(allHeavy === windowed)
  }

  test("quantile merged read: exact-tie summary rows (re-sent batch shape) still hit every rank exactly once") {
    import spark.implicits._
    // A summary unioned with ITSELF — the quantileStoreRead shape when
    // the same day recurs identically across batches: every (v, day, rnk)
    // row fully tied with its twin. Under the default RANGE frame tied
    // rows share one cumulative weight, so the half-open interval join
    // misses ranks that land between the twins (and can duplicate
    // others); the explicit ROWS frame gives each row a distinct cw. The
    // pin: EVERY rank 1..n resolves to exactly one row, and the estimate
    // still lands inside the doubled-count tolerance.
    val rows = (1 to 300).map(i => ("d", i.toLong * 17 % 500))
    val summ = Freq.quantileSummary(rows.toDF("day", "v"), 16)
    val doubled = summ.unionAll(summ)
    val n = 2L * rows.length
    val allRanks = (1L to n).map(r => (r.toInt, r)).toDF("q_pct", "r")
    val got = Freq.quantileMergedRead(doubled, allRanks)
    assert(got.count() === n, "every rank must resolve exactly once")
    assert(got.select("r").distinct().count() === n,
      "no rank may vanish or duplicate under exact ties")
  }

  test("quantile sketch: driver arm ≡ frame pipeline on a dated adversarial fixture") {
    import spark.implicits._
    // skewed + uniform + tiny days with DATE keys and value ties — the
    // q_agg_quantile_sketch shape; the arm and the frame pipeline must
    // agree on every column of every row
    val rows =
      (1 to 997).map(i => ("2024-01-01", (math.pow(i, 3) / 7).toLong)) ++
      (1 to 640).map(i => ("2024-01-02", i.toLong * 13 % 100)) ++
      (1 to 5).map(i => ("2024-01-03", 7L))
    val vals = rows.toDF("d", "v")
      .select(col("d").cast("date").as("day"), col("v"))
    val qs = Seq(50, 90, 99)
    val drv = Freq.quantileSketchDriver(spark, vals, 64, qs)
      .getOrElse(fail("fixture must fit the driver cap"))
      .collect().map(_.toSeq).toSeq
    val dist = Freq.quantileSketchFrames(vals, 64, qs)
      .collect().map(_.toSeq).toSeq
    assert(drv === dist, s"quantile sketch arms diverged: $drv vs $dist")
  }
}
