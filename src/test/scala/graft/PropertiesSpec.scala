package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean

import graft.catalog.Tables
import graft.operators.Dedup
import graft.queries.Sim

/** Property-based laws (SURVEY.md §5.2.3). Data-level generators run
  * against small in-memory DataFrames; table-level laws run once against
  * the sf0.001 fixtures. */
class PropertiesSpec extends SparkSpec {

  /** Run a ScalaCheck property with a fixed seed and assert it holds. */
  private def check(prop: Prop, n: Int = 20): Unit = {
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(n)
      .withInitialSeed(org.scalacheck.rng.Seed(42L))
    val res = SCTest.check(params, prop)
    assert(res.passed, res.status.toString)
  }

  private lazy val li = Tables.lineitem(spark, sf()).cache()

  test("dedup idempotence: dedup(dedup(x)) == dedup(x)") {
    val once = li.select("l_orderkey", "l_linenumber", "l_quantity")
      .dropDuplicates()
    assert(once.dropDuplicates().count() === once.count())
  }

  test("union-all count additivity on arbitrary predicates") {
    val preds = Seq(
      col("l_quantity") < 10, col("l_returnflag") === "A",
      col("l_orderkey") % 3 === 0)
    preds.foreach { p =>
      val a = li.filter(p).count()
      val b = li.filter(!p || p.isNull).count()
      assert(a + b === li.count(), s"partition not exhaustive for $p")
    }
  }

  test("cosine ∈ [−1, 1] and cos(v, v) ≈ 1 on real embeddings") {
    val e = Tables.embeddings(spark, sf())
    val selfCos = e.select(Sim.cosine(col("embedding"), col("embedding")).as("c"))
    assert(selfCos.filter(abs(col("c") - 1.0) > 1e-9).count() === 0)
    val a = e.select(col("vec_id").as("ia"), col("embedding").as("va")).limit(30)
    val b = e.select(col("vec_id").as("ib"), col("embedding").as("vb")).limit(30)
    val cross = a.crossJoin(b).select(Sim.cosine(col("va"), col("vb")).as("c"))
    assert(cross.filter(col("c") < -1.0 - 1e-9 || col("c") > 1.0 + 1e-9).count() === 0)
  }

  test("jaccard symmetry: j(a,b) == j(b,a) (generated token sets)") {
    import spark.implicits._
    val gen = Gen.listOfN(8, Gen.oneOf("a", "b", "c", "d", "e", "f"))
    check(Prop.forAll(gen, gen) { (x: List[String], y: List[String]) =>
      val df = Seq((x.mkString(" "), y.mkString(" "))).toDF("ta", "tb")
        .select(
          array_distinct(split(col("ta"), " ")).as("a"),
          array_distinct(split(col("tb"), " ")).as("b"))
      val Array(j1, j2) = df.select(
        size(array_intersect(col("a"), col("b"))).cast("double") /
          size(array_union(col("a"), col("b"))),
        size(array_intersect(col("b"), col("a"))).cast("double") /
          size(array_union(col("b"), col("a"))))
        .collect().head.toSeq.map(_.asInstanceOf[Double]).toArray
      j1 == j2
    })
  }

  test("window rank is a permutation of 1..n within each partition") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("l_orderkey"))
      .orderBy(col("l_linenumber"), col("l_quantity"))
    val ranked = li.select(col("l_orderkey"),
      row_number().over(w).as("rn"))
    val bad = ranked.groupBy("l_orderkey")
      .agg(count(lit(1)).as("n"), max(col("rn")).as("mx"),
        countDistinct(col("rn")).as("dn"))
      .filter(col("mx") =!= col("n") || col("dn") =!= col("n"))
    assert(bad.count() === 0)
  }

  test("explode ∘ nest = identity (generalized q_explode_roundtrip)") {
    val nested = li.groupBy("l_orderkey")
      .agg(collect_list(struct(col("l_linenumber"), col("l_quantity"))).as("xs"))
    val back = nested.select(col("l_orderkey"), explode(col("xs")).as("x"))
      .select(col("l_orderkey"), col("x.l_linenumber"), col("x.l_quantity"))
    assert(back.count() === li.count())
    assert(back.except(li.select("l_orderkey", "l_linenumber", "l_quantity")).count() === 0)
  }

  test("minhash containment: identical texts share every band bucket") {
    import spark.implicits._
    val gen = Gen.listOfN(12, Gen.oneOf("w1", "w2", "w3", "w4", "w5"))
    check(Prop.forAll(gen) { toks =>
      val docs = Seq((1L, toks.mkString(" ")), (2L, toks.mkString(" ")))
        .toDF("doc_id", "text")
      val cands = Dedup.lshCandidates(Dedup.lshBuckets(Dedup.minhashSignatures(docs)))
      cands.count() == 1L
    }, 10)
  }

  test("cleanExpr idempotence on arbitrary messy ASCII text") {
    import spark.implicits._
    val piece = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(8)),
      Gen.const("<b>Tag</b>"), Gen.const("a.b@c.de"),
      Gen.const("  \t"), Gen.const("\r\n"), Gen.const("MiXeD"))
    val gen = Gen.listOfN(6, piece).map(_.mkString(" "))
    check(Prop.forAll(gen) { s =>
      val out = Seq(s, "probe").toDF("text")
        .select(graft.queries.Text.cleanExpr(col("text")).as("c"))
        .collect().map(_.getString(0))
      val once = out.head
      val twice = Seq(once).toDF("text")
        .select(graft.queries.Text.cleanExpr(col("text")).as("c"))
        .collect().head.getString(0)
      twice == once
    }, 15)
  }

  test("contamination monotonicity: raising minShared never adds pairs") {
    import spark.implicits._
    val bench = Seq((1L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val train = Seq(
      (10L, "x alpha beta gamma y"),
      (11L, "alpha beta gamma delta epsilon q"),
      (12L, "unrelated words only here")).toDF("doc_id", "text")
    val at = (1 to 4).map { k =>
      Dedup.contamination(train, bench, minShared = k)
        .select("train_id", "bench_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    at.sliding(2).foreach { case Seq(lo, hi) =>
      assert(hi.subsetOf(lo), s"minShared increase added pairs: ${hi -- lo}")
    }
    // decontaminate keeps exactly the unflagged docs: doc 10 shares only
    // one shingle with the benchmark, doc 11 shares three
    val clean = Dedup.decontaminate(train, bench, minShared = 2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(clean === Set(10L, 12L))
  }

  test("as-of merge is total on the probe side for arbitrary key overlap") {
    import spark.implicits._
    val gen = for {
      pk <- Gen.listOfN(30, Gen.choose(0L, 5L))
      bk <- Gen.listOfN(20, Gen.choose(3L, 8L)) // partial key overlap
    } yield (pk, bk)
    check(Prop.forAll(gen) { case (pk, bk) =>
      val probes = pk.zipWithIndex.map { case (k, i) => (i.toLong, k, (i * 13 % 50).toLong) }
        .toDF("event_id", "k", "ts")
      val builds = bk.zipWithIndex.map { case (k, i) => (k, (i * 7 % 50).toLong) }
        .toDF("bk", "bts")
      graft.plans.AsOf.join(probes, builds, "k", "bk", "ts", "bts").count() == pk.size.toLong
    }, 10)
  }

  test("zorderKey laws: range, monotone per dimension, distance locality") {
    import spark.implicits._
    import graft.operators.Layout
    val gen = for {
      xs <- Gen.listOfN(40, Gen.choose(0L, 999L))
      ys <- Gen.listOfN(40, Gen.choose(0L, 999L))
    } yield xs.zip(ys)
    check(Prop.forAll(gen) { pts =>
      val df = pts.toDF("x", "y")
        .select(col("x"), col("y"),
          Layout.zorderKey(Seq((col("x"), 0L, 999L), (col("y"), 0L, 999L)), bits = 8).as("z"))
      val rows = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      // 16-bit range
      val inRange = rows.forall { case (_, _, z) => z >= 0L && z < (1L << 16) }
      // fixing one dim, z is monotone non-decreasing in the other's BUCKET
      def bucket(v: Long) = v * 256 / 1000
      val mono = rows.groupBy(_._2).forall { case (_, g) =>
        g.sortBy(_._1).map(t => (bucket(t._1), t._3)).toList
          .sliding(2).forall {
            case List((_, z1), (_, z2)) => z1 <= z2
            case _ => true
          }
      }
      inRange && mono
    }, 10)
  }

  test("pagerank laws: mass bound and permutation invariance of node ids") {
    import spark.implicits._
    import graft.operators.Graph
    val gen = Gen.listOfN(60, Gen.zip(Gen.choose(0L, 19L), Gen.choose(0L, 19L)))
      .map(_.filter { case (a, b) => a != b }.distinct)
      .suchThat(_.nonEmpty)
    check(Prop.forAll(gen) { raw =>
      val es = (raw ++ raw.map(_.swap)).distinct
      val ranks = Graph.pagerank(es.toDF("src", "dst"), iters = 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // floors only leak mass downward, bounded
      val total = ranks.values.sum
      // shifting every node id by a constant shifts keys, not rank values
      val shifted = Graph.pagerank(
        es.map { case (a, b) => (a + 1000L, b + 1000L) }.toDF("src", "dst"),
        iters = 3).collect().map(r => (r.getLong(0) - 1000L) -> r.getLong(1)).toMap
      total <= 1000000000000L && total > 999999000000L && shifted == ranks
    }, 8)
  }

  test("triangle laws: relabel invariance and disjoint-union additivity") {
    import spark.implicits._
    import graft.operators.Graph
    val gen = Gen.listOfN(50, Gen.zip(Gen.choose(0L, 14L), Gen.choose(0L, 14L)))
      .map(_.filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct)
      .suchThat(_.nonEmpty)
    def counts(es: Seq[(Long, Long)]): (Long, Long, Long) = {
      val r = Graph.triangleCount(es.toDF("a", "b")).collect().head
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    check(Prop.forAll(gen) { es =>
      val base = counts(es)
      // node relabeling (id shift) preserves all three counts — degree
      // orientation must not depend on the id values beyond tie-breaks
      val shifted = counts(es.map { case (a, b) => (a + 1000L, b + 1000L) })
      // two disjoint copies: everything exactly doubles
      val doubled = counts(es ++ es.map { case (a, b) => (a + 1000L, b + 1000L) })
      shifted == base &&
        doubled == ((base._1 * 2, base._2 * 2, base._3 * 2))
    }, 8)
  }

  test("serialize ∘ parse round trip preserves bronze blocks (A7 ∘ A10 = id)") {
    val raw = spark.read.text(getClass.getResource("/blocks/blocks.jsonl").getPath)
    val parsed = graft.ingest.BlockIngest.parse(raw)
    val bronze = graft.ingest.BlockIngest.keepCanonical(
      graft.ingest.BlockIngest.dedupBlocks(
        graft.ingest.BlockIngest.normalizeBlocks(parsed)))
    val reparsed = graft.ingest.BlockIngest.normalizeBlocks(
      graft.ingest.BlockIngest.parse(graft.ingest.BlockIngest.toMessages(bronze)))
    assert(reparsed.count() === bronze.count())
    val cols = Seq("block_number", "hash", "gas_used", "tx_count").map(col)
    assert(reparsed.select(cols: _*).except(bronze.select(cols: _*)).count() === 0)
  }

  test("psi laws on generated two-snapshot histograms: zero iff identical, always ≥ 0") {
    import spark.implicits._
    // arbitrary bucket multisets for the two snapshots over 4 buckets
    val gen = Gen.listOfN(24, Gen.choose(0, 3))
    check(Prop.forAll(gen, gen) { (oldB: List[Int], newB: List[Int]) =>
      val rows = oldB.map((_, true)) ++ newB.map((_, false))
      val out = graft.queries.Drift.psi(rows.toDF("bucket", "is_old"), 4).collect()
      val perBucket = out.filter(_.getInt(0) >= 0)
      val total = out.find(_.getInt(0) == -1).get.getLong(3)
      val nonNeg = perBucket.forall(_.getLong(3) >= 0L)
      val additive = total == perBucket.map(_.getLong(3)).sum
      val zeroIffSame =
        if (oldB.sorted == newB.sorted) total == 0L else true
      nonNeg && additive && zeroIffSame
    }, n = 12)
  }

  test("embedding drift: identical halves score PSI 0; a planted direction shift scores positive") {
    import spark.implicits._
    // old half (even ids) and new half (odd ids) are the SAME 8 vectors
    // → identical cosine-to-centroid buckets → PSI exactly 0 per bucket
    val base = Seq(
      Seq(1f, 0f, 0f, 0f), Seq(0.9f, 0.1f, 0f, 0f), Seq(0.8f, 0.2f, 0f, 0f),
      Seq(1f, 0.3f, 0f, 0f), Seq(0.7f, 0f, 0.1f, 0f), Seq(0.9f, 0f, 0.2f, 0f),
      Seq(1f, 0.1f, 0.1f, 0f), Seq(0.8f, 0.1f, 0f, 0.1f))
    val same = base.zipWithIndex.flatMap { case (v, i) =>
      Seq((2L * i, v), (2L * i + 1, v)) }
    val psiSame = graft.queries.Drift
      .embeddingDriftPsi(same.toDF("vec_id", "embedding"))
      .collect().find(_.getInt(0) == -1).get.getLong(3)
    assert(psiSame === 0L, s"identical halves must score 0, got $psiSame")
    // encoder swap: the new half points along a DIFFERENT axis — the
    // cosine-to-(old)-centroid mass moves buckets and PSI goes positive
    val shifted = base.zipWithIndex.flatMap { case (v, i) =>
      Seq((2L * i, v), (2L * i + 1, Seq(0f, 0f, v(0), v(1)))) }
    val psiShift = graft.queries.Drift
      .embeddingDriftPsi(shifted.toDF("vec_id", "embedding"))
      .collect().find(_.getInt(0) == -1).get.getLong(3)
    assert(psiShift > 0L, s"planted shift must score positive, got $psiShift")
  }

  test("jsd laws on generated histograms: zero iff identical, symmetric, bounded by ln 2") {
    import spark.implicits._
    val gen = Gen.listOfN(24, Gen.choose(0, 3))
    check(Prop.forAll(gen, gen) { (oldB: List[Int], newB: List[Int]) =>
      val rows = oldB.map((_, true)) ++ newB.map((_, false))
      def total(rs: Seq[(Int, Boolean)]) = graft.queries.Drift
        .jsd(rs.toDF("bucket", "is_old"), 4).collect()
        .find(_.getInt(0) == -1).get.getLong(3)
      val t = total(rows)
      // symmetry: JSD(p, q) = JSD(q, p) — PSI has this too, but for JSD
      // it is definitional (the midpoint mixture is symmetric)
      val sw = oldB.map((_, false)) ++ newB.map((_, true))
      val zeroIffSame = if (oldB.sorted == newB.sorted) t == 0L else true
      t >= 0L && t <= math.ceil(math.log(2) * 1e8).toLong &&
        t == total(sw) && zeroIffSame
    }, n = 8)
  }

  test("ks laws on generated histograms: bounded by [0, 1], symmetric") {
    import spark.implicits._
    val gen = Gen.listOfN(20, Gen.choose(0, 3))
    check(Prop.forAll(gen, Gen.listOfN(15, Gen.choose(0, 3))) {
      (oldB: List[Int], newB: List[Int]) =>
        val rows = oldB.map((_, true)) ++ newB.map((_, false))
        val d = graft.queries.Drift.ks(rows.toDF("bucket", "is_old")).collect().head
        val ks = d.getDouble(4)
        // swapping the snapshots flips every CDF difference's sign but not
        // its magnitude → identical statistic
        val sw = oldB.map((_, false)) ++ newB.map((_, true))
        val ks2 = graft.queries.Drift.ks(sw.toDF("bucket", "is_old")).collect().head.getDouble(4)
        ks >= 0.0 && ks <= 1.0 && ks == ks2
    }, n = 12)
  }

  test("substring dedup law: engine == sequential replay on adversarial tiny-alphabet corpora") {
    import spark.implicits._
    // 2-letter alphabet + W=3 makes window collisions pervasive — the
    // regime where first-occurrence bookkeeping and span-union logic can
    // actually go wrong (the fixture's wide vocab rarely collides).
    val W = 3
    val gen = Gen.listOfN(8, Gen.listOfN(12, Gen.oneOf("a", "b")))
    check(Prop.forAll(gen) { docsRaw: List[List[String]] =>
      docsRaw.nonEmpty ==> {
        val docs = docsRaw.zipWithIndex
          .map { case (ts, i) => (i.toLong, ts.mkString(" ")) }
        val got = Dedup.substringDedup(docs.toDF("doc_id", "text"), w = W)
          .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
        // sequential replay, global first-occurrence in (doc_id, pos) order
        val seen = scala.collection.mutable.HashSet.empty[String]
        val expected = docs.map { case (id, text) =>
          val toks = text.split(" ")
          val dup = Array.fill(toks.length)(false)
          for (i <- 0 to toks.length - W) {
            val win = toks.slice(i, i + W).mkString(" ")
            if (!seen.add(win)) (i until i + W).foreach(dup(_) = true)
          }
          id -> ((toks.length.toLong, toks.indices.count(!dup(_)).toLong))
        }.toMap
        got == expected
      }
    }, n = 15)
  }

  test("sessionize laws on generated event streams: partition, order, gap bound") {
    import spark.implicits._
    // arbitrary per-user µs timestamp lists → sessions must (a) cover every
    // event exactly once, (b) number densely from 1, (c) never contain an
    // internal gap > the threshold (checked via max session span vs count)
    val gapUs = 1000L
    val gen = Gen.listOfN(30, for {
      u <- Gen.choose(1L, 4L); t <- Gen.choose(0L, 20000L)
    } yield (u, t))
    check(Prop.forAll(gen) { evs: List[(Long, Long)] =>
      evs.nonEmpty ==> {
        val df = evs.zipWithIndex
          .map { case ((u, t), i) => (u, i.toLong, t) }
          .toDF("user_id", "event_id", "ts_us")
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"user_id").orderBy($"ts_us", $"event_id")
        val sess = df
          .withColumn("new_s", when(lag($"ts_us", 1).over(w).isNull ||
            $"ts_us" - lag($"ts_us", 1).over(w) >= gapUs, 1L).otherwise(0L))
          .withColumn("sn", sum($"new_s").over(
            w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
          .groupBy($"user_id", $"sn")
          .agg(count(lit(1)).as("n"), min($"ts_us").as("lo"), max($"ts_us").as("hi"))
          .collect()
        val total = sess.map(_.getAs[Long]("n")).sum
        // replay expected sessions per user from the sorted stream
        val expected = evs.groupBy(_._1).map { case (_, es) =>
          val ts = es.map(_._2).sorted
          1 + ts.zip(ts.tail).count { case (a, b) => b - a >= gapUs }
        }.sum
        total == evs.size && sess.length == expected &&
          sess.forall(r => r.getAs[Long]("hi") - r.getAs[Long]("lo") <=
            gapUs * (r.getAs[Long]("n") - 1))
      }
    }, n = 15)
  }

  test("misra-gries superset law on arbitrary skewed streams") {
    import spark.implicits._
    val gen = Gen.listOfN(200, Gen.frequency(
      (8, Gen.const("hot")), (3, Gen.const("warm")),
      (1, Gen.choose(0, 50).map(i => s"cold$i"))))
    check(Prop.forAll(gen) { items: List[String] =>
      items.nonEmpty ==> {
        val k = 5
        val df = items.toDF("item").repartition(3)
        val cand = graft.operators.Freq.candidates(df, k)
          .collect().map(_.getString(0)).toSet
        val n = items.size
        val heavy = items.groupBy(identity).collect {
          case (w, os) if os.size > n / k => w
        }.toSet
        heavy.subsetOf(cand)
      }
    }, n = 15)
  }

  test("entropy bounds: 0 ≤ H ≤ ln(n_users) on the fixture report") {
    val r = SparkEntry.queries("q_agg_entropy")(spark, sf()).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val h = row.getLong(3) / 1e4
      val nUsers = row.getLong(1)
      assert(h >= -1e-4 && h <= math.log(nUsers.toDouble) + 1e-4,
        s"entropy $h outside [0, ln($nUsers)]")
    }
  }

  test("gini bounds and mean-preservation sanity on the fixture report") {
    val r = SparkEntry.queries("q_agg_gini")(spark, sf()).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val g = row.getDouble(2)
      assert(g >= 0.0 && g < 1.0, s"gini $g outside [0, 1)")
    }
  }

  test("scd2 apply ≡ full rebuild for ARBITRARY batch cutoffs") {
    import spark.implicits._
    val sg = Tables.events(spark, sf()).filter(col("event_type") === "signup")
      .select(col("user_id"), col("event_id"), col("value").as("plan_value"),
        unix_micros(col("ts").cast("timestamp")).as("from_us"))
      .cache()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("from_us"), col("event_id"))
    val full = sg.withColumn("to_us", lead(col("from_us"), 1).over(w))
    val tsBounds = sg.agg(min(col("from_us")), max(col("from_us"))).head
    val (lo, hi) = (tsBounds.getLong(0), tsBounds.getLong(1))
    check(Prop.forAll(Gen.choose(0.0, 1.0)) { f: Double =>
      val cut = lo + ((hi - lo) * f).toLong
      val target = sg.filter(col("from_us") < cut)
        .withColumn("to_us", lead(col("from_us"), 1).over(w))
      val applied = graft.operators.Merge.applyScd2(
        target, sg.filter(col("from_us") >= cut))
      applied.exceptAll(full).isEmpty && full.exceptAll(applied).isEmpty
    }, n = 8)
    sg.unpersist()
  }

  test("merge absorbs a no-change source: merging a target subset changes no values") {
    import spark.implicits._
    // source = an arbitrary subset of target rows, unchanged, no deletes →
    // the snapshot's VALUES are invariant (only _action flips to update)
    val gen = Gen.listOfN(8, Gen.choose(1L, 12L)).map(_.distinct)
    check(Prop.forAll(gen) { keys: List[Long] =>
      val target = (1L to 12L).map(k => (k, s"v$k", k * 1.5)).toSeq
        .toDF("k", "v", "x")
      val source = keys.map(k => (k, s"v$k", k * 1.5, false)).toSeq
        .toDF("k", "v", "x", "is_delete")
      val out = graft.operators.Merge.merge(target, source, Seq("k")).drop("_action")
      out.exceptAll(target).isEmpty && target.exceptAll(out).isEmpty
    }, n = 10)
  }
}
