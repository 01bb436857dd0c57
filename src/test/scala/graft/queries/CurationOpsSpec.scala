package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.catalog.Tables
import graft.operators.Dedup

/** Unit tests for the round-8 curation additions: BM25 retrieval scoring
  * (driver-side independent recompute), PSI drift (hand-computed algebra +
  * invariants), and SemDeDup cluster-scoped pruning (consistency with the
  * exact pair operator, scoping, threshold monotonicity). */
class CurationOpsSpec extends SparkSpec {

  // ---------- BM25 ----------

  test("bm25: top-10 matches an independent driver-side recompute") {
    val rows = Tables.documents(spark, sf()).filter(col("text").isNotNull)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq)
    val n = rows.length.toLong
    val avgdl = rows.map(_._2.size.toLong).sum.toDouble / n
    val terms = Seq("spark", "join", "stream", "vector", "agg")
    val df = terms.map(t => t -> rows.count(_._2.contains(t)).toLong).toMap
    val idf = terms.map(t => t -> math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5))).toMap
    val scored = rows.flatMap { case (id, toks) =>
      val dl = toks.size.toLong
      val micro = terms.map { t =>
        val tf = toks.count(_ == t).toLong
        if (tf == 0) 0L
        else math.floor(
          idf(t) * (tf * (1.2 + 1.0)) / (tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl / avgdl)) * 1e6 + 0.5
        ).toLong
      }.sum
      if (micro > 0) Some(id -> micro) else None
    }
    val expected = scored.sortBy { case (id, m) => (-m, id) }.take(10).toSeq
    val got = SparkEntry_q("q_search_bm25")
      .select(col("doc_id"), col("score_micro")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSeq
    assert(got === expected, s"BM25 top-10 mismatch:\n got $got\n exp $expected")
  }

  test("bm25: every returned doc contains at least one query term") {
    val out = SparkEntry_q("q_search_bm25")
    assert(out.filter(col("n_terms") < 1 || col("n_terms") > 5).count() === 0)
    assert(out.filter(col("score_micro") <= 0).count() === 0,
      "BM25 scores of matching docs must be strictly positive")
  }

  private def SparkEntry_q(name: String) =
    graft.SparkEntry.queries(name)(spark, sf())

  test("phrase search: top-10 matches a driver-side sliding-window recompute") {
    val rows = graft.catalog.Tables.documents(spark, sf())
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq)
    val expected = rows.flatMap { case (id, toks) =>
      val hits = toks.sliding(2).zipWithIndex
        .collect { case (Seq("stream", "join"), i) => i }.toSeq
      if (hits.nonEmpty) Some((id, hits.size.toLong, hits.min)) else None
    }.sortBy { case (id, n, _) => (-n, id) }.take(10).toSeq
    val got = SparkEntry_q("q_search_phrase").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(got === expected, s"phrase mismatch:\n got $got\n exp $expected")
  }

  test("bigram logprob: per-doc sums match a driver-side LM recompute") {
    val rows = graft.catalog.Tables.documents(spark, sf())
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq)
    val bigs = rows.flatMap { case (id, toks) =>
      toks.sliding(2).collect {
        case Seq(a, b) if a.nonEmpty && b.nonEmpty => (id, a, b)
      }
    }
    val c12 = bigs.groupBy(t => (t._2, t._3)).map { case (k, v) => k -> v.size.toLong }
    val c1 = bigs.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
    val c2 = bigs.groupBy(_._3).map { case (k, v) => k -> v.size.toLong }
    val nb = bigs.size.toLong
    def nllMicro(a: String, b: String): Long =
      math.floor(-math.log(
        0.8 * (c12((a, b)).toDouble / c1(a)) + 0.2 * (c2(b).toDouble / nb)
      ) * 1e6 + 0.5).toLong
    val expected = bigs.groupBy(_._1).map { case (id, bs) =>
      id -> ((bs.size.toLong, bs.map(t => nllMicro(t._2, t._3)).sum))
    }
    val got = SparkEntry_q("q_text_bigram_logprob").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === expected,
      s"bigram LM mismatch on ${got.keySet.diff(expected.keySet)} / value diffs: " +
        got.collect { case (k, v) if expected.get(k).exists(_ != v) => (k, v, expected(k)) }.take(3))
  }

  test("dsir: top-50 importance weights match a driver-side recompute") {
    val rows = graft.catalog.Tables.documents(spark, sf())
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).split(" ", -1).toSeq.filter(_.nonEmpty)))
    val cb = rows.flatMap(_._3).groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val ct = rows.filter(_._2 == "en").flatMap(_._3)
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val v = cb.size.toLong
    val nb = cb.values.sum
    val nt = rows.filter(_._2 == "en").map(_._3.size.toLong).sum
    def lrMicro(t: String): Long = math.floor((
      math.log((ct.getOrElse(t, 0L) + 0.5) / (nt + v * 0.5))
        - math.log((cb(t) + 0.5) / (nb + v * 0.5))) * 1e6 + 0.5).toLong
    val expected = rows.map { case (id, _, toks) =>
      (id, toks.map(lrMicro).sum)
    }.sortBy { case (id, w) => (-w, id) }.take(50).toSeq
    val got = SparkEntry_q("q_sample_dsir")
      .select(col("doc_id"), col("weight_micro")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === expected, s"dsir mismatch:\n got ${got.take(5)}\n exp ${expected.take(5)}")
  }

  test("media dedup: exactly the planted replays dedup, keeper is the original") {
    val out = SparkEntry_q("q_media_dedup").collect()
    // docs < 50 are re-ingested once → 50 groups of 2 copies (unless two
    // fixture texts collide, which md5 grouping would surface as n>2)
    assert(out.length === 50, s"expected 50 dup groups, got ${out.length}")
    assert(out.forall(_.getLong(1) === 2L))
    assert(out.forall(r => r.getLong(2) < 50L),
      "keeper must be the original (smaller) media_id")
    assert(out.forall(_.getLong(3) > 0L))
  }

  // ---------- PSI ----------

  test("psi: identical snapshot distributions yield exactly zero drift") {
    import spark.implicits._
    // both snapshots hold 5 rows in each of the 4 buckets
    val sym = Seq.tabulate(40)(i => (i % 4, i < 20)).toDF("bucket", "is_old")
    val out = Drift.psi(sym, smoothBuckets = 4).collect()
    assert(out.forall(_.getLong(3) == 0L),
      s"identical p/q must floor to 0 micro in every row: ${out.mkString(",")}")
  }

  test("psi: hand-computed two-bucket example, exact micro units") {
    import spark.implicits._
    // old: 3 in b0, 1 in b1; new: 1 in b0, 3 in b1; smoothing over 2
    val rows = Seq.fill(3)((0, true)) ++ Seq((1, true)) ++
      Seq((0, false)) ++ Seq.fill(3)((1, false))
    val out = Drift.psi(rows.toDF("bucket", "is_old"), smoothBuckets = 2)
      .collect().map(r => r.getInt(0) -> r.getLong(3)).toMap
    def term(po: Double, qo: Double): Long =
      math.floor((po - qo) * math.log(po / qo) * 1e8 + 0.5).toLong
    val p0 = (3 + 0.5) / (4 + 0.5 * 2); val q0 = (1 + 0.5) / (4 + 0.5 * 2)
    val exp0 = term(p0, q0); val exp1 = term(q0, p0)
    assert(out(0) === exp0 && out(1) === exp1 && out(-1) === exp0 + exp1,
      s"psi micro mismatch: $out vs ($exp0, $exp1)")
  }

  test("psi: per-bucket terms are non-negative ((p-q)ln(p/q) >= 0), total = sum") {
    val out = graft.SparkEntry.queries("q_drift_psi")(spark, sf()).collect()
    val buckets = out.filter(_.getInt(0) >= 0)
    assert(buckets.forall(_.getLong(3) >= 0L),
      "every PSI contribution is mathematically non-negative")
    assert(out.find(_.getInt(0) == -1).get.getLong(3) === buckets.map(_.getLong(3)).sum)
  }

  test("ks: identical distributions → 0; disjoint → 1; exact integer argmax") {
    import spark.implicits._
    val same = Seq.tabulate(40)(i => (i % 4, i < 20)).toDF("bucket", "is_old")
    assert(Drift.ks(same).collect().head.getLong(1) === 0L)
    // old all in bucket 0, new all in bucket 1 → sup gap = 1 at bucket 0
    val disj = (Seq.fill(7)((0, true)) ++ Seq.fill(5)((1, false)))
      .toDF("bucket", "is_old")
    val d = Drift.ks(disj).collect().head
    assert(d.getInt(0) === 0 && d.getLong(1) === 7L * 5L && d.getDouble(4) === 1.0)
    // hand case: old (2,1,1) new (1,1,2) over buckets 0..2, tot 4 each:
    // cum_old·tot_new − cum_new·tot_old = 8−4=4 at b0, 12−8=4 at b1, 0 at b2
    // → max 4 at bucket 0 (ties break on the smaller bucket)
    val hand = (Seq.fill(2)((0, true)) ++ Seq((1, true), (2, true)) ++
      Seq((0, false), (1, false)) ++ Seq.fill(2)((2, false)))
      .toDF("bucket", "is_old")
    val h = Drift.ks(hand).collect().head
    assert(h.getInt(0) === 0 && h.getLong(1) === 4L && h.getDouble(4) === 0.25)
  }

  test("er blocking: sound (⊆ brute force) and complete on token-sharing pairs") {
    val names = graft.catalog.Tables.part(spark, sf())
      .select(col("p_name")).distinct().collect().map(_.getString(0))
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val brute = (for {
      a <- names; b <- names if a < b && lev(a, b) <= 2
    } yield (a, b)).toSet
    val got = SparkEntry_q("q_er_blocking").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got.subsetOf(brute), s"false positives: ${got.diff(brute).take(3)}")
    // completeness ON THE BLOCKING GUARANTEE: any brute pair sharing an
    // adjective or noun token must be found (pairs differing in BOTH
    // tokens are the documented blocking miss)
    val guaranteed = brute.filter { case (a, b) =>
      val (ta, tb) = (a.split(" "), b.split(" "))
      ta(0) == tb(0) || ta(1) == tb(1)
    }
    assert(guaranteed.subsetOf(got), s"blocked pairs missed: ${guaranteed.diff(got).take(3)}")
  }

  test("line dedup: kept-line conservation, replay stripping, first-doc identity") {
    import spark.implicits._
    val out = SparkEntry_q("q_dedup_lines").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // conservation: Σ n_kept over the corpus == number of DISTINCT lines
    // (each distinct line survives exactly once, by definition)
    val docs = graft.catalog.Tables.documents(spark, sf())
      .filter(col("text").isNotNull).select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def linesOf(text: String): Seq[String] =
      text.split(" ", -1).grouped(10).map(_.mkString(" ")).toSeq
    val corpus = docs ++ docs.filter(_._1 < 50).map { case (id, t) =>
      (id + 10000L) -> (linesOf(t).head + s" uniq$id")
    }
    val distinctLines = corpus.flatMap { case (_, t) => linesOf(t) }.distinct.size.toLong
    assert(out.values.map(_._2).sum === distinctLines,
      "every distinct line must survive exactly once")
    // replays share their first line with an earlier doc → stripped; the
    // unique marker line survives
    corpus.collect { case (id, _) if id >= 10000L =>
      val (nLines, nKept, _) = out(id)
      assert(nKept < nLines || nLines == 1L, s"replay $id kept all its lines")
      assert(nKept >= 1L, s"replay $id lost its unique marker line")
    }
    // doc 0 is globally first: reassembly must reproduce its text verbatim
    val md0 = java.security.MessageDigest.getInstance("MD5")
      .digest(docs.toMap.apply(0L).getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out(0L)._3 === md0)
  }

  // ---------- SemDeDup ----------

  private def clustered = Tables.embeddings(spark, sf())
    .select(col("vec_id"), col("label").as("cluster"), col("embedding"))

  test("semantic dedup: pruned iff a smaller-id same-cluster neighbor at cos >= t") {
    // independent recompute via the exact pair operator, restricted per cluster
    val pairs = Dedup.embeddingNearDups(
      Tables.embeddings(spark, sf()).select(col("vec_id"), col("embedding")), 0.3)
      .join(clustered.select(col("vec_id").as("d1"), col("cluster").as("c1")), "d1")
      .join(clustered.select(col("vec_id").as("d2"), col("cluster").as("c2")), "d2")
      .filter(col("c1") === col("c2"))
    val expectedPruned = pairs.select(col("d2").as("vec_id")).distinct()
    val got = Dedup.semanticDedup(clustered, 0.3)
    val gotPruned = got.filter(col("pruned")).select(col("vec_id"))
    assert(gotPruned.exceptAll(expectedPruned).isEmpty &&
      expectedPruned.exceptAll(gotPruned).isEmpty,
      "pruned set must equal the cluster-restricted exact-pair d2 set")
    // every input vector is flagged exactly once
    assert(got.count() === clustered.count())
    assert(got.select(col("vec_id")).distinct().count() === clustered.count())
  }

  test("semantic dedup: clusters isolate — identical vectors in different clusters survive") {
    import spark.implicits._
    val v = Seq.fill(8)(1.0f)
    val e = Seq(
      (1L, 0, v), (2L, 1, v),          // identical, different clusters
      (10L, 2, v), (11L, 2, v)         // identical, same cluster
    ).toDF("vec_id", "cluster", "embedding")
    val out = Dedup.semanticDedup(e, 0.9).collect()
      .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(!out(1L) && !out(2L), "cross-cluster twins must both survive")
    assert(!out(10L) && out(11L), "in-cluster twin keeps the min id only")
  }

  test("semantic dedup over a learned kmeans clustering prunes planted twins") {
    import spark.implicits._
    // 8 well-separated directions + an exact twin per tenth vector: the
    // learned cells must co-locate each twin pair, so every twin (larger
    // id) is pruned and originals survive. Jitter is wide (±0.25) so
    // same-cluster NON-twins stay well below the 0.999 threshold — only
    // the exact copies (cos = 1) may prune.
    val dim = 64
    def jitter(i: Long, d: Int): Float =
      ((((i * 1315423911L + d * 2654435761L) % 1000L) / 1000.0) - 0.5).toFloat * 0.5f
    def vec(i: Long): Seq[Float] = {
      val c = (i % 8).toInt
      Seq.tabulate(dim)(d => (if (d / 8 == c) 1.0f else 0.0f) + jitter(i, d))
    }
    val base = (0L until 100L).map(i => (i, vec(i), s"c${i % 8}"))
    val twins = (0L until 100L by 10L).map(i => (i + 5000L, vec(i), "t"))
    val embs = (base ++ twins).toDF("vec_id", "embedding", "label")
    val out = Dedup.semanticDedupKmeans(embs, threshold = 0.999, k = 8)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    (0L until 100L by 10L).foreach { i =>
      assert(out(i + 5000L), s"twin of $i must be pruned")
      assert(!out(i), s"original $i must survive (keep-min-id)")
    }
  }

  test("semantic dedup: higher threshold prunes a subset") {
    val loose = Dedup.semanticDedup(clustered, 0.2)
      .filter(col("pruned")).select("vec_id")
    val strict = Dedup.semanticDedup(clustered, 0.5)
      .filter(col("pruned")).select("vec_id")
    assert(strict.exceptAll(loose).isEmpty,
      "vectors pruned at 0.5 must also be pruned at 0.2")
  }

  // ---------- leakage-free split ----------

  test("leakage-free split: no near-dup pair straddles splits; naive split WOULD leak") {
    val split = graft.SparkEntry.queries("q_split_leakage_free")(spark, sf())
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getInt(2), r.getString(3)))).toMap
    // the invariant the operator exists for: both ends of every verified
    // near-dup pair carry the same split label
    val docs = Tables.documents(spark, sf()).filter(col("doc_id") < 500)
    val pairs = Dedup.minhashNearDups(docs, 0.5)
      .select(col("d1"), col("d2")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture must contain near-dup pairs")
    val leaked = pairs.filter { case (a, b) => split(a)._3 != split(b)._3 }
    assert(leaked.isEmpty, s"pairs straddling splits: ${leaked.take(5).toSeq}")
    // and the per-doc naive assignment WOULD have leaked on this fixture —
    // the operator changes an outcome, it isn't vacuously agreeing
    def naive(id: Long): String = {
      val b = Integer.parseInt(java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).take(2)
        .map("%02x".format(_)).mkString, 16)
      if (b < graft.queries.Text.trainBucket) "train"
      else if (b < graft.queries.Text.valBucket) "val" else "test"
    }
    assert(pairs.exists { case (a, b) => naive(a) != naive(b) },
      "fixture should exhibit naive-split leakage (else this test is vacuous)")
    // singletons (docs in no pair) degrade to exactly the naive assignment
    val paired = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    val singles = split.keySet -- paired
    assert(singles.nonEmpty)
    singles.foreach { d =>
      assert(split(d)._1 == d, s"singleton $d must be its own cluster")
      assert(split(d)._3 == naive(d), s"singleton $d must match q_sample_hash's split")
    }
  }

  test("leakage-free split: the straddle invariant also holds at sf0.1") {
    // round-10 verdict residue: the invariant was proven at fixture sf
    // only. Same assertion against the sf0.1 corpus (different first-500
    // doc population → different near-dup pair structure): both ends of
    // every verified near-dup pair must carry one split label.
    val split = graft.SparkEntry.queries("q_split_leakage_free")(spark, sf("sf0.1"))
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    val docs = Tables.documents(spark, sf("sf0.1")).filter(col("doc_id") < 500)
    val pairs = Dedup.minhashNearDups(docs, 0.5)
      .select(col("d1"), col("d2")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "sf0.1 corpus must contain near-dup pairs")
    val leaked = pairs.filter { case (a, b) => split(a) != split(b) }
    assert(leaked.isEmpty, s"pairs straddling splits at sf0.1: ${leaked.take(5).toSeq}")
  }

  // ---------- keyword extraction ----------

  test("keywords: per-doc top-3 matches a driver-side TF-IDF replay") {
    val got = graft.SparkEntry.queries("q_text_keywords")(spark, sf())
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    val docs = Tables.documents(spark, sf()).filter(col("text").isNotNull)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) ->
        "[a-z]+".r.findAllIn(r.getString(1).toLowerCase).toSeq)
    val tf = docs.flatMap { case (id, ts) =>
      ts.groupBy(identity).map { case (t, o) => (id, t, o.size.toLong) }
    }
    val df = tf.groupBy(_._2).map { case (t, rs) => t -> rs.size.toLong }
    val n = docs.length.toDouble
    val idfE4 = df.map { case (t, d) => t -> math.floor(math.log(n / d) * 1e4).toLong }
    val expected = tf.groupBy(_._1).toSeq.flatMap { case (id, rs) =>
      rs.map { case (_, t, f) => (id, t, f, df(t), f * idfE4(t)) }
        .sortBy { case (_, t, _, _, s) => (-s, t) }.take(3).zipWithIndex
        .map { case ((_, t, f, d, s), i) => (id, i + 1, t, f, d, s) }
    }.sortBy(x => (x._1, x._2))
    assert(got === expected)
  }

  // ---------- n-gram novelty ----------

  test("novelty: conservation and replay laws") {
    val rows = graft.SparkEntry.queries("q_text_novelty")(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    // per-doc sanity: novel ⊆ shingles; e4 score consistent
    rows.foreach { case (id, nSh, nNov, e4) =>
      assert(nNov <= nSh, s"doc $id: novel $nNov > shingles $nSh")
      assert(e4 === (if (nSh == 0) None else Some(nNov * 10000 / nSh)), s"doc $id score")
    }
    // the smallest doc_id with shingles is fully novel by definition
    val first = rows.filter(_._2 > 0).minBy(_._1)
    assert(first._3 === first._2, s"first doc must be fully novel: $first")
    // conservation: every distinct shingle is novel in exactly one doc
    val distinctShingles = Tables.documents(spark, sf())
      .select(explode(Dedup.shingles3(col("text"))).as("sh"))
      .distinct().count()
    assert(rows.map(_._3).sum === distinctShingles,
      "sum of per-doc novel counts must equal the distinct shingle count")
  }

  // ---------- hybrid RRF retrieval ----------

  test("hybrid RRF equals a driver-side fusion of the two arms' rankings") {
    val got = graft.SparkEntry.queries("q_search_hybrid_rrf")(spark, sf())
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        r.getLong(3)))
    // lexical arm ranking from the already-proven BM25 operator
    val lex = graft.queries.Search.bm25(
      Tables.documents(spark, sf()).select(col("doc_id"), col("text")),
      Seq("spark", "join", "stream", "vector", "agg"), k = 50)
      .select(col("doc_id"), col("score_micro")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (id, s) => (-s, id) }.map(_._1)
    // semantic arm recomputed driver-side
    val vecs = Tables.embeddings(spark, sf())
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val pv = vecs(0L)
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble; nb += b(i).toDouble * b(i).toDouble
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val sem = vecs.toSeq.map { case (id, v) => (id, math.floor(cos(pv, v) * 1e6).toLong) }
      .sortBy { case (id, c) => (-c, id) }.take(50).map(_._1)
    val rLex = lex.zipWithIndex.map { case (id, i) => id -> (i + 1L) }.toMap
    val rSem = sem.zipWithIndex.map { case (id, i) => id -> (i + 1L) }.toMap
    val expected = (rLex.keySet ++ rSem.keySet).toSeq.map { id =>
      val s = rLex.get(id).map(r => 1000000000L / (60 + r)).getOrElse(0L) +
        rSem.get(id).map(r => 1000000000L / (60 + r)).getOrElse(0L)
      (id, rLex.get(id), rSem.get(id), s)
    }.sortBy { case (id, _, _, s) => (-s, id) }.take(10)
    assert(got.toSeq === expected)
    // fusion sanity: a doc ranked by BOTH arms must outscore one ranked
    // only by the weaker arm at the same positions — implied by the sum
    // construction, so just pin that both arms actually contributed
    assert(got.exists(_._2.isDefined) && got.exists(_._3.isDefined),
      "both retrieval arms must contribute to the fused top-10")
  }

  // ---------- token-budget selection ----------

  test("budget selection equals the greedy prefix of the (quality desc, id) order") {
    val got = graft.SparkEntry.queries("q_sample_budget")(spark, sf())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // driver-side replay: score every doc, sort, take the prefix under budget
    val scored = Tables.documents(spark, sf())
      .select(col("doc_id"), col("text")).collect().map { r =>
        val toks = r.getString(1).split(" ", -1)
        val q =
          if (r.getString(1).trim.isEmpty || toks.length < 3) 0.0
          else {
            val uniq = toks.distinct
            (uniq.length.toDouble / toks.length) *
              (1.0 - uniq.count(graft.queries.Text.stopwords.contains).toDouble / toks.length)
          }
        (r.getLong(0), toks.length.toLong, math.floor(q * 1e4).toLong)
      }
    val expected = {
      var cum = 0L
      scored.sortBy { case (id, _, q) => (-q, id) }.flatMap { case (id, n, q) =>
        cum += n
        if (cum <= 10000L) Some((id, n, q, cum)) else None
      }
    }
    // the flatMap above keeps scanning after the budget trips; entries past
    // the first overflow must not re-enter even if a later small doc fits —
    // replicate the oracle exactly: prefix sums, keep rows with cum <= B
    assert(got.sortBy(_._1).toSeq === expected.sortBy(_._1).toSeq)
    assert(got.map(_._2).sum <= 10000L, "selected tokens must fit the budget")
    assert(got.nonEmpty)
  }
}
