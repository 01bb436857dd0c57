package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.Sim

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Three tiers (SURVEY.md north star; q_sim_knn is the driver-checked
  * correctness baseline):
  *
  *   - bruteForceTopK: exact — O(probes × corpus), corpus scan fully
  *     parallel, probes broadcast, per-probe top-k via window rank. The
  *     baseline every approximate variant's recall is measured against.
  *   - lshTopK: random-hyperplane LSH — corpus bucketed by the sign
  *     pattern of `planes` projections; each probe only scores its own
  *     bucket. At 100 TB the bucket join replaces the full cross product;
  *     recall is tuned by plane count (fewer planes → bigger buckets) and
  *     multi-probe (probe neighbors' buckets too — future work).
  *   - ivfTopK: IVF-style coarse quantization — a centroid table (here:
  *     per-label mean, i.e. labels act as the coarse codebook) is
  *     broadcast; each probe searches only its nearest centroid's
  *     partition (nprobe=1).
  *
  * Hyperplanes are generated from a fixed seed so plans and tests are
  * deterministic.
  */
object Ann {

  /** Deterministic pseudo-random unit hyperplanes (seeded). */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Float]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(rnd.nextGaussian().toFloat))
  }

  /** Sign-pattern LSH bucket id of a vector column under `planes`. */
  def lshBucket(vec: Column, planes: Seq[Seq[Float]]): Column =
    concat(planes.map { p =>
      when(Sim.dot(vec, typedlit(p)) >= 0, "1").otherwise("0")
    }: _*)

  /** Exact brute-force top-k: probes × corpus, rank by cosine. */
  def bruteForceTopK(probes: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val p = probes.select(col("vec_id").as("probe_id"), col("embedding").as("pv"))
    val c = corpus.select(col("vec_id").as("cand_id"), col("embedding").as("cv"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos").desc, col("cand_id"))
    c.crossJoin(broadcast(p))
      .select(col("probe_id"), col("cand_id"),
        round(Sim.cosine(col("pv"), col("cv")), 6).as("cos"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .drop("rn")
  }

  /** LSH-bucketed top-k: candidates restricted to the probe's bucket. */
  def lshTopK(probes: DataFrame, corpus: DataFrame, k: Int,
      nPlanes: Int = 4, dim: Int = 64): DataFrame = {
    val planes = hyperplanes(nPlanes, dim)
    val p = probes.select(col("vec_id").as("probe_id"), col("embedding").as("pv"),
      lshBucket(col("embedding"), planes).as("pb"))
    val c = corpus.select(col("vec_id").as("cand_id"), col("embedding").as("cv"),
      lshBucket(col("embedding"), planes).as("cb"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos").desc, col("cand_id"))
    c.join(broadcast(p), col("cb") === col("pb"))
      .select(col("probe_id"), col("cand_id"),
        round(Sim.cosine(col("pv"), col("cv")), 6).as("cos"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .drop("rn")
  }

  /** Multi-probe LSH top-k: each probe also searches every bucket at
    * hamming distance 1 from its own (flip one sign bit) — the standard
    * recall boost that trades nPlanes+1 bucket lookups for not shrinking
    * buckets. Probe side explodes to its probe set (tiny); the corpus is
    * still touched only where buckets match. */
  def lshMultiProbeTopK(probes: DataFrame, corpus: DataFrame, k: Int,
      nPlanes: Int = 4, dim: Int = 64): DataFrame = {
    val planes = hyperplanes(nPlanes, dim)
    // probe set = own bucket ∪ one-bit flips, built from substring/when
    // composition (nPlanes is a plan-time constant) so the expansion stays
    // inside whole-stage codegen — no Scala UDF in the probe path.
    val base = lshBucket(col("embedding"), planes)
    def flipBit(i: Int): Column = concat(
      substring(base, 1, i),
      when(substring(base, i + 1, 1) === "1", "0").otherwise("1"),
      substring(base, i + 2, nPlanes - i - 1))
    val probeSet = array(base +: (0 until nPlanes).map(flipBit): _*)
    val p = probes.select(col("vec_id").as("probe_id"), col("embedding").as("pv"),
      explode(probeSet).as("pb"))
    val c = corpus.select(col("vec_id").as("cand_id"), col("embedding").as("cv"),
      lshBucket(col("embedding"), planes).as("cb"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos").desc, col("cand_id"))
    c.join(broadcast(p), col("cb") === col("pb"))
      .select(col("probe_id"), col("cand_id"),
        round(Sim.cosine(col("pv"), col("cv")), 6).as("cos"))
      .dropDuplicates("probe_id", "cand_id")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .drop("rn")
  }

  /** Nearest-centroid assignment WITHOUT a shuffle: the codebook unrolls
    * into one array-of-structs expression per row and `array_max` picks the
    * best (struct ordering compares cos first, centroid id as tie-break) —
    * fully narrow, fused with the scan, no crossJoin + window. This is why
    * the codebook lives driver-side as plain values: k centroids are
    * broadcast-scale by definition. Null cosines (zero vectors) rank below
    * every real score. */
  def assign(corpus: DataFrame, codebook: Seq[(Int, Seq[Float])]): DataFrame = {
    val scored = array(codebook.map { case (id, v) =>
      struct(
        coalesce(Sim.cosine(col("embedding"), typedlit(v)), lit(-2.0)).as("cos"),
        lit(id).as("cluster"))
    }: _*)
    corpus.withColumn("cluster", array_max(scored).getField("cluster"))
  }

  /** Deterministic Lloyd's k-means over the embedding column — the real
    * IVF codebook builder (the label-routed `centroids` below is the
    * degenerate case where labels are already a clustering). Each
    * iteration is ONE narrow assignment pass + ONE groupBy shuffle
    * (per-dimension means); centroids round-trip through the driver
    * because k·dim doubles is broadcast-sized. Init is deterministic
    * farthest-first traversal (the k-center heuristic): seed 1 is the
    * md5-min document, each next seed is the point least similar to every
    * chosen seed — k cheap narrow scans that avoid the
    * two-seeds-in-one-cluster local optimum of arbitrary init. Empty
    * clusters keep their previous centroid. */
  def kmeans(corpus: DataFrame, k: Int, iters: Int): Seq[(Int, Seq[Float])] = {
    val first = corpus.orderBy(md5(col("vec_id").cast("string")))
      .limit(1).select(col("embedding")).collect().head.getSeq[Float](0)
    var seeds = Seq(first)
    while (seeds.size < k) {
      val sims = seeds.map(s =>
        coalesce(Sim.cosine(col("embedding"), typedlit(s)), lit(-2.0)))
      val worst = if (sims.size == 1) sims.head else greatest(sims: _*)
      val next = corpus.withColumn("worst", worst)
        .orderBy(col("worst").asc, col("vec_id"))
        .limit(1).select(col("embedding")).collect().head.getSeq[Float](0)
      seeds :+= next
    }
    var codebook: Seq[(Int, Seq[Float])] = seeds.zipWithIndex.map(_.swap)
    (0 until iters).foreach { _ =>
      val means = assign(corpus, codebook)
        .select(col("cluster"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy(col("cluster"), col("pos"))
        .agg(avg(col("x")).as("m"))
        .groupBy(col("cluster"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cluster"),
          transform(col("pm"), e => e.getField("m").cast("float")).as("c"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Float](1)).toMap
      codebook = codebook.map { case (i, old) => i -> means.getOrElse(i, old) }
    }
    codebook
  }

  /** IVF nprobe=1 over an explicit k-means codebook: corpus and probes are
    * both routed by nearest centroid (narrow), candidates meet in an
    * equi-join on cluster id — the full ANN shape at scale: cluster count
    * bounds every probe's candidate set. */
  def ivfTopK(probes: DataFrame, corpus: DataFrame, k: Int,
      codebook: Seq[(Int, Seq[Float])]): DataFrame = {
    val c = assign(corpus, codebook)
      .select(col("vec_id").as("cand_id"), col("cluster"), col("embedding").as("cv"))
    val p = assign(probes, codebook)
      .select(col("vec_id").as("probe_id"), col("cluster"), col("embedding").as("pv"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos").desc, col("cand_id"))
    c.join(broadcast(p), Seq("cluster"))
      .select(col("probe_id"), col("cand_id"),
        round(Sim.cosine(col("pv"), col("cv")), 6).as("cos"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .drop("rn")
  }

  /** Per-label mean vectors — the coarse IVF codebook. */
  def centroids(corpus: DataFrame): DataFrame = {
    // mean per dimension: explode with position, average, re-assemble.
    corpus
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy(col("label"), col("pos"))
      .agg(avg(col("x")).as("m"))
      .groupBy(col("label"))
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("label"),
        transform(col("pm"), e => e.getField("m").cast("float")).as("centroid"))
  }

  /** IVF nprobe=1: route each probe to its nearest centroid's label
    * partition, then exact-rank within that partition only. */
  def ivfTopK(probes: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val cents = centroids(corpus)
    val p = probes.select(col("vec_id").as("probe_id"), col("embedding").as("pv"))
    // nearest centroid per probe (centroid table is tiny → broadcast).
    val wc = Window.partitionBy(col("probe_id"))
      .orderBy(col("ccos").desc, col("label"))
    val routed = p.crossJoin(broadcast(cents))
      .select(col("probe_id"), col("pv"), col("label"),
        Sim.cosine(col("pv"), col("centroid")).as("ccos"))
      .withColumn("rn", row_number().over(wc))
      .filter(col("rn") === 1)
      .select(col("probe_id"), col("pv"), col("label").as("route"))
    val c = corpus.select(col("vec_id").as("cand_id"), col("label"), col("embedding").as("cv"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos").desc, col("cand_id"))
    c.join(broadcast(routed), col("label") === col("route"))
      .select(col("probe_id"), col("cand_id"),
        round(Sim.cosine(col("pv"), col("cv")), 6).as("cos"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .drop("rn")
  }
}
