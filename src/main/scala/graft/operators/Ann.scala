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
