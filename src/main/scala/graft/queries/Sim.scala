package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.catalog.Tables._

/** Similarity search over `embeddings` + multimodal join
  * (SURVEY.md §2B "LLM-data-pipeline extensions").
  *
  * Dot products and norms run through higher-order functions
  * (`zip_with`/`aggregate`) with element-wise double casts, so the fold is a
  * deterministic left-to-right double sum — bit-identical to the DuckDB
  * list_zip/list_transform/list_sum oracle algebra.
  *
  * Scale notes: brute-force kNN is O(probes × corpus) with the corpus scan
  * fully parallel and the per-row dot product codegen'd; the top-1 reduce is
  * a partial-aggregate min/max shuffle of one row per probe per partition.
  * The 100 TB scale path (LSH bucketing / IVF coarse quantization so each
  * probe touches a bucket, not the corpus) lives in graft.operators.Ann with
  * recall tests against this brute-force baseline.
  */
object Sim {

  /** Left-fold double dot product via higher-order functions — the
    * reference algebra the DuckDB oracle mirrors. Interpreted per element;
    * kept for the bit-equality spec against the native kernel. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** Dot product — native codegen'd kernel (graft.functions.DotProduct),
    * bit-identical to dotHof (same left-to-right double accumulation). */
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  /** Sum of squares (norm²) of a float-array column. */
  def norm2(v: Column): Column = dot(v, v)

  /** cosine(a, b) — single-pass native kernel (graft.functions.CosineSim),
    * bit-identical to dot/(√·√) in the HOF formulation. */
  def cosine(a: Column, b: Column): Column = call_function("graft_cosine", a, b)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // pairwise cosine over a bounded id set (190 pairs at every SF).
    "q_sim_cosine" -> ((s, dir) => {
      import s.implicits._
      val e = embeddings(s, dir).filter($"vec_id" < 20)
      val a = e.select($"vec_id".as("id_a"), $"embedding".as("va"))
      val b = e.select($"vec_id".as("id_b"), $"embedding".as("vb"))
      a.join(b, $"id_a" < $"id_b")
        .select($"id_a", $"id_b", round(cosine($"va", $"vb"), 4).as("cos"))
        .orderBy($"id_a", $"id_b")
    }),

    // brute-force top-1 neighbor per probe (the ANN correctness baseline).
    "q_sim_knn" -> ((s, dir) => {
      import s.implicits._
      val e = embeddings(s, dir)
      val probes = e.filter($"vec_id" < 5)
        .select($"vec_id".as("probe_id"), $"embedding".as("pv"))
      val corpus = e.filter($"vec_id" >= 5)
        .select($"vec_id".as("cand_id"), $"label", $"embedding".as("cv"))
      // probes broadcast: the corpus scan never shuffles for the product.
      val scored = corpus.crossJoin(broadcast(probes)).select(
        $"probe_id", $"cand_id", $"label",
        round(cosine($"pv", $"cv"), 4).as("cos"))
      val w = Window.partitionBy($"probe_id").orderBy($"cos".desc, $"cand_id")
      scored
        .select($"probe_id", $"cand_id", $"label", $"cos",
          row_number().over(w).as("rn"))
        .filter($"rn" === 1)
        .select($"probe_id", $"cand_id", $"label", $"cos")
        .orderBy($"probe_id")
    }),

    // Symmetric int8 quantization of the embedding column — the storage
    // operator a 100 TB vector corpus runs before indexing (4× smaller than
    // float32). scale = max|x|/127; q_i = floor(x_i/scale + 0.5) — the
    // explicit floor(+0.5) formula instead of round() because both engines
    // execute it with the SAME IEEE ops (round()'s tie-handling is
    // engine-specific); zero vectors quantize to zeros (the division guard
    // — ±Inf would throw on the ANSI bigint cast). Per-row narrow work;
    // only the int8 codes and one double shuffle onward.
    "q_embed_quantize" -> ((s, dir) => {
      import s.implicits._
      val absMax = array_max(transform($"embedding", x => abs(x.cast("double"))))
      embeddings(s, dir).filter($"vec_id" < 200)
        .select($"vec_id", (absMax / 127.0).as("scale"), $"embedding")
        .select($"vec_id", $"scale",
          array_join(
            transform($"embedding", x =>
              when($"scale" === 0.0, 0L)
                .otherwise(floor(x.cast("double") / $"scale" + 0.5).cast("long"))
                .cast("string")),
            ",").as("q8"))
        .orderBy($"vec_id")
    }),

    // multimodal: text metadata ⋈ vector column, filters on both modalities.
    "q_multimodal_join" -> ((s, dir) => {
      import s.implicits._
      documents(s, dir)
        .join(embeddings(s, dir), $"doc_id" === $"vec_id")
        .filter($"n_chars" > 100)
        .select($"doc_id", $"lang", $"n_chars", $"label",
          round(sqrt(norm2($"embedding")), 4).as("vnorm"))
        .filter($"vnorm" > 0.7)
        .orderBy($"doc_id")
    }),

    // Per-label centroid in tall (label, pos, mean) form — the oracle view
    // of Ann.centroids' per-dimension average (tall output sidesteps
    // array-of-double comparison; the wide re-assembly is Ann.centroids).
    // One posexplode + one hash agg: the explode inflation is absorbed by
    // map-side partial aggregation on (label, pos).
    "q_embed_centroid" -> ((s, dir) => {
      import s.implicits._
      embeddings(s, dir)
        .select($"label", posexplode($"embedding").as(Seq("pos", "x")))
        .groupBy($"label", $"pos")
        .agg(round(avg($"x"), 4).as("m"))
        .orderBy($"label", $"pos")
    }),

    // Sign-LSH candidate pairs: bucket every vector by the sign pattern of
    // its first 8 dimensions (8 axis-aligned random-hyperplane bits — the
    // deterministic, oracle-expressible instance of SRP-LSH), then verify
    // exact cosine ONLY within buckets. This is the embedding near-dup
    // scale path: the join is an equi-join on the bucket key (hash
    // partitioned, never all-pairs), candidate count ≈ n²/2^b per bucket
    // family, and recall against brute force is measured in
    // OperatorsSpec. At 100 TB the same plan holds — buckets shard across
    // executors and the exact-cosine verify touches only co-bucketed rows.
    "q_sim_bucket_pairs" -> ((s, dir) => {
      import s.implicits._
      val bucket = (0 until 8)
        .map(i => when(element_at($"embedding", i + 1) >= 0f, 1 << i).otherwise(0))
        .reduce(_ + _)
      val b = embeddings(s, dir).select($"vec_id", $"embedding", bucket.as("bucket"))
      val lhs = b.select($"bucket", $"vec_id".as("id_a"), $"embedding".as("va"))
      val rhs = b.select($"bucket", $"vec_id".as("id_b"), $"embedding".as("vb"))
      lhs.join(rhs, "bucket")
        .filter($"id_a" < $"id_b")
        .select($"id_a", $"id_b", round(cosine($"va", $"vb"), 4).as("cos"))
        .filter($"cos" >= 0.3)
        .orderBy($"id_a", $"id_b")
    })
  )

  private[queries] val dotSql =
    "list_sum(list_transform(list_zip(%s, %s), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))"
  private[queries] def normSql(v: String) =
    s"list_sum(list_transform($v, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"

  val oracle: Map[String, String] = Map(
    "q_sim_cosine" ->
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 20)
          SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                 round(${dotSql.format("a.embedding", "b.embedding")}
                       / (sqrt(${normSql("a.embedding")}) * sqrt(${normSql("b.embedding")})), 4) AS cos
          FROM e a JOIN e b ON a.vec_id < b.vec_id
          ORDER BY id_a, id_b""",

    "q_sim_knn" ->
      s"""WITH scored AS (
            SELECT p.vec_id AS probe_id, c.vec_id AS cand_id, c.label,
                   round(${dotSql.format("p.embedding", "c.embedding")}
                         / (sqrt(${normSql("p.embedding")}) * sqrt(${normSql("c.embedding")})), 4) AS cos
            FROM embeddings p, embeddings c
            WHERE p.vec_id < 5 AND c.vec_id >= 5),
          ranked AS (
            SELECT probe_id, cand_id, label, cos,
                   row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, cand_id) AS rn
            FROM scored)
          SELECT probe_id, cand_id, label, cos FROM ranked WHERE rn = 1
          ORDER BY probe_id""",

    "q_embed_quantize" ->
      """WITH e AS (
           SELECT vec_id, embedding,
                  list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
           FROM embeddings WHERE vec_id < 200)
         SELECT vec_id, scale,
                array_to_string(list_transform(embedding, x ->
                  CAST(CASE WHEN scale = 0.0 THEN 0
                       ELSE CAST(floor(CAST(x AS DOUBLE) / scale + 0.5) AS BIGINT) END AS VARCHAR)),
                  ',') AS q8
         FROM e
         ORDER BY vec_id""",

    // two unnests in one SELECT zip positionally in DuckDB (WITH
    // ORDINALITY is unsupported in this build)
    "q_embed_centroid" ->
      """SELECT label, CAST(pos AS INT) AS pos,
                round(avg(CAST(x AS DOUBLE)), 4) AS m
         FROM (SELECT label, unnest(embedding) AS x,
                      unnest(range(len(embedding))) AS pos
               FROM embeddings)
         GROUP BY 1, 2
         ORDER BY label, pos""",

    "q_multimodal_join" ->
      s"""SELECT doc_id, lang, n_chars, label,
                 round(sqrt(${normSql("embedding")}), 4) AS vnorm
          FROM documents JOIN embeddings ON doc_id = vec_id
          WHERE n_chars > 100
            AND round(sqrt(${normSql("embedding")}), 4) > 0.7
          ORDER BY doc_id""",

    "q_sim_bucket_pairs" ->
      s"""WITH b AS (
            SELECT vec_id, embedding,
                   (CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END)
                 + (CASE WHEN embedding[2] >= 0 THEN 2 ELSE 0 END)
                 + (CASE WHEN embedding[3] >= 0 THEN 4 ELSE 0 END)
                 + (CASE WHEN embedding[4] >= 0 THEN 8 ELSE 0 END)
                 + (CASE WHEN embedding[5] >= 0 THEN 16 ELSE 0 END)
                 + (CASE WHEN embedding[6] >= 0 THEN 32 ELSE 0 END)
                 + (CASE WHEN embedding[7] >= 0 THEN 64 ELSE 0 END)
                 + (CASE WHEN embedding[8] >= 0 THEN 128 ELSE 0 END) AS bucket
            FROM embeddings),
          pairs AS (
            SELECT a.vec_id AS id_a, b2.vec_id AS id_b,
                   round(${dotSql.format("a.embedding", "b2.embedding")}
                         / (sqrt(${normSql("a.embedding")}) * sqrt(${normSql("b2.embedding")})), 4) AS cos
            FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id)
          SELECT id_a, id_b, cos FROM pairs
          WHERE cos >= 0.3
          ORDER BY id_a, id_b"""
  )
}
