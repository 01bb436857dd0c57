package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Dev tool (optimization round 18): writes the `plans/r18/` before/after
  * evidence for the queries this round's driver arms touched. "Before" is
  * the DISTRIBUTED chain (the operator at driverCap = 0 — the identical
  * plan the query produced before the arm landed, and still its over-cap
  * 100 TB path); "after" is the query as declared. Loop operators whose
  * cost was in build-time jobs (collect-per-round) rather than the result
  * plan are dumped all the same — the md calls those out explicitly.
  * Usage: scripts/run.sh graft.plans.PlanDumpR18 */
object PlanDumpR18 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val b = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
    graft.GraftSession.configs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def fmt(df: DataFrame): String =
      df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    def write(name: String, text: String): Unit = {
      val p = java.nio.file.Paths.get("plans", "r18", name + ".txt")
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p,
        text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"wrote plans/r18/$name.txt")
    }
    def query(q: String): DataFrame = graft.SparkEntry.queries(q)(spark, dir)
    def pair(q: String)(before: => DataFrame): Unit = {
      write(s"${q}_before", fmt(before))
      write(s"${q}_after", fmt(query(q)))
    }

    val li = graft.catalog.Tables.lineitem(spark, dir)
    val ord = graft.catalog.Tables.orders(spark, dir)

    pair("q_agg_percentiles")(
      graft.queries.Aggs.percentilesOf(li, Seq(0.25, 0.5, 0.75), driverCap = 0L))
    pair("q_agg_approx_quantile") {
      val exact = graft.queries.Aggs.percentilesOf(li, Seq(0.5), driverCap = 0L)
        .select(col("l_returnflag"), col("q").as("exact_p50"))
      val approx = li.groupBy(col("l_returnflag"))
        .agg(percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000))
          .as("approx"))
      exact.join(approx, "l_returnflag")
        .select(col("l_returnflag"), col("exact_p50"),
          (abs(col("approx") - col("exact_p50")) <=
            lit(0.01) * col("exact_p50")).as("approx_ok"))
        .orderBy(col("l_returnflag"))
    }
    pair("q_agg_weighted_median")(
      graft.queries.Aggs.weightedMedianDistributed(spark, li))
    pair("q_agg_gini")(
      graft.queries.Aggs.giniDistributed(spark, ord))
    pair("q_agg_quantile_rollup")(
      graft.operators.Freq.quantileRollupFrames(
        li.select(col("l_shipdate").cast("date").as("day"),
          floor(col("l_extendedprice") * 100).cast("long").as("v")),
        16384L, Seq(50, 90, 99)))
    pair("q_agg_kmv_intersect") {
      val m = li.select(col("l_orderkey"), col("l_partkey"))
        .join(broadcast(graft.catalog.Tables.part(spark, dir)
          .filter(col("p_brand").isin("Brand#11", "Brand#22"))
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .join(ord.select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("p_brand").as("st"), col("o_custkey").as("mem"))
      graft.queries.Aggs.kmvIntersectDistributed(spark, m)
    }

    pair("q_graph_betweenness_weighted") {
      val ed = graft.operators.Graph.sliceEdgesWeighted(spark, dir)
      val (sources, dist, _) =
        graft.operators.Graph.wdist107Shared(spark, dir, 3, driverCap = 0L)
      graft.operators.Graph.betweennessWeightedBounded(ed, sources, 3,
        distShared = Some(dist), driverCap = 0L)
        .orderBy(col("b_e4").desc, col("node")).limit(20)
    }
    pair("q_graph_harmonic_weighted") {
      val (_, dist, _) =
        graft.operators.Graph.wdist107Shared(spark, dir, 3, driverCap = 0L)
      graft.operators.Graph.harmonicFromWdist(dist, bucket = 100L)
        .orderBy(col("source"))
    }

    val slice = graft.catalog.Tables.documents(spark, dir)
      .filter(col("doc_id") < 300 && col("text").isNotNull)
    pair("q_dedup_containment")(
      graft.operators.Dedup.containmentVerify(slice,
        slice.select(col("doc_id").as("d1"))
          .join(slice.select(col("doc_id").as("d2")), col("d1") < col("d2")),
        5000L, driverCap = 0L).orderBy(col("d1"), col("d2")))
    pair("q_dedup_containment_scale")(
      graft.operators.Dedup.containmentVerify(slice,
        graft.operators.Dedup.containmentCandidates(slice, driverCap = 0L),
        5000L, driverCap = 0L).orderBy(col("d1"), col("d2")))

    val docs100 = graft.catalog.Tables.documents(spark, dir)
      .filter(col("doc_id") < 100)
    pair("q_vocab_bpe") {
      // the result plan is the same narrow fold either way — the before
      // cost was learnMerges' per-round collect/checkpoint JOBS, which a
      // result plan cannot show; dumped for the record
      val merges = graft.operators.Vocab.learnMerges(docs100, k = 10,
        driverCap = 0L)
      graft.operators.Vocab.tokenize(docs100, merges)
        .select(col("doc_id"), size(col("units")).as("n_units"),
          array_join(col("units"), "|").as("units_str"))
        .orderBy(col("doc_id"))
    }
    pair("q_vocab_unigram") {
      val words = docs100
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(col("w") =!= "")
        .groupBy(col("w")).agg(count(lit(1)).as("n"))
      graft.operators.Vocab.unigramFit(words, rounds = 2, driverCap = 0L)
        .orderBy(col("cnt").desc, col("piece")).limit(150)
    }

    pair("q_cluster_kmeans")(
      graft.operators.Ann.kmeansFrame(spark, dir, 8, 3, driverCap = 0L))
    pair("q_cluster_dbscan")(
      graft.operators.Cluster.dbscan(
        graft.catalog.Tables.embeddings(spark, dir), 0.3, 8, driverCap = 0L)
        .orderBy(col("vec_id")))

    // the pipeline's CHANGED SUBTREE: the near-dup pair frame (the full
    // query plan is dumped as _after only — its before differed solely
    // in this subtree)
    write("q_pipeline_curate_pairs_before", fmt(
      graft.operators.Dedup.minhashNearDups(
        graft.pipeline.TrainingData.withQuality(docs100.select(
          col("doc_id"), col("lang"), col("text")), 3)
          .filter(col("quality") >= 0.3), 0.8, driverCap = 0L)))
    write("q_pipeline_curate_pairs_after", fmt(
      graft.operators.Dedup.minhashNearDups(
        graft.pipeline.TrainingData.withQuality(docs100.select(
          col("doc_id"), col("lang"), col("text")), 3)
          .filter(col("quality") >= 0.3), 0.8)))
    write("q_pipeline_curate_after", fmt(query("q_pipeline_curate")))

    // arms re-landed on queries with existing r18 before files: refresh
    // the after side
    Seq("q_er_entities", "q_graph_harmonic", "q_tvf_dbscan", "q_tvf_kmeans",
      "q_tvf_silhouette").foreach { q =>
      write(s"${q}_after", fmt(query(q)))
    }
    spark.stop()
  }
}
