package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Dev tool (optimization round 19): writes the `plans/r19/` before/after
  * evidence for this round's touched queries. The `_before` files were
  * dumped from the round-18 tree before any change (committed with the
  * first batch); this tool refreshes the `_after` side and dumps the
  * structurally new shapes (delta-frontier wdist, the eps-pair ANN
  * route). Usage: scripts/run.sh graft.plans.PlanDumpR19 */
object PlanDumpR19 {
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
      val p = java.nio.file.Paths.get("plans", "r19", name + ".txt")
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p,
        text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"wrote plans/r19/$name.txt")
    }
    def query(q: String): DataFrame = graft.SparkEntry.queries(q)(spark, dir)

    // after-sides for queries whose _before was dumped from the r18 tree
    Seq("q_pipeline_curate", "q_search_bm25_arrival", "q_tvf_bm25",
      "q_ann_pq", "q_ann_ivfpq", "q_outlier_mad", "q_text_bigram_logprob",
      "q_tpch_q18", "q_tpch_q21").foreach { q =>
      write(s"${q}_after", fmt(query(q)))
    }
    // q_text_bpe_apply: per-occurrence fold (r18 shape) vs the
    // per-distinct-word join shape
    write("q_text_bpe_apply_before", fmt {
      val docs = graft.catalog.Tables.documents(spark, dir)
        .filter(col("text").isNotNull && length(trim(col("text"))) > 0)
      graft.operators.Vocab.tokenize(docs, graft.operators.Vocab.demoMerges)
        .select(col("doc_id"),
          size(col("units")).cast("long").as("n_units"),
          size(filter(col("units"), u => length(u) > 1)).cast("long")
            .as("n_merged"))
        .orderBy(col("doc_id"))
    })
    write("q_text_bpe_apply_after", fmt(query("q_text_bpe_apply")))
    write("q_agg_approx_distinct_after", fmt(query("q_agg_approx_distinct")))

    // the delta-frontier weighted Bellman (over-cap distributed loop):
    // dump the final dist state's plan at driverCap = 0 — the round-18
    // `_before` (full min-union re-aggregation of the whole state each
    // round) is plans/r18/q_graph_betweenness_weighted_before.txt
    val (_, dist, rel) =
      graft.operators.Graph.wdist107Shared(spark, dir, 3, driverCap = 0L)
    write("wdist107_delta_frontier_after", fmt(dist))
    rel()

    // the eps-pair generator's three tiers: exact BNLJ (mid tier,
    // every oracle-reachable SF) and the ANN candidate route (the
    // over-epsAnnCap 100 TB path)
    val embs = graft.catalog.Tables.embeddings(spark, dir)
    write("eps_pairs_exact_bnlj", fmt(
      graft.operators.Cluster.epsPairs(embs, 0.3, driverCap = 0L)))
    write("eps_pairs_ann_route", fmt(
      graft.operators.Cluster.epsPairsAnn(embs, 0.3)))
    spark.stop()
  }
}
