package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{BloomMightContain, CosineSim, DotProduct, JaccardSim, MinHashShingle3, MinHashSignature, SrpSignature}

/** Session extension registering graft's native functions
  * (`spark.sql.extensions=graft.plans.GraftExtensions`, set by
  * GraftSession.configs). Makes `graft_dot`/`graft_cosine` available to
  * both the DataFrame API (`call_function`) and plain SQL. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(clazz: Class[_], name: String, usage: String) =
    new ExpressionInfo(clazz.getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    // custom operator tier: merge-based as-of join (AsOfJoinPlan →
    // AsOfJoinExec) — see graft.plans.AsOf
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      info(classOf[DotProduct], "graft_dot", "graft_dot(a, b) - dot product of two float arrays in double."),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      info(classOf[CosineSim], "graft_cosine", "graft_cosine(a, b) - cosine similarity of two float arrays."),
      (children: Seq[Expression]) => CosineSim(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_jaccard"),
      info(classOf[JaccardSim], "graft_jaccard",
        "graft_jaccard(a, b) - Jaccard similarity of two distinct string arrays."),
      (children: Seq[Expression]) => JaccardSim(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_bloom_might_contain"),
      info(classOf[BloomMightContain], "graft_bloom_might_contain",
        "graft_bloom_might_contain(key, bloomBytes) - probe a serialized bloom filter."),
      (children: Seq[Expression]) => BloomMightContain(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash"),
      info(classOf[MinHashSignature], "graft_minhash",
        "graft_minhash(tokens, k) - all k MinHash components (min md5(token || '_s<i>')) in one pass."),
      (children: Seq[Expression]) => MinHashSignature(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash_sh3"),
      info(classOf[MinHashShingle3], "graft_minhash_sh3",
        "graft_minhash_sh3(tokens, k) - MinHash over rolling 3-gram shingles, no shingle materialization."),
      (children: Seq[Expression]) => MinHashShingle3(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_srp"),
      info(classOf[SrpSignature], "graft_srp",
        "graft_srp(vec, bands, bits) - banded sign-random-projection LSH buckets of a float array."),
      (children: Seq[Expression]) => SrpSignature(children(0), children(1), children(2))))
    // SQL TVF surface over the operator library (literal args → the
    // operator's analyzed plan, spliced like a named subquery)
    ext.injectTableFunction((
      FunctionIdentifier("graft_near_dups"),
      info(GraftTvf.getClass, "graft_near_dups",
        "graft_near_dups(dir, threshold) - MinHash-LSH verified near-dup pairs over dir's documents."),
      (children: Seq[Expression]) => GraftTvf.nearDups(children)))
    ext.injectTableFunction((
      FunctionIdentifier("graft_doc_chunks"),
      info(GraftTvf.getClass, "graft_doc_chunks",
        "graft_doc_chunks(dir, width, overlap) - overlapping token windows over dir's documents."),
      (children: Seq[Expression]) => GraftTvf.docChunks(children)))
    ext.injectTableFunction((
      FunctionIdentifier("graft_bm25"),
      info(GraftTvf.getClass, "graft_bm25",
        "graft_bm25(dir, query, k) - BM25 top-k docs for a space-separated query string."),
      (children: Seq[Expression]) => GraftTvf.bm25(children)))
    ext.injectTableFunction((
      FunctionIdentifier("graft_semantic_dedup"),
      info(GraftTvf.getClass, "graft_semantic_dedup",
        "graft_semantic_dedup(dir, threshold) - SemDeDup keep/prune verdicts over dir's embeddings."),
      (children: Seq[Expression]) => GraftTvf.semanticDedup(children)))
    ext.injectTableFunction((
      FunctionIdentifier("graft_kmeans"),
      info(GraftTvf.getClass, "graft_kmeans",
        "graft_kmeans(dir, k, iters) - Lloyd k-means cell summaries (cluster, n, centroid fingerprint) over dir's embeddings."),
      (children: Seq[Expression]) => GraftTvf.kmeansTvf(children)))
    ext.injectTableFunction((
      FunctionIdentifier("graft_dbscan"),
      info(GraftTvf.getClass, "graft_dbscan",
        "graft_dbscan(dir, eps, minPts) - per-vector DBSCAN verdicts (deg, core/border/noise role, cluster) over dir's embeddings."),
      (children: Seq[Expression]) => GraftTvf.dbscanTvf(children)))
    ext.injectTableFunction((
      FunctionIdentifier("graft_silhouette"),
      info(GraftTvf.getClass, "graft_silhouette",
        "graft_silhouette(dir) - per-vector silhouette (e4) over dir's embeddings under the learned Lloyd cells."),
      (children: Seq[Expression]) => GraftTvf.silhouetteTvf(children)))
    ext.injectTableFunction((
      FunctionIdentifier("graft_backtest"),
      info(GraftTvf.getClass, "graft_backtest",
        "graft_backtest(dir) - rolling-origin forecast evaluation (holt vs holtwinters vs seasonal-naive) over dir's events."),
      (children: Seq[Expression]) => GraftTvf.backtest(children)))
    ext.injectTableFunction((
      FunctionIdentifier("graft_pagerank"),
      info(GraftTvf.getClass, "graft_pagerank",
        "graft_pagerank(dir, iters) - full (node, rank) integer pagerank over dir's part-supplier graph."),
      (children: Seq[Expression]) => GraftTvf.pagerank(children)))
    ext.injectTableFunction((
      FunctionIdentifier("graft_communities"),
      info(GraftTvf.getClass, "graft_communities",
        "graft_communities(dir, rounds) - full (v, lbl) label-propagation assignment over dir's co-purchase graph."),
      (children: Seq[Expression]) => GraftTvf.communities(children)))
    ext.injectTableFunction((
      FunctionIdentifier("graft_ppr"),
      info(GraftTvf.getClass, "graft_ppr",
        "graft_ppr(dir, iters, seed...) - personalized pagerank from explicit seed node ids."),
      (children: Seq[Expression]) => GraftTvf.ppr(children)))
    ext.injectTableFunction((
      FunctionIdentifier("graft_sssp"),
      info(GraftTvf.getClass, "graft_sssp",
        "graft_sssp(dir, rounds, source...) - weighted shortest paths from explicit source node ids."),
      (children: Seq[Expression]) => GraftTvf.sssp(children)))
    ext.injectTableFunction((
      FunctionIdentifier("graft_dedup_clusters"),
      info(GraftTvf.getClass, "graft_dedup_clusters",
        "graft_dedup_clusters(dir, threshold) - near-dup cluster id + canonical-keeper verdict per document."),
      (children: Seq[Expression]) => GraftTvf.dedupClusters(children)))
    ext.injectTableFunction((
      FunctionIdentifier("graft_quantiles"),
      info(GraftTvf.getClass, "graft_quantiles",
        "graft_quantiles(store_dir, p...) - percentile reads off a persisted quantile-summary store."),
      (children: Seq[Expression]) => GraftTvf.quantiles(children)))
    ext.injectTableFunction((
      FunctionIdentifier("graft_ann_search"),
      info(GraftTvf.getClass, "graft_ann_search",
        "graft_ann_search(vec_dir, edge_dir, probe_id, k) - top-k neighbors of a stored vector in an incremental ANN store."),
      (children: Seq[Expression]) => GraftTvf.annSearch(children)))
    ext.injectTableFunction((
      FunctionIdentifier("graft_bm25_index"),
      info(GraftTvf.getClass, "graft_bm25_index",
        "graft_bm25_index(store_dir, query, k) - BM25 top-k served off a persisted arrival-built inverted index."),
      (children: Seq[Expression]) => GraftTvf.bm25Index(children)))
    ext.injectTableFunction((
      FunctionIdentifier("graft_distinct"),
      info(GraftTvf.getClass, "graft_distinct",
        "graft_distinct(store_dir) - per-day distinct estimates off a persisted arrival-built HLL store."),
      (children: Seq[Expression]) => GraftTvf.distinct(children)))
    ext.injectTableFunction((
      FunctionIdentifier("graft_ktruss"),
      info(GraftTvf.getClass, "graft_ktruss",
        "graft_ktruss(dir, k, rounds) - surviving (a, b, sup) edges of the k-truss peel over dir's co-purchase graph."),
      (children: Seq[Expression]) => GraftTvf.ktruss(children)))
    ext.injectTableFunction((
      FunctionIdentifier("graft_hyperball"),
      info(GraftTvf.getClass, "graft_hyperball",
        "graft_hyperball(dir, radius[, broadcast_state]) - full (node, bs) HyperBall neighborhood-function map over dir's co-purchase graph."),
      (children: Seq[Expression]) => GraftTvf.hyperball(children)))
    ext.injectTableFunction((
      FunctionIdentifier("graft_betweenness"),
      info(GraftTvf.getClass, "graft_betweenness",
        "graft_betweenness(dir, radius) - full (node, b_e4) sampled-Brandes brokerage map over dir's co-purchase graph."),
      (children: Seq[Expression]) => GraftTvf.betweenness(children)))
    ext.injectTableFunction((
      FunctionIdentifier("graft_pagerank_store"),
      info(GraftTvf.getClass, "graft_pagerank_store",
        "graft_pagerank_store(edge_dir, iters) - pagerank served off a persisted arrival-built edge store."),
      (children: Seq[Expression]) => GraftTvf.pagerankStore(children)))
    ext.injectTableFunction((
      FunctionIdentifier("graft_components_store"),
      info(GraftTvf.getClass, "graft_components_store",
        "graft_components_store(map_dir) - current node->component map off a persisted arrival-built components store."),
      (children: Seq[Expression]) => GraftTvf.componentsStore(children)))
    ext.injectTableFunction((
      FunctionIdentifier("graft_louvain"),
      info(GraftTvf.getClass, "graft_louvain",
        "graft_louvain(dir, rounds) - full (v, lbl) Louvain local-move community assignment over dir's co-purchase graph."),
      (children: Seq[Expression]) => GraftTvf.louvain(children)))
    ext.injectTableFunction((
      FunctionIdentifier("graft_entities"),
      info(GraftTvf.getClass, "graft_entities",
        "graft_entities(store_dir) - canonical entities served off a persisted arrival-built entity store."),
      (children: Seq[Expression]) => GraftTvf.entitiesStore(children)))
    ext.injectTableFunction((
      FunctionIdentifier("graft_topk"),
      info(GraftTvf.getClass, "graft_topk",
        "graft_topk(store_dir, m) - heavy hitters off a persisted arrival-built Misra-Gries store."),
      (children: Seq[Expression]) => GraftTvf.topk(children)))
  }
}
