package graft.catalog

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SQL-surface tests: registered views + custom SQL incl. graft_* natives
  * and bronze blockchain tables (README.md:202-205 north star). */
class GraftCatalogSpec extends SparkSpec {

  test("registerAll exposes every testdata table to spark.sql") {
    GraftCatalog.registerAll(spark, sf())
    val r = spark.sql("""
      SELECT r_name, count(*) AS n
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name ORDER BY r_name""").collect()
    assert(r.length === 5)
    assert(r.map(_.getAs[Long]("n")).sum === 150L)
  }

  test("custom SQL can mix views with graft native functions") {
    GraftCatalog.registerAll(spark, sf())
    val r = spark.sql("""
      SELECT d.lang, round(avg(graft_cosine(e.embedding, e.embedding)), 4) AS c
      FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
      GROUP BY d.lang ORDER BY d.lang""").collect()
    assert(r.nonEmpty)
    assert(r.forall(_.getAs[Double]("c") === 1.0))
  }

  test("TVF surface: operators callable from plain SQL FROM clauses") {
    GraftCatalog.registerAll(spark, sf()) // `documents` view for the join below
    // same relations as the DataFrame API, spliced into SQL
    val viaSql = spark.sql(
      s"SELECT count(*) AS n FROM graft_near_dups('${sf()}', 0.5)")
      .collect()(0).getAs[Long]("n")
    val viaApi = graft.operators.Dedup
      .minhashNearDups(Tables.documents(spark, sf()), 0.5).count()
    assert(viaSql === viaApi)
    // TVF composes with ordinary SQL (join back to documents, aggregate)
    val chunks = spark.sql(s"""
      SELECT d.lang, count(*) AS n_chunks
      FROM graft_doc_chunks('${sf()}', 32, 8) c
      JOIN documents d ON c.doc_id = d.doc_id
      GROUP BY d.lang ORDER BY d.lang""").collect()
    assert(chunks.nonEmpty)
    val total = graft.operators.Pack
      .chunk(Tables.documents(spark, sf()), 32, 8).count()
    assert(chunks.map(_.getAs[Long]("n_chunks")).sum === total)
    // non-literal argument fails resolution with the contract message
    val err = intercept[Exception] {
      spark.sql("SELECT * FROM graft_near_dups(substr(rand()::string, 1), 0.5)").collect()
    }
    assert(err.getMessage.contains("literal") || err.getMessage.contains("resolve"))
  }

  test("TVF surface: bm25 and semantic dedup callable from plain SQL") {
    // parameterized BM25: arbitrary query string, arbitrary k — must agree
    // with the DataFrame operator on the same terms
    val viaSql = spark.sql(
      s"SELECT doc_id, score_micro FROM graft_bm25('${sf()}', 'spark table', 5)")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val viaApi = graft.queries.Search.bm25(
        Tables.documents(spark, sf()).select(col("doc_id"), col("text")),
        Seq("spark", "table"), 5)
      .select(col("doc_id"), col("score_micro"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(viaSql === viaApi && viaSql.size === 5)
    // semantic dedup verdicts compose with SQL aggregation
    val pruned = spark.sql(
      s"""SELECT count(*) AS n FROM graft_semantic_dedup('${sf()}', 0.3)
          WHERE pruned""").collect()(0).getAs[Long]("n")
    val prunedApi = graft.operators.Dedup.semanticDedup(
        Tables.embeddings(spark, sf())
          .select(col("vec_id"), col("label").as("cluster"), col("embedding")), 0.3)
      .filter(col("pruned")).count()
    assert(pruned === prunedApi)
  }

  test("TVF surface: graph tier (pagerank, communities) callable from plain SQL") {
    // full-map TVFs agree with the DataFrame operators row for row
    val prSql = spark.sql(
      s"SELECT node, rank FROM graft_pagerank('${sf()}', 3) ORDER BY node")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val prApi = graft.operators.Graph
      .pagerank(graft.operators.Graph.partSupplierEdges(spark, sf()), 3)
      .orderBy(col("node"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(prSql === prApi && prSql.nonEmpty)
    // communities compose with ordinary SQL (size rollup in the outer
    // query reproduces labelPropagate's top-k)
    val viaSql = spark.sql(s"""
      SELECT lbl, count(*) AS n_members
      FROM graft_communities('${sf()}', 3)
      GROUP BY lbl ORDER BY n_members DESC, lbl LIMIT 5""")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val viaApi = graft.operators.Graph
      .labelPropagate(graft.operators.Graph.jaccardSliceEdges(spark, sf()),
        rounds = 3, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(viaSql === viaApi)
    // louvain beside the LPA rule: the modularity-optimizing assignment
    // composes with the same size rollup
    val lvSql = spark.sql(s"""
      SELECT lbl, count(*) AS n_members
      FROM graft_louvain('${sf()}', 2)
      GROUP BY lbl ORDER BY n_members DESC, lbl LIMIT 5""")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val lvApi = graft.operators.Graph
      .louvainAssign(graft.operators.Graph.jaccardSliceEdges(spark, sf()),
        rounds = 2)
      .groupBy(col("lbl")).agg(count(org.apache.spark.sql.functions.lit(1)).as("n_members"))
      .orderBy(col("n_members").desc, col("lbl")).limit(5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(lvSql === lvApi && lvSql.nonEmpty)
  }

  test("TVF surface: graft_ppr and graft_sssp take explicit seed varargs from SQL") {
    import spark.implicits._
    // personalized pagerank: SQL with two explicit seeds ≡ the operator
    val prSql = spark.sql(
      s"SELECT node, rank FROM graft_ppr('${sf()}', 3, 2, 4) ORDER BY node")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val prApi = graft.operators.Graph.pagerankPersonalized(
        graft.operators.Graph.partSupplierEdges(spark, sf()),
        Seq(2L, 4L).toDF("node"), iters = 3)
      .orderBy(col("node"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(prSql === prApi && prSql.nonEmpty)
    // sssp composes with ordinary SQL (reachability count per distance band)
    val dSql = spark.sql(
      s"SELECT node, d FROM graft_sssp('${sf()}', 3, 0, 1) ORDER BY node")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val dApi = graft.operators.Graph.ssspWeighted(
        graft.operators.Graph.sliceEdgesWeighted(spark, sf()),
        Seq(0L, 1L).toDF("node"), rounds = 3)
      .orderBy(col("node"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(dSql === dApi && dSql.nonEmpty)
  }

  test("TVF surface: graft_ann_search reads a persisted incremental store from SQL") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("tvf_ann").toString
    val (vecDir, edgeDir) = (s"$tmp/vecs", s"$tmp/edges")
    val vecs = Tables.embeddings(spark, sf())
      .filter(col("vec_id") >= 5 && col("vec_id") < 300)
      .select(col("vec_id").as("cand_id"), col("embedding").as("cv"))
    graft.streaming.StreamOps.annIngestBatch(vecs, 0L, vecDir, edgeDir, 12)
    val got = spark.sql(
      s"SELECT cand_id, rn FROM graft_ann_search('$vecDir', '$edgeDir', 7, 3) ORDER BY rn")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(got.length === 3, s"expected 3 neighbors, got $got")
    assert(got.map(_._2) === Seq(1, 2, 3), "rn must be contiguous 1..k")
    assert(!got.map(_._1).contains(7L), "the probe must not return itself")
    // agrees with the DataFrame store search on the same probe
    val api = graft.streaming.StreamOps.annIncrementalSearch(
        vecs.filter(col("cand_id") === 7L)
          .select(col("cand_id").as("probe_id"), col("cv").as("pv")),
        vecDir, edgeDir, k = 4)
      .filter(col("cand_id") =!= 7L)
      .orderBy(col("rn")).limit(3)
      .collect().map(_.getLong(1)).toSeq
    assert(got.map(_._1) === api)
  }

  test("TVF surface: graft_dedup_clusters and graft_quantiles callable from plain SQL") {
    import spark.implicits._
    // clusters ≡ the DataFrame composition (pairs → components → labels)
    val viaSql = spark.sql(
      s"SELECT doc_id, cluster_id, is_canonical FROM graft_dedup_clusters('${sf()}', 0.5) ORDER BY doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    val docs = Tables.documents(spark, sf())
    val d = graft.operators.Dedup
    val pairs = d.minhashNearDups(docs, 0.5)
    val comp = graft.operators.Components.connectedComponents(
      pairs.select(col("d1").as("src"), col("d2").as("dst")))
    val viaApi = docs.select(col("doc_id"))
      .join(comp.select(col("id").as("doc_id"), col("component")),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("cluster_id"))
      .withColumn("is_canonical", col("doc_id") === col("cluster_id"))
      .orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(viaSql === viaApi && viaSql.nonEmpty)
    // every cluster has exactly one canonical keeper = its smallest member
    val keepers = viaSql.groupBy(_._2).map { case (c, rows) =>
      (c, rows.count(_._3), rows.map(_._1).min) }
    keepers.foreach { case (c, nCanon, minId) =>
      assert(nCanon === 1 && minId === c,
        s"cluster $c: $nCanon keepers, min member $minId") }
    // quantiles TVF ≡ the store-read operator on a persisted store
    val store = java.nio.file.Files.createTempDirectory("tvf_q").toString + "/store"
    val vals = Tables.lineitem(spark, sf()).select(
      col("l_shipdate").cast("date").as("day"),
      floor(col("l_extendedprice") * 100).cast("long").as("v"))
    graft.streaming.StreamOps.quantileSummaryBatch(vals, 0L, store, k = 64)
    val qSql = spark.sql(
      s"SELECT q_pct, n, r, est_v FROM graft_quantiles('$store', 25, 75) ORDER BY q_pct")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val qApi = graft.streaming.StreamOps
      .quantileStoreRead(spark, store, Seq(25, 75))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(qSql === qApi && qSql.size === 2)
    // out-of-range percentile fails the literal contract loudly
    val err = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_quantiles('$store', 0)").collect()
    }
    assert(err.getMessage.contains("[1, 100]") || err.getMessage.contains("resolve"))
  }

  test("TVF surface: graft_bm25_index serves the arrival store from plain SQL ≡ the API read") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("tvf_bm25").toString
    val idx = s"$tmp/index"
    val docs = Tables.documents(spark, sf()).select(col("doc_id"), col("text"))
    graft.streaming.StreamOps.bm25IngestBatch(
      docs.filter(col("doc_id") % 2 === 0), 0L, idx)
    graft.streaming.StreamOps.bm25IngestBatch(
      docs.filter(col("doc_id") % 2 === 1), 1L, idx)
    val viaSql = spark.sql(
      s"SELECT doc_id, n_terms, score, score_micro FROM graft_bm25_index('$idx', 'spark join stream vector agg', 10)")
      .collect().map(_.toSeq).toSeq
    val viaApi = graft.streaming.StreamOps
      .bm25StoreSearch(spark, idx, graft.queries.Search.queryTerms, 10)
      .collect().map(_.toSeq).toSeq
    assert(viaSql === viaApi && viaSql.nonEmpty)
    // ...and both equal the from-text batch build (the store law holds
    // through the SQL surface too)
    val viaBatch = graft.queries.Search
      .bm25(docs, graft.queries.Search.queryTerms, 10)
      .collect().map(_.toSeq).toSeq
    assert(viaSql === viaBatch)
  }

  test("TVF surface: graft_topk serves the MG store from plain SQL ≡ the API read") {
    import spark.implicits._
    val store = java.nio.file.Files.createTempDirectory("tvf_topk").toString + "/store"
    val items = Tables.lineitem(spark, sf())
      .select(col("l_quantity").cast("long").cast("string").as("item"))
    graft.streaming.StreamOps.topkSummaryBatch(items, 0L, store, k = 64)
    val viaSql = spark.sql(
      s"SELECT item, lb, n, max_err FROM graft_topk('$store', 7)")
      .collect().map(_.toSeq).toSeq
    val viaApi = graft.streaming.StreamOps.topkStoreRead(spark, store, 7)
      .collect().map(_.toSeq).toSeq
    assert(viaSql === viaApi && viaSql.size === 7)
    // ≤ 50 distinct quantities under k = 64 ⇒ the exact regime: counts
    // whole, zero error budget, n = the fact count
    val nFacts = Tables.lineitem(spark, sf()).count()
    viaSql.foreach { r =>
      assert(r(2) === nFacts && r(3) === 0L, s"exact regime violated: $r") }
    // bad arity fails the literal contract loudly
    val err = intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_topk('$store')").collect()
    }
    assert(err.getMessage.contains("2 arguments") || err.getMessage.contains("resolve"))
    // graft_distinct: SQL ≡ API over an arrival-built HLL store
    val dstore = java.nio.file.Files.createTempDirectory("tvf_hll").toString + "/store"
    val ev = graft.catalog.Tables.events(spark, sf()).select(
      col("ts").cast("timestamp").cast("date").as("day"),
      col("user_id").as("id"))
    graft.streaming.StreamOps.distinctSummaryBatch(ev, 0L, dstore, 14)
    val dSql = spark.sql(s"SELECT day, est FROM graft_distinct('$dstore')")
      .collect().map(_.toSeq).toSeq
    val dApi = graft.streaming.StreamOps.distinctStoreRead(spark, dstore)
      .collect().map(_.toSeq).toSeq
    assert(dSql === dApi && dSql.nonEmpty)
  }

  test("TVF surface: graft_betweenness splices the sampled-Brandes loop into SQL") {
    import org.apache.spark.sql.functions.col
    val viaSql = spark.sql(
      s"SELECT node, b_e4 FROM graft_betweenness('${sf()}', 3) ORDER BY b_e4 DESC, node LIMIT 20")
      .collect().map(_.toSeq).toSeq
    val ed = graft.operators.Graph.symmetrizedSliceEdges(spark, sf())
    val viaApi = graft.operators.Graph.betweennessBounded(
        ed, ed.select(col("src").as("s")).distinct().filter(col("s") % 53 === 0), 3)
      .orderBy(col("b_e4").desc, col("node")).limit(20)
      .collect().map(_.toSeq).toSeq
    assert(viaSql === viaApi && viaSql.nonEmpty)
  }

  test("TVF surface: graft_pagerank_store serves ranks off the edge store ≡ the API read") {
    import spark.implicits._
    val estore =
      java.nio.file.Files.createTempDirectory("tvf_edges").toString + "/store"
    graft.streaming.StreamOps.edgesIngestBatch(
      Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)).toDF("src", "dst"),
      0L, estore)
    graft.streaming.StreamOps.edgesIngestBatch(
      Seq((3L, 4L), (4L, 3L), (1L, 2L), (2L, 1L)).toDF("src", "dst"),
      1L, estore)
    val pSql = spark.sql(
      s"SELECT node, rank FROM graft_pagerank_store('$estore', 3) ORDER BY node")
      .collect().map(_.toSeq).toSeq
    val pApi = graft.streaming.StreamOps.pagerankStoreRead(spark, estore, 3)
      .orderBy(col("node")).collect().map(_.toSeq).toSeq
    assert(pSql === pApi && pSql.size === 4)
    // memo invalidation: a newly ingested batch bumps the store stamp,
    // so the TVF re-resolves instead of serving stale ranks
    graft.streaming.StreamOps.edgesIngestBatch(
      Seq((4L, 5L), (5L, 4L)).toDF("src", "dst"), 2L, estore)
    val n2 = spark.sql(
      s"SELECT count(*) AS n FROM graft_pagerank_store('$estore', 3)")
      .collect()(0).getLong(0)
    assert(n2 === 5L, "new batch must re-resolve the memoized plan")
  }

  test("TVF surface: graft_backtest splices the forecast evaluation into SQL ≡ the API frame") {
    val sql = spark.sql(
      s"SELECT * FROM graft_backtest('${sf()}') ORDER BY event_type")
      .collect().map(_.toSeq).toSeq
    val api = graft.queries.Timeseries.backtestFrame(spark, sf())
      .orderBy(col("event_type")).collect().map(_.toSeq).toSeq
    assert(sql === api && sql.nonEmpty,
      "graft_backtest must serve the exact q_timeseries_backtest frame")
  }

  test("TVF surface: graft_kmeans serves Lloyd cell summaries from plain SQL ≡ the API frame") {
    val sql = spark.sql(
      s"SELECT cluster, n, cent_fp FROM graft_kmeans('${sf()}', 8, 3) ORDER BY cluster")
      .collect().map(_.toSeq).toSeq
    val api = graft.operators.Ann.kmeansFrame(spark, sf(), 8, 3)
      .collect().map(_.toSeq).toSeq
    assert(sql === api && sql.size === 8,
      "graft_kmeans must serve the exact q_cluster_kmeans frame")
  }

  test("TVF surface: graft_dbscan serves per-vector density verdicts from plain SQL ≡ the API frame") {
    val sql = spark.sql(
      s"SELECT vec_id, deg, role, cluster FROM graft_dbscan('${sf()}', 0.3, 8) ORDER BY vec_id")
      .collect().map(_.toSeq).toSeq
    val api = graft.operators.Cluster.dbscan(
        graft.catalog.Tables.embeddings(spark, sf()), 0.3, 8)
      .orderBy(org.apache.spark.sql.functions.col("vec_id"))
      .collect().map(_.toSeq).toSeq
    assert(sql === api && sql.nonEmpty,
      "graft_dbscan must serve the exact q_cluster_dbscan frame")
  }

  test("TVF surface: graft_silhouette serves per-vector quality scores from plain SQL ≡ the API frame") {
    val sql = spark.sql(
      s"SELECT vec_id, cluster, s_e4 FROM graft_silhouette('${sf()}') ORDER BY vec_id")
      .collect().map(_.toSeq).toSeq
    val api = graft.operators.Ann.silhouetteFrame(spark, sf())
      .collect().map(_.toSeq).toSeq
    assert(sql === api && sql.nonEmpty,
      "graft_silhouette must serve the exact q_cluster_silhouette frame")
  }

  test("TVF surface: graft_entities serves canonical entities off the store ≡ the API read") {
    import spark.implicits._
    val estore =
      java.nio.file.Files.createTempDirectory("tvf_ents").toString + "/store"
    val part = graft.catalog.Tables.part(spark, sf())
      .select(col("p_partkey").cast("long").as("p_partkey"), col("p_name"),
        col("p_brand"), col("p_type"), col("p_size").cast("int").as("p_size"))
    graft.streaming.StreamOps.entitiesIngestBatch(
      part.filter(col("p_partkey") % 2 === 0), 0L, estore)
    graft.streaming.StreamOps.entitiesIngestBatch(
      part.filter(col("p_partkey") % 2 === 1), 1L, estore)
    val eSql = spark.sql(
      s"SELECT * FROM graft_entities('$estore') ORDER BY entity_id")
      .collect().map(_.toSeq).toSeq
    val eApi = graft.streaming.StreamOps.entitiesStoreRead(spark, estore)
      .orderBy(col("entity_id")).collect().map(_.toSeq).toSeq
    assert(eSql === eApi && eSql.nonEmpty)
    // memo invalidation: a new batch bumps the store stamp — a record of
    // an existing canonical name must fold into its entity's count
    val total1 = eSql.map(_.last.asInstanceOf[Long]).sum
    val canonName = eSql.head(2).asInstanceOf[String]
    graft.streaming.StreamOps.entitiesIngestBatch(
      part.filter(col("p_name") === canonName).orderBy(col("p_partkey"))
        .limit(1).withColumn("p_partkey", lit(0L)),
      2L, estore)
    val total2 = spark.sql(
      s"SELECT sum(n_parts_total) AS t FROM graft_entities('$estore')")
      .collect()(0).getLong(0)
    assert(total2 === total1 + 1, "new batch must re-resolve the memoized plan")
  }

  test("TVF surface: graft_ktruss and graft_hyperball splice the eager graph loops into SQL") {
    import spark.implicits._
    val viaSql = spark.sql(
      s"SELECT a, b, sup FROM graft_ktruss('${sf()}', 4, 2) ORDER BY a, b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val viaApi = graft.operators.Graph
      .ktrussPeel(graft.operators.Graph.jaccardSliceEdges(spark, sf()), 4, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(viaSql === viaApi && viaSql.nonEmpty)
    // hyperball: SQL arithmetic over the bs array reproduces monotone
    // ball growth, and b0 = 1 for every node
    val hb = spark.sql(
      s"""SELECT count(*) AS n,
                 sum(CASE WHEN bs[0] = 1 THEN 1 ELSE 0 END) AS b0_ones,
                 sum(CASE WHEN bs[1] >= bs[0] AND bs[2] >= bs[1] THEN 1 ELSE 0 END) AS mono
          FROM graft_hyperball('${sf()}', 2)""").collect()(0)
    assert(hb.getLong(0) > 0 && hb.getLong(1) === hb.getLong(0) &&
      hb.getLong(2) === hb.getLong(0), s"got $hb")
  }

  test("bronze blockchain tables queryable by SQL after ingest") {
    val raw = spark.read.text(getClass.getResource("/blocks/blocks.jsonl").getPath)
    val out = java.nio.file.Files.createTempDirectory("bronze_sql").toString
    graft.ingest.BlockIngest.writeBronze(graft.ingest.BlockIngest.parse(raw), out)
    GraftCatalog.registerBronze(spark, out)
    val r = spark.sql("""
      SELECT b.block_number, b.tx_count, count(t.tx_hash) AS n_tx
      FROM blocks b LEFT JOIN transactions t
        ON b.block_number = t.block_number AND b.chain_name = t.chain_name
      GROUP BY b.block_number, b.tx_count
      ORDER BY b.block_number""").collect()
    assert(r.nonEmpty)
    // tx_count metadata agrees with the exploded child table for canonical
    // blocks (reorg winner at height 100 has 1 tx)
    r.foreach { row =>
      assert(row.getAs[Long]("tx_count") === row.getAs[Long]("n_tx"))
    }
  }
}
