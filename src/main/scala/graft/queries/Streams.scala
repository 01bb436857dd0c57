package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.Tables._
import graft.util.D._

/** Streaming analytics in batch-oracle form (SURVEY.md §2B "Streaming").
  * The same `window`/`session_window`/`dropDuplicates` operators run
  * unchanged under `readStream`; graft.streaming.StreamOps + the MemoryStream
  * specs cover the streaming-only semantics (watermarks, late data,
  * append-mode emission) that have no batch oracle.
  *
  * Reference analogs: the realtime block feed
  * (`/root/reference/src/blockchain/evm_adapter.rs:68-84`) for the tumbling
  * feed, Earliest-replay at-least-once delivery
  * (`/root/reference/src/streams/message_queue/pulsar.rs:28-32`) +
  * UNIQUE constraints for streaming dedup.
  *
  * Scale notes: time-windowed aggregation shuffles on (window, key) with
  * partial aggregation; session windows shuffle on user key and merge
  * per-key sorted runs. State at 100 TB is bounded by watermarking (see
  * streaming module); the batch forms here are plain hash aggregates.
  */
object Streams {

  /** A persisted 3-batch quantile-summary store built from lineitem cent
    * prices per ship-day (batch = l_orderkey % 3 — the same day recurs
    * across batches, so the merged read exercises the cross-batch tie
    * discipline). Built ONCE per (dir, mtime) through the REAL arrival
    * body (StreamOps.quantileSummaryBatch) into a
    * [[graft.util.FixtureCache]] staging publish; q_tvf_quantiles then
    * reads it through the SQL TVF surface. */
  private[queries] def quantileStoreFixture(s: SparkSession, dir: String): String = {
    val out = graft.util.FixtureCache.buildOnce(dir, "lineitem", "qstore") {
      staging =>
        val vals = lineitem(s, dir).select(
          (col("l_orderkey") % 3).as("b"),
          col("l_shipdate").cast("date").as("day"),
          floor(col("l_extendedprice") * 100).cast("long").as("v"))
        for (b <- 0L to 2L)
          graft.streaming.StreamOps.quantileSummaryBatch(
            vals.filter(col("b") === b).select(col("day"), col("v")),
            b, staging.resolve("store").toString, k = 64)
    }
    s"$out/store"
  }

  /** A persisted 3-batch Misra–Gries heavy-hitter store built from
    * lineitem quantities (batch = l_orderkey % 3; item = the integer
    * quantity — ≤ 50 distinct values, so k = 64 keeps every batch in
    * the EXACT regime: dec = 0, counts whole, max_err = 0 — which is
    * what lets DuckDB recompute the answer from facts; the lossy
    * regime's guarantee is StreamOpsSpec/probe territory). Built ONCE
    * per (dir, mtime) through the REAL arrival body
    * (StreamOps.topkSummaryBatch) into a FixtureCache staging publish. */
  private[queries] def topkStoreFixture(s: SparkSession, dir: String): String = {
    val out = graft.util.FixtureCache.buildOnce(dir, "lineitem", "topkstore3") {
      staging =>
        val vals = lineitem(s, dir).select(
          (col("l_orderkey") % 3).as("b"),
          col("l_quantity").cast("long").cast("string").as("item"))
        for (b <- 0L to 2L)
          graft.streaming.StreamOps.topkSummaryBatch(
            vals.filter(col("b") === b).select(col("item")),
            b, staging.resolve("store").toString, k = 64)
    }
    s"$out/store"
  }

  /** A persisted 3-batch ENTITY store built from the part dim
    * (batch = p_partkey % 3) through the REAL arrival ingest body —
    * [[topkStoreFixture]]'s ER sibling. Representatives and counts must
    * fold across the three batches for the read to equal the batch
    * recompute. */
  private[queries] def entitiesStoreFixture(s: SparkSession, dir: String): String = {
    val out = graft.util.FixtureCache.buildOnce(dir, "part", "entstore3") {
      staging =>
        val p = graft.catalog.Tables.part(s, dir).select(
          col("p_partkey").cast("long").as("p_partkey"), col("p_name"),
          col("p_brand"), col("p_type"), col("p_size").cast("int").as("p_size"))
        for (b <- 0L to 2L)
          graft.streaming.StreamOps.entitiesIngestBatch(
            p.filter(col("p_partkey") % 3 === b), b,
            staging.resolve("store").toString)
    }
    s"$out/store"
  }

  /** A persisted 3-batch EDGE store over the part↔supplier graph
    * (batches split the distinct pair set by l_partkey % 3, each
    * symmetrized; batch 1 additionally REPLAYS a slice of batch 0's
    * edges so the read's distinct union is load-bearing) — built once
    * through the REAL edgesIngestBatch body. */
  private[queries] def edgesStoreFixture(s: SparkSession, dir: String): String = {
    val out = graft.util.FixtureCache.buildOnce(dir, "lineitem", "prstore3") {
      staging =>
        val pairs = lineitem(s, dir)
          .select((col("l_partkey") * 2).as("src"),
            (col("l_suppkey") * 2 + 1).as("dst"),
            (col("l_partkey") % 3).as("b"))
          .distinct()
        def sym(df: org.apache.spark.sql.DataFrame) =
          df.select(col("src"), col("dst"))
            .union(df.select(col("dst").as("src"), col("src").as("dst")))
        for (b <- 0L to 2L) {
          val batch =
            if (b == 1L)
              sym(pairs.filter(col("b") === 1L))
                .union(sym(pairs.filter(col("b") === 0L && col("src") % 5 === 0)))
            else sym(pairs.filter(col("b") === b))
          graft.streaming.StreamOps.edgesIngestBatch(
            batch, b, staging.resolve("store").toString)
        }
    }
    s"$out/store"
  }

  /** A persisted 3-batch COMPONENTS store over q_graph_components'
    * repeat-co-purchase graph (edges split by a % 3 — components span
    * batches, so the incremental merge/relabel path is load-bearing) —
    * built once through the REAL componentsBatch body. */
  private[queries] def componentsStoreFixture(s: SparkSession, dir: String): String = {
    val out = graft.util.FixtureCache.buildOnce(dir, "lineitem", "ccstore3") {
      staging =>
        // the SAME graph q_graph_components' oracle walks — the shared
        // builder, referenced not copied (advice r17 #1)
        val pairs = graft.operators.Graph.coPurchasePairCounts(s, dir)
          .filter(col("c") >= 2)
          .localCheckpoint()
        for (b <- 0L to 2L)
          graft.streaming.StreamOps.componentsBatch(
            pairs.filter(col("a") % 3 === b)
              .select(col("a").as("src"), col("b").as("dst")),
            b, staging.resolve("map").toString,
            staging.resolve("edges").toString)
        graft.util.Frames.releaseCheckpoint(pairs)
    }
    s"$out/map"
  }

  /** A persisted 3-batch HLL distinct store built from events
    * (day = event date, id = user_id, batch = event_id % 3 — every day
    * recurs across batches, so the union read exercises cross-batch
    * sketch merging). Built ONCE per (dir, mtime) through the REAL
    * arrival body into a FixtureCache staging publish. */
  private[queries] def distinctStoreFixture(s: SparkSession, dir: String): String = {
    val out = graft.util.FixtureCache.buildOnce(dir, "events", "dstore") {
      staging =>
        val vals = events(s, dir).select(
          (col("event_id") % 3).as("b"),
          col("ts").cast("timestamp").cast("date").as("day"),
          col("user_id").as("id"))
        for (b <- 0L to 2L)
          graft.streaming.StreamOps.distinctSummaryBatch(
            vals.filter(col("b") === b).select(col("day"), col("id")),
            b, staging.resolve("store").toString, lgK = 14)
    }
    s"$out/store"
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // The HLL-store SQL surface oracle-checked end to end
    // (q_tvf_quantiles/q_tvf_topk's distinct-count sibling): per-day
    // distinct users off the persisted 3-batch HLL store through
    // spark.sql text alone, anchored against the exact per-day distinct
    // recomputed from facts (the q_agg_approx_distinct tolerance
    // pattern: at lgK 14 the 5% bound is ~6 sigma — and the union read
    // is register-max, so the store answer equals the from-scratch
    // sketch exactly).
    "q_tvf_distinct" -> ((s, dir) => {
      import s.implicits._
      val store = distinctStoreFixture(s, dir)
      val est = s.sql(s"SELECT day, est FROM graft_distinct('$store')")
      val exact = events(s, dir)
        .groupBy($"ts".cast("timestamp").cast("date").as("day"))
        .agg(countDistinct($"user_id").as("exact_users"))
      exact.join(est, Seq("day"))
        .select($"day", $"exact_users",
          (abs($"est" - $"exact_users") <=
            greatest(lit(2L), expr("exact_users div 20"))).as("approx_ok"))
        .orderBy($"day")
    }),

    // The MG-store SQL surface oracle-checked end to end
    // (q_tvf_quantiles's frequency-tier sibling): top-10 quantities off
    // the persisted 3-batch Misra–Gries store through spark.sql TEXT
    // alone. The TVF read is summary-sized (count addition over ≤ k
    // rows per batch), never a fact scan; the fixture domain keeps
    // every batch exact (dec = 0), so the oracle recomputes the same
    // counts from lineitem and asserts the error budget is zero.
    "q_tvf_topk" -> ((s, dir) => {
      val store = topkStoreFixture(s, dir)
      s.sql(s"SELECT item, lb, n, max_err FROM graft_topk('$store', 10) " +
        "ORDER BY lb DESC, item")
    }),

    // The components-store SQL surface oracle-checked end to end: the
    // current node→component map off the persisted 3-batch incremental
    // store (components SPAN batches, so the affected-sized
    // merge/relabel path produced the stored labels) through spark.sql
    // TEXT alone. Incremental ≡ full recompute is the StreamOpsSpec
    // law, so the oracle is q_graph_components' recursive min-label
    // closure VERBATIM — same graph, referenced not copied.
    "q_tvf_components_store" -> ((s, dir) => {
      val store = componentsStoreFixture(s, dir)
      s.sql(s"SELECT node, component FROM graft_components_store('$store') " +
        "ORDER BY node")
    }),

    // The edge-store rank read oracle-checked end to end: PageRank off
    // the persisted 3-batch edge store (with a replayed overlap slice —
    // the distinct-union read must not double-count) through spark.sql
    // TEXT alone. The deduped union IS partSupplierEdges' pair set, so
    // the oracle is the q_graph_pagerank recurrence unrolled over that
    // set, read as the full (node, rank) map.
    "q_tvf_pagerank_store" -> ((s, dir) => {
      val store = edgesStoreFixture(s, dir)
      s.sql(s"SELECT node, rank FROM graft_pagerank_store('$store', 3) " +
        "ORDER BY node")
    }),

    // The entity-store SQL surface oracle-checked end to end (the
    // q_tvf_topk pattern): canonical entities off the persisted 3-batch
    // arrival store through spark.sql TEXT alone. The store read IS the
    // batch q_er_entities recompute (the StreamOpsSpec law: folded
    // summaries + the shared blocking→scoring→closure→survivorship), so
    // the oracle is q_er_entities' closure + survivorship SQL VERBATIM
    // — one definition checks the batch query and the store surface.
    "q_tvf_entities" -> ((s, dir) => {
      val store = entitiesStoreFixture(s, dir)
      s.sql(s"SELECT * FROM graft_entities('$store') ORDER BY entity_id")
    }),

    // The sketch-store SQL surface oracle-checked end to end (the
    // q_tvf_communities pattern): p50/90/99 off the persisted 3-batch
    // MRL summary store through spark.sql TEXT alone — the
    // analyst-without-Scala path to the arrival stores. The TVF read is
    // sketch-sized (merged weighted-rank pass over ≤ D·(k+1) rows per
    // batch), never a fact scan; the oracle REBUILDS the same per-
    // (batch, day) block-compaction summaries from lineitem in SQL and
    // reads the same merged rank — value-at-rank determinism holds
    // through ties because tied rows share v (the quantileMergedRead
    // ROWS-frame discipline).
    "q_tvf_quantiles" -> ((s, dir) => {
      val store = quantileStoreFixture(s, dir)
      s.sql(s"SELECT q_pct, n, r, est_v FROM graft_quantiles('$store', 50, 90, 99) ORDER BY q_pct")
    }),

    // The clustering-tier SQL surface (round 18): Lloyd k-means cell
    // summaries through spark.sql TEXT alone, at the checked constants
    // (k=8, iters=3) so the TVF serves q_cluster_kmeans's exact frame
    // (one shared builder — referenced, not copied) and the batch
    // query's unrolled-CTE oracle is this surface's oracle.
    "q_tvf_kmeans" -> ((s, dir) =>
      s.sql(s"SELECT cluster, n, cent_fp FROM graft_kmeans('$dir', 8, 3) " +
        "ORDER BY cluster")),

    // The density-clustering SQL surface (round 18, q_tvf_kmeans's
    // sibling): per-vector DBSCAN verdicts through spark.sql TEXT alone
    // at the checked constants (eps 0.3, minPts 8) — one shared
    // Cluster.dbscan builder, so the batch query's eps-graph + closure
    // oracle is this surface's oracle.
    "q_tvf_dbscan" -> ((s, dir) =>
      s.sql(s"SELECT vec_id, deg, role, cluster " +
        s"FROM graft_dbscan('$dir', 0.3, 8) ORDER BY vec_id")),

    // The clustering-quality SQL surface (round 18, completing the
    // tier's TVF trio): per-vector silhouette through spark.sql TEXT
    // alone — one shared Ann.silhouetteFrame builder, so the batch
    // query's kmeans-CTE oracle is this surface's oracle.
    "q_tvf_silhouette" -> ((s, dir) =>
      s.sql(s"SELECT vec_id, cluster, s_e4 FROM graft_silhouette('$dir') " +
        "ORDER BY vec_id")),

    // The time-series SQL surface (round 18 — every other family had a
    // TVF member; none of the 16 timeseries queries was reachable from
    // SQL text): rolling-origin forecast evaluation through spark.sql
    // TEXT alone. The TVF splices q_timeseries_backtest's exact frame
    // (one shared builder — referenced, not copied), so the batch
    // query's oracle IS this surface's oracle.
    "q_tvf_backtest" -> ((s, dir) =>
      s.sql(s"SELECT * FROM graft_backtest('$dir') ORDER BY event_type")),

    // 1h tumbling count/sum per event_type.
    "q_stream_tumbling" -> ((s, dir) => {
      import s.implicits._
      events(s, dir)
        .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
        .agg(count(lit(1)).as("n"), r4(sum(dec4($"value"))).as("sum_value"))
        .select($"w.start".as("ws"), $"w.end".as("we"), $"event_type", $"n", $"sum_value")
        .orderBy($"ws", $"event_type")
    }),

    // 1h window / 30m slide: each event lands in exactly 2 windows.
    "q_stream_sliding" -> ((s, dir) => {
      import s.implicits._
      events(s, dir)
        .groupBy(window($"ts", "1 hour", "30 minutes").as("w"), $"event_type")
        .agg(count(lit(1)).as("n"))
        .select($"w.start".as("ws"), $"w.end".as("we"), $"event_type", $"n")
        .orderBy($"ws", $"event_type")
    }),

    // 30m-gap sessions per user: event count and [min, max] span.
    "q_stream_session" -> ((s, dir) => {
      import s.implicits._
      events(s, dir)
        .groupBy(session_window($"ts", "30 minutes").as("w"), $"user_id")
        .agg(count(lit(1)).as("n"),
          min($"ts").as("first_ts"), max($"ts").as("last_ts"))
        .select($"user_id", $"first_ts", $"last_ts", $"n")
        .orderBy($"user_id", $"first_ts")
    }),

    // exactly-once by event_id after duplicate injection (at-least-once
    // replay analog); full rows are identical so the kept row is
    // deterministic.
    "q_stream_dedup" -> ((s, dir) => {
      import s.implicits._
      val e = events(s, dir).select($"event_id", $"ts", $"user_id", $"event_type")
      e.unionAll(e)
        .dropDuplicates("event_id")
        .orderBy($"event_id")
    }),

    // Late-data accounting, batch-oracle form: each event gets a
    // deterministic synthetic ARRIVAL time (ts + (event_id mod 7) hours —
    // out-of-orderness without rand()), and an event is DROPPED when it
    // arrives more than the 2h allowed lateness after its 1h event-time
    // window closed — the decision Structured Streaming's watermark makes
    // (the real withWatermark mechanism is MemoryStream-tested in
    // StreamOpsSpec; this query is the replay-auditable batch form that
    // quantifies the drop). All integer µs arithmetic; one (window) hash
    // agg — embarrassingly parallel, no global arrival-order scan.
    "q_stream_late" -> ((s, dir) => {
      import s.implicits._
      val hourUs = 3600L * 1000000L
      events(s, dir)
        .select($"event_id", unix_micros($"ts".cast("timestamp")).as("ts_us"))
        .withColumn("arr_us", $"ts_us" + ($"event_id" % 7) * hourUs)
        .withColumn("ws_us", ($"ts_us" - pmod($"ts_us", lit(hourUs))).as("ws_us"))
        .withColumn("late",
          when($"arr_us" > $"ws_us" + hourUs + lit(2L * hourUs), 1L).otherwise(0L))
        .groupBy($"ws_us")
        .agg(count(lit(1)).as("n_all"),
          sum(lit(1L) - $"late").as("n_ontime"),
          sum($"late").as("n_late"))
        .orderBy($"ws_us")
    }),

    // Stream-stream interval join, batch-oracle form: purchases matched to
    // the same user's signups within the preceding hour — the EXACT join
    // predicate of StreamOps.purchaseSignupJoin (whose streaming semantics
    // — watermark-bounded state, append emission — StreamOpsSpec covers on
    // MemoryStream). The range conjunct beside the user equi-key is what
    // bounds streaming state at 100 TB: each side buffers only rows inside
    // the watermark+window horizon, and the batch plan is a plain equi-join
    // on user with the interval as residual — never a time-cross-product.
    "q_stream_join" -> ((s, dir) => {
      import s.implicits._
      val e = events(s, dir)
      val p = e.filter($"event_type" === "purchase")
        .select($"event_id".as("purchase_id"), $"user_id", $"ts".as("p_ts"))
      val sg = e.filter($"event_type" === "signup")
        .select($"user_id".as("s_user"), $"ts".as("s_ts"))
      p.join(sg,
          $"user_id" === $"s_user" &&
            $"s_ts" <= $"p_ts" &&
            $"s_ts" >= $"p_ts" - expr("INTERVAL 1 HOUR"))
        .select($"purchase_id", $"user_id", $"p_ts", $"s_ts")
        .orderBy($"purchase_id", $"s_ts")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_tvf_distinct" ->
      """SELECT CAST(ts AS DATE) AS day,
                count(DISTINCT user_id) AS exact_users,
                TRUE AS approx_ok
         FROM events
         GROUP BY 1
         ORDER BY day""",

    // the fixture keeps every batch in the exact MG regime (50 distinct
    // quantities ≤ k = 64 ⇒ dec = 0 per batch), so per-item counts are
    // whole, n is the fact count and the error budget is literally zero
    "q_tvf_topk" ->
      """SELECT CAST(CAST(l_quantity AS BIGINT) AS VARCHAR) AS item,
                CAST(count(*) AS BIGINT) AS lb,
                (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS n,
                CAST(0 AS BIGINT) AS max_err
         FROM lineitem
         GROUP BY 1
         ORDER BY lb DESC, item
         LIMIT 10""",

    // the store read ≡ the batch recompute, so the batch query's oracle
    // IS this surface's oracle — referenced, not copied
    "q_tvf_entities" -> graft.operators.Dedup.oracle("q_er_entities"),

    // the TVF splices the same frame the batch query builds, so the
    // batch oracle is this surface's oracle — referenced, not copied
    "q_tvf_backtest" -> graft.queries.Timeseries.oracle("q_timeseries_backtest"),

    // same-frame-by-construction: the TVF runs kmeansFrame at the
    // checked constants, so the unrolled-fixpoint oracle is shared
    "q_tvf_kmeans" -> graft.operators.Ann.oracle("q_cluster_kmeans"),

    // same-frame-by-construction: the TVF runs Cluster.dbscan at the
    // checked constants, so the eps-graph + closure oracle is shared
    "q_tvf_dbscan" -> graft.operators.Cluster.oracle("q_cluster_dbscan"),

    // same-frame-by-construction: the TVF runs silhouetteFrame at the
    // checked codebook constants, so the kmeans-CTE oracle is shared
    "q_tvf_silhouette" -> graft.operators.Ann.oracle("q_cluster_silhouette"),

    // incremental ≡ full recompute, so the batch query's closure IS
    // this surface's oracle — referenced, not copied
    "q_tvf_components_store" -> graft.operators.Graph.oracle("q_graph_components"),

    // the q_graph_pagerank recurrence (same constants: mass 1e12,
    // bias-free integer damping) unrolled over the store's deduped
    // union — which is exactly the distinct part↔supplier pair set
    "q_tvf_pagerank_store" -> {
      val rounds = (1 to 3).map { i =>
        s"""r$i AS MATERIALIZED (
           |  SELECT d.src AS node,
           |         ((15 * (1000000000000 // (SELECT n FROM nn))) // 100)
           |         + ((85 * COALESCE(i.s, 0)) // 100) AS rank
           |    FROM deg d LEFT JOIN (
           |      SELECT e.dst AS dst, SUM(r.rank // dd.outdeg) AS s
           |        FROM edges e
           |        JOIN r${i - 1} r ON e.src = r.node
           |        JOIN deg dd ON dd.src = e.src
           |       GROUP BY e.dst) i ON i.dst = d.src)""".stripMargin
      }.mkString(",\n")
      s"""WITH pairs AS MATERIALIZED (
         |  SELECT DISTINCT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst
         |    FROM lineitem),
         |edges AS MATERIALIZED (
         |  SELECT src, dst FROM pairs
         |  UNION ALL
         |  SELECT dst AS src, src AS dst FROM pairs),
         |deg AS MATERIALIZED (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
         |nn AS MATERIALIZED (SELECT COUNT(*) AS n FROM deg),
         |r0 AS MATERIALIZED (
         |  SELECT src AS node, 1000000000000 // (SELECT n FROM nn) AS rank FROM deg),
         |$rounds
         |SELECT CAST(node AS BIGINT) AS node, CAST(rank AS BIGINT) AS rank
         |  FROM r3
         | ORDER BY node""".stripMargin
    },

    "q_tvf_quantiles" ->
      """WITH v AS (SELECT l_orderkey % 3 AS b, CAST(l_shipdate AS DATE) AS day,
                  CAST(floor(l_extendedprice * 100) AS BIGINT) AS v FROM lineitem),
         ranked AS (SELECT b, day, v,
                  row_number() OVER (PARTITION BY b, day ORDER BY v) AS rnk,
                  count(*) OVER (PARTITION BY b, day) AS nd FROM v),
         summ AS (SELECT day, v, rnk, CAST(rnk - ((rnk - 1) // step) * step AS BIGINT) AS w
                  FROM (SELECT day, v, rnk, nd, (nd + 63) // 64 AS step FROM ranked)
                  WHERE rnk % step = 0 OR rnk = nd),
         n AS (SELECT CAST(sum(w) AS BIGINT) AS n FROM summ),
         ranks AS (SELECT q_pct, n, CAST((n * q_pct + 99) // 100 AS BIGINT) AS r
                  FROM (SELECT unnest([50, 90, 99]) AS q_pct), n),
         cum AS (SELECT v, day, rnk, w,
                 CAST(sum(w) OVER (ORDER BY v, day, rnk ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cw
                 FROM summ)
         SELECT r.q_pct, r.n, r.r, c.v AS est_v
         FROM ranks r JOIN cum c ON c.cw >= r.r AND c.cw - c.w < r.r
         ORDER BY q_pct""",

    "q_stream_late" ->
      """WITH e AS (
           SELECT event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
                  epoch_us(CAST(ts AS TIMESTAMP)) + (event_id % 7) * 3600000000 AS arr_us
           FROM events),
         w AS (
           SELECT ts_us - (ts_us % 3600000000) AS ws_us, arr_us,
                  CASE WHEN arr_us > ts_us - (ts_us % 3600000000)
                       + 3600000000 + 7200000000 THEN 1 ELSE 0 END AS late
           FROM e)
         SELECT ws_us, CAST(count(*) AS BIGINT) AS n_all,
                CAST(sum(1 - late) AS BIGINT) AS n_ontime,
                CAST(sum(late) AS BIGINT) AS n_late
         FROM w GROUP BY 1 ORDER BY ws_us""",

    "q_stream_tumbling" ->
      """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS ws,
                date_trunc('hour', CAST(ts AS TIMESTAMP)) + INTERVAL 1 HOUR AS we,
                event_type,
                count(*) AS n,
                round(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_value
         FROM events
         GROUP BY 1, 2, 3
         ORDER BY ws, event_type""",

    "q_stream_sliding" ->
      """WITH assigned AS (
           SELECT time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP)) AS ws, event_type FROM events
           UNION ALL
           SELECT time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP)) - INTERVAL 30 MINUTE AS ws, event_type FROM events)
         SELECT ws, ws + INTERVAL 1 HOUR AS we, event_type, count(*) AS n
         FROM assigned
         GROUP BY ws, event_type
         ORDER BY ws, event_type""",

    "q_stream_session" ->
      """WITH ordered AS (
           SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
                  CASE WHEN CAST(ts AS TIMESTAMP)
                         - lag(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY ts)
                         >= INTERVAL 30 MINUTE
                       OR lag(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                       THEN 1 ELSE 0 END AS new_session
           FROM events),
         sessions AS (
           SELECT user_id, ts,
                  sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
           FROM ordered)
         SELECT user_id, min(ts) AS first_ts, max(ts) AS last_ts, count(*) AS n
         FROM sessions
         GROUP BY user_id, sid
         ORDER BY user_id, first_ts""",

    "q_stream_dedup" ->
      """SELECT DISTINCT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type
         FROM (SELECT event_id, ts, user_id, event_type FROM events
               UNION ALL
               SELECT event_id, ts, user_id, event_type FROM events)
         ORDER BY event_id""",

    "q_stream_join" ->
      """SELECT p.event_id AS purchase_id, p.user_id,
                CAST(p.ts AS TIMESTAMP) AS p_ts,
                CAST(s.ts AS TIMESTAMP) AS s_ts
         FROM events p
         JOIN events s ON s.user_id = p.user_id
           AND s.event_type = 'signup'
           AND CAST(s.ts AS TIMESTAMP) <= CAST(p.ts AS TIMESTAMP)
           AND CAST(s.ts AS TIMESTAMP) >= CAST(p.ts AS TIMESTAMP) - INTERVAL 1 HOUR
         WHERE p.event_type = 'purchase'
         ORDER BY purchase_id, s_ts"""
  )
}
