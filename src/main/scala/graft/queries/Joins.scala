package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.Tables._
import graft.util.D._

/** Join family (SURVEY.md §2B "Joins").
  *
  * Reference analogs: the blocks↔transactions FK pair
  * (`/root/reference/migrations/0001_initial.sql:39`) motivates the equi/anti
  * joins (FK-orphan check); the block-tip probe
  * (`/root/reference/src/blockchain/evm_adapter.rs:86-98`) loosely motivates
  * the as-of pattern. The rest is north-star analytics surface.
  *
  * Scale notes (100 TB posture):
  *   - Fact⋈fact equi-joins (orders⋈lineitem) shuffle both sides on the join
  *     key once — sort-merge under AQE, which also splits skewed partitions.
  *   - Dimension joins (part, supplier, region, nation, customer at small SF)
  *     broadcast: q_join_broadcast pins the hint explicitly; elsewhere AQE
  *     converts to broadcast when the built side is under the threshold.
  *   - The theta join is bounded by an equi conjunct (nationkey) so it plans
  *     as a sort-merge/hash join on the equi key with the inequality as a
  *     post-join filter — NOT a nested-loop over the cross product.
  *   - The as-of join keeps the range predicate inside the join condition
  *     (equi on user + range on ts) and reduces with max() instead of
  *     materializing a rank window over the fan-out (SURVEY §7.2.4).
  */
object Joins {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Plain inner equi-join, per-customer order rollup.
    "q_join_inner_equi" -> ((s, dir) => {
      import s.implicits._
      orders(s, dir)
        .join(customer(s, dir), $"o_custkey" === $"c_custkey", "inner")
        .select($"o_orderkey", $"c_custkey", $"c_name", $"o_totalprice")
        .orderBy($"o_orderkey")
    }),

    // Explicit broadcast of both dimension sides → BroadcastHashJoin; the
    // fact table never shuffles for the join (only for the group-by).
    "q_join_broadcast" -> ((s, dir) => {
      import s.implicits._
      lineitem(s, dir)
        .join(broadcast(part(s, dir)), $"l_partkey" === $"p_partkey")
        .join(broadcast(supplier(s, dir)), $"l_suppkey" === $"s_suppkey")
        .groupBy($"p_brand", $"s_name")
        .agg(
          r4(sum(dec4($"l_quantity"))).as("sum_qty"),
          count(lit(1)).as("n_items"))
        .orderBy($"p_brand", $"s_name")
    }),

    // 5-way chain region→nation→customer→orders→lineitem; Catalyst reorders,
    // AQE broadcasts the small tail. Revenue per region.
    "q_join_multiway" -> ((s, dir) => {
      import s.implicits._
      region(s, dir)
        .join(nation(s, dir), $"r_regionkey" === $"n_regionkey")
        .join(customer(s, dir), $"n_nationkey" === $"c_nationkey")
        .join(orders(s, dir), $"c_custkey" === $"o_custkey")
        .join(lineitem(s, dir), $"o_orderkey" === $"l_orderkey")
        .groupBy($"r_name")
        .agg(
          r4(sum(dec4($"l_extendedprice") * (lit(1) - dec4($"l_discount")))).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy($"r_name")
    }),

    // LEFT: every customer kept; count(o_orderkey) = 0 for orderless ones.
    "q_join_left" -> ((s, dir) => {
      import s.implicits._
      customer(s, dir)
        .join(orders(s, dir), $"c_custkey" === $"o_custkey", "left")
        .groupBy($"c_custkey")
        .agg(
          count($"o_orderkey").as("n_orders"),
          r4(coalesce(sum(dec4($"o_totalprice")), dec4(lit(0)))).as("sum_spent"))
        .orderBy($"c_custkey")
    }),

    // RIGHT: mirrored build — orders RIGHT JOIN customer, same semantics.
    "q_join_right" -> ((s, dir) => {
      import s.implicits._
      orders(s, dir)
        .join(customer(s, dir), $"o_custkey" === $"c_custkey", "right")
        .groupBy($"c_custkey", $"c_name")
        .agg(count($"o_orderkey").as("n_orders"))
        .orderBy($"c_custkey")
    }),

    // FULL OUTER over overlapping key ranges: [0,100) ∪ [50,150].
    "q_join_full" -> ((s, dir) => {
      import s.implicits._
      val a = customer(s, dir).filter($"c_custkey" < 100)
        .select($"c_custkey".as("ak"), $"c_acctbal".as("abal"))
      val b = customer(s, dir).filter($"c_custkey".between(50, 150))
        .select($"c_custkey".as("bk"), $"c_acctbal".as("bbal"))
      a.join(b, $"ak" === $"bk", "full")
        .select(
          coalesce($"ak", $"bk").as("custkey"),
          $"ak".isNotNull.as("in_a"),
          $"bk".isNotNull.as("in_b"),
          r4(coalesce($"abal", $"bbal")).as("bal"))
        .orderBy($"custkey")
    }),

    // SEMI: customers that have at least one order (EXISTS).
    "q_join_semi" -> ((s, dir) => {
      import s.implicits._
      customer(s, dir)
        .join(orders(s, dir), $"c_custkey" === $"o_custkey", "left_semi")
        .select($"c_custkey", $"c_name")
        .orderBy($"c_custkey")
    }),

    // ANTI: the FK-orphan check (0001_initial.sql:39). Parent set is
    // restricted to even orderkeys so the orphan set is non-trivial.
    "q_join_anti" -> ((s, dir) => {
      import s.implicits._
      val parents = orders(s, dir).filter($"o_orderkey" % 2 === 0)
      lineitem(s, dir)
        .join(parents, $"l_orderkey" === $"o_orderkey", "left_anti")
        .select($"l_orderkey", $"l_linenumber")
        .orderBy($"l_orderkey", $"l_linenumber")
    }),

    // CROSS: region × nation (25×5, scale-safe constant) → BroadcastNestedLoop.
    "q_join_cross" -> ((s, dir) => {
      import s.implicits._
      region(s, dir).select($"r_name")
        .crossJoin(nation(s, dir).select($"n_name"))
        .orderBy($"r_name", $"n_name")
    }),

    // THETA: equi conjunct (same nation) + inequality (richer supplier).
    "q_join_theta" -> ((s, dir) => {
      import s.implicits._
      supplier(s, dir)
        .join(customer(s, dir),
          $"s_nationkey" === $"c_nationkey" && $"s_acctbal" > $"c_acctbal")
        .select($"s_suppkey", $"c_custkey",
          r4(col("s_acctbal") - col("c_acctbal")).as("bal_gap"))
        .orderBy($"s_suppkey", $"c_custkey")
    }),

    // RANGE: equi on orderkey + shipdate within 30 days of orderdate.
    "q_join_range" -> ((s, dir) => {
      import s.implicits._
      lineitem(s, dir)
        .join(orders(s, dir),
          $"l_orderkey" === $"o_orderkey" &&
          $"l_shipdate" >= $"o_orderdate" &&
          $"l_shipdate" <= $"o_orderdate" + expr("INTERVAL 30 DAYS"))
        .select($"l_orderkey", $"l_linenumber", $"l_shipdate", $"o_orderdate")
        .orderBy($"l_orderkey", $"l_linenumber", $"l_shipdate")
    }),

    // AS-OF: latest prior signup per purchase, same user. Equi on user +
    // range on ts inside the join condition; aggregate max instead of a
    // rank window over the fan-out.
    "q_join_asof" -> ((s, dir) => {
      import s.implicits._
      val ev = events(s, dir)
      val p = ev.filter($"event_type" === "purchase")
        .select($"event_id", $"user_id", $"ts")
      val sg = ev.filter($"event_type" === "signup")
        .select($"user_id".as("s_user"), $"ts".as("s_ts"))
      p.join(sg, $"user_id" === $"s_user" && $"s_ts" <= $"ts", "left")
        .groupBy($"event_id", $"user_id", $"ts")
        .agg(max($"s_ts").as("signup_ts"))
        .orderBy($"event_id")
    }),

    // NEAREST as-of: each purchase matched to the same user's signup
    // closest in time in EITHER direction (q_join_asof is backward-only),
    // ties to the earlier signup — the sensor-alignment join. Two-phase
    // min instead of a rank window over the fan-out: min(|Δt|) per
    // purchase, then min(signup_ts) among the achievers — both plain hash
    // aggs on the (user-equi, bounded-fanout) join, all integer µs math.
    "q_join_asof_nearest" -> ((s, dir) => {
      import s.implicits._
      val ev = events(s, dir)
      val p = ev.filter($"event_type" === "purchase")
        .select($"event_id", $"user_id", unix_micros($"ts".cast("timestamp")).as("ts_us"))
      val sg = ev.filter($"event_type" === "signup")
        .select($"user_id".as("s_user"), unix_micros($"ts".cast("timestamp")).as("s_ts_us"))
      val f = p.join(sg, $"user_id" === $"s_user")
        .select($"event_id", $"ts_us", $"s_ts_us",
          abs($"ts_us" - $"s_ts_us").as("diff"))
      val md = f.groupBy($"event_id").agg(min($"diff").as("md"))
      val res = f.join(md, Seq("event_id"))
        .filter($"diff" === $"md")
        .groupBy($"event_id").agg(min($"s_ts_us").as("nearest_us"))
      p.join(res, Seq("event_id"), "left")
        .select($"event_id", $"user_id", $"ts_us", $"nearest_us")
        .orderBy($"event_id")
    }),

    // EXISTENCE (mark) join: EXISTS in the SELECT list — every probe row
    // kept, annotated with a boolean instead of filtered (semi join
    // keeps-and-drops, anti drops-and-keeps; the mark join keeps ALL and
    // FLAGS). Catalyst plans ExistenceJoin (PlanSpec-pinned): one hash
    // join emitting the exists bit, not a correlated re-scan per row.
    "q_join_existence" -> ((s, dir) => {
      orders(s, dir).createOrReplaceTempView("orders_ex")
      lineitem(s, dir).createOrReplaceTempView("lineitem_ex")
      s.sql("""
        SELECT o_orderkey, o_totalprice,
               EXISTS (SELECT 1 FROM lineitem_ex l
                       WHERE l.l_orderkey = o.o_orderkey
                         AND l.l_quantity > 45) AS has_big_item
        FROM orders_ex o
        ORDER BY o_orderkey""")
    }),

    // POINT-IN-TIME (SCD2) dimension join — the feature-store correctness
    // op: each purchase joined to the dimension version VALID AT ITS
    // EVENT TIME (the signup-derived plan history: each signup opens an
    // interval closed by the user's next signup). Intervals partition
    // time per user, so each fact row matches at most once with no
    // dedup pass; the interval predicate rides the user equi-join as a
    // residual (never a time product), and pre-purchase facts keep a
    // null dimension (left join) — using the CURRENT version instead
    // would be the train-serve leakage this join exists to prevent.
    "q_join_scd2_pit" -> ((s, dir) => {
      import s.implicits._
      val ev = events(s, dir)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy($"from_us", $"event_id")
      val dim = ev.filter($"event_type" === "signup")
        .select($"user_id", $"event_id",
          $"value".as("plan_value"),
          unix_micros($"ts".cast("timestamp")).as("from_us"))
        .withColumn("to_us", lead($"from_us", 1).over(w))
        .select($"user_id".as("d_user"), $"plan_value", $"from_us", $"to_us")
      val p = ev.filter($"event_type" === "purchase")
        .select($"event_id", $"user_id", unix_micros($"ts".cast("timestamp")).as("ts_us"))
      p.join(dim,
          $"user_id" === $"d_user" && $"ts_us" >= $"from_us" &&
          ($"to_us".isNull || $"ts_us" < $"to_us"), "left")
        .select($"event_id", $"user_id", $"ts_us",
          $"from_us".as("plan_from_us"), $"plan_value")
        .orderBy($"event_id")
    }),

    // Null-safe equi-join (<=> / IS NOT DISTINCT FROM): null keys MATCH
    // each other, unlike = which drops them under 3-valued logic. nullif
    // manufactures null keys on both sides ('P' status) so the null
    // bucket genuinely pairs.
    "q_join_nullsafe" -> ((s, dir) => {
      import s.implicits._
      val a = orders(s, dir).filter($"o_orderkey" < 200)
        .select($"o_orderkey".as("a_key"), nullif($"o_orderstatus", lit("P")).as("a_st"))
      val b = orders(s, dir).filter($"o_orderkey" < 200)
        .select($"o_orderkey".as("b_key"), nullif($"o_orderstatus", lit("P")).as("b_st"))
      a.join(b, $"a_st" <=> $"b_st" && $"a_key" < $"b_key")
        .groupBy($"a_st").agg(count(lit(1)).as("n_pairs"))
        .orderBy($"a_st".asc_nulls_first)
    }),

    // Same as-of semantics through the CUSTOM MERGE OPERATOR
    // (graft.plans.AsOf → AsOfJoinExec): one co-partitioned forward merge
    // instead of the fan-out join + aggregate above — the scale path for
    // hot keys, oracle-checked against the identical correlated-max SQL.
    "q_join_asof_merge" -> ((s, dir) => {
      import s.implicits._
      val ev = events(s, dir)
      val p = ev.filter($"event_type" === "purchase")
        .select($"event_id", $"user_id", $"ts")
      val sg = ev.filter($"event_type" === "signup")
        .select($"user_id".as("s_user"), $"ts".as("s_ts"))
      graft.plans.AsOf.join(p, sg, "user_id", "s_user", "ts", "s_ts")
        .select($"event_id", $"user_id", $"ts", $"s_ts".as("signup_ts"))
        .orderBy($"event_id")
    }),

    // Salted skew join: the dim side replicates into SALT copies, each fact
    // row routes to ONE replica by a deterministic in-row salt — a hot join
    // key's rows spread over SALT shuffle partitions instead of piling on
    // one. Result ≡ the plain join (oracle is the unsalted SQL); the salt
    // column never leaves the join. This is the manual form of AQE's
    // skew-join split for engines/paths where AQE can't see the skew (e.g.
    // a skewed key INSIDE one input file-split, or bucketed inputs AQE
    // won't re-split).
    "q_join_skew_salted" -> ((s, dir) => {
      import s.implicits._
      val li = lineitem(s, dir)
        .select($"l_orderkey".as("o_orderkey"), $"l_linenumber", $"l_extendedprice")
      val ords = orders(s, dir).select($"o_orderkey", $"o_orderpriority")
      graft.operators.Layout
        .saltedJoin(li, ords, "o_orderkey", salt = 8, saltExpr = $"l_linenumber")
        .groupBy($"o_orderpriority")
        .agg(r4(sum(dec4($"l_extendedprice"))).as("sum_price"),
          count(lit(1)).as("n_items"))
        .orderBy($"o_orderpriority")
    }),

    // Correlated LATERAL subquery with ORDER BY + LIMIT — the per-row
    // top-1 idiom in its SQL form; Catalyst decorrelates it into a
    // ranked window join rather than a per-row re-scan. The outer key
    // range is REPEATED inside the lateral input: Catalyst doesn't derive
    // `l_orderkey < 1000` from the correlation + outer filter on its own,
    // and per-key top-1 is invariant to dropping other keys — so without
    // it the rank runs over ALL of lineitem and only then joins down to
    // the matched slice. At 100× the unpruned rank IS the query cost;
    // with it the predicate reaches the lineitem parquet scan
    // (PlanSpec guards PushedFilters).
    "q_join_lateral" -> ((s, dir) => {
      graft.catalog.GraftCatalog.registerAll(s, dir)
      s.sql("""
        SELECT o.o_orderkey, t.l_linenumber, t.l_extendedprice
        FROM orders o JOIN LATERAL (
          SELECT l_linenumber, l_extendedprice FROM lineitem
          WHERE l_orderkey = o.o_orderkey AND l_orderkey < 1000
          ORDER BY l_extendedprice DESC, l_linenumber
          LIMIT 1) t
        WHERE o.o_orderkey < 1000
        ORDER BY o.o_orderkey""")
    }),

    // Bloom-prefiltered semi join: the dim key set ships as a serialized
    // bloom probed inside the fact scan stage (codegen'd custom
    // Expression); only bloom survivors shuffle into the exact residual
    // join, so the result is identical to the plain semi join (the oracle).
    "q_join_bloom" -> ((s, dir) => {
      import s.implicits._
      val dim = orders(s, dir)
        .filter($"o_orderpriority" === "1-URGENT").select($"o_orderkey")
      graft.operators.Bloom
        .semiJoin(lineitem(s, dir), dim, "l_orderkey", "o_orderkey")
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n_items"),
          r4(sum(dec4($"l_extendedprice"))).as("sum_price"))
        .orderBy($"l_returnflag")
    }),

    // INTERVAL overlap with NO equi key: error-event windows × purchase-event
    // windows (each event spans [ts, ts+10min]). The raw predicate is pure
    // range — Spark would plan BNL/cartesian — so the query goes through
    // graft.operators.IntervalJoin: explode to 10-min time buckets, equi-join
    // on bucket, filter overlap, and attribute each pair to the single
    // bucket holding max(starts) so no downstream dedup shuffle is needed.
    // Output = the overlap window bounds (timestamps compare exactly
    // cross-engine; second-diffs would hit rounding-semantics skew).
    "q_join_interval" -> ((s, dir) => {
      import s.implicits._
      val ev = events(s, dir)
      def iv(t: String, p: String) = ev.filter($"event_type" === t).select(
        $"event_id".as(s"${p}_id"), $"ts".as(s"${p}_s"),
        ($"ts" + expr("INTERVAL 10 MINUTES")).as(s"${p}_e"))
      graft.operators.IntervalJoin
        .overlap(iv("error", "a"), iv("purchase", "b"),
          "a_s", "a_e", "b_s", "b_e", bucketSeconds = 600L)
        .select($"a_id", $"b_id",
          greatest($"a_s", $"b_s").as("ov_start"),
          least($"a_e", $"b_e").as("ov_end"))
        .orderBy($"a_id", $"b_id")
    }),

    // Fact⋈fact join on PRE-BUCKETED tables: orders and lineitem are both
    // written bucketBy(8, orderkey) + sortBy (see bucketedTables), so the
    // sort-merge join consumes the buckets' co-located layout directly —
    // NO hash exchange on either side and no per-query sort beyond merging
    // pre-sorted bucket files (PlanSpec pins both). This completes the
    // layout trilogy (partition pruning / z-order / bucketing): at 100 TB,
    // bucketing both fact tables on the join key at write time converts
    // every subsequent orders⋈lineitem — the workload's hottest join —
    // from a 2-sided shuffle into a local merge, and the follow-up
    // group-by on the same key rides the same partitioning for free. The
    // MERGE hint only pins the strategy so AQE cannot flip the small SF
    // side to broadcast and hide the property being demonstrated.
    "q_join_bucketed" -> ((s, dir) => {
      import s.implicits._
      val (ordersTbl, lineitemTbl) = bucketedTables(s, dir)
      s.table(lineitemTbl).hint("merge")
        .join(s.table(ordersTbl).filter($"o_orderstatus" === "F").hint("merge"),
          $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderkey")
        .agg(count(lit(1)).as("n_items"),
          r4(sum(dec4($"l_extendedprice"))).as("revenue"))
        .orderBy($"o_orderkey")
    })
  )

  /** Write orders + lineitem as 8-bucket tables on their join key
    * (Layout.writeBucketed — one file per bucket), once per
    * (JVM, source-fingerprint) — the write-once discipline of
    * Scans.partitionedEvents, extended to the session catalog (bucket
    * metadata lives in the catalog, so the read must go through
    * `spark.table`, not a raw parquet path). Table names carry the
    * fingerprint: a regenerated source can never be served from a stale
    * catalog entry. */
  private val bucketLock = new Object
  private[queries] def bucketedTables(s: SparkSession, dir: String): (String, String) = {
    val src = java.nio.file.Paths.get(path(dir, "orders"))
    val mtime = java.nio.file.Files.getLastModifiedTime(src).toMillis
    val stamp = java.lang.Long.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(s"$dir@$mtime").toLong & 0xffffffffL)
    val names = (s"graft_orders_bkt_$stamp", s"graft_lineitem_bkt_$stamp")
    bucketLock.synchronized {
      def ensure(name: String, df: DataFrame, key: String): Unit =
        if (!s.catalog.tableExists(name)) {
          val loc = java.nio.file.Paths.get(sys.props("java.io.tmpdir"), name)
          graft.operators.Layout.writeBucketed(df, name, key, 8, Some(loc.toString))
        }
      ensure(names._1, orders(s, dir), "o_orderkey")
      ensure(names._2, lineitem(s, dir), "l_orderkey")
    }
    names
  }

  val oracle: Map[String, String] = Map(
    "q_join_lateral" ->
      """SELECT o.o_orderkey, t.l_linenumber, t.l_extendedprice
         FROM orders o JOIN LATERAL (
           SELECT l_linenumber, l_extendedprice FROM lineitem
           WHERE l_orderkey = o.o_orderkey
           ORDER BY l_extendedprice DESC, l_linenumber
           LIMIT 1) t ON true
         WHERE o.o_orderkey < 1000
         ORDER BY o.o_orderkey""",

    // plain join over the ORIGINAL tables: the bucketed layout must be
    // result-invariant — only the plan changes
    "q_join_bucketed" ->
      """SELECT o_orderkey, count(*) AS n_items,
                round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE), 4) AS revenue
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE o_orderstatus = 'F'
         GROUP BY o_orderkey
         ORDER BY o_orderkey""",

    // the UNFILTERED semi join: the bloom prefilter must be result-invariant
    "q_join_bloom" ->
      """SELECT l_returnflag, count(*) AS n_items,
                round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_price
         FROM lineitem
         WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                              WHERE o_orderpriority = '1-URGENT')
         GROUP BY l_returnflag
         ORDER BY l_returnflag""",

    // the NAIVE theta form: bucket decomposition must be result-invariant
    "q_join_interval" ->
      """SELECT a.event_id AS a_id, b.event_id AS b_id,
                greatest(a.s, b.s) AS ov_start,
                least(a.e, b.e) AS ov_end
         FROM (SELECT event_id, CAST(ts AS TIMESTAMP) AS s,
                      CAST(ts AS TIMESTAMP) + INTERVAL 10 MINUTE AS e
               FROM events WHERE event_type = 'error') a,
              (SELECT event_id, CAST(ts AS TIMESTAMP) AS s,
                      CAST(ts AS TIMESTAMP) + INTERVAL 10 MINUTE AS e
               FROM events WHERE event_type = 'purchase') b
         WHERE a.s <= b.e AND b.s <= a.e
         ORDER BY a_id, b_id""",

    // the UNSALTED join: salting must be result-invariant
    "q_join_skew_salted" ->
      """SELECT o_orderpriority,
                round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_price,
                count(*) AS n_items
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY o_orderpriority
         ORDER BY o_orderpriority""",

    "q_join_inner_equi" ->
      """SELECT o_orderkey, c_custkey, c_name, o_totalprice
         FROM orders JOIN customer ON o_custkey = c_custkey
         ORDER BY o_orderkey""",

    "q_join_broadcast" ->
      """SELECT p_brand, s_name,
                round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_qty,
                count(*) AS n_items
         FROM lineitem
         JOIN part ON l_partkey = p_partkey
         JOIN supplier ON l_suppkey = s_suppkey
         GROUP BY p_brand, s_name
         ORDER BY p_brand, s_name""",

    "q_join_multiway" ->
      """SELECT r_name,
                round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE), 4) AS revenue,
                count(*) AS n_items
         FROM region
         JOIN nation ON r_regionkey = n_regionkey
         JOIN customer ON n_nationkey = c_nationkey
         JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON o_orderkey = l_orderkey
         GROUP BY r_name
         ORDER BY r_name""",

    "q_join_left" ->
      """SELECT c_custkey,
                count(o_orderkey) AS n_orders,
                round(CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(18,4))), CAST(0 AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_spent
         FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         GROUP BY c_custkey
         ORDER BY c_custkey""",

    "q_join_right" ->
      """SELECT c_custkey, c_name, count(o_orderkey) AS n_orders
         FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
         GROUP BY c_custkey, c_name
         ORDER BY c_custkey""",

    "q_join_full" ->
      """SELECT coalesce(ak, bk) AS custkey,
                (ak IS NOT NULL) AS in_a,
                (bk IS NOT NULL) AS in_b,
                round(CAST(coalesce(abal, bbal) AS DOUBLE), 4) AS bal
         FROM (SELECT c_custkey AS ak, c_acctbal AS abal FROM customer WHERE c_custkey < 100) a
         FULL OUTER JOIN (SELECT c_custkey AS bk, c_acctbal AS bbal FROM customer WHERE c_custkey BETWEEN 50 AND 150) b
           ON ak = bk
         ORDER BY custkey""",

    "q_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         ORDER BY c_custkey""",

    "q_join_anti" ->
      """SELECT l_orderkey, l_linenumber FROM lineitem
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey AND o_orderkey % 2 = 0)
         ORDER BY l_orderkey, l_linenumber""",

    "q_join_cross" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation
         ORDER BY r_name, n_name""",

    "q_join_theta" ->
      """SELECT s_suppkey, c_custkey,
                round(CAST(s_acctbal - c_acctbal AS DOUBLE), 4) AS bal_gap
         FROM supplier JOIN customer
           ON s_nationkey = c_nationkey AND s_acctbal > c_acctbal
         ORDER BY s_suppkey, c_custkey""",

    "q_join_range" ->
      """SELECT l_orderkey, l_linenumber, l_shipdate, o_orderdate
         FROM lineitem JOIN orders
           ON l_orderkey = o_orderkey
          AND l_shipdate >= o_orderdate
          AND l_shipdate <= o_orderdate + INTERVAL 30 DAY
         ORDER BY l_orderkey, l_linenumber, l_shipdate""",

    "q_join_nullsafe" ->
      """SELECT a.st AS a_st, count(*) AS n_pairs
         FROM (SELECT o_orderkey AS k, nullif(o_orderstatus, 'P') AS st
               FROM orders WHERE o_orderkey < 200) a
         JOIN (SELECT o_orderkey AS k, nullif(o_orderstatus, 'P') AS st
               FROM orders WHERE o_orderkey < 200) b
           ON a.st IS NOT DISTINCT FROM b.st AND a.k < b.k
         GROUP BY a.st
         ORDER BY a_st NULLS FIRST""",

    "q_join_existence" ->
      """SELECT o_orderkey, o_totalprice,
                EXISTS (SELECT 1 FROM lineitem l
                        WHERE l.l_orderkey = o.o_orderkey
                          AND l.l_quantity > 45) AS has_big_item
         FROM orders o
         ORDER BY o_orderkey""",

    "q_join_scd2_pit" ->
      """WITH dim AS (
           SELECT user_id AS d_user, value AS plan_value,
                  epoch_us(CAST(ts AS TIMESTAMP)) AS from_us,
                  lead(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
                    PARTITION BY user_id
                    ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS to_us
           FROM events WHERE event_type = 'signup'),
         p AS (
           SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
           FROM events WHERE event_type = 'purchase')
         SELECT p.event_id, p.user_id, p.ts_us,
                dim.from_us AS plan_from_us, dim.plan_value
         FROM p LEFT JOIN dim
           ON p.user_id = dim.d_user AND p.ts_us >= dim.from_us
          AND (dim.to_us IS NULL OR p.ts_us < dim.to_us)
         ORDER BY p.event_id""",

    "q_join_asof_nearest" ->
      """WITH p AS (
           SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
           FROM events WHERE event_type = 'purchase'),
         sg AS (
           SELECT user_id AS s_user, epoch_us(CAST(ts AS TIMESTAMP)) AS s_ts_us
           FROM events WHERE event_type = 'signup'),
         f AS (
           SELECT p.event_id, p.ts_us, sg.s_ts_us,
                  abs(p.ts_us - sg.s_ts_us) AS diff
           FROM p JOIN sg ON p.user_id = sg.s_user),
         md AS (SELECT event_id, min(diff) AS md FROM f GROUP BY 1),
         res AS (
           SELECT f.event_id, min(f.s_ts_us) AS nearest_us
           FROM f JOIN md ON f.event_id = md.event_id AND f.diff = md.md
           GROUP BY 1)
         SELECT p.event_id, p.user_id, p.ts_us, res.nearest_us
         FROM p LEFT JOIN res ON p.event_id = res.event_id
         ORDER BY p.event_id""",

    "q_join_asof" ->
      """SELECT e.event_id, e.user_id, CAST(e.ts AS TIMESTAMP) AS ts,
                CAST((SELECT max(s.ts) FROM events s
                      WHERE s.event_type = 'signup'
                        AND s.user_id = e.user_id
                        AND s.ts <= e.ts) AS TIMESTAMP) AS signup_ts
         FROM events e
         WHERE e.event_type = 'purchase'
         ORDER BY e.event_id""",

    "q_join_asof_merge" ->
      """SELECT e.event_id, e.user_id, CAST(e.ts AS TIMESTAMP) AS ts,
                CAST((SELECT max(s.ts) FROM events s
                      WHERE s.event_type = 'signup'
                        AND s.user_id = e.user_id
                        AND s.ts <= e.ts) AS TIMESTAMP) AS signup_ts
         FROM events e
         WHERE e.event_type = 'purchase'
         ORDER BY e.event_id"""
  )
}
