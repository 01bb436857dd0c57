package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.catalog.Tables._
import graft.util.D._

/** Sorts / limits / top-k + set operations + dedup semantics
  * (SURVEY.md §2B "Sorts", "Set operations", "Dedup / integrity").
  *
  * Reference analogs: multi-topic merge (`/root/reference/src/lib.rs:64-130`)
  * for union-all; UNIQUE constraints (`/root/reference/migrations/
  * 0001_initial.sql:22-23`) and the duplicate-ingestion bug (SURVEY §0.2.5)
  * for the dedup pair; UNIQUE(block_number) replace-on-reorg intent for
  * keep-latest.
  *
  * Scale notes: global top-k plans as TakeOrderedAndProject (per-partition
  * heap + driver merge of k rows — no full sort, no shuffle of the data).
  * Full sorts (q_sort_multi) are range-partitioned sample-based sorts, the
  * right plan at scale. Exact dedup is a hash aggregate on the key columns;
  * keep-latest is the same shuffle with a max-timestamp argmax instead of a
  * window sort where possible.
  */
object SortsSets {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Schema-evolution union: two snapshots whose column sets diverged
    // (an added column, a dropped one) aligned BY NAME with missing
    // columns null-filled — the append across schema versions every
    // long-lived lakehouse table eventually needs (positional UNION
    // would silently mis-align). DuckDB mirrors with UNION ALL BY NAME.
    "q_set_union_by_name" -> ((s, dir) => {
      import s.implicits._
      val v1 = orders(s, dir).filter($"o_orderkey" < 1000)
        .select($"o_orderkey", $"o_totalprice", $"o_orderstatus")
      val v2 = orders(s, dir).filter($"o_orderkey" >= 1000 && $"o_orderkey" < 2000)
        .select($"o_orderkey", $"o_orderpriority", $"o_totalprice")
      v1.unionByName(v2, allowMissingColumns = true)
        .orderBy($"o_orderkey")
    }),

    // Multi-key sort, mixed direction, explicit null placement. nullif()
    // manufactures nulls so NULLS FIRST/LAST is actually exercised.
    "q_sort_multi" -> ((s, dir) => {
      import s.implicits._
      orders(s, dir)
        .select(
          $"o_orderkey",
          nullif($"o_orderstatus", lit("P")).as("st"),
          $"o_totalprice")
        .orderBy(
          $"st".desc_nulls_last,
          $"o_totalprice".asc,
          $"o_orderkey".asc)
    }),

    // Global ORDER BY + LIMIT → TakeOrderedAndProject.
    "q_topk_global" -> ((s, dir) => {
      import s.implicits._
      orders(s, dir)
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
        .limit(10)
    }),

    // LIMIT with OFFSET over a total order.
    "q_limit_offset" -> ((s, dir) => {
      import s.implicits._
      orders(s, dir)
        .select($"o_orderkey", $"o_totalprice")
        .orderBy($"o_orderkey")
        .offset(5)
        .limit(10)
    }),

    // UNION ALL of two disjoint partitions of orders (count additivity).
    "q_set_union_all" -> ((s, dir) => {
      import s.implicits._
      val lo = orders(s, dir).filter($"o_totalprice" < 1000)
        .select($"o_orderkey", $"o_totalprice")
      val hi = orders(s, dir).filter($"o_totalprice" >= 1000)
        .select($"o_orderkey", $"o_totalprice")
      lo.unionAll(hi).orderBy($"o_orderkey")
    }),

    // UNION (distinct) of two overlapping key sets.
    "q_set_union_distinct" -> ((s, dir) => {
      import s.implicits._
      val a = orders(s, dir).filter($"o_orderkey" < 1000).select($"o_custkey")
      val b = orders(s, dir).filter($"o_orderkey" < 2000).select($"o_custkey")
      a.union(b).distinct().orderBy($"o_custkey")
    }),

    // INTERSECT of customer key sets from two segments' orders.
    "q_set_intersect" -> ((s, dir) => {
      import s.implicits._
      val open = orders(s, dir).filter($"o_orderstatus" === "O").select($"o_custkey")
      val fin  = orders(s, dir).filter($"o_orderstatus" === "F").select($"o_custkey")
      open.intersect(fin).orderBy($"o_custkey")
    }),

    // EXCEPT: customers with open orders but no finished ones.
    "q_set_except" -> ((s, dir) => {
      import s.implicits._
      val open = orders(s, dir).filter($"o_orderstatus" === "O").select($"o_custkey")
      val fin  = orders(s, dir).filter($"o_orderstatus" === "F").select($"o_custkey")
      open.except(fin).orderBy($"o_custkey")
    }),

    // INTERSECT ALL / EXCEPT ALL: multiplicity-preserving set ops — a
    // customer with 3 open and 2 finished orders appears min(3,2)=2 /
    // 3−2=1 times respectively (bag semantics, distinct operator family
    // from the DISTINCT variants above).
    "q_set_intersect_all" -> ((s, dir) => {
      import s.implicits._
      val open = orders(s, dir).filter($"o_orderstatus" === "O").select($"o_custkey")
      val fin  = orders(s, dir).filter($"o_orderstatus" === "F").select($"o_custkey")
      open.intersectAll(fin).orderBy($"o_custkey")
    }),

    "q_set_except_all" -> ((s, dir) => {
      import s.implicits._
      val open = orders(s, dir).filter($"o_orderstatus" === "O").select($"o_custkey")
      val fin  = orders(s, dir).filter($"o_orderstatus" === "F").select($"o_custkey")
      open.exceptAll(fin).orderBy($"o_custkey")
    }),

    // Exact dedup after duplicate injection (×2 union) — A15/§0.2.5
    // regression as a feature. Full-row dedup: (orderkey, linenumber) is NOT
    // unique in the synthetic lineitem, so the dedup key is the whole row.
    "q_dedup_exact" -> ((s, dir) => {
      import s.implicits._
      val li = lineitem(s, dir)
        .select($"l_orderkey", $"l_linenumber", $"l_quantity")
      li.unionAll(li)
        .dropDuplicates("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy($"l_orderkey", $"l_linenumber", $"l_quantity")
    }),

    // Keep-latest-per-key (reorg/upsert semantics): per user_id the row with
    // max ts; event_id tie-break for determinism.
    "q_dedup_keep_latest" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id")
        .orderBy($"ts".desc, $"event_id".desc)
      events(s, dir)
        .select($"user_id", $"event_id", $"ts", $"event_type",
          row_number().over(w).as("rn"))
        .filter($"rn" === 1)
        .select($"user_id", $"event_id", $"ts", $"event_type")
        .orderBy($"user_id")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_set_union_by_name" ->
      """SELECT o_orderkey, o_totalprice, o_orderstatus, o_orderpriority
         FROM (
           SELECT o_orderkey, o_totalprice, o_orderstatus
           FROM orders WHERE o_orderkey < 1000
           UNION ALL BY NAME
           SELECT o_orderkey, o_orderpriority, o_totalprice
           FROM orders WHERE o_orderkey >= 1000 AND o_orderkey < 2000)
         ORDER BY o_orderkey""",

    "q_sort_multi" ->
      """SELECT o_orderkey, nullif(o_orderstatus, 'P') AS st, o_totalprice
         FROM orders
         ORDER BY st DESC NULLS LAST, o_totalprice ASC, o_orderkey ASC""",

    "q_topk_global" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
         FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",

    "q_limit_offset" ->
      """SELECT o_orderkey, o_totalprice
         FROM orders ORDER BY o_orderkey LIMIT 10 OFFSET 5""",

    "q_set_union_all" ->
      """SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice < 1000
         UNION ALL
         SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice >= 1000
         ORDER BY o_orderkey""",

    "q_set_union_distinct" ->
      """SELECT o_custkey FROM orders WHERE o_orderkey < 1000
         UNION
         SELECT o_custkey FROM orders WHERE o_orderkey < 2000
         ORDER BY o_custkey""",

    "q_set_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
         INTERSECT
         SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
         ORDER BY o_custkey""",

    "q_set_except" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
         EXCEPT
         SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
         ORDER BY o_custkey""",

    "q_set_intersect_all" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
         INTERSECT ALL
         SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
         ORDER BY o_custkey""",

    "q_set_except_all" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
         EXCEPT ALL
         SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
         ORDER BY o_custkey""",

    "q_dedup_exact" ->
      """SELECT DISTINCT l_orderkey, l_linenumber, l_quantity
         FROM (SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
               UNION ALL
               SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem)
         ORDER BY l_orderkey, l_linenumber, l_quantity""",

    "q_dedup_keep_latest" ->
      """SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type
         FROM (SELECT user_id, event_id, ts, event_type,
                      row_number() OVER (PARTITION BY user_id
                        ORDER BY ts DESC, event_id DESC) AS rn
               FROM events)
         WHERE rn = 1
         ORDER BY user_id"""
  )
}
