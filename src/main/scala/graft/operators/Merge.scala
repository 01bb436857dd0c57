package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.Tables

/** MERGE INTO — the lakehouse upsert primitive (WHEN MATCHED UPDATE /
  * WHEN NOT MATCHED INSERT / WHEN MATCHED AND del DELETE / NOT MATCHED BY
  * SOURCE KEEP), expressed as ONE full-outer equi-join on the key plus
  * post-join classification — the write-direction sibling of the
  * q_cdc_diff read-direction diff, and the batch semantics of the
  * reference's idempotent-upsert sink family (dedup A15 + migrations
  * rollback A17: `/root/reference/migrations/...` applies versioned state
  * transitions; MERGE is the data-plane transition).
  *
  * Contract: `source` carries FULL rows (every value column of the
  * target), so an update is a whole-row replacement — the Delta/Iceberg
  * default. A source row flagged `is_delete` deletes on match and is
  * IGNORED when unmatched (so re-running the same MERGE is a no-op:
  * idempotence is spec-pinned).
  *
  * Scale shape: one shuffle on the key for each un-bucketed side — and
  * ZERO shuffles when both snapshots share the bucketed layout
  * (q_join_bucketed's bucketBy(orderkey)): the full-outer join rides the
  * bucket partitioning, which is exactly how a compacted lakehouse table
  * absorbs a CDC batch. The source is typically batch-sized — Spark
  * broadcastable — while the target streams through the join unmoved.
  */
object Merge {

  /** Apply a MERGE of `source` into `target` on `keys`. Both frames must
    * share the full column set; `source` additionally carries a boolean
    * `is_delete`. Returns the post-merge snapshot tagged with `_action`
    * ('keep' | 'update' | 'insert'); deleted rows are absent. */
  def merge(target: DataFrame, source: DataFrame, keys: Seq[String]): DataFrame = {
    val valueCols = target.columns.filterNot(keys.contains).toSeq
    require(valueCols.forall(source.columns.contains),
      s"source must carry every target column; missing ${
        valueCols.filterNot(source.columns.contains).mkString(",")}")
    val tgt = valueCols.foldLeft(target)((d, c) => d.withColumnRenamed(c, s"_t_$c"))
      .withColumn("_t_present", lit(true))
    val src = valueCols.foldLeft(source)((d, c) => d.withColumnRenamed(c, s"_s_$c"))
      .withColumn("_s_present", lit(true))
    val joined = tgt.join(src, keys, "full_outer")
    // null-proof presence flags: an unmatched side leaves its marker NULL,
    // and 3-valued logic would swallow the insert branch (true && null)
    val tPresent = coalesce(col("_t_present"), lit(false))
    val sPresent = coalesce(col("_s_present"), lit(false))
    val action = when(sPresent && !tPresent, "insert")
      .when(sPresent && tPresent, "update")
      .otherwise("keep")
    joined
      // matched deletes drop out; unmatched deletes are ignored (no
      // resurrection on replay — the idempotence half of the contract)
      .filter(!(sPresent && coalesce(col("is_delete"), lit(false))))
      .select(keys.map(col) ++
        valueCols.map(c => coalesce(col(s"_s_$c"), col(s"_t_$c")).as(c)) :+
        action.as("_action"): _*)
  }

  /** SCD2-maintaining merge: apply a batch of new dimension versions to an
    * interval-closed history — each user's OPEN row is closed at their
    * first batch timestamp, batch rows chain among themselves (lead), the
    * last stays open; closed history and untouched users are carried
    * unchanged. Equivalence law: applying any time-split batch must
    * reproduce the FULL rebuild exactly — which is what q_merge_scd2's
    * oracle checks (the full lead() rebuild over all versions), the same
    * incremental ≡ recompute proof shape as q_agg_incremental.
    *
    * Frames: (user_id, event_id, plan_value, from_us[, to_us]). Cost: one
    * user-keyed window per side + one broadcast-scale join of per-user
    * first-batch timestamps — the history is never rewritten, only its
    * open rows touched. */
  def applyScd2(target: DataFrame, batch: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("from_us"), col("event_id"))
    val closedBatch = batch
      .withColumn("to_us", lead(col("from_us"), 1).over(w))
    val firstBatch = batch.groupBy(col("user_id"))
      .agg(min(col("from_us")).as("nb_ts"))
    val appliedTarget = target
      .join(broadcast(firstBatch), Seq("user_id"), "left")
      .withColumn("to_us",
        when(col("to_us").isNull && col("nb_ts").isNotNull, col("nb_ts"))
          .otherwise(col("to_us")))
      .drop("nb_ts")
    appliedTarget.unionByName(closedBatch)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // SCD2 MERGE: history built from pre-cutoff versions, then the
    // post-cutoff batch applied incrementally; the oracle is the FULL
    // rebuild over all versions — passing proves the apply path is
    // exactly equivalent (no rewritten history, only open rows closed).
    "q_merge_scd2" -> ((s, dir) => {
      import s.implicits._
      val cutUs = 1705276800000000L // 2024-01-15T00:00:00Z
      val sg = graft.catalog.Tables.events(s, dir)
        .filter($"event_type" === "signup")
        .select($"user_id", $"event_id", $"value".as("plan_value"),
          unix_micros($"ts".cast("timestamp")).as("from_us"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy($"from_us", $"event_id")
      val target = sg.filter($"from_us" < cutUs)
        .withColumn("to_us", lead($"from_us", 1).over(w))
      applyScd2(target, sg.filter($"from_us" >= cutUs))
        .orderBy($"user_id", $"from_us", $"event_id")
    }),

    // Deterministic MERGE scenario over orders: target = keys not
    // divisible by 7; source = updates (key%3==0, price+100, status 'U'),
    // inserts (key%7==0, status 'I'), deletes (key%11==0) — overlapping
    // classes exercise the precedence rules (delete beats update; an
    // unmatched delete, e.g. 77, is a no-op).
    "q_merge_upsert" -> ((s, dir) => {
      import s.implicits._
      val o = Tables.orders(s, dir)
        .select($"o_orderkey", $"o_totalprice", $"o_orderstatus")
      val target = o.filter($"o_orderkey" % 7 =!= 0)
      val source = o
        .filter($"o_orderkey" % 3 === 0 || $"o_orderkey" % 7 === 0 ||
          $"o_orderkey" % 11 === 0)
        .select($"o_orderkey",
          when($"o_orderkey" % 7 =!= 0 && $"o_orderkey" % 3 === 0,
            $"o_totalprice" + 100.0).otherwise($"o_totalprice").as("o_totalprice"),
          when($"o_orderkey" % 7 === 0, lit("I"))
            .when($"o_orderkey" % 3 === 0, lit("U"))
            .otherwise($"o_orderstatus").as("o_orderstatus"),
          ($"o_orderkey" % 11 === 0).as("is_delete"))
      merge(target, source, Seq("o_orderkey"))
        .orderBy($"o_orderkey")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_merge_scd2" ->
      """SELECT user_id, event_id, value AS plan_value,
                epoch_us(CAST(ts AS TIMESTAMP)) AS from_us,
                lead(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
                  PARTITION BY user_id
                  ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS to_us
         FROM events
         WHERE event_type = 'signup'
         ORDER BY user_id, from_us, event_id""",

    "q_merge_upsert" ->
      """WITH o AS (SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders),
         target AS (SELECT * FROM o WHERE o_orderkey % 7 <> 0),
         source AS (
           SELECT o_orderkey,
                  CASE WHEN o_orderkey % 7 <> 0 AND o_orderkey % 3 = 0
                       THEN o_totalprice + 100.0 ELSE o_totalprice END AS o_totalprice,
                  CASE WHEN o_orderkey % 7 = 0 THEN 'I'
                       WHEN o_orderkey % 3 = 0 THEN 'U'
                       ELSE o_orderstatus END AS o_orderstatus,
                  o_orderkey % 11 = 0 AS is_delete
           FROM o
           WHERE o_orderkey % 3 = 0 OR o_orderkey % 7 = 0 OR o_orderkey % 11 = 0)
         SELECT coalesce(t.o_orderkey, s.o_orderkey) AS o_orderkey,
                coalesce(s.o_totalprice, t.o_totalprice) AS o_totalprice,
                coalesce(s.o_orderstatus, t.o_orderstatus) AS o_orderstatus,
                CASE WHEN s.o_orderkey IS NOT NULL AND t.o_orderkey IS NULL THEN 'insert'
                     WHEN s.o_orderkey IS NOT NULL THEN 'update'
                     ELSE 'keep' END AS _action
         FROM target t FULL OUTER JOIN source s ON t.o_orderkey = s.o_orderkey
         WHERE NOT (s.o_orderkey IS NOT NULL AND coalesce(s.is_delete, false))
         ORDER BY o_orderkey"""
  )
}
