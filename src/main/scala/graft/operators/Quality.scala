package graft.operators

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Data-quality operators — the reference's declared integrity semantics
  * promoted to first-class, reusable checks:
  *
  *   - UNIQUE constraints (`/root/reference/migrations/0001_initial.sql:22-23`,
  *     A15) → checkUnique
  *   - FK integrity (`0001_initial.sql:39`, A16 — unenforceable in Spark) →
  *     checkFk (left-anti orphan scan)
  *   - "basic schema validation" (`/root/reference/README.md:42`, realized
  *     in the reference only as serde parse-or-fail) → expectSchema
  *   - NOT NULL columns (`0001_initial.sql`) → checkNotNull
  *   - pipeline observability → observed (Spark `Observation` metrics
  *     collected for free during the action, no second scan)
  *
  * Scale notes: every check is a single aggregate/anti-join over the
  * checked table — no collects, no per-row driver logic; `observed` adds
  * ZERO extra passes (metrics ride along with whatever action runs).
  */
object Quality {

  /** Key groups violating UNIQUE(keys): (key columns..., n_rows > 1). */
  def checkUnique(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .filter(col("n_rows") > 1)

  /** Child rows whose (childKeys) have no parent (parentKeys) — the
    * FK-orphan scan. Empty result = integrity holds. SQL MATCH SIMPLE
    * semantics (what the reference's Postgres FK enforces): a child row
    * with ANY null key column satisfies the constraint and is never
    * reported; parent-side nulls never match anything. */
  def checkFk(child: DataFrame, parent: DataFrame,
      childKeys: Seq[String], parentKeys: Seq[String]): DataFrame = {
    val nonNullChild = child.filter(childKeys.map(col(_).isNotNull).reduce(_ && _))
    val cond = childKeys.zip(parentKeys)
      .map { case (c, p) => nonNullChild(c) === parent(p) }
      .reduce(_ && _)
    nonNullChild.join(parent, cond, "left_anti")
  }

  /** One-row frame of null COUNTS per required column (not the offending
    * rows — filter `col.isNull` yourself to quarantine them). */
  def checkNotNull(df: DataFrame, cols: Seq[String]): DataFrame =
    df.select(cols.map(c => sum(col(c).isNull.cast("long")).as(s"${c}_nulls")): _*)

  /** Schema conformance: human-readable diffs vs the expected StructType —
    * missing columns, type mismatches, nullable-where-required drift, and
    * unexpected extra columns (reported separately so additive evolution
    * doesn't hard-fail). Empty = conforms. */
  def expectSchema(df: DataFrame, expected: StructType): Seq[String] = {
    val actual = df.schema.map(f => f.name -> f).toMap
    val missing = expected.flatMap { f =>
      actual.get(f.name) match {
        case None => Some(s"missing column: ${f.name} ${f.dataType.simpleString}")
        case Some(a) if a.dataType != f.dataType =>
          Some(s"type mismatch: ${f.name} is ${a.dataType.simpleString}, " +
            s"expected ${f.dataType.simpleString}")
        case Some(a) if a.nullable && !f.nullable =>
          Some(s"nullability drift: ${f.name} is nullable, expected required")
        case _ => None
      }
    }
    val extras = df.schema.map(_.name).filterNot(expected.fieldNames.contains)
      .map(n => s"unexpected column: $n")
    missing ++ extras
  }

  /** Attach row-count + per-column null-count metrics to a DataFrame; the
    * metrics materialize when any action runs — no second scan. */
  def observed(df: DataFrame, name: String, nullChecked: Seq[String])
      : (DataFrame, Observation) = {
    val obs = Observation(name)
    val metrics = count(lit(1)).as("n_rows") +:
      nullChecked.map(c => sum(col(c).isNull.cast("long")).as(s"${c}_nulls"))
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }

  /** In-table rule set evaluated in ONE scan of `df`: each rule is a
    * violation predicate folded into `sum(when(...))`, then unpivoted to
    * the tall (rule, n_checked, n_violations) report — the Deequ-style
    * analysis discipline (at 100 TB a rule suite must not scan the fact
    * table once per rule). */
  def checkRules(df: DataFrame, rules: Seq[(String, org.apache.spark.sql.Column)])
      : DataFrame = {
    val aggs = count(lit(1)).as("n_checked") +:
      rules.map { case (name, bad) => sum(when(bad, 1L).otherwise(0L)).as(name) }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = rules.map { case (name, _) => s"'$name', $name" }.mkString(", ")
    wide.select(
      expr(s"stack(${rules.size}, $stackArgs) as (rule, n_violations)"),
      col("n_checked"))
      .select(col("rule"), col("n_checked"), col("n_violations"))
  }

  // ---- driver contract ----------------------------------------------------

  /** The engine's data-quality suite over the fixture warehouse: per-table
    * rule scans (one pass each), an FK-orphan anti-join, a cross-table
    * temporal consistency join, and a uniqueness check — the dbt-test /
    * Deequ surface as ONE tall oracle-checked report. Two rules fire on
    * the fixtures by design (discount policy, ship-before-order), so the
    * counting path is exercised, not just the all-zeroes happy path. */
  val queries: Map[String, (org.apache.spark.sql.SparkSession, String) => DataFrame] = Map(
    "q_dq_checks" -> ((s, dir) => {
      import graft.catalog.Tables
      val o = Tables.orders(s, dir)
      val li = Tables.lineitem(s, dir)
      val e = Tables.events(s, dir)
      val ordersRules = checkRules(o, Seq(
        "orders_totalprice_nonneg" -> (col("o_totalprice") < 0),
        "orders_date_in_range" ->
          (col("o_orderdate") < lit("1995-01-01").cast("timestamp") ||
           col("o_orderdate") >= lit("2002-01-01").cast("timestamp")),
        "orders_status_domain" -> !col("o_orderstatus").isin("O", "F", "P")))
      val liRules = checkRules(li, Seq(
        "lineitem_quantity_range" ->
          (col("l_quantity") < 1 || col("l_quantity") > 50),
        "lineitem_discount_policy" -> (col("l_discount") > 0.08)))
      val eventRules = checkRules(e, Seq(
        "events_value_range" ->
          (col("value").isNull || col("value") < 0 || col("value") > 400),
        "events_type_domain" ->
          !col("event_type").isin("view", "click", "purchase", "signup", "error")))
      val fkOrphans = o.agg(count(lit(1)).as("n_checked")).crossJoin(
        checkFk(o, Tables.customer(s, dir), Seq("o_custkey"), Seq("c_custkey"))
          .agg(count(lit(1)).as("n_violations")))
        .select(lit("orders_custkey_fk").as("rule"), col("n_checked"), col("n_violations"))
      val shipOrder = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .agg(count(lit(1)).as("n_checked"),
          sum(when(col("l_shipdate") < col("o_orderdate"), 1L).otherwise(0L))
            .as("n_violations"))
        .select(lit("lineitem_ship_not_before_order").as("rule"),
          col("n_checked"), col("n_violations"))
      val unique = e.agg(count(lit(1)).as("n_checked"),
          (count(lit(1)) - countDistinct(col("event_id"))).as("n_violations"))
        .select(lit("events_event_id_unique").as("rule"),
          col("n_checked"), col("n_violations"))
      Seq(ordersRules, liRules, eventRules, fkOrphans, shipOrder, unique)
        .reduce(_ unionAll _)
        .orderBy(col("rule"))
    }))

  val oracle: Map[String, String] = Map(
    "q_dq_checks" ->
      """SELECT rule, n_checked, CAST(n_violations AS BIGINT) AS n_violations FROM (
           SELECT 'orders_totalprice_nonneg' AS rule,
                  (SELECT count(*) FROM orders) AS n_checked,
                  (SELECT count(*) FROM orders WHERE o_totalprice < 0) AS n_violations
           UNION ALL SELECT 'orders_date_in_range',
                  (SELECT count(*) FROM orders),
                  (SELECT count(*) FROM orders
                   WHERE o_orderdate < TIMESTAMP '1995-01-01'
                      OR o_orderdate >= TIMESTAMP '2002-01-01')
           UNION ALL SELECT 'orders_status_domain',
                  (SELECT count(*) FROM orders),
                  (SELECT count(*) FROM orders
                   WHERE o_orderstatus NOT IN ('O', 'F', 'P'))
           UNION ALL SELECT 'lineitem_quantity_range',
                  (SELECT count(*) FROM lineitem),
                  (SELECT count(*) FROM lineitem
                   WHERE l_quantity < 1 OR l_quantity > 50)
           UNION ALL SELECT 'lineitem_discount_policy',
                  (SELECT count(*) FROM lineitem),
                  (SELECT count(*) FROM lineitem WHERE l_discount > 0.08)
           UNION ALL SELECT 'events_value_range',
                  (SELECT count(*) FROM events),
                  (SELECT count(*) FROM events
                   WHERE value IS NULL OR value < 0 OR value > 400)
           UNION ALL SELECT 'events_type_domain',
                  (SELECT count(*) FROM events),
                  (SELECT count(*) FROM events
                   WHERE event_type NOT IN ('view','click','purchase','signup','error'))
           UNION ALL SELECT 'orders_custkey_fk',
                  (SELECT count(*) FROM orders),
                  (SELECT count(*) FROM orders
                   WHERE o_custkey IS NOT NULL
                     AND o_custkey NOT IN (SELECT c_custkey FROM customer))
           UNION ALL SELECT 'lineitem_ship_not_before_order',
                  (SELECT count(*) FROM lineitem l JOIN orders o
                     ON l.l_orderkey = o.o_orderkey),
                  (SELECT count(*) FROM lineitem l JOIN orders o
                     ON l.l_orderkey = o.o_orderkey
                   WHERE l.l_shipdate < o.o_orderdate)
           UNION ALL SELECT 'events_event_id_unique',
                  (SELECT count(*) FROM events),
                  (SELECT count(*) - count(DISTINCT event_id) FROM events))
         ORDER BY rule"""
  )
}
