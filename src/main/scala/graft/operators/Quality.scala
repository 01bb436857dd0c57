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
}
