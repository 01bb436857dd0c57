package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Determinism helpers (SURVEY.md §2B header rules, FIXTURES.md §B.4).
  *
  * Policy, pinned by empirical DuckDB-1.0 probes:
  *   - Monetary/quantity arithmetic runs through DECIMAL(18,4) casts so partial
  *     aggregation across Spark partitions is order-insensitive (exact integer
  *     arithmetic), unlike double summation.
  *   - Final non-integer outputs are `round(CAST(x AS DOUBLE), 4)`. Both
  *     engines round the shortest decimal representation half-away-from-zero
  *     (Spark: BigDecimal.valueOf + HALF_UP; DuckDB: same observable behavior),
  *     so the output doubles are bit-identical.
  *   - DECIMAL outputs are avoided entirely: DuckDB *truncates* on decimal
  *     downscale casts while Spark rounds HALF_UP, and sum() result
  *     precision differs (38 vs 28) — a schema-compare hazard.
  *   - Counts stay BIGINT on both sides (DuckDB `sum(int)` is HUGEINT → the
  *     oracle SQL must CAST ... AS BIGINT).
  *   - CAVEAT (round-9 sf0.1 sweep): round() of the SAME double can differ
  *     between engines when its exact decimal sits just under a half
  *     boundary — 3.8522499999999997 rounds to 3.8522 in Spark
  *     (BigDecimal.valueOf sees …2499…) but 3.8523 in DuckDB. r4 remains
  *     fine for derived aggregates (boundary hits are measure-zero and
  *     none have occurred there), but for per-row SCORES over many rows
  *     prefer the floor-quantized BIGINT convention
  *     (`floor(x*1e4).cast("long")` ⇔ `CAST(floor(x*10000) AS BIGINT)`) —
  *     floor of a bit-identical double is always portable.
  */
object D {
  /** Exact money/quantity input representation. */
  def dec4(c: Column): Column = c.cast(DecimalType(18, 4))

  /** Wider exact representation for multiplied factors (e.g. (1-d)*(1+t)). */
  def dec8(c: Column): Column = c.cast(DecimalType(18, 8))

  /** Final numeric output: double rounded to 4, matches oracle
    * `round(CAST(x AS DOUBLE), 4)`. */
  def r4(c: Column): Column = round(c.cast(DoubleType), 4)
}
