package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, AttributeSeq, BindReferences, Expression,
  GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Merge-based AS-OF join — the custom-operator tier (LogicalPlan +
  * SparkStrategy + SparkPlan via SparkSessionExtensions) for the one
  * operator in the surface whose built-in formulation degrades at scale.
  *
  * The composable form (q_join_asof: equi+range join then max/rank,
  * `graft.queries.Joins`) fans out every probe row to ALL earlier build
  * rows of the same key before collapsing — O(probes × builds-per-key)
  * intermediate rows, quadratic on hot keys. This operator co-partitions
  * both sides by key, sorts by (key, ts) — both enforced declaratively via
  * requiredChildDistribution/Ordering so Catalyst plans the exchanges —
  * and then streams ONE forward merge pass per partition: O(n + m) rows,
  * no fan-out, no window state.
  *
  * Semantics: LEFT OUTER as-of — every probe row is emitted, joined to
  * the build row with the greatest build-ts <= probe-ts for the same key
  * (build columns null when none). Null keys or null timestamps never
  * match. Among build rows with identical (key, ts), the surviving row is
  * the last in sort order (unspecified, like DuckDB's ASOF JOIN).
  *
  * Reference analog: the block-tip probe (`adapters.rs:21-23`, A5) is a
  * degenerate as-of lookup; the general operator serves event-time
  * enrichment (signup-before-purchase, price-as-of-trade).
  */
object AsOf {

  /** As-of join by column NAME (names resolve against each side's output —
    * keeps the public API free of Column internals). */
  def join(probes: DataFrame, builds: DataFrame,
      probeKey: String, buildKey: String,
      probeTs: String, buildTs: String): DataFrame = {
    val lp = Bridge.planOf(probes)
    val rp = Bridge.planOf(builds)
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in [${plan.output.map(_.name).mkString(", ")}]"))
    // Shared-lineage guard: when both sides derive from the same frame
    // without aliasing, they carry IDENTICAL exprIds; the output would
    // then contain duplicate attributes and every right-side column would
    // silently resolve to the probe side's values. Dataset.join dedups
    // this in analysis; this operator fails fast instead.
    val shared = lp.outputSet.intersect(rp.outputSet)
    require(shared.isEmpty,
      s"probe and build sides share lineage for ${shared.map(_.name).mkString(", ")} — " +
        "alias the build side's columns (e.g. .select($\"ts\".as(\"s_ts\"), ...)) first")
    val (lk, rk) = (attr(lp, probeKey), attr(rp, buildKey))
    val (lts, rts) = (attr(lp, probeTs), attr(rp, buildTs))
    // no implicit coercion is inserted (unlike SQL joins), so mismatched
    // types would hash-partition the same logical key differently and
    // class-cast at execution — fail at construction instead.
    require(lk.dataType == rk.dataType,
      s"key types differ: $probeKey is ${lk.dataType}, $buildKey is ${rk.dataType} — cast first")
    require(lts.dataType == rts.dataType,
      s"ts types differ: $probeTs is ${lts.dataType}, $buildTs is ${rts.dataType} — cast first")
    Bridge.ofRows(probes.sparkSession, AsOfJoinPlan(lp, rp, lk, rk, lts, rts))
  }
}

case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTs: Expression,
    rightTs: Expression)
  extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lts, rts) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTs: Expression,
    rightTs: Expression)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** Both sides hash-partitioned by key (EnsureRequirements co-partitions
    * binary children) … */
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  /** … and sorted by (key, ts) within partitions — the merge precondition,
    * planned as SortExec nodes by Catalyst, not hand-rolled. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  /** Total order on supported key/ts types; nulls sort first (matches
    * Ascending null ordering) and never join. */
  private def comparator(dt: DataType): (Any, Any) => Int = {
    val base: (Any, Any) => Int = dt match {
      case LongType | TimestampType | TimestampNTZType =>
        (a, b) => java.lang.Long.compare(a.asInstanceOf[Long], b.asInstanceOf[Long])
      case IntegerType | DateType =>
        (a, b) => java.lang.Integer.compare(a.asInstanceOf[Int], b.asInstanceOf[Int])
      case ShortType =>
        (a, b) => java.lang.Short.compare(a.asInstanceOf[Short], b.asInstanceOf[Short])
      case DoubleType =>
        (a, b) => java.lang.Double.compare(a.asInstanceOf[Double], b.asInstanceOf[Double])
      case FloatType =>
        (a, b) => java.lang.Float.compare(a.asInstanceOf[Float], b.asInstanceOf[Float])
      case StringType =>
        (a, b) => a.asInstanceOf[UTF8String].compareTo(b.asInstanceOf[UTF8String])
      case other => throw new IllegalArgumentException(
        s"as-of join does not support $other keys/timestamps")
    }
    (a, b) =>
      if (a == null && b == null) 0
      else if (a == null) -1
      else if (b == null) 1
      else base(a, b)
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val lKey = leftKey; val rKey = rightKey; val lTs = leftTs; val rTs = rightTs
    val lOut = left.output; val rOut = right.output; val allOut = output
    val keyCmp = comparator(lKey.dataType)
    val tsCmp = comparator(lTs.dataType)
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val buffered = rIter.buffered
      val nullRight = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow
      // bind against allOut (right side nullability widened), NOT
      // lOut ++ rOut: BoundReference takes nullability from the input
      // schema, and a non-nullable long would read the null-row as 0.
      val resultProj = UnsafeProjection.create(allOut, allOut)
      // binding: evaluate expressions against each side's own schema
      val lKeyBound = BindReferences.bindReference(lKey, AttributeSeq(lOut))
      val lTsBound = BindReferences.bindReference(lTs, AttributeSeq(lOut))
      val rKeyBound = BindReferences.bindReference(rKey, AttributeSeq(rOut))
      val rTsBound = BindReferences.bindReference(rTs, AttributeSeq(rOut))
      var bestRow: InternalRow = null
      var bestKey: Any = null
      lIter.map { l =>
        val lk = lKeyBound.eval(l)
        val lt = lTsBound.eval(l)
        if (lk == null || lt == null) {
          resultProj(joined(l, nullRight))
        } else {
          // advance the build side through every row that can no longer
          // beat a future probe: key strictly behind, or same key with
          // ts <= this probe's ts (probes come in ascending ts order).
          var advancing = true
          while (advancing && buffered.hasNext) {
            val h = buffered.head
            val hk = rKeyBound.eval(h)
            val c = keyCmp(hk, lk)
            if (c < 0 || hk == null) {
              buffered.next() // dead key range (or null key): discard
            } else if (c == 0) {
              val ht = rTsBound.eval(h)
              if (ht != null && tsCmp(ht, lt) <= 0) {
                bestRow = buffered.next().copy()
                bestKey = hk match {
                  case s: UTF8String => s.clone()
                  case other => other
                }
              } else if (ht == null) {
                buffered.next() // null ts never matches
              } else {
                advancing = false
              }
            } else {
              advancing = false
            }
          }
          val matched = bestRow != null && keyCmp(bestKey, lk) == 0
          resultProj(joined(l, if (matched) bestRow else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}
