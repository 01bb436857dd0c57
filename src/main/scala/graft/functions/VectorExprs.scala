package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

private[functions] trait FloatArrayPair { self: BinaryExpression =>
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two ARRAY<FLOAT> arguments, got $l / $r")
    }
}

/** Native codegen'd vector kernels — the perf upgrade path over the
  * higher-order-function formulation (SURVEY.md §4.2: HOFs like
  * `aggregate`/`zip_with` evaluate interpreted per element; at
  * probes × corpus scale that interpreter overhead dominates ANN search).
  *
  * Semantics are BIT-IDENTICAL to the HOF algebra used by the oracle
  * queries: a left-to-right double accumulation of per-element products —
  * same operation order, same IEEE results — so swapping them in changes
  * nothing observable but time.
  *
  * Both generate a tight scalar loop inside whole-stage codegen
  * (`doGenCode`), keeping the surrounding projection fused.
  */

/** dot(a, b): Σ aᵢ·bᵢ over float arrays, accumulated in double. */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression with FloatArrayPair {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      dot += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val dot = ctx.freshName("dot")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** jaccard(a, b) over two string arrays that are already distinct: one
  * hash-set pass instead of array_intersect + array_union (each of which
  * builds its own set AND materializes a result array per row). Identical
  * algebra: |A∩B| / (|A| + |B| − |A∩B|) = size(intersect)/size(union) for
  * distinct inputs, and the final division is the same single IEEE op the
  * oracle performs. Evaluated per row (CodegenFallback) — the win is doing
  * the set work in one tight JVM pass, not per-element Catalyst eval. */
case class JaccardSim(left: Expression, right: Expression)
  extends BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(org.apache.spark.sql.types.StringType, _),
            ArrayType(org.apache.spark.sql.types.StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two ARRAY<STRING> arguments, got $l / $r")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaccard"
  // contract: two empty sets → NULL (DuckDB's 0/0 division), never NaN —
  // and that null can surface even from non-null inputs, so nullability
  // must not be inferred from the children.
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val na = a.numElements(); val nb = b.numElements()
    if (na == 0 && nb == 0) return null // 0/0 like size(union)=0 division
    val set = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String](na * 2)
    var i = 0
    while (i < na) { set.add(a.getUTF8String(i)); i += 1 }
    var common = 0
    i = 0
    while (i < nb) { if (set.contains(b.getUTF8String(i))) common += 1; i += 1 }
    common.toDouble / (na + nb - common)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** cosine(a, b) in ONE pass: dot, ‖a‖², ‖b‖² accumulated in the same loop
  * (the HOF formulation walks the arrays three times).
  *
  * Zero-denominator contract (pinned — not IEEE incidental): a zero or
  * empty vector on either side yields NULL, matching DuckDB's
  * division-by-zero NULL, never the NaN that raw `0/0.0` would produce. */
case class CosineSim(left: Expression, right: Expression)
  extends BinaryExpression with FloatArrayPair {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"
  // null can surface from non-null (zero-vector) inputs
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val dot = ctx.freshName("dot")
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val i = ctx.freshName("i"); val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = (double) $a.getFloat($i);
         |  double $y = (double) $b.getFloat($i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |if ($na == 0.0 || $nb == 0.0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
