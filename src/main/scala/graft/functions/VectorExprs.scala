package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

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

/** graft_srp(vec, bands, bits): banded sign-random-projection LSH signature
  * — `bands` bucket ids, each from `bits` hyperplane sign bits, in ONE pass
  * over the vector.
  *
  * Hyperplanes are pseudo-random ±1 vectors derived from a fixed 64-bit
  * integer mix of (hyperplane index, dimension) — fully deterministic, no
  * stored codebook, identical on every executor. For unit vectors,
  * P[bit agrees] = 1 − θ/π (Charikar's SRP-LSH), so two near-duplicate
  * embeddings (cos ≥ 0.9 → θ ≤ 26°) agree on an 8-bit band with
  * probability ≈ 0.86⁸ ≈ 0.29 and collide in ≥1 of 4 bands with
  * probability ≈ 0.75; recall vs exact kNN is pinned in OperatorsSpec.
  *
  * Per row: dims × bands·bits mixes, one int[bands] output — the candidate
  * generation cost of embedding near-dup at 100 TB stays a narrow map, and
  * the pair join downstream is an equi-join on (band, bucket). */
case class SrpSignature(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(FloatType, _), IntegerType, IntegerType)
          if second.foldable && third.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(FloatType, _), IntegerType, IntegerType) =>
        TypeCheckResult.TypeCheckFailure(s"$prettyName: bands/bits must be literals")
      case (v, b, w) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (ARRAY<FLOAT>, INT bands, INT bits), got $v / $b / $w")
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_srp"

  @transient private lazy val bands: Int = {
    val v = second.eval(null).asInstanceOf[Int]
    require(v >= 1 && v <= 16, s"$prettyName: bands must be in [1, 16], got $v")
    v
  }
  @transient private lazy val bits: Int = {
    val v = third.eval(null).asInstanceOf[Int]
    require(v >= 1 && v <= 30, s"$prettyName: bits must be in [1, 30], got $v")
    v
  }

  override def nullSafeEval(v: Any, b: Any, w: Any): Any = {
    val vec = v.asInstanceOf[ArrayData]
    val n = vec.numElements()
    val k = bands * bits
    val acc = new Array[Double](k)
    var d = 0
    while (d < n) {
      val x = vec.getFloat(d).toDouble
      var j = 0
      while (j < k) {
        // splitmix-style finalizer over (hyperplane, dimension)
        var h = j.toLong * 0x9E3779B97F4A7C15L + d.toLong * 0xC2B2AE3D27D4EB4FL
        h ^= h >>> 33; h *= 0xFF51AFD7ED558CCDL; h ^= h >>> 33
        if (h >= 0L) acc(j) += x else acc(j) -= x
        j += 1
      }
      d += 1
    }
    val out = new Array[Int](bands)
    var bi = 0
    while (bi < bands) {
      var bucket = 0
      var j = 0
      while (j < bits) {
        if (acc(bi * bits + j) >= 0.0) bucket |= 1 << j
        j += 1
      }
      out(bi) = bucket
      bi += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, _, _) => {
      val k = bands * bits
      val n = ctx.freshName("n"); val acc = ctx.freshName("acc")
      val d = ctx.freshName("d"); val j = ctx.freshName("j")
      val x = ctx.freshName("x"); val h = ctx.freshName("h")
      val out = ctx.freshName("out"); val bi = ctx.freshName("bi")
      val bucket = ctx.freshName("bucket")
      s"""
         |int $n = $v.numElements();
         |double[] $acc = new double[$k];
         |for (int $d = 0; $d < $n; $d++) {
         |  double $x = (double) $v.getFloat($d);
         |  for (int $j = 0; $j < $k; $j++) {
         |    long $h = (long) $j * 0x9E3779B97F4A7C15L + (long) $d * 0xC2B2AE3D27D4EB4FL;
         |    $h ^= $h >>> 33; $h *= 0xFF51AFD7ED558CCDL; $h ^= $h >>> 33;
         |    if ($h >= 0L) $acc[$j] += $x; else $acc[$j] -= $x;
         |  }
         |}
         |int[] $out = new int[$bands];
         |for (int $bi = 0; $bi < $bands; $bi++) {
         |  int $bucket = 0;
         |  for (int $j = 0; $j < $bits; $j++) {
         |    if ($acc[$bi * $bits + $j] >= 0.0) $bucket |= 1 << $j;
         |  }
         |  $out[$bi] = $bucket;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
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
