package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** graft_minhash(tokens, k) — ALL k MinHash components in ONE pass.
  *
  * Bit-identical semantics to the composable form the oracle mirrors,
  * `array_min(transform(toks, t -> md5(t || '_s<i>')))` for i in 0..k−1:
  * md5 of the UTF-8 bytes of token ∥ "_s<i>", lowercase hex, lexicographic
  * minimum per seed (hex is ASCII, so unsigned digest-byte order equals
  * the string order array_min uses). Null tokens are skipped and an
  * empty/all-null set yields null components — exactly array_min's
  * behavior, which is what keeps empty docs out of every LSH band.
  *
  * Why it exists: the HOF form evaluates INTERPRETED per element and per
  * seed — k array traversals, k materialized intermediate arrays, and a
  * Catalyst eval per token per seed. This kernel walks the token array
  * once, reuses one MessageDigest, compares raw digest bytes (hex
  * conversion happens k times per ROW, not per token), and allocates
  * nothing per element. Evaluated per row (CodegenFallback) like
  * graft_jaccard — the win is the tight JVM pass, and the minhash family
  * (near-dup, incremental, clusters, curation) sits on the hottest path
  * of the whole engine. */
case class MinHashSignature(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(StringType, _), IntegerType) =>
        TypeCheckResult.TypeCheckFailure(s"$prettyName: k must be a literal")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (ARRAY<STRING>, INT k), got $l / $r")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "graft_minhash"

  @transient private lazy val k: Int = {
    val v = right.eval(null).asInstanceOf[Int]
    require(v >= 1 && v <= 64, s"$prettyName: k must be in [1, 64], got $v")
    v
  }
  @transient private lazy val suffixes: Array[Array[Byte]] =
    Array.tabulate(k)(i => s"_s$i".getBytes(StandardCharsets.UTF_8))

  // unsigned lexicographic compare of two 16-byte digests
  private def less(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val x = a(i) & 0xff; val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  private val hexDigits = "0123456789abcdef".toCharArray

  private def hex(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexDigits((d(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = hexDigits(d(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val arr = l.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val best = new Array[Array[Byte]](k)
    val md = MessageDigest.getInstance("MD5")
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val tok = arr.getUTF8String(i).getBytes
        var s = 0
        while (s < k) {
          md.reset()
          md.update(tok)
          md.update(suffixes(s))
          val d = md.digest()
          if (best(s) == null || less(d, best(s))) best(s) = d
          s += 1
        }
      }
      i += 1
    }
    new GenericArrayData(best.map(d => if (d == null) null else hex(d)))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** graft_minhash_sh3(tokens, k) — MinHash over rolling 3-gram shingles of
  * the TOKEN array, fused: bit-identical to
  * `graft_minhash(shingles3(text), k)` (i.e. the oracle's
  * min-md5-of-"t_i t_i+1 t_i+2" algebra) but the shingle strings are never
  * materialized — each window's bytes stream straight into the digest.
  *
  * Why it exists: the composed form allocates one ~20-char string per
  * window (concat_ws), an array to hold them, and an array_distinct
  * sort/hash pass — per row, on the heaviest allocator in the bench
  * (q_dedup_ngram_lsh's sf0.1 spread traced to GC). Fusing removes all
  * three: token bytes are fetched once, windows reuse them, and the
  * distinct pass is dropped because min() over a multiset equals min()
  * over its set. Fewer than 3 tokens yields all-null components — the
  * same "empty shingle set matches nothing" contract as shingles3 ∘
  * graft_minhash. Null tokens are skipped within a window exactly like
  * concat_ws does. */
case class MinHashShingle3(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(StringType, _), IntegerType) =>
        TypeCheckResult.TypeCheckFailure(s"$prettyName: k must be a literal")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (ARRAY<STRING>, INT k), got $l / $r")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "graft_minhash_sh3"

  @transient private lazy val k: Int = {
    val v = right.eval(null).asInstanceOf[Int]
    require(v >= 1 && v <= 64, s"$prettyName: k must be in [1, 64], got $v")
    v
  }
  @transient private lazy val suffixes: Array[Array[Byte]] =
    Array.tabulate(k)(i => s"_s$i".getBytes(StandardCharsets.UTF_8))

  private val space = Array(' '.toByte)

  private def less(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val x = a(i) & 0xff; val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  private val hexDigits = "0123456789abcdef".toCharArray

  private def hex(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexDigits((d(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = hexDigits(d(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val arr = l.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val best = new Array[Array[Byte]](k)
    if (n >= 3) {
      // fetch token bytes once; each token participates in ≤ 3 windows
      val toks = new Array[Array[Byte]](n)
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) toks(i) = arr.getUTF8String(i).getBytes
        i += 1
      }
      val md = MessageDigest.getInstance("MD5")
      var w = 0
      while (w <= n - 3) {
        var s = 0
        while (s < k) {
          md.reset()
          // concat_ws(" ", t0, t1, t2) semantics: nulls skipped, single
          // separator between present tokens
          var j = 0
          var first = true
          while (j < 3) {
            val t = toks(w + j)
            if (t != null) {
              if (!first) md.update(space)
              md.update(t)
              first = false
            }
            j += 1
          }
          md.update(suffixes(s))
          val d = md.digest()
          if (best(s) == null || less(d, best(s))) best(s) = d
          s += 1
        }
        w += 1
      }
    }
    new GenericArrayData(best.map(d => if (d == null) null else hex(d)))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
