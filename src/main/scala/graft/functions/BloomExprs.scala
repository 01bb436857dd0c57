package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** graft_bloom_might_contain(key, bloomBytes) — membership probe against a
  * serialized spark-sketch BloomFilter carried as a foldable binary
  * literal.
  *
  * Scale role (graft.operators.Bloom): a semi/inner join where the dim
  * side is too large to broadcast-HASH-join (hundreds of millions of
  * keys) still fits as a bloom — ~1.2 GB per 10⁹ keys at 1% fpp vs tens
  * of GB for the hash relation — so the fact side can be pre-filtered AT
  * THE SCAN, before the shuffle, and only bloom-surviving rows (true
  * matches + fpp false positives) pay shuffle cost. The exact join after
  * the prefilter removes false positives, keeping results identical.
  *
  * The probe compiles into whole-stage codegen (`doGenCode` references
  * the deserialized filter object once per plan via `addReferenceObj`);
  * the bloom deserializes once on the driver and ships with the plan.
  */
case class BloomMightContain(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, BinaryType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (LongType, BinaryType) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable (literal) serialized bloom filter")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (BIGINT key, BINARY bloom), got $l / $r")
    }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"

  @transient private lazy val bloom: BloomFilter = {
    val bytes = right.eval(null).asInstanceOf[Array[Byte]]
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    bloom.mightContainLong(l.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", bloom,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, (key, _) =>
      s"${ev.value} = $ref.mightContainLong($key);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
