package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** bloom_probe(filter_bytes, hash64) → boolean — membership test
  * against a PER-ROW serialized bloom filter column.
  *
  * Spark's own `bloom_contains` (BloomFilterMightContain) requires the
  * filter to be a CONSTANT (literal or scalar subquery) because it is
  * built for the one-filter-many-rows runtime-filter shape. A bloom
  * FILE INDEX is the transpose: many filters (one per data file), one
  * probe value — so the filter is a column and the probe is the
  * constant. Each evaluation deserializes its row's filter; that is
  * deliberate and cheap HERE because the expression only ever runs
  * over the index relation, whose cardinality is the FILE COUNT (one
  * KB-sized row per file), never over data rows.
  */
case class BloomProbe(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_probe"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType || right.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, bigint), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    else TypeCheckResult.TypeCheckSuccess

  override protected def nullSafeEval(bytes: Any, hash: Any): Any =
    BloomProbe.mightContain(bytes.asInstanceOf[Array[Byte]],
      hash.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, h) =>
      s"graft.functions.BloomProbe.mightContain($b, $h)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomProbe =
    copy(left = newLeft, right = newRight)
}

object BloomProbe {
  /** Static helper the generated code calls. */
  def mightContain(bytes: Array[Byte], hash: Long): Boolean =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
      .mightContainLong(hash)
}
