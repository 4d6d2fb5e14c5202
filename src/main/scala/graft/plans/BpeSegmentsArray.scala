package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `bpe_segments(word STRING): ARRAY<STRING>` — the word's fixpoint
  * BPE segmentation under the fixture merge table
  * ([[graft.functions.Bpe.Merges]]), NULL in = NULL out. The array
  * sibling of [[BpeCountLong]] (same static encoder, shared verbatim
  * between codegen and interpreted paths); consumers that only need
  * the token count should keep using `bpe_count`, which skips the
  * array materialization. Word-local — safe in streaming plans. */
case class BpeSegmentsArray(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bpe_segments needs a STRING input, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    graft.functions.Bpe.segmentsData(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Bpe.segmentsData($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
