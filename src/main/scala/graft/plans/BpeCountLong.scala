package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `bpe_count(word STRING): BIGINT` — the number of BPE symbols the
  * word encodes to under the fixture merge table
  * ([[graft.functions.Bpe.Merges]]), NULL in = NULL out. A native
  * expression (not a UDF) so the encode stays inside whole-stage
  * codegen next to the rest of the projection; the merge loop itself
  * is a static call into [[graft.functions.Bpe]] (a Scala object's
  * static forwarder is callable from generated Java), shared verbatim
  * with the interpreted path. Word-local — safe in streaming plans. */
case class BpeCountLong(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bpe_count needs a STRING input, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    graft.functions.Bpe.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Bpe.count($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
