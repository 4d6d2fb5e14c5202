package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `bpe_count_text(text STRING): BIGINT` — total fixture-BPE symbols
  * over the whitespace tokens of a whole document, NULL in = NULL out.
  * The document-level sibling of [[BpeCountLong]]: split + per-word
  * memoized encode + sum all happen in one compiled static call
  * ([[graft.functions.Bpe.countText]]), so per-token budgeting costs
  * one invocation per DOCUMENT — no higher-order transform/aggregate
  * lambda dispatch and no per-token boxing. Doc-local — safe in
  * streaming plans. */
case class BpeCountTextLong(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bpe_count_text needs a STRING input, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    graft.functions.Bpe.countText(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Bpe.countText($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
