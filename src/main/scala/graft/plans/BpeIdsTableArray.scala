package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `bpe_ids_with(table, word STRING): ARRAY<BIGINT>` — the word's
  * token-ID sequence under a LEARNED merge table's induced vocabulary
  * ([[graft.functions.BpeTable.encodeIds]]: segment fixpoint, each
  * symbol's 1-based first position in the vocab list, 0 = OOV), NULL
  * in = NULL out. [[BpeCountTableLong]]'s array-emitting sibling
  * (VERDICT r11 #4 — a training pipeline ships token ID sequences, not
  * just totals): the encoder instance rides into generated Java as a
  * codegen reference object; the per-word result is memoized, so the
  * per-row cost on the grouped vocabulary frame is a hash probe.
  * Word-local and pure — safe in streaming plans. */
case class BpeIdsTableArray(
    table: graft.functions.BpeTable,
    child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bpe_ids_with needs a STRING input, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    table.ids(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", table,
      classOf[graft.functions.BpeTable].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.ids($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
