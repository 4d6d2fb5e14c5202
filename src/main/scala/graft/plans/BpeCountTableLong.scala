package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `bpe_count_with(table, word STRING): BIGINT` — the number of BPE
  * symbols the word encodes to under a LEARNED merge table
  * ([[graft.functions.BpeTable]], read from the persisted
  * [[graft.operators.BpeIndex]]), NULL in = NULL out. The dynamic twin
  * of [[BpeCountLong]]: the fixture expression can call a static
  * method, but a trained table only exists at plan time, so the
  * encoder instance rides into generated Java as a codegen REFERENCE
  * OBJECT (`ctx.addReferenceObj` — the standard Catalyst pattern for
  * plan-time state; the table is broadcast-sized by Heaps' law, and
  * ships once per plan, not per row). Word-local and pure — safe in
  * streaming plans. */
case class BpeCountTableLong(
    table: graft.functions.BpeTable,
    child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bpe_count_with needs a STRING input, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    table.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", table,
      classOf[graft.functions.BpeTable].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.count($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
