package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `multi_match_pack(text, patterns): BIGINT` — one Aho-Corasick scan
  * of `text` against a LITERAL pattern list, returning
  * `total_hits * 1024 + distinct_patterns` packed in a single long
  * (see [[graft.functions.MultiMatch]] for semantics and the automaton
  * cache). The patterns child must be foldable: the automaton is keyed
  * by the pattern spec, and a per-row pattern list would rebuild it per
  * row — rejected at analysis, not discovered at runtime.
  *
  * Codegen calls the static scan directly, so blocklist filtering
  * stays inside WholeStageCodegen — the per-document cost at 100 TB is
  * one automaton traversal, not |patterns| string passes.
  */
case class MultiMatchPackLong(text: Expression, patterns: Expression)
    extends BinaryExpression {

  override def left: Expression = text
  override def right: Expression = patterns

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (text.dataType, patterns.dataType) match {
      case (StringType, StringType) if patterns.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (StringType, StringType) =>
        TypeCheckResult.TypeCheckFailure(
          "multi_match_pack needs a LITERAL pattern list (foldable)")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"multi_match_pack needs (STRING, STRING), got ($l, $r)")
    }

  override def nullSafeEval(t: Any, p: Any): Any =
    graft.functions.MultiMatch.stats(
      t.asInstanceOf[UTF8String], p.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, p) =>
      s"${ev.value} = graft.functions.MultiMatch.stats($t, $p);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(text = newLeft, patterns = newRight)
}
