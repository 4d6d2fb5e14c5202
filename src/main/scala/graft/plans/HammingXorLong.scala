package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Hamming distance of two multi-word bit signatures — two
  * ARRAY<BIGINT> columns of equal length (⌈dim/64⌉ words, see
  * [[graft.operators.VectorOps.signSig]]) — as a native codegen'd
  * Catalyst expression: Σ_w bit_count(a[w] XOR b[w]).
  *
  * This is THE hot scan of the sign-hash family (q202 / q206 /
  * [[graft.operators.SigIndex]].rank): it runs once per
  * (query, candidate) pair over the whole corpus, so like
  * [[ArrayDotLong]] it must stay inside WholeStageCodegen as a tight
  * primitive loop — the built-in `aggregate(zip_with(...))`
  * formulation evaluates interpreted lambdas per word and allocates an
  * intermediate array per row. (The single-word predecessor was the
  * codegen'd `bit_count(qsig ^ sig)` on scalar BIGINTs; this is its
  * exact generalization, and equals it bit for bit at one word.)
  *
  * Null contract: inputs must be non-null arrays of non-null longs
  * (guaranteed by signSig's fold); null input arrays yield null via
  * the standard null-safe wrappers. Word counts must match — packing
  * both sides with the same signSig guarantees it; a length mismatch
  * scores only the common prefix (same min-length discipline as
  * [[ArrayDotLong]]).
  */
case class HammingXorLong(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"HammingXorLong needs two ARRAY<BIGINT> inputs, got $l and $r")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += java.lang.Long.bitCount(x.getLong(i) ^ y.getLong(i)); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val s = ctx.freshName("ham")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
        long $s = 0L;
        int $n = Math.min($a.numElements(), $b.numElements());
        for (int $i = 0; $i < $n; $i++) {
          $s += java.lang.Long.bitCount($a.getLong($i) ^ $b.getLong($i));
        }
        ${ev.value} = $s;
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
