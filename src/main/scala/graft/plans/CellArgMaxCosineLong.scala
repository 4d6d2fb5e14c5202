package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** IVF cell assignment as ONE codegen'd expression: the centroid id
  * whose cosine with the row's vector is maximal (ties to the smallest
  * id) — `argmax_{j} (cos(q, cq_j), -cell_j)`.
  *
  * Why an expression and not a join: the relational formulation
  * (crossJoin the k centroids, then `max_by` per vector) materializes
  * n x k ROWS and pays a hash-aggregate exchange per assignment pass —
  * per k-means iteration, at 100 TB that is the dominant shuffle. With
  * the centroid set packed into three parallel arrays on a single
  * broadcast row, assignment is a MAP-ONLY pass: constant generated
  * code size (the loop bound is data, not code, so k = 32k centroids at
  * 10^9 vectors compiles the same 30 lines), zero extra rows, zero
  * shuffle. The cosine arithmetic is bit-identical to
  * [[graft.operators.VectorOps.cosine]] ((double) dot / sqrt(n2a) /
  * sqrt(n2b), left-associated), so swapping the formulation cannot
  * change any oracle-checked result.
  *
  * Children: q ARRAY<BIGINT>, qn2 BIGINT, cells ARRAY<BIGINT>,
  * cqs ARRAY<ARRAY<BIGINT>>, cn2s ARRAY<BIGINT> (parallel arrays,
  * see VectorOps.centroidArrays). Returns BIGINT; null when any input
  * is null or the centroid set is empty.
  *
  * Null/NaN contract: array elements must be non-null (guaranteed by
  * VectorOps.quantized / centroidArrays); norms must be > 0 so cosines
  * are finite and the plain `>` / `==` double comparisons below match
  * Spark's struct-ordering max_by on the same values. The norm
  * precondition is ENFORCED, not assumed: a zero (or negative) `qn2` or
  * any zero `cn2s[j]` returns null rather than letting a NaN cosine
  * make the argmax order-dependent (a NaN seen first would win every
  * later `>` comparison — divergent from Spark, which sorts NaN
  * greatest).
  */
case class CellArgMaxCosineLong(q: Expression, qn2: Expression, cells: Expression,
                                cqs: Expression, cn2s: Expression) extends Expression {

  override def children: Seq[Expression] = Seq(q, qn2, cells, cqs, cn2s)
  override def nullable: Boolean = true
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = q.dataType == ArrayType(LongType, containsNull = false) ||
      q.dataType == ArrayType(LongType, containsNull = true)
    def arr(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    def arrarr(dt: DataType) = dt match {
      case ArrayType(ArrayType(LongType, _), _) => true
      case _ => false
    }
    if (ok && qn2.dataType == LongType && arr(cells.dataType) &&
      arrarr(cqs.dataType) && arr(cn2s.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "CellArgMaxCosineLong needs (ARRAY<BIGINT>, BIGINT, ARRAY<BIGINT>, " +
        s"ARRAY<ARRAY<BIGINT>>, ARRAY<BIGINT>), got ${children.map(_.dataType)}")
  }

  override def eval(input: InternalRow): Any = {
    val qv = q.eval(input)
    val n2v = qn2.eval(input)
    val cellsV = cells.eval(input)
    val cqsV = cqs.eval(input)
    val cn2sV = cn2s.eval(input)
    if (qv == null || n2v == null || cellsV == null || cqsV == null || cn2sV == null) return null
    val qa = qv.asInstanceOf[ArrayData]
    val cellsA = cellsV.asInstanceOf[ArrayData]
    val cqsA = cqsV.asInstanceOf[ArrayData]
    val cn2sA = cn2sV.asInstanceOf[ArrayData]
    val k = cellsA.numElements()
    if (k == 0) return null
    val n2 = n2v.asInstanceOf[Long]
    if (n2 <= 0L) return null
    val sq = math.sqrt(n2.toDouble)
    var bestCos = 0.0
    var bestCell = 0L
    var first = true
    var j = 0
    while (j < k) {
      val cq = cqsA.getArray(j)
      val m = math.min(qa.numElements(), cq.numElements())
      var dot = 0L
      var i = 0
      while (i < m) { dot += qa.getLong(i) * cq.getLong(i); i += 1 }
      val cn2 = cn2sA.getLong(j)
      if (cn2 <= 0L) return null
      val cos = dot.toDouble / sq / math.sqrt(cn2.toDouble)
      val cell = cellsA.getLong(j)
      if (first || cos > bestCos || (cos == bestCos && cell < bestCell)) {
        bestCos = cos; bestCell = cell; first = false
      }
      j += 1
    }
    bestCell
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val qC = q.genCode(ctx)
    val n2C = qn2.genCode(ctx)
    val cellsC = cells.genCode(ctx)
    val cqsC = cqs.genCode(ctx)
    val cn2sC = cn2s.genCode(ctx)
    val k = ctx.freshName("k")
    val sq = ctx.freshName("sq")
    val bestCos = ctx.freshName("bestCos")
    val bestCell = ctx.freshName("bestCell")
    val first = ctx.freshName("first")
    val j = ctx.freshName("j")
    val cq = ctx.freshName("cq")
    val m = ctx.freshName("m")
    val dot = ctx.freshName("dot")
    val i = ctx.freshName("i")
    val cos = ctx.freshName("cos")
    val cell = ctx.freshName("cell")
    val cn2 = ctx.freshName("cn2")
    val bad = ctx.freshName("badNorm")
    val arrayData = classOf[ArrayData].getName
    ev.copy(code = code"""
      ${qC.code}
      ${n2C.code}
      ${cellsC.code}
      ${cqsC.code}
      ${cn2sC.code}
      boolean ${ev.isNull} = true;
      long ${ev.value} = -1L;
      if (!${qC.isNull} && !${n2C.isNull} && !${cellsC.isNull} &&
          !${cqsC.isNull} && !${cn2sC.isNull}) {
        int $k = ${cellsC.value}.numElements();
        if ($k > 0 && ${n2C.value} > 0L) {
          double $sq = Math.sqrt((double) ${n2C.value});
          double $bestCos = 0.0;
          long $bestCell = -1L;
          boolean $first = true;
          boolean $bad = false;
          for (int $j = 0; $j < $k; $j++) {
            $arrayData $cq = ${cqsC.value}.getArray($j);
            int $m = Math.min(${qC.value}.numElements(), $cq.numElements());
            long $dot = 0L;
            for (int $i = 0; $i < $m; $i++) {
              $dot += ${qC.value}.getLong($i) * $cq.getLong($i);
            }
            long $cn2 = ${cn2sC.value}.getLong($j);
            if ($cn2 <= 0L) { $bad = true; break; }
            double $cos = ((double) $dot) / $sq / Math.sqrt((double) $cn2);
            long $cell = ${cellsC.value}.getLong($j);
            if ($first || $cos > $bestCos || ($cos == $bestCos && $cell < $bestCell)) {
              $bestCos = $cos; $bestCell = $cell; $first = false;
            }
          }
          if (!$bad) {
            ${ev.isNull} = false;
            ${ev.value} = $bestCell;
          }
        }
      }
    """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(q = newChildren(0), qn2 = newChildren(1), cells = newChildren(2),
      cqs = newChildren(3), cn2s = newChildren(4))
}
