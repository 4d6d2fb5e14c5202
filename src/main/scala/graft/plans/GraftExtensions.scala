package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension registration for this library's custom expressions,
  * so SQL surfaces can use them too:
  *
  *   spark.sql.extensions=graft.plans.GraftExtensions   (at session build)
  * or
  *   GraftExtensions.register(spark)                    (on a live session)
  *
  * then: `SELECT array_dot_long(qa, qb) FROM ...`
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.arrayDotLong)
    ext.injectFunction(GraftExtensions.kmvSketchLong)
    ext.injectFunction(GraftExtensions.cellArgmaxCosineLong)
  }
}

object GraftExtensions {
  private val arrayDotLong: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("array_dot_long"),
    new ExpressionInfo(classOf[ArrayDotLong].getName, "array_dot_long"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "array_dot_long takes exactly 2 arguments")
      ArrayDotLong(children.head, children(1))
    })

  private val kmvSketchLong: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("kmv_sketch_long"),
    new ExpressionInfo(classOf[KmvSketchLong].getName, "kmv_sketch_long"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "kmv_sketch_long takes (hash BIGINT, k INT)")
      val k = children(1) match {
        case e if e.foldable => e.eval().asInstanceOf[Number].intValue()
        case e => throw new IllegalArgumentException(s"k must be a literal, got $e")
      }
      KmvSketchLong(children.head, k)
    })

  private val cellArgmaxCosineLong: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("cell_argmax_cosine_long"),
    new ExpressionInfo(classOf[CellArgMaxCosineLong].getName, "cell_argmax_cosine_long"),
    (children: Seq[Expression]) => {
      require(children.length == 5,
        "cell_argmax_cosine_long takes (q, qn2, cells, cqs, cn2s)")
      CellArgMaxCosineLong(children(0), children(1), children(2), children(3), children(4))
    })

  /** Idempotent registration on an already-built session. */
  def register(spark: SparkSession): Unit = {
    for ((id, info, builder) <- Seq(arrayDotLong, kmvSketchLong, cellArgmaxCosineLong))
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
  }
}
