package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd sequential dot product of two double arrays.
  *
  * Semantics are EXACTLY the HOF form
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0.0, (acc,x) -> acc + x)`:
  * a strict left fold in element order, so the IEEE rounding of every
  * intermediate sum is identical — the property the DuckDB oracle depends
  * on (`list_reduce(list_prepend(0.0, ...))`). zip_with pads the shorter
  * array with NULL, which poisons the product and then the sum; mirrored
  * here by returning NULL on length mismatch or any NULL element.
  *
  * Why custom: the HOF chain is CodegenFallback — ~64 interpreted lambda
  * evaluations per pair. ANN queries score |queries|×|corpus| pairs, so the
  * interpreted overhead dominates their runtime (measured ~3s of ann_ivf's
  * bench time at sf0.1); this is a tight primitive loop instead.
  */
case class DotProd(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_prod"

  private def ok(dt: DataType): Boolean = dt match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_prod requires two array<double>, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  /** Boxed result so codegen's null handling stays simple: null = the HOF
    * chain's NULL-poisoning outcome.
    */
  def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null // zip_with pads with NULL → NULL sum
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dotProd", this)
    val boxed = ctx.freshName("boxed")
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |java.lang.Double $boxed = $ref.compute($a, $b);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $boxed.doubleValue(); }
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): DotProd =
    copy(left = newLeft, right = newRight)
}

object DotProd {
  def register(spark: org.apache.spark.sql.SparkSession): String = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_prod", exprs => DotProd(exprs(0), exprs(1)), "built-in")
    "dot_prod"
  }
}
