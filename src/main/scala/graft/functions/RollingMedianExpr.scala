package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types._

/** Codegen'd rolling-window exact median over k OFFSET probes.
  *
  * The rolling median's natural Spark shape —
  * `sort_array(collect_list(v) OVER frame)` — builds and sorts a boxed
  * object-aggregate buffer per ROW; at the 1000× decade that priced
  * rolling_median ~3× its plan-identical rolling_mean sibling, and the HOF
  * replacement (`array_sort(filter(array(lag0..lagk)))` + element_at) is
  * CodegenFallback — interpreted per row, measured no faster at sf10. This
  * is the tight primitive form: the k window-offset values arrive as
  * children (lag is a bare row-buffer read in WindowExec), NULLs — both
  * missing VALUES and probes past the partition head — are skipped in the
  * gather, and the ≤k survivors insertion-sort in a stack array.
  *
  * Semantics are EXACTLY the reference's RollingMedian branch
  * (transforms/rolling_window.py): fewer than `minSamples` survivors →
  * NULL; odd n → middle; even n → lower + (upper - lower) / 2, except a
  * zero-straddling pair uses (lower + upper) / 2 — the two forms differ in
  * floating point, and the DuckDB oracle replays the same branch.
  * OrderedSpec pins equality with the collect_list shape.
  */
case class RollingMedianK(children: Seq[Expression], minSamples: Int)
  extends Expression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "rolling_median_k"

  override def checkInputDataTypes(): TypeCheckResult =
    children.find(_.dataType != DoubleType) match {
      case Some(bad) => TypeCheckResult.TypeCheckFailure(
        s"rolling_median_k requires double probes, got ${bad.dataType.catalogString}")
      case None if children.isEmpty =>
        TypeCheckResult.TypeCheckFailure("rolling_median_k needs probes")
      case None => TypeCheckResult.TypeCheckSuccess
    }

  override def eval(input: InternalRow): Any = {
    val buf = new Array[Double](children.length)
    var cnt = 0
    children.foreach { c =>
      val v = c.eval(input)
      if (v != null) { buf(cnt) = v.asInstanceOf[Double]; cnt += 1 }
    }
    if (cnt < minSamples) null else RollingMedianK.median(buf, cnt)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val buf = ctx.freshName("medBuf")
    val cnt = ctx.freshName("medCnt")
    val evals = children.map(_.genCode(ctx))
    val gather = evals.map { e =>
      s"""${e.code}
         |if (!${e.isNull}) { $buf[$cnt] = ${e.value}; $cnt++; }""".stripMargin
    }.mkString("\n")
    ev.copy(code =
      code"""
         |double[] $buf = new double[${children.length}];
         |int $cnt = 0;
         |$gather
         |boolean ${ev.isNull} = $cnt < $minSamples;
         |double ${ev.value} = 0.0;
         |if (!${ev.isNull}) {
         |  ${ev.value} = graft.functions.RollingMedianK.median($buf, $cnt);
         |}
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): RollingMedianK =
    copy(children = newChildren)
}

object RollingMedianK {

  /** Median of buf[0, n): sorts in place (n ≤ the window constant — a
    * stack-local insertion-scale sort), then the reference branch.
    */
  def median(buf: Array[Double], n: Int): Double = {
    java.util.Arrays.sort(buf, 0, n)
    if (n % 2 == 1) buf(n / 2)
    else {
      val lower = buf(n / 2 - 1)
      val upper = buf(n / 2)
      if (lower < 0.0 && upper > 0.0) (lower + upper) / 2.0
      else lower + (upper - lower) / 2.0
    }
  }
}
