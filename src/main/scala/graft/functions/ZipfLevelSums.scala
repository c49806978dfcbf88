package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, TernaryExpression}
import org.apache.spark.sql.types._

/** Codegen'd per-LEVEL Zipf regression sums: for a frequency level `(cnt,
  * k)` whose `k` tied tokens occupy ranks `base+1 .. base+k`, emit
  *
  *   (n, Σx, Σy, Σxy, Σxx) with x = round6(ln rank), y = round6(ln cnt)
  *
  * in one tight loop — the piece that lets zipf_fit's rank walk run
  * entirely on the GRID-BOUNDED level table. The fit's sums are invariant
  * to which tied token receives which rank (Σ f(rank) over a contiguous
  * run is assignment-independent), so no per-token rank — and therefore no
  * single-partition window over the vocabulary — exists anywhere.
  *
  * Exactness (the EntropyStats discipline): each term rounds via
  * BigDecimal(Double.toString) HALF_UP to an exact micro long — the same
  * value Spark's `round(col, 6)` produces — accumulates as integer micros
  * (order-free), and returns as DECIMAL(30,6), so the query-level
  * `sum(...).cast(double)` lands bit-identically to the former
  * per-token `sumDec` over the rank explode. The cross terms multiply the
  * ROUNDED doubles (`xd*yd`) exactly as the relational form multiplied its
  * round-6 columns.
  */
case class ZipfLevelSums(first: Expression, second: Expression,
                         third: Expression) extends TernaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("sx", DecimalType(30, 6), nullable = false),
    StructField("sy", DecimalType(30, 6), nullable = false),
    StructField("sxy", DecimalType(30, 6), nullable = false),
    StructField("sxx", DecimalType(30, 6), nullable = false)))

  override def prettyName: String = "zipf_level_sums"

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"zipf_level_sums requires (base: bigint, k: bigint, cnt: bigint), got " +
        children.map(_.dataType.catalogString).mkString(", "))

  private def round6Micros(x: Double): Long =
    BigDecimal(java.lang.Double.toString(x))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .bigDecimal.movePointRight(6).longValueExact

  def compute(base: Long, k: Long, cnt: Long): InternalRow = {
    val ym = round6Micros(math.log(cnt.toDouble))
    val yd = java.math.BigDecimal.valueOf(ym, 6).doubleValue()
    var sx = 0L; var sxy = 0L; var sxx = 0L
    var i = 1L
    while (i <= k) {
      val xm = round6Micros(math.log((base + i).toDouble))
      val xd = java.math.BigDecimal.valueOf(xm, 6).doubleValue()
      sx += xm
      sxy += round6Micros(xd * yd)
      sxx += round6Micros(xd * xd)
      i += 1
    }
    def dec(m: Long) = Decimal(m, 30, 6)
    new GenericInternalRow(Array[Any](k, dec(sx), dec(ym * k), dec(sxy), dec(sxx)))
  }

  override protected def nullSafeEval(b: Any, k: Any, c: Any): Any =
    compute(b.asInstanceOf[Long], k.asInstanceOf[Long], c.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("zipfLevelSums", this)
    nullSafeCodeGen(ctx, ev, (b, k, c) =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $ref.compute($b, $k, $c);")
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): ZipfLevelSums =
    copy(first = f, second = s, third = t)
}
