package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd count-min-sketch row positions of a token: ONE sha256 digest,
  * `h` DISJOINT 15-hex-char windows (60 bits each, Kirsch-Mitzenmacher
  * style derivation of the row hashes from a single strong digest), each
  * reduced mod `w` — read straight from the digest NIBBLES, no hex string
  * round-trip (the PortableHashArr discipline).
  *
  * This replaced the per-row prefixed-digest form (`sha256('cms<i>:' ||
  * tok)` per row): at 600M rows the heavy_hitters pair spent its time in
  * h separate sha walks plus the hex/conv string path per token
  * occurrence. One digest bounds the sha cost per token at 1 regardless of
  * h (h·15 ≤ 64 hex chars — enforced), and the oracle twin reads the SAME
  * windows via `substr(sha256(tok), 1+15i, 15)` (Sketches.cmsPosSql), so
  * the sketch stays engine-exact and hash-verified.
  */
case class CmsPositions(child: Expression, h: Int, w: Long)
    extends UnaryExpression {
  require(h >= 1 && h * 15 <= 64, s"cms_positions: need 1 <= h <= 4, got $h")
  require(w >= 1, s"cms_positions: need w >= 1, got $w")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = s"cms_positions_${h}_$w"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cms_positions requires a string, got ${other.catalogString}")
  }

  def compute(tok: UTF8String): ArrayData = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val dig = md.digest(tok.getBytes)
    val out = new Array[Long](h)
    var i = 0
    while (i < h) {
      var v = 0L
      var j = 15 * i
      val end = j + 15
      while (j < end) {
        val b = dig(j >> 1) & 0xFF
        v = (v << 4) | (if ((j & 1) == 0) b >>> 4 else b & 0xF)
        j += 1
      }
      out(i) = v % w // v is 60-bit, always nonnegative
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cmsPositions", this)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): CmsPositions =
    copy(child = newChild)
}
