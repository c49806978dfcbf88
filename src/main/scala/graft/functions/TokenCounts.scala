package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd token counters — single byte-level passes over the UTF-8
  * payload replacing the `regexp_count` hot path (java.util.regex walks an
  * alternation NFA per position; at 600M rows that regex was the whole cost
  * of token_count — the Text-native lesson from the round-9 5-25× wins).
  *
  * BIT-EQUAL CONTRACT (property-pinned in PropertyExprSpec): each counter
  * reproduces `regexp_count` over the shared pattern constants exactly —
  * the DuckDB oracle twins keep running the regex, so any divergence fails
  * the hash gate.
  *
  * Byte-level is safe because every class boundary is ASCII: Java's `\s`
  * without UNICODE_CHARACTER_CLASS is exactly {space, \t, \n, \x0B, \f, \r},
  * all single bytes in UTF-8, and multi-byte sequences contain no bytes
  * < 0x80 — so ASCII-run scans can never split or misread a non-ASCII code
  * point. Non-ASCII code points count once via their LEAD byte
  * ((b & 0xC0) != 0x80), matching the regex engine's code-point iteration.
  */
object TokenCounts {
  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'
  @inline private def isLower(b: Byte): Boolean = b >= 'a' && b <= 'z'
  @inline private def isUpper(b: Byte): Boolean = b >= 'A' && b <= 'Z'
  @inline private def isDigit(b: Byte): Boolean = b >= '0' && b <= '9'

  /** `regexp_count(text, '\S+')`: maximal runs of non-`\s` code points.
    * Run boundaries are ASCII whitespace bytes, so counting byte-runs is
    * identical to counting code-point runs.
    */
  def countWs(s: UTF8String): Int = {
    val n = s.numBytes()
    var i = 0
    var count = 0
    var inRun = false
    while (i < n) {
      val ws = isWs(s.getByte(i))
      if (!ws && !inRun) count += 1
      inRun = !ws
      i += 1
    }
    count
  }

  /** `regexp_count(text, Text.BpeTokenPattern)` =
    * `[a-z]+|[A-Z][a-z]*|[0-9]|[^\sa-zA-Z0-9]` with java.util.regex's
    * leftmost, alternative-order, non-overlapping scan: lowercase runs are
    * greedy, an uppercase letter absorbs the following lowercase run,
    * digits are single tokens, and every other non-whitespace CODE POINT
    * (punctuation, non-ASCII letters, emoji) is one token.
    */
  def countBpe(s: UTF8String): Int = {
    val n = s.numBytes()
    var i = 0
    var count = 0
    while (i < n) {
      val b = s.getByte(i)
      if (isLower(b)) {
        count += 1
        i += 1
        while (i < n && isLower(s.getByte(i))) i += 1
      } else if (isUpper(b)) {
        count += 1
        i += 1
        while (i < n && isLower(s.getByte(i))) i += 1
      } else if (isDigit(b)) {
        count += 1
        i += 1
      } else if (isWs(b)) {
        i += 1
      } else {
        // any other code point is one token; continuation bytes don't count
        if ((b & 0xC0) != 0x80) count += 1
        i += 1
      }
    }
    count
  }
}

/** Native `regexp_count(text, '\S+')`. */
case class WsTokenCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "ws_token_count"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ws_token_count requires a string, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    TokenCounts.countWs(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenCounts.countWs($c);")

  override protected def withNewChildInternal(newChild: Expression): WsTokenCount =
    copy(child = newChild)
}

/** Native `regexp_count(text, Text.BpeTokenPattern)`. */
case class BpeTokenCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "bpe_token_count"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_token_count requires a string, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    TokenCounts.countBpe(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenCounts.countBpe($c);")

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}
