package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass-per-stage HTML visible-text extraction — the codegen'd
  * twin of the `Crawl.htmlText` regex chain (script/style/comment blocks
  * out, source whitespace flattened, block-closing tags to newlines, tags
  * to spaces, entities decoded, whitespace tidied, edges stripped).
  *
  * The regex chain walks the full document once PER PASS through
  * java.util.regex's lazy-dotall scanner (~10 full-string rebuilds per row);
  * at 600M rows that chain was the whole cost of the crawl-extraction
  * journeys (config_corpus_crawl / stream_corpus_extract — the top non-sink
  * sf100 rows). This scanner does three literal-substring removal passes
  * plus one finishing walk, no regex engine anywhere — the TokenCounts /
  * ShingleArray native-codegen discipline.
  *
  * CHAR-IDENTICAL CONTRACT (property-pinned in HtmlTextSpec): the output
  * equals the regex chain's output for EVERY input — the DuckDB oracle twin
  * keeps running the chain, so any divergence fails the hash gate. The
  * non-obvious sequential-pass interactions the scanner reproduces:
  *
  *  - style regions are matched on the SCRIPT-REMOVED string and comments
  *    on the script+style-removed string (a `</style>` inside a script
  *    region is consumed by the script pass and cannot close a style
  *    region) — hence three ordered removal passes, not one;
  *  - an unterminated script/style open tag (no `>` or no close tag
  *    downstream) is NOT a region: the open tag falls through to the
  *    generic-tag pass and its content survives as text;
  *  - the block-close pass replaces matches ANYWHERE — including inside a
  *    malformed larger tag, where it deletes the block-close's `>` and so
  *    extends the enclosing tag's extent to the next surviving `>`
  *    (`<foo </p> bar>` collapses to one space, not a line break);
  *  - a generic tag matches iff a surviving `>` exists downstream; once one
  *    scan hits end-of-string without finding one, no later generic tag can
  *    match either (the scanner turns the check off instead of rescanning);
  *  - entity decode is one ordered table (`&amp;` last, so `&amp;lt;`
  *    decodes exactly one level); no two entities can match at the same
  *    position (all differ at index 1) and no replacement can fuse with
  *    neighbors into a new match (only `&amp;` emits `&`, and it is the
  *    final pass), so left-to-right positional decoding is exactly the
  *    sequential global replaces;
  *  - `&nbsp;` decodes to a SPACE that later collapse/trim stages treat as
  *    whitespace — the scanner folds it into the pending-whitespace state,
  *    where a pending newline (from a block close) always dominates a
  *    pending space and edge whitespace is dropped entirely.
  *
  * Matching is ASCII-only by construction: `\s` without UNICODE_CHARACTER
  * _CLASS is exactly {space, \t, \n, \x0B, \f, \r}, and `(?i)` without
  * UNICODE_CASE folds only ASCII letters (the scanner's own ASCII fold —
  * NOT String.regionMatches(ignoreCase), whose toLowerCase fallback would
  * wrongly fold U+0130 onto 'i').
  */
object HtmlText {

  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == 0x0B || c == '\f' || c == '\r'

  /** ASCII-only case-insensitive char match against a lowercase pattern
    * char (the `(?i)`-without-UNICODE_CASE fold).
    */
  @inline private def asciiIC(a: Char, p: Char): Boolean =
    a == p || (a >= 'A' && a <= 'Z' && (a + 32) == p)

  /** ASCII case-insensitive literal match of lowercase `pat` at `i`. */
  private def matchIC(s: String, i: Int, pat: String): Boolean = {
    if (i + pat.length > s.length) return false
    var k = 0
    while (k < pat.length) {
      if (!asciiIC(s.charAt(i + k), pat.charAt(k))) return false
      k += 1
    }
    true
  }

  /** The block-close alternatives of `Crawl.BlockBreakPattern`, fixed
    * lowercase strings (the `</tag>` arm admits NO whitespace — any source
    * whitespace inside would have flattened to a space and broken the
    * match, so a literal compare on the original string is exact).
    */
  private val BlockCloseTags: Array[String] = Array(
    "</p>", "</div>", "</li>", "</ul>", "</ol>",
    "</h1>", "</h2>", "</h3>", "</h4>", "</h5>", "</h6>",
    "</tr>", "</table>", "</title>", "</blockquote>")

  /** End index (exclusive) of a block-close match starting at `i` (which
    * holds '<'), or -1. The `<br[ /]*>` arm matches against the FLATTENED
    * string, where `[ /]*` sees the single space each source whitespace
    * run became — so on the original string it admits any mix of
    * whitespace and '/'.
    */
  private def blockCloseEnd(s: String, i: Int): Int = {
    val n = s.length
    if (i + 1 >= n) return -1
    val c1 = s.charAt(i + 1)
    if (c1 == '/') {
      var t = 0
      while (t < BlockCloseTags.length) {
        val tag = BlockCloseTags(t)
        if (matchIC(s, i, tag)) return i + tag.length
        t += 1
      }
      -1
    } else if (asciiIC(c1, 'b') && i + 2 < n && asciiIC(s.charAt(i + 2), 'r')) {
      var j = i + 3
      while (j < n && (isWs(s.charAt(j)) || s.charAt(j) == '/')) j += 1
      if (j < n && s.charAt(j) == '>') j + 1 else -1
    } else -1
  }

  /** `(?s)<OPEN[^>]*>.*?</CLOSE>` -> " " globally (case-sensitive, lazy:
    * the region ends at the FIRST close literal after the open tag's '>').
    * An open with no '>' or no close downstream does not match and stays
    * for the later passes. The two memo bounds keep repeated failing opens
    * linear (once a '>' scan or a close search fails from some position,
    * every later one fails too).
    */
  private def stripElements(s: String, openLit: String, closeLit: String): String = {
    var i = s.indexOf(openLit)
    if (i < 0) return s
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var start = 0
    var gtMissingFrom = Int.MaxValue
    var closeMissingFrom = Int.MaxValue
    // memo of the last '>' scan: no '>' in [gtScanLo, gtPos)
    var gtScanLo = -1
    var gtPos = -2
    while (i >= 0) {
      var end = -1
      val j0 = i + openLit.length
      if (j0 < gtMissingFrom) {
        var j = -1
        if (j0 >= gtScanLo && j0 <= gtPos) j = gtPos
        else {
          var k = j0
          while (k < n && s.charAt(k) != '>') k += 1
          if (k < n) { j = k; gtScanLo = j0; gtPos = k }
        }
        if (j < 0) gtMissingFrom = j0
        else if (j + 1 < closeMissingFrom) {
          val c = s.indexOf(closeLit, j + 1)
          if (c < 0) closeMissingFrom = j + 1
          else end = c + closeLit.length
        }
      }
      if (end >= 0) {
        sb.append(s, start, i).append(' ')
        start = end
        i = s.indexOf(openLit, end)
      } else {
        i = s.indexOf(openLit, i + 1)
      }
    }
    if (start == 0) s
    else { sb.append(s, start, n); sb.toString }
  }

  /** `(?s)<!--.*?-->` -> " " globally (lazy; close searched from open+4, so
    * `<!--->` does not self-close). Once a close search fails, every later
    * open fails too.
    */
  private def stripComments(s: String): String = {
    var i = s.indexOf("<!--")
    if (i < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var start = 0
    var done = false
    while (i >= 0 && !done) {
      val c = s.indexOf("-->", i + 4)
      if (c < 0) done = true
      else {
        sb.append(s, start, i).append(' ')
        start = c + 3
        i = s.indexOf("<!--", start)
      }
    }
    if (start == 0) s
    else { sb.append(s, start, s.length); sb.toString }
  }

  /** Entity table of `Crawl.Entities` as a positional decoder: returns
    * `(len << 16) | replacementChar` for a match at `i`, or -1. All six
    * entities differ at index 1, so at most one matches — table order is
    * only about `&amp;` being the one that emits '&' (never re-decoded,
    * because the walk moves past it).
    */
  private def entityAt(s: String, i: Int): Int = {
    val n = s.length
    if (i + 3 >= n) return -1 // shortest entity is 4 chars
    s.charAt(i + 1) match {
      case 'l' =>
        if (s.charAt(i + 2) == 't' && s.charAt(i + 3) == ';') (4 << 16) | '<'
        else -1
      case 'g' =>
        if (s.charAt(i + 2) == 't' && s.charAt(i + 3) == ';') (4 << 16) | '>'
        else -1
      case 'q' =>
        if (i + 5 < n && s.charAt(i + 2) == 'u' && s.charAt(i + 3) == 'o' &&
          s.charAt(i + 4) == 't' && s.charAt(i + 5) == ';') (6 << 16) | '"'
        else -1
      case '#' =>
        if (i + 4 < n && s.charAt(i + 2) == '3' && s.charAt(i + 3) == '9' &&
          s.charAt(i + 4) == ';') (5 << 16) | '\''
        else -1
      case 'n' =>
        if (i + 5 < n && s.charAt(i + 2) == 'b' && s.charAt(i + 3) == 's' &&
          s.charAt(i + 4) == 'p' && s.charAt(i + 5) == ';') (6 << 16) | ' '
        else -1
      case 'a' =>
        if (i + 4 < n && s.charAt(i + 2) == 'm' && s.charAt(i + 3) == 'p' &&
          s.charAt(i + 4) == ';') (5 << 16) | '&'
        else -1
      case _ => -1
    }
  }

  /** Stages B-H of the chain over the removal-pass output: whitespace
    * flatten, block closes to newlines, tags to spaces, entities, collapse,
    * edge strip — as one walk with pending-whitespace state (newline
    * dominates space; edges drop).
    */
  private def finish(s: String): String = {
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var pendingSpace = false
    var pendingNL = false
    var noTagClose = false
    var i = 0

    @inline def emit(c: Char): Unit = {
      if (sb.length > 0) {
        if (pendingNL) sb.append('\n')
        else if (pendingSpace) sb.append(' ')
      }
      pendingNL = false
      pendingSpace = false
      sb.append(c)
    }

    while (i < n) {
      val c = s.charAt(i)
      if (isWs(c)) { pendingSpace = true; i += 1 }
      else if (c == '<') {
        val bc = blockCloseEnd(s, i)
        if (bc >= 0) { pendingNL = true; i = bc }
        else if (!noTagClose) {
          // generic `<[^>]*>` in block-close-replaced coordinates: scan for
          // the first '>' that is not inside a block-close match (whose '>'
          // the earlier pass deleted)
          var k = i + 1
          var end = -1
          while (k < n && end < 0) {
            val ck = s.charAt(k)
            if (ck == '>') end = k + 1
            else if (ck == '<') {
              val b2 = blockCloseEnd(s, k)
              if (b2 >= 0) k = b2 else k += 1
            } else k += 1
          }
          if (end >= 0) { pendingSpace = true; i = end }
          else { noTagClose = true; emit('<'); i += 1 }
        } else { emit('<'); i += 1 }
      } else if (c == '&') {
        val e = entityAt(s, i)
        if (e >= 0) {
          val repl = (e & 0xFFFF).toChar
          if (repl == ' ') pendingSpace = true else emit(repl)
          i += (e >>> 16)
        } else { emit('&'); i += 1 }
      } else { emit(c); i += 1 }
    }
    sb.toString
  }

  /** The full chain on a String. */
  def extractString(html: String): String =
    finish(stripComments(stripElements(
      stripElements(html, "<script", "</script>"), "<style", "</style>")))

  /** Codegen entry point. */
  def extract(html: UTF8String): UTF8String =
    UTF8String.fromString(extractString(html.toString))
}

/** Native `Crawl.htmlText` (see [[HtmlText]]). */
case class HtmlVisibleText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "html_visible_text"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"html_visible_text requires a string, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    HtmlText.extract(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HtmlText.extract($c);")

  override protected def withNewChildInternal(newChild: Expression): HtmlVisibleText =
    copy(child = newChild)
}
