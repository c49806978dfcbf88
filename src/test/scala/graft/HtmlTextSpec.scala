package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.functions.HtmlText
import graft.operators.Crawl

/** Char-identical pin of the native [[HtmlText]] scanner against the regex
  * chain it replaced ([[Crawl.htmlTextRegex]] — the executable spec the
  * DuckDB oracle mirrors). Two layers:
  *
  *  - a scalacheck sweep of adversarial tag-soup concatenations against a
  *    pure-JVM java.util.regex rendition of the chain (exactly what Spark's
  *    RegExpReplace runs per pass);
  *  - a Spark-level equality of the native column vs the regex-chain column
  *    over the named corner cases, so the codegen path itself is covered.
  *
  * The corner list encodes the sequential-pass interactions documented on
  * [[HtmlText]]: style closes consumed by script regions, unterminated
  * opens falling through to the tag pass, block-closes inside malformed
  * tags extending the tag's extent, tags fusing across removed regions,
  * one-level entity decode, and `$`-anchor behavior at a trailing newline.
  */
class HtmlTextSpec extends SparkSpec {
  import spark.implicits._

  /** The chain as Spark executes it: java.util.regex per pass, literal
    * `replace` for entities, space-only trim (Spark's StringTrim strips
    * 0x20 only — NOT Java String.trim's <= 0x20).
    */
  private def refChain(html: String): String = {
    def rr(s: String, pat: String, repl: String): String =
      java.util.regex.Pattern.compile(pat).matcher(s)
        .replaceAll(java.util.regex.Matcher.quoteReplacement(repl))
    val noBlocks = rr(rr(rr(html,
      Crawl.ScriptPattern, " "), Crawl.StylePattern, " "),
      Crawl.CommentPattern, " ")
    val flat = rr(noBlocks, "\\s+", " ")
    val broken = rr(flat, Crawl.BlockBreakPattern, "\n")
    val noTags = rr(broken, Crawl.TagPattern, " ")
    val decoded = Crawl.Entities.foldLeft(noTags) {
      case (s, (ent, ch)) => s.replace(ent, ch)
    }
    val tidy = rr(rr(decoded, "[ \\t]+", " "), "[ ]*\\n[\\n ]*", "\n")
    val stripped = rr(tidy, "^\\n+|\\n+$", "")
    stripped.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
  }

  private val corners: Seq[String] = Seq(
    "",
    "plain text only",
    "a  \n\t b",
    // block structure vs source newlines
    "<body><p>one\ntwo</p><div>three</div><br>four</body>",
    "<p>a</p></p><br / ></BR><BR//>x<br x>y",
    "</blockquote></TABLE></Tr></h6></h7>",
    // script/style/comment removal, lazy closes, sequential passes
    "<script>var x = 1 < 2;</script>after",
    "<script a=b>x</script><script>y</script>z",
    "<SCRIPT>upper is not a script</SCRIPT>",
    "<script>unterminated",
    "<script no gt x y z",
    "<style>a<script>b</style>c</script>d</style>e",
    "<script>x<style>y</script>z</style>w",
    "<!-- c --><p>k</p><!-- unterminated",
    "<!--->not closed<!---->closed",
    "a<!--x> --> b>c",
    // region replacement fusing / breaking adjacency
    "<br<script>x</script>/>",
    "<sty<script>a</script>le>b</style>",
    "&a<!-- z -->mp;",
    // block-close inside a malformed tag extends the tag
    "<foo </p> bar>tail",
    "<foo </p> bar",
    "<foo </p",
    "x < y > z",
    "a<x\nhref=1>b",
    "lone < no close anywhere",
    "lone < then </p> later and no gt",
    // entities: one-level decode, non-entities, nbsp as whitespace
    "&amp;lt;tag&amp;gt;",
    "&#&#39;39;",
    "a&nbsp;&nbsp;b &amp; c&quot;d&#39;e",
    "&unknown; &lt &gt; &",
    "&amp;amp;",
    // edges: leading/trailing whitespace and newlines
    " <p>lead</p> ",
    "</p>leading block close",
    "trailing block close</p>",
    "\n\n<p>x</p>\n\n",
    "ctrl kept",
    // non-ASCII: Turkish dotted capital I must NOT fold onto 'i' tags
    "<TİTLE>x</TİTLE>",
    "café 的是 <p>ü</p>",
    // the production wrapper shape
    "<html><head><title>Doc 1 &amp; src</title><style>p{color:red}</style>" +
      "<script>var x = 1 < 2; send(x);</script></head><body><!-- nav -->\n" +
      "<h1>src</h1><p>body text here</p>\n<ul><li>Home</li><li>Next &gt;" +
      "</li></ul>\n<p>Lang: en</p></body></html>")

  test("native scanner == regex chain on the corner cases (JVM)") {
    corners.foreach { h =>
      assert(HtmlText.extractString(h) == refChain(h), s"input: ${h.take(80)}")
    }
  }

  test("native scanner == regex chain under scalacheck tag soup") {
    val frag: Gen[String] = Gen.oneOf(
      "<script", "<script>", "</script>", "<style>", "</style>", "<!--",
      "-->", "<p>", "</p>", "</P>", "<br/>", "<br / >", "<BR>", "<div>",
      "</div>", "</title>", "<title>", "<", ">", "/", "&lt;", "&amp;",
      "&amp;lt;", "&nbsp;", "&", ";", "#", "text", "a b", "\n", " ", "\t",
      "\r\n", "é", "的", "x>y", "wo rd", "--", "!")
    val doc: Gen[String] =
      Gen.chooseNum(0, 24).flatMap(k => Gen.listOfN(k, frag)).map(_.mkString)
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(800),
      Prop.forAll(doc) { h => HtmlText.extractString(h) == refChain(h) })
    assert(res.passed, res.status.toString)
  }

  test("native column == regex-chain column through codegen") {
    val df = corners.toDF("html")
    val both = df.select(
      Crawl.htmlText(col("html")).as("native"),
      Crawl.htmlTextRegex(col("html")).as("chain"))
    both.collect().foreach { r =>
      assert(r.getString(0) == r.getString(1))
    }
    // null stays null
    val nulls = Seq[Option[String]](None, Some("<p>x</p>")).toDF("html")
      .select(Crawl.htmlText(col("html"))).collect()
    assert(nulls(0).isNullAt(0) && nulls(1).getString(0) == "x")
  }
}
