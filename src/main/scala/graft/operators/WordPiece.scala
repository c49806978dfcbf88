package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** WordPiece merge training — the THIRD tokenizer family beside BPE
  * (Bpe.scala) and unigram (Unigram.scala): the BERT-style likelihood
  * criterion (Schuster & Nakajima 2012; the public HuggingFace-documented
  * training rule). Each round merges the adjacent symbol pair maximizing
  *
  *   score = count(pair) / (count(lhs) * count(rhs))
  *
  * instead of BPE's raw pair count — the pair that most increases the
  * corpus unigram-LM likelihood. Non-initial symbols carry the `##`
  * continuation marker (the WordPiece vocabulary convention); a merge
  * concatenates lhs with rhs-minus-marker, so the merged symbol inherits
  * the lhs's position class.
  *
  * Scale posture: identical to BPE's — the ONE corpus-sized job is the
  * initial word-frequency aggregate; every round after runs on the
  * VOCABULARY (pair counts + symbol counts, both partial-aggregated and
  * vocabulary-bounded), the winner crosses the driver as a 2-string value,
  * and per-round localCheckpoints pin constant plan depth. Scores compare
  * as doubles built from exact integer counts with the SAME operand order
  * in both engines (two long→double conversions, one multiply, one divide
  * — IEEE-identical), ties broken (lhs asc, rhs asc).
  */
object WordPiece {

  private val Marker = "##"

  /** Merged symbol of a (lhs, rhs) pair: rhs drops its continuation
    * marker; the result inherits lhs's class.
    */
  private[graft] def merged(l: String, r: String): String =
    l + r.stripPrefix(Marker)

  /** Vocabulary frame (w, syms, n) with `##`-marked non-initial
    * characters: "word" → "w ##o ##r ##d".
    */
  private[graft] def initVocab(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(Text.tokens(col(textCol))).as("w"))
      .where(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .select(col("w"),
        when(length(col("w")) === 1, col("w"))
          .otherwise(concat_ws(" ",
            substring(col("w"), 1, 1),
            concat_ws(" ", transform(
              split(substring(col("w"), 2, Int.MaxValue), "(?!^)(?!$)"),
              c => concat(lit(Marker), c))))).as("syms"),
        col("n"))
      .localCheckpoint(eager = false)

  /** One WordPiece merge over a space-joined symbol string — the same
    * leftmost, non-overlapping left fold as Bpe.applyMerge, with the
    * merged replacement [[merged]](l, r) instead of l+r.
    */
  private[graft] def applyMerge(syms: Column, l: String, r: String): Column = {
    val toks = split(syms, " ")
    val rest = slice(toks, lit(2), size(toks) - 1)
    aggregate(rest, element_at(toks, 1), (acc, s) =>
      when(s === lit(r) && (acc === lit(l) || acc.endsWith(lit(" " + l))),
        concat(acc.substr(lit(1), length(acc) - lit(l.length)),
          lit(merged(l, r))))
        .otherwise(concat(acc, lit(" "), s)))
  }

  /** The round's winner under the likelihood score: vocabulary-bounded
    * pair counts joined (broadcast) with the vocabulary-bounded symbol
    * counts on both sides, ranked by (score desc, lhs asc, rhs asc) — one
    * aggregate pair + TakeOrderedAndProject, never a corpus pass.
    * Output: (lhs, rhs, cnt, lhs_cnt, rhs_cnt).
    */
  private[graft] def bestPair(vocab: DataFrame): DataFrame = {
    val pair = split(col("pair"), " ")
    val pairs = vocab
      .select(col("n"),
        explode(Text.shingles(split(col("syms"), " "), 2)).as("pair"))
      .select(element_at(pair, 1).as("lhs"), element_at(pair, 2).as("rhs"),
        col("n"))
      .groupBy(col("lhs"), col("rhs")).agg(sum(col("n")).as("cnt"))
    val syms = vocab
      .select(col("n"), explode(split(col("syms"), " ")).as("sym"))
      .groupBy(col("sym")).agg(sum(col("n")).as("c"))
    pairs
      .join(broadcast(syms.select(col("sym").as("lhs"), col("c").as("lhs_cnt"))),
        Seq("lhs"))
      .join(broadcast(syms.select(col("sym").as("rhs"), col("c").as("rhs_cnt"))),
        Seq("rhs"))
      .withColumn("score",
        col("cnt").cast("double") /
          (col("lhs_cnt").cast("double") * col("rhs_cnt").cast("double")))
      .orderBy(col("score").desc, col("lhs").asc, col("rhs").asc)
      .limit(1)
      .select(col("lhs"), col("rhs"), col("cnt"),
        col("lhs_cnt"), col("rhs_cnt"))
  }

  /** A trained WordPiece model: the merge table (rnd, lhs, rhs, cnt,
    * lhs_cnt, rhs_cnt — integer evidence for the score, which is
    * derivable) plus the fully-merged vocabulary (w, syms, n) — word →
    * trained segmentation, the encode map.
    */
  final case class Model(merges: Seq[(Int, String, String, Long, Long, Long)],
                         vocab: DataFrame)

  /** Train `rounds` WordPiece merges; stops early when no pair remains. */
  def train(df: DataFrame, textCol: String, rounds: Int): Model = {
    require(rounds > 0, s"wordpiece: rounds must be > 0, got $rounds")
    var vocab = initVocab(df, textCol)
    val out = Seq.newBuilder[(Int, String, String, Long, Long, Long)]
    var rnd = 1
    var exhausted = false
    while (rnd <= rounds && !exhausted) {
      bestPair(vocab).collect().headOption match {
        case None => exhausted = true
        case Some(row) =>
          val (l, r) = (row.getString(0), row.getString(1))
          out += ((rnd, l, r, row.getLong(2), row.getLong(3), row.getLong(4)))
          vocab = vocab.withColumn("syms", applyMerge(col("syms"), l, r))
            .localCheckpoint(eager = false)
          rnd += 1
      }
    }
    Model(out.result(), vocab)
  }
}
