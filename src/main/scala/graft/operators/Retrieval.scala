package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sparse-retrieval / fingerprinting operators for corpus mining
  * (SURVEY.md §2.7 additions): MOSS-style winnowing fingerprints and the
  * shared pieces of the BM25 inverted-index scorer.
  *
  * Reference framing: the reference pipeline fingerprints documents with a
  * single rolling hash (`doc_fingerprint`); winnowing is the
  * locality-selecting refinement (Schleimer, Wilkerson, Aiken: "Winnowing:
  * Local Algorithms for Document Fingerprinting", SIGMOD 2003) that keeps a
  * guaranteed-coverage SUBSET of k-gram hashes, so two documents sharing any
  * run of >= k + w - 1 characters share at least one fingerprint. All
  * arithmetic is 64-bit integer modular hashing — bit-identical in any
  * engine, which is what makes the head oracle-checkable.
  */
object Retrieval {

  val HashMod: Long = 1000000007L
  val HashBase: Long = 31L

  /** Winnowing fingerprints of `textCol`, as `(idCol, fps array<long>)`:
    * lowercase → polynomial k-gram hashes (base 31 mod 1e9+7, the
    * doc_fingerprint chain) → minimum per window of `w` consecutive gram
    * hashes → distinct. One codegen'd [[graft.functions.WinnowFps]]
    * expression per row (O(n·k) + a monotone-deque sliding min) — zero
    * shuffles, embarrassingly parallel at any corpus size. The same chain
    * as built-in HOFs is quadratic after CollapseProject inlining, which
    * is why this is a custom expression.
    */
  def winnowFingerprints(df: DataFrame, idCol: String, textCol: String,
                         k: Int, w: Int): DataFrame = {
    require(k >= 2 && w >= 1, s"winnow: need k >= 2, w >= 1, got k=$k w=$w")
    graft.functions.WinnowFps.register(df.sparkSession)
    df.select(col(idCol),
      expr(s"winnow_fps(lower($textCol), $k, $w)").as("fps"))
  }

  /** DuckDB twin of [[winnowFingerprints]] as an expression over a text
    * column `t` (already lowercased by the caller's CTE) — the same
    * code-array → gram-fold → window-min → distinct chain in list
    * comprehensions, shared so the two engines cannot drift.
    */
  def winnowFingerprintsSql(t: String, k: Int, w: Int): String =
    s"""list_distinct([list_min(list_slice(gh, j, j + ${w - 1}))
          for j in generate_series(1, len(gh) - ${w - 1})])""".stripMargin

  /** The gram-hash list `gh` for [[winnowFingerprintsSql]], over a
    * lowercased text column `t`.
    */
  def gramHashesSql(t: String, k: Int): String =
    s"""[list_reduce(
           list_prepend(CAST(0 AS BIGINT),
             [CAST(ascii($t[i + j]) AS BIGINT)
              for j in generate_series(0, ${k - 1})]),
           (acc, c) -> (acc * $HashBase + c) % $HashMod)
         for i in generate_series(1, length($t) - ${k - 1})]"""
}
