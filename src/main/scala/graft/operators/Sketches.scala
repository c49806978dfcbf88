package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate sketches for cardinality/quantiles at scale (SURVEY.md §2.5
  * adjunct). Both are order-independent mergeable sketches — the only shapes
  * that survive 1000-executor partial aggregation:
  *  - HyperLogLog++ (`approx_count_distinct`): register-max merge;
  *  - KLL-style quantiles (`percentile_approx`).
  * Estimates are engine-specific, so queries using these are rows-only; specs
  * bound the error against exact answers.
  */
object Sketches {

  /** Per-group exact + HLL cardinality side by side (rsd = relative sd). */
  def distinctWithApprox(df: DataFrame, groupCols: Seq[String], target: String,
                         rsd: Double = 0.05): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(countDistinct(col(target)).as("exact_distinct"),
        approx_count_distinct(col(target), rsd).as("approx_distinct"))

  /** Per-group exact median + approximate percentile side by side. */
  def medianWithApprox(df: DataFrame, groupCols: Seq[String], target: String,
                       accuracy: Int = 10000): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(expr(s"percentile($target, 0.5)").as("exact_p50"),
        percentile_approx(col(target), lit(0.5), lit(accuracy)).as("approx_p50"))

  // --- count-min sketch (heavy hitters) ------------------------------------
  // Unlike HLL/KLL above, the CMS is INTEGER state under per-cell addition —
  // order-free and engine-exact, so its heads hash-verify against the
  // DuckDB oracle like any exact query. h×w cells bound the state however
  // large the corpus: executors build partial sketches, the shuffle merges
  // them, and a stream accumulates the same cells in complete mode with
  // ≤ h×w groups.

  /** Sketch row h's cell for a token column — sha-keyed and shared verbatim
    * with the oracle (`cmsPosSql`).
    */
  def cmsPos(h: Int, tok: Column, w: Long): Column =
    pmod(graft.functions.Text.portableHash(
      concat(lit(s"cms$h:"), tok)), lit(w))

  /** SQL twin of [[cmsPos]]. */
  def cmsPosSql(h: Int, e: String, w: Long): String =
    s"${graft.functions.Text.portableHashSql(s"'cms$h:' || $e")} % $w"

  /** The h×w cell counts of a token frame — ONE pass, map-side partial
    * sums, ≤ h×w result rows at any corpus size.
    */
  def cmsCells(toks: DataFrame, h: Int, w: Long): DataFrame =
    toks.select(explode(array((0 until h).map(i =>
        struct(lit(i).as("h"), cmsPos(i, col("tok"), w).as("pos"))): _*))
        .as("c"))
      .groupBy(col("c.h").as("h"), col("c.pos").as("pos"))
      .agg(count(lit(1)).as("cnt"))

  /** Heavy-hitter report over a (possibly drained-from-a-stream) sketch:
    * distinct terms probe the broadcast cells (estimate = min over rows,
    * the CMS upper bound), candidates clear `total div divisor`, and the
    * EXACT count verifies candidates only (semi-join — the full-vocabulary
    * count aggregate never runs). `heavy` = the verified verdict; sketch
    * false positives surface as heavy=false rows.
    */
  def cmsHeavyReport(toks: DataFrame, cells: DataFrame, h: Int, w: Long,
                     divisor: Long): DataFrame = {
    val total = cells.where(col("h") === 0)
      .agg(sum(col("cnt")).cast("long").as("total"))
    val probed = (0 until h).foldLeft(toks.select(col("tok")).distinct()) {
      (df, i) =>
        df.join(broadcast(cells.where(col("h") === i)
            .select(col("pos").as(s"pos$i"), col("cnt").as(s"c$i"))),
          cmsPos(i, col("tok"), w) === col(s"pos$i"))
    }.withColumn("est", least((0 until h).map(i => col(s"c$i")): _*))
    val cand = probed.crossJoin(broadcast(total))
      .where(col("est") >= expr(s"total div $divisor"))
      .select(col("tok"), col("est"), col("total"))
      .localCheckpoint() // vocabulary-bounded; feeds the verify twice
    val exact = toks
      .join(broadcast(cand.select(col("tok"))), Seq("tok"), "left_semi")
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    cand.join(exact, Seq("tok"))
      .select(col("tok"), col("est"), col("cnt"),
        (col("cnt") >= expr(s"total div $divisor")).as("heavy"))
  }
}
