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
}
