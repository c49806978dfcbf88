package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream composition (SURVEY.md §2.4).
  *
  * Capability reference: /root/reference/src/datapipeline/alignment/
  * broadcast.py and engine.py. The reference indexes a finite unpartitioned
  * stream in driver memory and merge-intersects sorted iterators; Spark-first,
  * those are a broadcast hash join and a multi-way sort-merge join — same
  * semantics, cluster-scalable.
  */
object Compose {

  /** reference: alignment/broadcast.py broadcast_stream — attach one
    * unpartitioned temporal stream to every partition of a partitioned
    * primary at the exact timestamp. Matching is exact (no as-of/fill);
    * inner semantics: the reference errors on a missing match, a declarative
    * plan surfaces coverage through [[broadcastCoverage]] instead.
    * Broadcast-side columns are prefixed to avoid collisions.
    */
  def broadcastJoin(primary: DataFrame, smallStream: DataFrame, timeCol: String,
                    prefix: String = "b_"): DataFrame = {
    val renamed = smallStream.columns.foldLeft(smallStream) { (d, c) =>
      if (c == timeCol) d else d.withColumnRenamed(c, prefix + c)
    }
    primary.join(broadcast(renamed), Seq(timeCol), "inner")
  }

  /** Primary rows that have no broadcast match (the condition the reference
    * raises on). Usable as a data-quality gate.
    */
  def broadcastCoverage(primary: DataFrame, smallStream: DataFrame,
                        timeCol: String): DataFrame =
    primary.join(broadcast(smallStream.select(timeCol).distinct()),
      Seq(timeCol), "leftanti")

  /** reference: alignment/engine.py align_streams — k-way intersection of
    * streams sharing a partition identity on (partition, time). Column
    * collisions are disambiguated with an input index prefix.
    */
  def alignStreams(inputs: Seq[DataFrame], partitionBy: Seq[String],
                   timeCol: String): DataFrame = {
    require(inputs.length >= 2, "Alignment requires at least two input streams")
    val keys = partitionBy :+ timeCol
    val prefixed = inputs.zipWithIndex.map { case (df, i) =>
      df.columns.foldLeft(df) { (d, c) =>
        if (keys.contains(c)) d else d.withColumnRenamed(c, s"s${i}_$c")
      }
    }
    prefixed.reduce((a, b) => a.join(b, keys, "inner"))
  }
}
