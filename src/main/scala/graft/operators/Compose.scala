package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Backward as-of join: attach to each left row the latest right payload
    * with right.time <= left.time within the same partition key. Spark has no
    * native as-of join; a range-condition join would explode into a
    * broadcast-nested-loop. This union+window formulation costs exactly ONE
    * shuffle+sort over (key, time) regardless of the time-gap distribution —
    * the scalable shape for "attach latest quote/price/state to event".
    *
    * Right side must be unique per (key, time) (collapse first otherwise).
    * Payload columns are taken from `payload` and surface with `prefix`.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               timeCol: String, payload: Seq[String],
               prefix: String = "asof_"): DataFrame = {
    val leftCols = left.columns
    val rTagged = right.select(
      keys.map(col) ++ Seq(col(timeCol), lit(1).as("__is_r")) ++
        payload.map(c => col(c).as(s"__p_$c")) ++
        leftCols.filterNot(c => keys.contains(c) || c == timeCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val lTagged = left.select(
      keys.map(col) ++ Seq(col(timeCol), lit(0).as("__is_r")) ++
        payload.map(c => lit(null).cast(right.schema(c).dataType).as(s"__p_$c")) ++
        leftCols.filterNot(c => keys.contains(c) || c == timeCol).map(col): _*)
    // At equal time, right rows sort first so they are visible to the left
    // row (<= semantics, matching ASOF JOIN ON l.t >= r.t).
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(timeCol).asc, col("__is_r").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = payload.foldLeft(rTagged.unionByName(lTagged)) { (df, c) =>
      df.withColumn(s"__f_$c", last(col(s"__p_$c"), ignoreNulls = true).over(w))
    }
    filled.filter(col("__is_r") === 0)
      .select(leftCols.map(col) ++
        payload.map(c => col(s"__f_$c").as(s"$prefix$c")): _*)
  }

  /** Interval containment join without a nested-loop: bucketize time on a
    * cadence, explode each interval into the buckets it covers, equi-join
    * point-bucket to interval-bucket, then exact-filter containment. Shuffle
    * degree follows bucket counts, not |points|×|intervals| — choose the
    * bucket near the median interval length.
    */
  def rangeJoin(points: DataFrame, pointTime: String,
                intervals: DataFrame, startCol: String, endCol: String,
                bucket: String): DataFrame = {
    val step = graft.functions.TimeFns.parseCadenceMillis(bucket) * 1000L
    def bucketOf(c: Column): Column = floor(unix_micros(c) / lit(step)).cast("long")
    val p = points.withColumn("__b", bucketOf(col(pointTime)))
    val iv = intervals.withColumn("__b",
      explode(sequence(bucketOf(col(startCol)), bucketOf(col(endCol)))))
    p.join(iv, Seq("__b"))
      .where(col(pointTime) >= col(startCol) && col(pointTime) <= col(endCol))
      .drop("__b")
  }

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
