package graft.sources

import java.time.{Instant, LocalDate, LocalDateTime, ZoneOffset}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TimeFns

/** Synthetic generator sources (SURVEY.md §2.1 adjunct).
  *
  * Capability reference: /root/reference/src/datapipeline/sources/synthetic/
  * time/loader.py:9 (TimeTicksGenerator — bounded inclusive [start, end] tick
  * stream at a fixed frequency).
  *
  * Scale posture: `spark.range` is a parallel, partitioned source (one narrow
  * partition per chunk of ids), so a billion-tick grid generates across the
  * cluster — not a driver loop and not a single exploded `sequence()` row.
  */
object Synthetic {

  /** Parse "2024-01-01" or "2024-01-01 03:04:05" (or ISO 'T' form) as a UTC
    * instant — the reference's parse_datetime treats naive datetimes as UTC.
    */
  private[graft] def parseUtcMicros(value: String): Long = {
    val t = value.trim
    val ldt =
      if (t.contains("T")) LocalDateTime.parse(t)
      else if (t.contains(" ")) LocalDateTime.parse(t.replace(' ', 'T'))
      else LocalDate.parse(t).atStartOfDay()
    val i: Instant = ldt.toInstant(ZoneOffset.UTC)
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }

  /** Bounded synthetic time source: one row per tick in [start, end]
    * inclusive at `frequency` (reference TimeTicksGenerator.generate).
    * Emits a single `time` TIMESTAMP column.
    */
  def timeTicks(spark: SparkSession, start: String, end: String,
                frequency: String = "1h"): DataFrame = {
    val stepUs = TimeFns.parseCadenceMillis(frequency) * 1000L
    val startUs = parseUtcMicros(start)
    val endUs = parseUtcMicros(end)
    require(endUs >= startUs, "end must not precede start")
    val n = (endUs - startUs) / stepUs + 1
    spark.range(0, n)
      .select(timestamp_micros(lit(startUs) + col("id") * stepUs).as("time"))
  }
}
