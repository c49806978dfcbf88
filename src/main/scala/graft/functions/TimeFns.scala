package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Time/cadence helpers.
  *
  * Capability reference: /root/reference/src/datapipeline/utils/time.py
  * (parse_timecode:18, parse_cadence:31, floor_time_to_cadence:42) and
  * /root/reference/src/datapipeline/transforms/time.py (FloorTimeTransform,
  * ShiftTimeTransform). Re-expressed as codegen-friendly Column expressions —
  * epoch-anchored integer arithmetic on millis, no UDFs.
  */
object TimeFns {

  private val TimecodePattern = """\s*(-?\d+)\s*(ms|s|sec|m|min|h|d|w)\s*""".r

  /** Parse a signed duration like "30s", "10min", "-1h", "2d" to millis. */
  def parseTimecodeMillis(value: String): Long = value match {
    case TimecodePattern(amount, unit) =>
      val unitMs: Long = unit match {
        case "ms"          => 1L
        case "s" | "sec"   => 1000L
        case "m" | "min"   => 60L * 1000L
        case "h"           => 3600L * 1000L
        case "d"           => 86400L * 1000L
        case "w"           => 7L * 86400L * 1000L
      }
      amount.toLong * unitMs
    case _ => throw new IllegalArgumentException(s"Unsupported timecode: $value")
  }

  /** Parse a strictly positive cadence. */
  def parseCadenceMillis(value: String): Long = {
    val ms = parseTimecodeMillis(value)
    require(ms > 0, s"Cadence must be positive: $value")
    ms
  }

  /** Floor a timestamp column down to a UTC-epoch-anchored cadence grid.
    * `t - (t mod step)` with a floor-mod, so pre-epoch times floor correctly.
    * Microsecond arithmetic: lossless for Spark's TimestampType.
    */
  def floorTime(ts: Column, cadence: String): Column = {
    val step = parseCadenceMillis(cadence) * 1000L
    val us = unix_micros(ts)
    timestamp_micros(us - pmod(us, lit(step)))
  }

  /** Shift a timestamp column by a signed duration like "1d" or "-1h". */
  def shiftTime(ts: Column, by: String): Column =
    timestamp_micros(unix_micros(ts) + lit(parseTimecodeMillis(by) * 1000L))

  /** 2π as the exact double literal both engines share — embedded in the
    * oracle SQL so `sin` sees a bit-identical argument.
    */
  val TwoPi: Double = 2.0 * math.Pi

  /** Synthetic time encodings (reference mappers/synthetic/time.py):
    * cyclic hour/weekday features and the raw epoch-seconds ramp. Weekday
    * follows Python `weekday()` (Monday = 0). All plain codegen'd exprs.
    */
  def encodeTime(ts: Column, mode: String): Column = mode match {
    case "hour_sin" =>
      sin(lit(TwoPi) * hour(ts).cast("double") / 24.0)
    case "weekday_sin" =>
      // Spark dayofweek: Sunday=1..Saturday=7 → python weekday Monday=0
      sin(lit(TwoPi) * pmod(dayofweek(ts) + 5, lit(7)).cast("double") / 7.0)
    case "linear" =>
      unix_micros(ts).cast("double") / 1000000.0
    case other =>
      throw new IllegalArgumentException(s"Unsupported encode_time mode: $other")
  }
}
