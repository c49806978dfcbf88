package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.TimeFns
import graft.operators.Ordered
import Q._

/** §2.2 record-wise preprocess transforms (reference: transforms/where.py,
  * transforms/time.py, transforms/stream/derive.py, logarithm.py).
  * All are pure Column expressions — pushed into the scan / whole-stage
  * codegen; no shuffle.
  */
object QueriesPreprocess {

  val queries: Map[String, QueryFn] = Map(
    "where_filter" -> { (s, d) =>
      val base = events(s, d)
      val filtered = Ordered.where(
        Ordered.where(base, "event_type", "eq", "purchase"),
        "value", "gt", 50.0)
        .filter(col("ts") >= lit("2024-01-10").cast("timestamp"))
      filtered.select(col("event_id"), col("user_id"), eu(col("ts")).as("t_us"),
        col("value"))
    },

    "floor_time" -> { (s, d) =>
      events(s, d).select(col("event_id"),
        eu(TimeFns.floorTime(col("ts"), "1h")).as("t_floor_us"))
    },

    // Synthetic time encodings (reference mappers/synthetic/time.py):
    // sin() differs in the last ULP between libm and the JVM, so both
    // engines round to 6dp; the 2π literal is shared.
    "encode_time" -> { (s, d) =>
      events(s, d).select(col("event_id"),
        round(TimeFns.encodeTime(col("ts"), "hour_sin"), 6).as("hour_sin"),
        round(TimeFns.encodeTime(col("ts"), "weekday_sin"), 6).as("weekday_sin"),
        round(TimeFns.encodeTime(col("ts"), "linear"), 6).as("linear"))
    },

    "shift_time" -> { (s, d) =>
      events(s, d).select(col("event_id"),
        eu(TimeFns.shiftTime(col("ts"), "-1h")).as("t_shift_us"))
    },

    "derive_arith" -> { (s, d) =>
      val df = lineitem(s, d)
        .withColumn("one_minus_disc", lit(1.0) - col("l_discount"))
      Ordered.derive(df, "l_extendedprice", "mul", "net",
        rightField = Some("one_minus_disc"))
        .select(col("l_orderkey"), col("l_linenumber"), col("net"))
    },

    // Schema'd extraction from a JSON payload column (reference decoders
    // parse raw payloads into typed records): from_json with explicit schema,
    // no inference pass.
    "json_props" -> { (s, d) =>
      events(s, d).select(col("event_id"),
        from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.LongType)))).getField("k").as("prop_k"))
    },

    "log_natural" -> { (s, d) =>
      val df = events(s, d).filter(col("value") > 0)
      Ordered.logNatural(df, "value", "ln_value")
        .select(col("event_id"), round(col("ln_value"), 6).as("ln_value"))
    },

    "log1p" -> { (s, d) =>
      Ordered.log1pField(events(s, d), "value", "ln1p_value")
        .select(col("event_id"), round(col("ln1p_value"), 6).as("ln1p_value"))
    }
  )

  val oracleSql: Map[String, String] = Map(
    "where_filter" ->
      """SELECT event_id, user_id, epoch_us(ts) AS t_us, value
         FROM events
         WHERE event_type = 'purchase' AND value > 50
           AND ts >= TIMESTAMP '2024-01-10'""",
    "encode_time" ->
      s"""SELECT event_id,
          ROUND(sin(${TimeFns.TwoPi} * CAST(hour(ts) AS DOUBLE) / 24.0), 6) AS hour_sin,
          ROUND(sin(${TimeFns.TwoPi} * CAST(isodow(ts) - 1 AS DOUBLE) / 7.0), 6) AS weekday_sin,
          ROUND(CAST(epoch_us(ts) AS DOUBLE) / 1000000.0, 6) AS linear
          FROM events""",

    "floor_time" ->
      """SELECT event_id,
         epoch_us(ts) - epoch_us(ts) % 3600000000 AS t_floor_us
         FROM events""",
    "shift_time" ->
      "SELECT event_id, epoch_us(ts) - 3600000000 AS t_shift_us FROM events",
    "derive_arith" ->
      """SELECT l_orderkey, l_linenumber,
         l_extendedprice * (1.0 - l_discount) AS net FROM lineitem""",
    "json_props" ->
      """SELECT event_id,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k
         FROM events""",
    "log_natural" ->
      "SELECT event_id, ROUND(LN(value), 6) AS ln_value FROM events WHERE value > 0",
    "log1p" ->
      "SELECT event_id, ROUND(LN(1.0 + value), 6) AS ln1p_value FROM events"
  )
}
