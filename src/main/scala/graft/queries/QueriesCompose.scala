package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TimeFns
import graft.operators.Compose
import Q._

/** §2.4 stream composition (reference: alignment/broadcast.py, engine.py,
  * services/streams/). The reference's driver-memory timestamp index becomes
  * a broadcast hash join; its k-way sorted-iterator intersection becomes a
  * multi-way equi-join on (partition, time).
  */
object QueriesCompose {

  private def withHour(df: DataFrame): DataFrame =
    df.withColumn("hour", TimeFns.floorTime(col("hour_ts"), "1h"))

  val queries: Map[String, QueryFn] = Map(
    // Attach an unpartitioned hourly reference stream (global per-hour mean)
    // to every event at its hour — exact-timestamp broadcast attach.
    "broadcast_join" -> { (s, d) =>
      val e = events(s, d).withColumn("hour", TimeFns.floorTime(col("ts"), "1h"))
      val hourly = e.groupBy(col("hour"))
        .agg((sumDec(col("value")) / count(lit(1))).as("hourly_avg"))
      Compose.broadcastJoin(e, hourly, "hour")
        .select(col("event_id"), eu(col("hour")).as("hour_us"),
          round(col("b_hourly_avg"), 6).as("hourly_avg"))
    },

    // k-way intersection of two derived per-(user, hour) streams.
    "align_streams" -> { (s, d) =>
      val e = events(s, d).withColumn("hour", TimeFns.floorTime(col("ts"), "1h"))
      val clicks = e.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("hour"))
        .agg(count(lit(1)).as("clicks"))
      val purchases = e.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("hour"))
        .agg(sumDec(col("value")).as("purchase_total"))
      Compose.alignStreams(Seq(clicks, purchases), Seq("user_id"), "hour")
        .select(col("user_id"), eu(col("hour")).as("hour_us"),
          col("s0_clicks").as("clicks"),
          col("s1_purchase_total").as("purchase_total"))
    },

    // Backward as-of join: attach the latest hourly per-user reference value
    // (right stream) to every raw event. One shuffle+sort, no range join.
    "asof_join" -> { (s, d) =>
      val e = events(s, d)
      val hourly = e
        .withColumn("hour", TimeFns.floorTime(col("ts"), "1h"))
        .groupBy(col("user_id"), col("hour"))
        .agg(sumDec(col("value")).as("ref_value"))
        .select(col("user_id"), col("hour").as("ts"), col("ref_value"))
      Compose.asofJoin(
        e.select(col("user_id"), col("ts"), col("event_id")),
        hourly, Seq("user_id"), "ts", Seq("ref_value"))
        .select(col("event_id"), col("user_id"), eu(col("ts")).as("t_us"),
          col("asof_ref_value").as("ref_value"))
    },

    // Bucketized interval-containment join: attach each event of other users
    // to the session windows of user 0 it falls inside. Equi-join on time
    // buckets + exact filter — no nested loop.
    // Two-phase salted aggregation over a 5-key (maximally skewed) grouping:
    // phase 1 spreads each hot key over 8 salt buckets, phase 2 merges —
    // the exact decimal sum survives the split, so the salted plan is
    // hash-identical to the plain GROUP BY oracle.
    "skew_salted_agg" -> { (s, d) =>
      graft.operators.Skew.saltedAgg(events(s, d), Seq("event_type"),
        saltFrom = "event_id", factor = 8, valueCol = "value",
        partial = c => sum(c.cast("decimal(30,4)")),
        merge = c => sum(c), to = "total")
        .select(col("event_type"), col("total").cast("double").as("total"))
    },

    "range_join" -> { (s, d) =>
      val key = graft.operators.StreamKey(Seq("user_id"), "ts", Seq("event_id"))
      val sess = graft.operators.Ordered.sessionize(events(s, d), key, "6h")
        .filter(col("user_id") === 0)
        .groupBy(col("session_id"))
        .agg(min(col("ts")).as("s_start"), max(col("ts")).as("s_end"))
      val points = events(s, d).filter(col("user_id") =!= 0)
        .select(col("event_id"), col("ts"))
      Compose.rangeJoin(points, "ts", sess, "s_start", "s_end", "1h")
        .select(col("event_id"), col("session_id"),
          eu(col("s_start")).as("s_start_us"))
    },

    // Gap-based sessionization (30 min): per-session summaries.
    "sessionize" -> { (s, d) =>
      val sess = graft.operators.Ordered.sessionize(events(s, d),
        graft.operators.StreamKey(Seq("user_id"), "ts", Seq("event_id")), "30min")
      sess.groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          min(eu(col("ts"))).as("start_us"),
          max(eu(col("ts"))).as("end_us"),
          sumDec(col("value")).as("total"))
    },

    // Derived stream = operator chain fused into one plan: filter → floor →
    // per-(user, hour) collapse → arithmetic derive.
    "derived_stream" -> { (s, d) =>
      val e = events(s, d)
        .filter(col("event_type").isin("purchase", "click"))
        .withColumn("hour", TimeFns.floorTime(col("ts"), "1h"))
      e.groupBy(col("user_id"), col("hour"))
        .agg(sumDec(col("value")).as("total"), count(lit(1)).as("n"))
        .select(col("user_id"), eu(col("hour")).as("hour_us"),
          (col("total") * lit(2.0)).as("total_x2"), col("n"))
    }
  )

  private val hourSql = "epoch_us(ts) - epoch_us(ts) % 3600000000"

  val oracleSql: Map[String, String] = Map(
    "skew_salted_agg" ->
      s"""SELECT event_type, ${sumDecSql("value")} AS total
          FROM events GROUP BY event_type""",
    "broadcast_join" ->
      s"""WITH h AS (
            SELECT $hourSql AS hour_us,
                   ${sumDecSql("value")} / COUNT(*) AS hourly_avg
            FROM events GROUP BY 1)
          SELECT e.event_id, h.hour_us, ROUND(h.hourly_avg, 6) AS hourly_avg
          FROM events e JOIN h ON ($hourSql) = h.hour_us""",

    "align_streams" ->
      s"""WITH c AS (
            SELECT user_id, $hourSql AS hour_us, COUNT(*) AS clicks
            FROM events WHERE event_type = 'click' GROUP BY 1, 2),
          p AS (
            SELECT user_id, $hourSql AS hour_us,
                   ${sumDecSql("value")} AS purchase_total
            FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
          SELECT c.user_id, c.hour_us, c.clicks, p.purchase_total
          FROM c JOIN p ON c.user_id = p.user_id AND c.hour_us = p.hour_us""",

    "asof_join" ->
      s"""WITH hourly AS (
            SELECT user_id, $hourSql AS h_us, ${sumDecSql("value")} AS ref_value
            FROM events GROUP BY user_id, 2)
          SELECT e.event_id, e.user_id, epoch_us(e.ts) AS t_us, h.ref_value
          FROM events e
          ASOF LEFT JOIN hourly h
            ON e.user_id = h.user_id AND epoch_us(e.ts) >= h.h_us""",

    "range_join" ->
      """WITH flagged AS (
           SELECT user_id, ts, event_id,
                  CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 21600000000
                       THEN 1 ELSE 0 END AS new_s
           FROM events WHERE user_id = 0
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         sess AS (
           SELECT session_id, min(ts) AS s_start, max(ts) AS s_end FROM (
             SELECT ts,
                    CAST(sum(new_s) OVER (ORDER BY ts, event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1
                      AS BIGINT) AS session_id
             FROM flagged)
           GROUP BY session_id)
         SELECT e.event_id, s.session_id, epoch_us(s.s_start) AS s_start_us
         FROM events e JOIN sess s ON e.ts >= s.s_start AND e.ts <= s.s_end
         WHERE e.user_id != 0""",

    "sessionize" ->
      """WITH flagged AS (
           SELECT user_id, ts, event_id, value,
                  CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                       THEN 1 ELSE 0 END AS new_s
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         sess AS (
           SELECT user_id, ts, value,
                  CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1
                    AS BIGINT) AS session_id
           FROM flagged)
         SELECT user_id, session_id, COUNT(*) AS n_events,
                min(epoch_us(ts)) AS start_us, max(epoch_us(ts)) AS end_us,
                CAST(SUM(CAST(value AS DECIMAL(30,4))) AS DOUBLE) AS total
         FROM sess GROUP BY user_id, session_id""",

    "derived_stream" ->
      s"""SELECT user_id, $hourSql AS hour_us,
          ${sumDecSql("value")} * 2.0 AS total_x2, COUNT(*) AS n
          FROM events WHERE event_type IN ('purchase', 'click')
          GROUP BY user_id, 2"""
  )
}
