package graft.queries

import java.util.concurrent.atomic.AtomicInteger

import graft.streaming.Streaming
import Q._

/** §2.8 Structured Streaming equivalence: the streamed hourly rollup over the
  * finite events input must equal the batch oracle exactly.
  */
object QueriesStreaming {

  private val runId = new AtomicInteger(0)

  val queries: Map[String, QueryFn] = Map(
    "stream_windowed_agg" -> { (s, d) =>
      Streaming.runToBatch(s, d, s"graft_stream_agg_${runId.incrementAndGet()}")
    }
  )

  val oracleSql: Map[String, String] = Map(
    "stream_windowed_agg" ->
      s"""SELECT epoch_us(ts) - epoch_us(ts) % 3600000000 AS hour_us,
          event_type, COUNT(*) AS n, ${sumDecSql("value")} AS total
          FROM events GROUP BY 1, event_type"""
  )
}
