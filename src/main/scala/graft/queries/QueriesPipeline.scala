package graft.queries

import org.apache.spark.sql.functions._

import graft.pipeline.{DatasetPipeline, Series}
import Q._

/** Composed end-to-end flows (reference pipelines/dataset/pipeline.py,
  * pipelines/series/projector.py): the full dataset journey as one plan, and
  * series projection with the reference's series_id suffix encoding.
  */
object QueriesPipeline {

  // --- dataset_pipeline config: shared between the Spark plan and the SQL
  // twin so thresholds/ratios/seeds cannot drift.
  private val ColumnThreshold = 0.05
  private val RowThreshold = 0.9
  private val Ratios = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
  private val Seed = 42
  private val Retained = Seq("n_events", "avg_value", "purchase_total")

  val queries: Map[String, QueryFn] = Map(
    // Assemble → coverage-select (bonus_total is all-NULL → dropped;
    // missing_feature absent → dropped) → conform → row-filter → hash split
    // → z-scale with train-fold-only statistics → per-fold outputs.
    "dataset_pipeline" -> { (s, d) =>
      val cfg = DatasetPipeline.Config(
        timeCol = "ts", cadence = "1h", sampleKeys = Seq("user_id"),
        features = Seq(
          "n_events" -> count(lit(1)),
          "avg_value" -> (sumDec(col("value")) / count(lit(1))),
          "purchase_total" ->
            sumDec(when(col("event_type") === "purchase", col("value"))),
          "bonus_total" ->
            sumDec(when(col("event_type") === "bonus_xyz", col("value")))),
        candidateFeatures =
          Seq("n_events", "avg_value", "purchase_total", "bonus_total",
            "missing_feature"),
        columnThreshold = ColumnThreshold, rowThreshold = RowThreshold,
        splitToken = col("user_id"), ratios = Ratios, seed = Seed,
        scaledFeatures = Seq("avg_value", "purchase_total"))
      val result = DatasetPipeline.run(events(s, d), cfg)
      require(result.retained == Retained,
        s"coverage selection drifted: ${result.retained}")
      result.dataset.select(col("fold"), col("user_id"),
        eu(col("sample_time")).as("sample_time_us"),
        col("n_events").cast("long").as("n_events"),
        round(col("avg_value"), 6).as("avg_value"),
        round(col("purchase_total"), 6).as("purchase_total"))
    },

    // Series projection over events: partition identity (user_id, event_type)
    // minus sample key (user_id) → series_id suffix `@event_type:<value>`;
    // two configs fan each record into two identified series rows.
    "series_project" -> { (s, d) =>
      Series.project(events(s, d),
        partitionBy = Seq("user_id", "event_type"),
        sampleKeys = Seq("user_id"), timeCol = "ts",
        configs = Seq(Series.SeriesConfig("value", "value"),
          Series.SeriesConfig("evt", "event_id")))
        .select(col("series_id"), eu(col("time")).as("t_us"), col("value"),
          col("user_id"))
    }
  )

  val oracleSql: Map[String, String] = Map(
    "dataset_pipeline" -> {
      val presentCount = Retained
        .map(c => s"CASE WHEN $c IS NOT NULL THEN 1 ELSE 0 END")
        .mkString("(", "\n             + ", ")")
      s"""WITH assembled AS (
            SELECT user_id,
                   epoch_us(ts) - epoch_us(ts) % 3600000000 AS sample_time_us,
                   COUNT(*) AS n_events,
                   ${sumDecSql("value")} / COUNT(*) AS avg_value,
                   ${sumDecSql("CASE WHEN event_type = 'purchase' THEN value END")} AS purchase_total
            FROM events GROUP BY user_id, 2),
          filtered AS (
            SELECT * FROM assembled
            WHERE $presentCount >= ${RowThreshold * Retained.size}),
          labeled AS (
            SELECT *, ${QueriesAssembly.hashSplitSql("user_id", Seed, Ratios)} AS fold
            FROM filtered),
          stats AS (
            SELECT ${sumDecSql("avg_value", 6)} / COUNT(avg_value) AS m_avg,
                   ROUND(GREATEST(COALESCE(stddev_pop(avg_value), 0.0), 1e-12), 6) AS s_avg,
                   ${sumDecSql("purchase_total", 6)} / COUNT(purchase_total) AS m_pt,
                   ROUND(GREATEST(COALESCE(stddev_pop(purchase_total), 0.0), 1e-12), 6) AS s_pt
            FROM labeled WHERE fold = 'train')
          SELECT fold, user_id, sample_time_us, n_events,
                 ROUND((avg_value - m_avg) / s_avg, 6) AS avg_value,
                 ROUND((purchase_total - m_pt) / s_pt, 6) AS purchase_total
          FROM labeled, stats"""
    },

    "series_project" ->
      """SELECT 'value__@event_type:' || event_type AS series_id,
                epoch_us(ts) AS t_us, value, user_id
         FROM events
         UNION ALL
         SELECT 'evt__@event_type:' || event_type AS series_id,
                epoch_us(ts) AS t_us, CAST(event_id AS DOUBLE) AS value, user_id
         FROM events"""
  )
}
