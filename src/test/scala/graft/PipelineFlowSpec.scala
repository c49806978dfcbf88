package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.pipeline.{DatasetPipeline, Series}
import graft.sources.Synthetic

/** End-to-end dataset pipeline, series projection encoding, and the
  * synthetic tick source — reference semantics from
  * pipelines/dataset/pipeline.py, domain/series_id.py,
  * sources/synthetic/time/loader.py.
  */
class PipelineFlowSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def sampleEvents = Seq(
    // user 1: two hours, purchases only in hour 0
    (1L, ts("2024-01-01 00:05:00"), "purchase", 10.0),
    (1L, ts("2024-01-01 00:25:00"), "click", 2.0),
    (1L, ts("2024-01-01 01:10:00"), "click", 3.0),
    // user 2: one hour with purchase
    (2L, ts("2024-01-01 00:15:00"), "purchase", 20.0),
    (2L, ts("2024-01-01 00:45:00"), "purchase", 5.0),
    // user 3: never purchases
    (3L, ts("2024-01-01 02:00:00"), "view", 1.0)
  ).toDF("user_id", "ts", "event_type", "value")

  private def runPipeline = DatasetPipeline.run(sampleEvents,
    DatasetPipeline.Config(
      timeCol = "ts", cadence = "1h", sampleKeys = Seq("user_id"),
      features = Seq(
        "n_events" -> count(lit(1)),
        "avg_value" -> avg(col("value")),
        "purchase_total" ->
          sum(when(col("event_type") === "purchase", col("value"))),
        "bonus_total" ->
          sum(when(col("event_type") === "never_matches", col("value")))),
      candidateFeatures = Seq("n_events", "avg_value", "purchase_total",
        "bonus_total", "missing_feature"),
      columnThreshold = 0.05, rowThreshold = 0.9,
      splitToken = col("user_id"),
      ratios = Seq("train" -> 0.5, "test" -> 0.5), seed = 1,
      scaledFeatures = Seq("avg_value")))

  test("dataset pipeline: coverage selection drops all-NULL and absent features") {
    assert(runPipeline.retained == Seq("n_events", "avg_value", "purchase_total"))
  }

  test("dataset pipeline: row filter keeps only fully-covered samples; folds partition them") {
    val out = runPipeline.dataset.cache()
    // 4 (user, hour) groups exist; only the 2 with a purchase survive the
    // 0.9-coverage row filter
    val keys = out.select(col("user_id"), col("sample_time")).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString)).toSet
    assert(keys == Set((1L, "2024-01-01 00:00:00.0"),
      (2L, "2024-01-01 00:00:00.0")))
    // every surviving row carries exactly one fold label
    val folds = out.select(col("fold")).collect().map(_.getString(0))
    assert(folds.forall(Set("train", "test").contains))
    assert(out.count() == keys.size)
  }

  test("dataset pipeline: scaler is fitted on the train fold only") {
    val out = runPipeline.dataset.cache()
    val trainZ = out.filter(col("fold") === "train")
      .select(avg(col("avg_value"))).collect()(0)
    // mean of z over the fit population is 0 by construction (up to fp noise
    // and the 6dp std rounding)
    if (!trainZ.isNullAt(0)) assert(math.abs(trainZ.getDouble(0)) < 1e-6)
    // unscaled feature passes through untouched (still the raw count)
    val n = out.select(col("n_events").cast("long")).collect().map(_.getLong(0))
    assert(n.forall(_ >= 1))
  }

  test("series projection encodes the reference series_id suffix") {
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), "zone a", 10.0),
      (2L, ts("2024-01-01 01:00:00"), null.asInstanceOf[String], 20.0)
    ).toDF("user_id", "time", "zone", "value")
    val out = Series.project(df, partitionBy = Seq("user_id", "zone"),
      sampleKeys = Seq("user_id"), timeCol = "time",
      configs = Seq(Series.SeriesConfig("value", "value")))
      .select(col("series_id")).collect().map(_.getString(0)).toSet
    // python urllib.parse.quote("zone a", safe="") == "zone%20a"; null → !n
    assert(out == Set("value__@zone:zone%20a", "value__@zone:!n"))
  }

  test("series projection: integer and boolean identity components; no suffix when all partition fields are sample keys") {
    val df = Seq((1L, ts("2024-01-01 00:00:00"), 7L, true, 1.5))
      .toDF("user_id", "time", "sensor", "active", "value")
    val ids = Series.project(df, Seq("user_id", "sensor", "active"),
      Seq("user_id"), "time", Seq(Series.SeriesConfig("v", "value")))
      .select(col("series_id")).collect().map(_.getString(0)).toSet
    assert(ids == Set("v__@sensor:!i:7|@active:!b:1"))

    val plain = Series.project(df, Seq("user_id"), Seq("user_id"), "time",
      Seq(Series.SeriesConfig("v", "value")))
      .select(col("series_id")).collect().map(_.getString(0)).toSet
    assert(plain == Set("v"))
  }

  test("series projection rejects fractional identity fields") {
    val df = Seq((1L, ts("2024-01-01 00:00:00"), 0.5, 1.0))
      .toDF("user_id", "time", "ratio", "value")
    intercept[UnsupportedOperationException] {
      Series.project(df, Seq("user_id", "ratio"), Seq("user_id"), "time",
        Seq(Series.SeriesConfig("v", "value")))
    }
  }

  test("synthetic ticks: inclusive bounds, exact cadence, distributed range") {
    val t = Synthetic.timeTicks(spark, "2024-01-01", "2024-01-02", "6h")
    val got = t.collect().map(_.getTimestamp(0).toString).sorted
    assert(got.toSeq == Seq(
      "2024-01-01 00:00:00.0", "2024-01-01 06:00:00.0",
      "2024-01-01 12:00:00.0", "2024-01-01 18:00:00.0",
      "2024-01-02 00:00:00.0"))
    // the plan is a Range source, not a single exploded row
    assert(t.queryExecution.executedPlan.toString.contains("Range"))
  }

  test("series id decode inverts the column encoder; reference grammar accepted") {
    // round-trip through the actual projection encoder
    val df = Seq((1L, "cli ck/s", true, 7, 1.5))
      .toDF("user_id", "typ", "flag", "n", "v")
    val id = Series.project(df, Seq("user_id", "typ", "flag", "n"),
        Seq("user_id"), "v", Seq(Series.SeriesConfig("m", "v")))
      .select("series_id").head().getString(0)
    assert(Series.baseId(id) == "m")
    assert(Series.components(id) == Seq(
      "typ" -> "cli ck/s", "flag" -> true, "n" -> 7L))
    // unpartitioned ids have no components
    assert(Series.baseId("plain") == "plain" && Series.components("plain") == Nil)
    // reference-only grammar: null and hex floats decode
    assert(Series.components("m__@a:!n|@b:!f:0x1.8p+1") ==
      Seq("a" -> null, "b" -> 3.0))
    // malformed ids fail loudly
    intercept[IllegalArgumentException](Series.baseId("m__"))
    intercept[IllegalArgumentException](Series.components("m__noat:1"))
    intercept[IllegalArgumentException](Series.components("m__@b:!b:7"))
    intercept[IllegalArgumentException](Series.components("m__@b:!x:1"))
    // malformed percent escapes pass through literally (Python unquote)
    assert(Series.components("m__@a:%zz") == Seq("a" -> "%zz"))
    assert(Series.components("m__@a:100%") == Seq("a" -> "100%"))
    assert(Series.components("m__@a:%4") == Seq("a" -> "%4"))
    // literal astral-plane chars survive decoding (surrogate pairs intact)
    assert(Series.components("m__@a:\ud83d\ude00x") ==
      Seq("a" -> "\ud83d\ude00x"))
    // mixed literal + escape runs
    assert(Series.components("m__@a:a%20b%zzc") == Seq("a" -> "a b%zzc"))
  }

  test("scaler artifact: fit → save → load round-trips; apply scales in place") {
    import graft.pipeline.Artifacts
    val df = Seq(("train", 1.0, 10.0), ("train", 3.0, 30.0), ("test", 5.0, 50.0))
      .toDF("fold", "a", "b")
    val art = Artifacts.fitScaler(df.filter(col("fold") === "train"), Seq("a", "b"))
    assert(art.statistics("a").mean == 2.0 && art.statistics("a").std == 1.0)
    assert(art.observations == 4) // 2 per field
    val path = "/tmp/graft_scratch/spec_scaler/scaler.json"
    Artifacts.saveScaler(path, art)
    val loaded = Artifacts.loadScaler(path).swap.toOption.get
    assert(loaded == art) // exact double round-trip through JSON
    val out = Artifacts.applyScaler(df, loaded)
      .orderBy("a").select("a").collect().map(_.getDouble(0)).toSeq
    assert(out == Seq(-1.0, 1.0, 3.0)) // (x - 2) / 1, test fold scaled by train stats
  }

  test("fitScaler names the field when it has zero non-null observations") {
    import graft.pipeline.Artifacts
    val df = Seq((1.0, Option.empty[Double]), (2.0, Option.empty[Double]))
      .toDF("ok", "all_null")
    val e = intercept[IllegalArgumentException](
      Artifacts.fitScaler(df, Seq("ok", "all_null")))
    assert(e.getMessage.contains("all_null"))
  }

  test("folded scaler artifact: per-fold stats, unknown fold fails, JSON round-trip") {
    import graft.pipeline.Artifacts
    val df = Seq(("train", 1.0), ("train", 3.0), ("val", 7.0), ("val", 9.0))
      .toDF("fold", "x")
    val folded = Artifacts.fitFoldedScaler(df, "fold", Seq("x"))
    assert(folded.forFold("train").statistics("x").mean == 2.0)
    assert(folded.forFold("val").statistics("x").mean == 8.0)
    intercept[NoSuchElementException](folded.forFold("nope"))
    val path = "/tmp/graft_scratch/spec_scaler/folded.json"
    Artifacts.saveFoldedScaler(path, folded)
    assert(Artifacts.loadScaler(path).toOption.get == folded)
    // validation: mismatched observations and blank ids are rejected
    intercept[IllegalArgumentException](
      Artifacts.StandardScalerArtifact(true, true, 1e-12, 5,
        Map("x" -> Artifacts.ScalerStats(0.0, 1.0, 2))))
    intercept[IllegalArgumentException](
      Artifacts.StandardScalerArtifact(true, true, 1e-12, 2,
        Map(" x" -> Artifacts.ScalerStats(0.0, 1.0, 2))))
  }
}
