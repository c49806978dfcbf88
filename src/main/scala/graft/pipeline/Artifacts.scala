package graft.pipeline

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scaler artifacts (reference: artifacts/scaler.py — ScalerStatistics,
  * StandardScalerArtifact, FoldedScalerArtifact, save/load_scaler_artifact).
  *
  * The artifact is driver-side METADATA by design — a handful of doubles
  * per feature, the Spark twin of the reference's build/scaler.json. Fit is
  * one distributed aggregation; apply embeds the loaded statistics as
  * literals, so the scaling arithmetic constant-folds into whole-stage
  * codegen with no join at all.
  *
  * Cross-engine determinism (same contract as DatasetPipeline): means come
  * from exact DECIMAL sums, stds are rounded to 6dp at fit time, so a
  * DuckDB oracle reproduces every scaled value bit-for-bit.
  */
object Artifacts {

  final case class ScalerStats(mean: Double, std: Double, count: Long) {
    require(!mean.isNaN && !mean.isInfinite, "scaler mean must be finite")
    require(std > 0 && !std.isInfinite, "scaler std must be finite and > 0")
    require(count > 0, "scaler count must be > 0")
  }

  final case class StandardScalerArtifact(
      withMean: Boolean, withStd: Boolean, epsilon: Double,
      observations: Long, statistics: Map[String, ScalerStats]) {
    require(epsilon > 0, "scaler epsilon must be > 0")
    require(statistics.nonEmpty, "scaler statistics must not be empty")
    statistics.keys.foreach { id =>
      require(id.trim.nonEmpty && id == id.trim,
        s"scaler vector ids must be trimmed and non-empty, got '$id'")
    }
    require(observations == statistics.values.map(_.count).sum,
      "scaler observations must equal the sum of feature statistic counts")
  }

  final case class FoldedScalerArtifact(folds: Map[String, StandardScalerArtifact]) {
    require(folds.nonEmpty, "folded scaler must have at least one fold")
    folds.keys.foreach { id =>
      require(id.trim.nonEmpty && id == id.trim,
        s"scaler fold ids must be trimmed and non-empty, got '$id'")
    }
    def forFold(foldId: String): StandardScalerArtifact =
      folds.getOrElse(foldId,
        throw new NoSuchElementException(s"Scaler artifact has no fold '$foldId'."))
  }

  private def sumDec(c: Column, scale: Int = 6): Column =
    sum(c.cast(s"decimal(30,$scale)")).cast("double")

  /** Fit per-field statistics on the training frame in ONE aggregation pass.
    * mean = exact decimal sum / count; std = max(pstdev, epsilon) rounded to
    * 6dp (reference ScalerAccumulator semantics + the cross-engine rounding
    * contract).
    */
  def fitScaler(train: DataFrame, fields: Seq[String],
                withMean: Boolean = true, withStd: Boolean = true,
                epsilon: Double = 1e-12): StandardScalerArtifact = {
    require(fields.nonEmpty, "fitScaler needs at least one field")
    val aggs = fields.flatMap { f =>
      Seq((sumDec(col(f)) / count(col(f))).as(s"${f}__mean"),
        round(greatest(coalesce(stddev_pop(col(f)), lit(0.0)), lit(epsilon)), 6)
          .as(s"${f}__std"),
        count(col(f)).as(s"${f}__count"))
    }
    val row = train.agg(aggs.head, aggs.tail: _*).head()
    val stats = fields.map { f =>
      // Guard before unboxing: an all-NULL field yields count 0 and NULL
      // mean/std, and getAs[Double] would NPE with no hint of which field.
      val n = row.getAs[Long](s"${f}__count")
      require(n > 0,
        s"fitScaler: field '$f' has no non-null training observations — " +
          "cannot fit scaler statistics.")
      f -> ScalerStats(
        row.getAs[Double](s"${f}__mean"),
        row.getAs[Double](s"${f}__std"),
        n)
    }.toMap
    StandardScalerArtifact(withMean, withStd, epsilon,
      stats.values.map(_.count).sum, stats)
  }

  /** Fit one artifact per fold label (reference run_scaled_dataset_pipeline's
    * per-fold scalers): one grouped aggregation, a few rows collected.
    */
  def fitFoldedScaler(labeled: DataFrame, foldCol: String, fields: Seq[String],
                      epsilon: Double = 1e-12): FoldedScalerArtifact = {
    val folds = labeled.select(col(foldCol)).distinct()
      .collect().map(_.getString(0)).sorted
    FoldedScalerArtifact(folds.map { f =>
      f -> fitScaler(labeled.filter(col(foldCol) === f), fields,
        epsilon = epsilon)
    }.toMap)
  }

  /** Apply a fitted artifact in place: (x - mean) / std per configured
    * field, statistics embedded as codegen'd literals.
    */
  def applyScaler(df: DataFrame, artifact: StandardScalerArtifact): DataFrame =
    artifact.statistics.toSeq.sortBy(_._1).foldLeft(df) { case (d, (f, s)) =>
      val centered = if (artifact.withMean) col(f) - lit(s.mean) else col(f)
      val scaled = if (artifact.withStd) centered / lit(s.std) else centered
      d.withColumn(f, scaled)
    }

  // ------------------------------------------------------------- JSON I/O
  // Layout mirrors the reference artifact exactly (kind/version
  // discriminator, snake_case keys), via json4s (ships with Spark).

  import org.json4s._
  import org.json4s.jackson.JsonMethods

  private def statsJson(a: StandardScalerArtifact): JObject =
    JObject(
      "kind" -> JString("standard_scaler"),
      "version" -> JInt(3),
      "with_mean" -> JBool(a.withMean),
      "with_std" -> JBool(a.withStd),
      "epsilon" -> JDouble(a.epsilon),
      "observations" -> JLong(a.observations),
      "statistics" -> JObject(a.statistics.toSeq.sortBy(_._1).map {
        case (f, s) => f -> (JObject(
          "mean" -> JDouble(s.mean), "std" -> JDouble(s.std),
          "count" -> JLong(s.count)): JValue)
      }: _*))

  def saveScaler(path: String, artifact: StandardScalerArtifact): Unit = {
    val p = Paths.get(path)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    Files.writeString(p, JsonMethods.pretty(JsonMethods.render(statsJson(artifact))))
  }

  def saveFoldedScaler(path: String, artifact: FoldedScalerArtifact): Unit = {
    val p = Paths.get(path)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    val json = JObject(
      "kind" -> JString("folded_scaler"),
      "version" -> JInt(3),
      "folds" -> JObject(artifact.folds.toSeq.sortBy(_._1).map {
        case (f, a) => f -> (statsJson(a): JValue)
      }: _*))
    Files.writeString(p, JsonMethods.pretty(JsonMethods.render(json)))
  }

  private def parseStandard(j: JValue): StandardScalerArtifact = {
    def d(v: JValue): Double = v match {
      case JDouble(x) => x
      case JInt(x) => x.toDouble
      case JLong(x) => x.toDouble
      case other => throw new IllegalArgumentException(s"bad number: $other")
    }
    def l(v: JValue): Long = v match {
      case JInt(x) => x.toLong
      case JLong(x) => x
      case other => throw new IllegalArgumentException(s"bad integer: $other")
    }
    require(d(j \ "version") == 3.0, "unsupported scaler artifact version")
    val stats = (j \ "statistics") match {
      case JObject(fields) => fields.map { case (f, s) =>
        f -> ScalerStats(d(s \ "mean"), d(s \ "std"), l(s \ "count"))
      }.toMap
      case other => throw new IllegalArgumentException(s"bad statistics: $other")
    }
    StandardScalerArtifact(
      (j \ "with_mean").asInstanceOf[JBool].value,
      (j \ "with_std").asInstanceOf[JBool].value,
      d(j \ "epsilon"), l(j \ "observations"), stats)
  }

  /** Load either artifact kind, discriminated like the reference's
    * `Field(discriminator="kind")`.
    */
  def loadScaler(path: String): Either[StandardScalerArtifact, FoldedScalerArtifact] = {
    val j = JsonMethods.parse(Files.readString(Paths.get(path)))
    (j \ "kind") match {
      case JString("standard_scaler") => Left(parseStandard(j))
      case JString("folded_scaler") =>
        val folds = (j \ "folds") match {
          case JObject(fields) => fields.map { case (f, a) => f -> parseStandard(a) }.toMap
          case other => throw new IllegalArgumentException(s"bad folds: $other")
        }
        Right(FoldedScalerArtifact(folds))
      case other => throw new IllegalArgumentException(s"unknown artifact kind: $other")
    }
  }
}
