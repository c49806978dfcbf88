package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Series projection: fan a record stream out into identified series streams.
  *
  * Capability reference: /root/reference/src/datapipeline/pipelines/series/
  * projector.py:17-40 (SeriesProjector) and domain/series_id.py (the
  * `base__@field:value|@field:value` suffix encoding). The partition fields
  * that are NOT sample keys become part of the series identity; sample keys
  * stay as entity-key columns.
  *
  * Scale posture: pure narrow projection + explode (one output row per
  * (record, config)) — no shuffle; the series_id is a derived column so any
  * downstream groupBy(series_id) shuffles exactly once.
  */
object Series {

  val IdSeparator = "__"
  val ComponentSeparator = "|"

  /** One projected series per record: `id` names the series, `field` is the
    * source column for its value (reference SeriesConfig).
    */
  final case class SeriesConfig(id: String, field: String)

  /** Percent-encode like Python's `urllib.parse.quote(s, safe="")`:
    * Spark's url_encode is form-encoding (space→'+', '*' kept, '~' escaped);
    * patch the three divergent classes afterwards.
    */
  private def quote(c: Column): Column = {
    val formEncoded = url_encode(c)
    regexp_replace(
      regexp_replace(
        regexp_replace(formEncoded, lit("\\+"), lit("%20")),
        lit("%7E"), lit("~")),
      lit("\\*"), lit("%2A"))
  }

  /** Encode one identity component `@field:value` per domain/series_id.py:
    * null → !n, bool → !b:0|1, integral → !i:v, string → percent-encoded.
    * Fractional identity fields are rejected: the reference encodes them via
    * Python float.hex(), which has no engine-portable SQL expression — cast
    * categorical floats to string or int upstream instead.
    */
  private[graft] def encodeComponent(field: String, dt: DataType): Column = {
    val encodedField = java.net.URLEncoder.encode(field, "UTF-8")
      .replace("+", "%20").replace("%7E", "~").replace("*", "%2A")
    val v = col(field)
    val encodedValue: Column = dt match {
      case StringType => quote(v)
      case BooleanType => concat(lit("!b:"), v.cast("int").cast("string"))
      case ByteType | ShortType | IntegerType | LongType =>
        concat(lit("!i:"), v.cast("string"))
      case other @ (DoubleType | FloatType | _: DecimalType) =>
        throw new UnsupportedOperationException(
          s"Series identity field '$field' is ${other.catalogString}: the " +
            "reference encodes floats as float.hex() which is not portable " +
            "across engines — cast to string or integer first.")
      case other =>
        throw new UnsupportedOperationException(
          s"Series identity field '$field' must be string, integer, boolean " +
            s"or null; got ${other.catalogString}.")
    }
    concat(lit("@" + encodedField + ":"), coalesce(encodedValue, lit("!n")))
  }

  /** Project records into per-config series rows:
    * (series_id, time, value, sampleKeys…). series_id = config.id, suffixed
    * with `__@f:v|…` over the partition fields that are not sample keys
    * (reference make_partitioned_series_id).
    */
  def project(df: DataFrame, partitionBy: Seq[String], sampleKeys: Seq[String],
              timeCol: String, configs: Seq[SeriesConfig]): DataFrame = {
    require(configs.nonEmpty, "series projection needs at least one config")
    configs.foreach { c =>
      require(!c.id.contains(IdSeparator),
        s"Series base id must not contain reserved separator '$IdSeparator'")
    }
    val idFields = partitionBy.filterNot(sampleKeys.contains)
    val suffix: Option[Column] =
      if (idFields.isEmpty) None
      else Some(concat_ws(ComponentSeparator,
        idFields.map(f => encodeComponent(f, df.schema(f).dataType)): _*))
    val entries = configs.map { c =>
      val seriesId = suffix match {
        case None      => lit(c.id): Column
        case Some(sfx) => concat(lit(c.id + IdSeparator), sfx)
      }
      struct(seriesId.as("series_id"),
        col(c.field).cast("double").as("value"))
    }
    df.select(sampleKeys.map(col) :+ col(timeCol).as("time") :+
        explode(array(entries: _*)).as("s"): _*)
      .select(col("s.series_id") +: col("time") +: col("s.value") +:
        sampleKeys.map(col): _*)
  }
}
