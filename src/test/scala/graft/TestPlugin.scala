package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.StreamKey
import graft.plugins.{GraftPlugin, PluginOp}

/** Fixture plugin, discovered via the ServiceLoader entry in
  * src/test/resources/META-INF/services/graft.plugins.GraftPlugin — proving
  * the classpath-discovery path end to end (a real plugin jar works the
  * same way).
  */
final class TestPlugin extends GraftPlugin {
  override def name: String = "spec-fixture"

  // a tab-separated reader format
  override def loaders = Map(
    "tsv" -> { (spark: SparkSession, path: String, options: Map[String, String]) =>
      spark.read.options(options)
        .option("sep", "\t").option("header", "true")
        .option("inferSchema", "true")
        .csv(path)
    })

  // `{ operation: plugin, name: scale, options: { field: v, factor: 2 } }`
  override def transforms = Map(
    "scale" -> { (options: Map[String, Any]) =>
      val field = options.getOrElse("field",
        throw new IllegalArgumentException("scale: 'field' required")).toString
      val factor = options.getOrElse("factor", 1).toString.toDouble
      new PluginOp {
        def apply(df: DataFrame, key: StreamKey): DataFrame =
          df.withColumn(field, col(field) * lit(factor))
      }
    })

  override def registerFunctions(spark: SparkSession): Unit =
    spark.udf.register("spec_plus_one",
      (x: Long) => x + 1) // spec-only; real plugins register Expressions
}
