package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers over the driver's parquet test tables plus generic format readers
  * (SURVEY.md §2.1). The reference's fs loader + decoder stack
  * (/root/reference/src/datapipeline/sources/adapters/fs.py, decoders.py)
  * maps to Spark's native readers: glob paths, gzip codecs, and bounded-batch
  * parquet reads are built in, and schema lands in the plan so column pruning
  * and predicate pushdown reach the scan.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // The driver's events table carries TIMESTAMP(NANOS) which Spark's vectorized
    // reader rejects; read nanos as long and normalize below (integer division —
    // ns-epoch magnitudes exceed 2^53, double math would corrupt them).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Read ms-precision parquet timestamps as session-TZ TIMESTAMP (UTC), not
    // TIMESTAMP_NTZ — keeps unix_micros & friends applicable everywhere.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  def lineitem(spark: SparkSession, d: String): DataFrame = table(spark, d, "lineitem")
  def orders(spark: SparkSession, d: String): DataFrame = table(spark, d, "orders")
  def customer(spark: SparkSession, d: String): DataFrame = table(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame = table(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame = table(spark, d, "part")
  def nation(spark: SparkSession, d: String): DataFrame = table(spark, d, "nation")
  def region(spark: SparkSession, d: String): DataFrame = table(spark, d, "region")
  /** events.ts is TIMESTAMP(NANOS) in parquet → read as long ns, convert to
    * microsecond TimestampType (lossless for this data: values are µs-grain).
    */
  def events(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val raw = table(spark, d, "events")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else raw
  }
  def documents(spark: SparkSession, d: String): DataFrame = table(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = table(spark, d, "embeddings")

  /** jsonl reader with explicit schema (no inference pass at scale). */
  def readJsonl(spark: SparkSession, path: String,
                schemaDDL: Option[String] = None): DataFrame = {
    val r = spark.read
    schemaDDL.fold(r)(s => r.schema(s)).json(path)
  }

  /** csv reader with explicit schema + header contract. */
  def readCsv(spark: SparkSession, path: String, header: Boolean = true,
              schemaDDL: Option[String] = None): DataFrame = {
    val r = spark.read.option("header", header.toString)
    schemaDDL.fold(r.option("inferSchema", "false"))(s => r.schema(s)).csv(path)
  }
}
