package graft

import org.apache.spark.sql.SparkSession

/** Bench main: times every SparkEntry query at SPARK_GRAFT_SF_DIR, prints one
  * JSON line. A warmup pass (table reads + a tiny agg) is excluded from the
  * timings so JVM/codegen startup isn't attributed to the first query.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warmup: touch every table once (filesystem cache + codegen + shuffle machinery).
    Seq("lineitem", "orders", "customer", "supplier", "nation", "region",
      "part", "documents", "embeddings").foreach { t =>
      graft.sources.Tables.table(spark, sfDir, t).count()
    }
    graft.sources.Tables.events(spark, sfDir)
      .groupBy("event_type").count().count()

    // Best of 2 runs per query: the shared host has bursty background load,
    // and steady-state latency is the honest number for plan quality.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }
      name -> times.min
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
