package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: print the per-plan posture decision for named queries at a
  * data dir — plan-build only, no execution.
  */
object PostureProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args(1).split(",")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, dir)
      val sortish = pipeline.Posture.sortDominated(
        pipeline.Posture.plannedWithExchanges(df))
      val parts = pipeline.Posture.initialShufflePartitions(df, 32)
      println(s"[posture] $n sortDominated=$sortish parts=$parts bytes=${pipeline.Posture.scanBytes(df)}")
    }
    spark.stop()
  }
}
