package graft

import graft.streaming.Streaming

/** The distributed parquet sink variant of the two result-linear streaming
  * queries must carry exactly the memory-sink rows — it exists so the sf1
  * sweep times the operator instead of a driver-side collect, never to
  * change results.
  */
class StreamingSinkSpec extends SparkSpec {

  private val DataDir = "/root/testdata/sf0.001"

  private def rowSet(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("attachStatic: parquet sink rows equal memory sink rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sink_attach")
    val viaMemory = rowSet(
      Streaming.attachStatic(spark, DataDir, "sink_spec_attach_mem"))
    val viaFile = rowSet(Streaming.attachStatic(spark, DataDir,
      "sink_spec_attach_file", Some(dir.resolve("s").toString)))
    assert(viaFile == viaMemory)
    assert(viaFile.nonEmpty)
  }

  test("asofAttach: parquet sink rows equal memory sink rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sink_asof")
    val viaMemory = rowSet(
      Streaming.asofAttach(spark, DataDir, "sink_spec_asof_mem"))
    val viaFile = rowSet(Streaming.asofAttach(spark, DataDir,
      "sink_spec_asof_file", Some(dir.resolve("s").toString)))
    assert(viaFile == viaMemory)
    assert(viaFile.nonEmpty)
  }
}
