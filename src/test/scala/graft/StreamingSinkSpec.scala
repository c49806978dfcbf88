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

  test("sftPackStream: parquet sink rows equal memory sink rows and the batch head") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sink_sft")
    val viaMemory = rowSet(
      Streaming.sftPackStream(spark, DataDir, "sink_spec_sft_mem"))
    val viaFile = rowSet(Streaming.sftPackStream(spark, DataDir,
      "sink_spec_sft_file", Some(dir.resolve("s").toString)))
    assert(viaFile == viaMemory)
    assert(viaFile.nonEmpty)
    // the ingest render is the batch head verbatim
    val batch = rowSet(SparkEntry.queries("sft_pack")(spark, DataDir))
    assert(viaMemory == batch)
  }

  private val CorpusDoc =
    """sources:
      |  - id: docs
      |    loader: { transport: fs, path: documents.parquet, reader: { format: parquet } }
      |corpus:
      |  source: docs
      |  steps:
      |    - { step: filter, lang: en, min_quality: 0.3, max_repetition: 0.8 }
      |    - { step: dedup_exact }
      |""".stripMargin

  test("streaming corpus journey equals the batch filter→dedup_exact prefix") {
    import org.apache.spark.sql.functions.{col, sha2}
    val project = graft.pipeline.Config.parseProject(CorpusDoc)
    val streamed = Streaming.runCorpusStream(spark, DataDir, project,
      "sink_spec_corpus_dedup")
      .select(sha2(col("text").cast("string"), 256).as("h"))
    val batch = graft.pipeline.ConfigRuntime
      .corpusThrough(spark, DataDir, project, through = None)
      .select(sha2(col("text").cast("string"), 256).as("h"))
    assert(rowSet(streamed) == rowSet(batch))
    assert(streamed.count() == batch.count(),
      "one representative per distinct curated text")
  }

  test("corpus steps needing corpus-at-rest passes are rejected by name") {
    val doc = CorpusDoc.replace("- { step: dedup_exact }",
      "- { step: dedup_fuzzy, threshold: 0.5 }")
    val e = intercept[IllegalArgumentException] {
      graft.pipeline.ConfigRuntime.corpusStream(spark, DataDir,
        graft.pipeline.Config.parseProject(doc))
    }
    assert(e.getMessage.contains("dedup_fuzzy") &&
      e.getMessage.contains("not streamable"))
  }

  test("the budget step is rejected on a stream by name") {
    val doc = CorpusDoc.replace("- { step: dedup_exact }",
      "- { step: budget, by: source, tokens: 200 }")
    val e = intercept[IllegalArgumentException] {
      graft.pipeline.ConfigRuntime.corpusStream(spark, DataDir,
        graft.pipeline.Config.parseProject(doc))
    }
    assert(e.getMessage.contains("'budget'") &&
      e.getMessage.contains("not streamable"), e.getMessage)
  }

  test("streaming tokenize requires an already-trained artifact") {
    val doc = CorpusDoc.replace("- { step: dedup_exact }",
      "- { step: tokenize, artifact: /tmp/graft_no_such_tok.json, rounds: 4 }")
    val e = intercept[IllegalArgumentException] {
      graft.pipeline.ConfigRuntime.corpusStream(spark, DataDir,
        graft.pipeline.Config.parseProject(doc))
    }
    assert(e.getMessage.contains("trained artifact") &&
      e.getMessage.contains("batch corpus journey"),
      e.getMessage)
  }

  test("authorityGateStream equals the batch left join; unseen hosts rank 0") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$DataDir/documents.parquet")
    val ranked = docs.select(col("source").as("host")).distinct()
      .orderBy("host").limit(2).withColumn("rank_micros", lit(500000L))
    val gated = Streaming.authorityGateStream(spark, DataDir, col("source"),
      ranked, 400000L, "sink_spec_authority")
    val expected = docs.select(col("doc_id"), col("source").as("host"))
      .join(ranked, Seq("host"), "left")
      .select(col("doc_id"), col("host"),
        coalesce(col("rank_micros"), lit(0L)).as("rank_micros"))
      .withColumn("keep", col("rank_micros") >= 400000L)
    assert(rowSet(gated) == rowSet(expected))
    assert(gated.where(col("rank_micros") === 0L && !col("keep")).count() > 0,
      "hosts absent from the rank table must surface with rank 0 and drop")
  }
}
