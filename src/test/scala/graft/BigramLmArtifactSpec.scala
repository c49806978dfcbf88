package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.operators.BigramLm

/** The bigram-LM train-if-missing artifact's freshness contract (r13
  * verdict ask #4 + advice): the corpus fingerprint must walk the table
  * RECURSIVELY (a hive-partitioned layout keys on LEAF part files, not on
  * subdirectory stat), the manifest must carry the full fingerprint input
  * so validity is a content comparison rather than a bare existence check,
  * and touching one leaf file inside a partition subdir must refit.
  */
class BigramLmArtifactSpec extends SparkSpec {

  private def mkCorpus(dir: String): Unit = {
    import spark.implicits._
    Seq((1L, "a", "the cat sat on the mat"),
        (2L, "a", "the dog sat on the rug"),
        (3L, "b", "a cat and a dog met"),
        (4L, "b", "the cat met the dog"))
      .toDF("doc_id", "part", "text")
      .write.mode("overwrite").partitionBy("part").parquet(dir)
  }

  private def leafFiles(dir: String): Seq[java.nio.file.Path] = {
    import scala.jdk.CollectionConverters._
    scala.util.Using.resource(Files.walk(Paths.get(dir))) { w =>
      w.iterator().asScala.filter(p => Files.isRegularFile(p) &&
        p.getFileName.toString.endsWith(".parquet")).toSeq.sortBy(_.toString)
    }
  }

  test("corpus fingerprint keys on leaf files inside partition subdirs") {
    val dir = Files.createTempDirectory("graft_bigram_fp").toString
    mkCorpus(dir)
    val state = BigramLm.corpusState(dir)
    val leaves = leafFiles(dir)
    assert(leaves.size >= 2, "fixture must be a multi-subdir layout")
    // every leaf's RELATIVE path (subdir included) is in the canonical state
    leaves.foreach { p =>
      val rel = Paths.get(dir).relativize(p).toString
      assert(state.contains(rel), s"state must stat leaf $rel")
    }
    // a missing path snapshots as "missing" — never an NPE
    assert(BigramLm.corpusState(dir + "_nope").contains("missing"))
  }

  test("hydrate on unchanged corpus; one touched leaf file refits") {
    val dir = Files.createTempDirectory("graft_bigram_fp2").toString
    val cache = Files.createTempDirectory("graft_bigram_cache").toString
    mkCorpus(dir)
    def subdirs(): Seq[String] =
      Option(new java.io.File(cache).listFiles()).getOrElse(Array.empty)
        .filter(_.isDirectory).map(_.getName).toSeq.sorted

    val docs = spark.read.parquet(dir)
    val first = BigramLm.scoresArtifact(spark, docs, "doc_id", "text", dir, cache)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(subdirs().size == 1, "first call fits exactly one artifact")

    // unchanged corpus → hydrate: no new artifact dir, same rows
    val again = BigramLm.scoresArtifact(spark, docs, "doc_id", "text", dir, cache)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(subdirs().size == 1, "unchanged corpus must hydrate, not refit")
    assert(again == first)

    // touch ONE leaf file inside a partition subdir → the fingerprint
    // moves and the next call fits a fresh artifact
    val leaf = leafFiles(dir).head
    Files.setLastModifiedTime(leaf,
      java.nio.file.attribute.FileTime.fromMillis(
        Files.getLastModifiedTime(leaf).toMillis + 1000))
    BigramLm.scoresArtifact(spark, docs, "doc_id", "text", dir, cache).count()
    assert(subdirs().size == 2, "a touched leaf inside a subdir must refit")
  }
}
