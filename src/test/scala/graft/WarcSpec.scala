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

  test("warc.gz: per-record gzip members round-trip through the streaming decoder") {
    val docs = (0 until 60).map(i =>
      ("response", s"urn:t:$i", s"https://h.example.com/$i",
        s"zipped body $i " + ("filler " * (i % 7))))
    val records = docs.toDF("t", "id", "uri", "block")
      .select(Warc.record(col("t"), col("id"), col("uri"), col("block"))
        .as("rec"))
    val dir = java.nio.file.Files.createTempDirectory("warcgz").toString
    Warc.writeGzMembers(records.repartition(3), dir)
    // the layout is the Common Crawl shape: several part files (per-file
    // task parallelism), each a concatenation of per-record gzip members
    val parts = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".warc.gz"))
    assert(parts.length == 3, s"expected 3 member files, got ${parts.length}")
    // every file holds multiple members: more than one gzip magic
    val magicCounts = parts.map { f =>
      val b = java.nio.file.Files.readAllBytes(f.toPath)
      (0 until b.length - 2).count(i =>
        b(i) == 0x1f.toByte && b(i + 1) == 0x8b.toByte && b(i + 2) == 8)
    }
    assert(magicCounts.forall(_ > 1),
      s"per-record members expected, magic counts: ${magicCounts.toSeq}")
    val out = Warc.readWarcGz(spark, dir).collect()
      .map(r => (r.getString(1), r.getLong(3), r.getBoolean(4), r.getString(5)))
    assert(out.length == 60)
    assert(out.forall(_._3), "all members must pass length_ok")
    val byId = out.map(r => r._1 -> r._4).toMap
    docs.foreach { case (_, id, _, block) => assert(byId(id) == block) }
    // overwrite semantics: restaging with fewer partitions replaces files
    Warc.writeGzMembers(records.repartition(2), dir)
    assert(new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".warc.gz")) == 2)
    assert(Warc.readWarcGz(spark, dir).count() == 60)
  }

  test("warc.gz ranged fetch: the sidecar index addresses every member exactly") {
    val docs = (0 until 40).map(i =>
      ("response", s"urn:t:$i", s"https://h.example.com/$i",
        s"ranged body $i " + ("pad " * (i % 5))))
    val records = docs.toDF("t", "id", "uri", "block")
      .select(Warc.record(col("t"), col("id"), col("uri"), col("block"))
        .as("rec"))
    val dir = java.nio.file.Files.createTempDirectory("warcrange").toString
    Warc.writeGzMembers(records.repartition(3), dir)
    val idx = Warc.readGzIndex(spark, dir)
    val rows = idx.collect()
    assert(rows.length == 40, "one index row per record")
    // extents are exact: offsets per file are 0-based, contiguous, and sum
    // to the file length
    val byFile = rows.map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    byFile.foreach { case (path, ms) =>
      val sorted = ms.sortBy(_._2)
      assert(sorted.head._2 == 0L, "first member starts at byte 0")
      sorted.sliding(2).foreach {
        case Array((_, o1, l1), (_, o2, _)) => assert(o1 + l1 == o2,
          "members are contiguous")
        case _ =>
      }
      val p = java.nio.file.Paths.get(new java.net.URI(path))
      assert(sorted.map(_._3).sum == java.nio.file.Files.size(p),
        "extents cover the file exactly")
    }
    // a filtered fetch reads exactly the named members, payloads intact
    val wanted = idx.filter(
      regexp_extract(col("record_id"), "urn:t:([0-9]+)", 1)
        .cast("long") % 3 === 0)
    val out = Warc.readWarcGzRange(spark, wanted).collect()
      .map(r => (r.getString(1), r.getBoolean(4), r.getString(5)))
    assert(out.length == docs.count(d => d._2.stripPrefix("urn:t:").toInt % 3 == 0))
    assert(out.forall(_._2), "ranged members must pass length_ok")
    val byId = out.map(r => r._1 -> r._3).toMap
    docs.filter(_._2.stripPrefix("urn:t:").toInt % 3 == 0).foreach {
      case (_, id, _, block) => assert(byId(id) == block)
    }
  }

  test("splitFrames heals frames across arbitrary chunk boundaries") {
    val recs = (0 until 5).map(i => s"frame body $i with tail\r\n")
    val whole = recs.map(Warc.Magic + _).mkString.getBytes("UTF-8")
    // every chunk size, including ones that split the magic itself
    for (chunk <- Seq(1, 3, 7, 10, 11, 64, whole.length)) {
      val chunks = whole.grouped(chunk).map(_.toArray)
      val frames = Warc.splitFrames(chunks).toSeq
      assert(frames == recs, s"chunk=$chunk")
    }
  }
}
