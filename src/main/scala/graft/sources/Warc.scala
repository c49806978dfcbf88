package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (ISO 28500) crawl-archive ingestion — the interchange format a
  * web-scale training-data pipeline actually receives its raw input in
  * (Common Crawl publishes WARC; the reference pipeline starts one step
  * later at clean records, `sources/decoders.py`).
  *
  * Read shape: `spark.read.option("lineSep", "WARC/1.0\r\n").text(path)` —
  * the record magic is the Hadoop line delimiter, so a multi-terabyte
  * uncompressed WARC SPLITS at record boundaries with no pre-pass (each
  * 128 MB input split starts scanning forward to the next magic — the same
  * mechanism that makes plain text splittable). Per-record parsing is then
  * pure codegen'd string expressions: named headers out, payload framed by
  * `Content-Length` (the REAL WARC framing — a payload that happened to
  * contain the magic would surface as a `length_ok = false` row, not a
  * silent corruption).
  *
  * Payload lengths here are character counts (the synthetic corpora are
  * ASCII); a byte-accurate multi-byte deployment swaps `length` for
  * `octet_length` at both build and parse — the framing logic is unchanged.
  *
  * Compressed WARC (`.warc.gz`): Common Crawl ships each record as its OWN
  * gzip member, members concatenated into ~1 GB part files — see
  * [[Warc.writeGzMembers]]/[[Warc.readWarcGz]]. Parallelism is per FILE
  * (the Common Crawl processing posture: one warc.gz per task; at 100 TB
  * that is ~100k files — plenty of tasks); within a file the members
  * stream through one inflater with bounded memory, and record framing
  * after inflation is the same magic-delimiter mechanism as the
  * uncompressed path. The per-record-member layout is what makes the
  * format randomly addressable by (offset, length) for index-driven
  * fetches — the writer here produces exactly that layout.
  */
object Warc {

  val Magic = "WARC/1.0\r\n"

  /** One WARC record as a single string column: magic + named headers +
    * blank line + `Content-Length`-framed block + record terminator.
    */
  def record(warcType: Column, recordId: Column, targetUri: Column,
             block: Column): Column =
    concat(
      lit(Magic),
      lit("WARC-Type: "), warcType, lit("\r\n"),
      lit("WARC-Record-ID: <"), recordId, lit(">\r\n"),
      lit("WARC-Target-URI: "), targetUri, lit("\r\n"),
      lit("Content-Length: "), length(block).cast("string"), lit("\r\n"),
      lit("\r\n"),
      block, lit("\r\n"))

  /** Raw record frames of a WARC path: one row per record (the empty
    * leading split before the first magic is dropped). Splittable.
    */
  def frames(spark: SparkSession, path: String): DataFrame =
    spark.read.option("lineSep", Magic).text(path)
      .filter(length(col("value")) > 0)

  /** Parsed WARC records: named headers + length-framed payload +
    * framing-integrity flag. `length_ok` asserts the two CRLFs that close a
    * well-formed block sit exactly where `Content-Length` says — a payload
    * containing the magic (and therefore over-split) fails this check
    * loudly instead of truncating silently.
    *
    * Output: `(warc_type, record_id, target_uri, n_bytes, length_ok,
    * payload)`.
    */
  def readWarc(spark: SparkSession, path: String): DataFrame =
    parseFrames(frames(spark, path))

  /** Parse raw record frames (one string row, the text between record
    * magics) into the named-header/length-framed shape — shared by the
    * splittable uncompressed read and the per-member gzip read.
    */
  private def parseFrames(framesDf: DataFrame): DataFrame = {
    val v = col("value")
    val headers = substring_index(v, "\r\n\r\n", 1)
    val bodyStart = length(headers) + 5 // past the \r\n\r\n separator
    // nullif: a frame without the header extracts "" — ANSI-safe to null
    val len = nullif(regexp_extract(headers, "Content-Length: ([0-9]+)", 1),
      lit("")).cast("long")
    val payload = call_function("substr", v, bodyStart.cast("int"),
      len.cast("int"))
    val closing = call_function("substr", v, (bodyStart + len).cast("int"),
      lit(2))
    framesDf.select(
      regexp_extract(headers, "WARC-Type: ([^\r\n]+)", 1).as("warc_type"),
      regexp_extract(headers, "WARC-Record-ID: <([^>]+)>", 1).as("record_id"),
      regexp_extract(headers, "WARC-Target-URI: ([^\r\n]+)", 1)
        .as("target_uri"),
      len.as("n_bytes"),
      // null-safe: a frame with no Content-Length header (an over-split
      // payload tail) is malformed, not unknown
      coalesce(closing === "\r\n", lit(false)).as("length_ok"),
      payload.as("payload"))
  }

  // ------------------------------------------------------------- warc.gz

  /** Write one gzip MEMBER (10-byte header, raw deflate, CRC32+ISIZE
    * trailer) per record onto `out`, reusing one Deflater per partition —
    * a fresh GZIPOutputStream per record would leak a native Deflater
    * each (no close without closing the underlying stream).
    */
  private def writeMember(out: java.io.OutputStream, bytes: Array[Byte],
                          deflater: java.util.zip.Deflater,
                          crc: java.util.zip.CRC32): Unit = {
    out.write(Array[Byte](0x1f, 0x8b.toByte, 8, 0, 0, 0, 0, 0, 0, 0xff.toByte))
    deflater.reset()
    val dos = new java.util.zip.DeflaterOutputStream(out, deflater, 8192)
    dos.write(bytes)
    dos.finish() // flushes the deflate stream; the underlying stays open
    crc.reset()
    crc.update(bytes)
    def intLE(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    intLE(crc.getValue)
    intLE(bytes.length.toLong)
  }

  /** Stage a one-string-column frame of WARC records as the Common Crawl
    * `warc.gz` layout: one part file per partition, one gzip member PER
    * RECORD concatenated inside it, plus a CDX-style sidecar index per part
    * (`part-NNNNN.warc.gz.idx`, lines `record_id \t offset \t length` —
    * the member's compressed byte extent) so index-driven fetches can
    * ranged-read single records without scanning the archive
    * ([[readWarcGzRange]]). Executor-side streaming IO (the codec
    * exception to the no-imperative rule — same as the multimodal
    * decoders); one Deflater per partition, bytes never collect.
    */
  def writeGzMembers(records: DataFrame, outDir: String): Unit = {
    import java.nio.file.{Files, Paths}
    val dir = Paths.get(outDir)
    Files.createDirectories(dir)
    // overwrite semantics for re-runs
    val existing = Files.list(dir)
    try {
      val it = existing.iterator()
      while (it.hasNext) {
        val p = it.next()
        val n = p.getFileName.toString
        if (n.endsWith(".warc.gz") || n.endsWith(".warc.gz.idx"))
          Files.delete(p)
      }
    } finally existing.close()
    val spark = records.sparkSession
    import spark.implicits._
    val colName = records.columns.head
    records.select(col(colName)).as[String].foreachPartition {
      (rows: Iterator[String]) =>
        if (rows.hasNext) {
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val path = Paths.get(outDir, f"part-$pid%05d.warc.gz")
          val raw = new java.io.BufferedOutputStream(
            Files.newOutputStream(path), 1 << 16)
          // count every compressed byte as it passes — the counter IS the
          // member offset table
          var written = 0L
          val out = new java.io.FilterOutputStream(raw) {
            override def write(b: Int): Unit = { raw.write(b); written += 1 }
            override def write(b: Array[Byte], off: Int, len: Int): Unit = {
              raw.write(b, off, len); written += len
            }
          }
          val idx = Files.newBufferedWriter(
            Paths.get(outDir, f"part-$pid%05d.warc.gz.idx"))
          val deflater = new java.util.zip.Deflater(
            java.util.zip.Deflater.DEFAULT_COMPRESSION, true) // nowrap: raw deflate
          val crc = new java.util.zip.CRC32()
          try rows.foreach { rec =>
            val at = written
            writeMember(out, rec.getBytes(java.nio.charset.StandardCharsets.UTF_8),
              deflater, crc)
            val i0 = rec.indexOf("WARC-Record-ID: <")
            val i1 = if (i0 >= 0) rec.indexOf('>', i0 + 17) else -1
            val rid = if (i1 > i0) rec.substring(i0 + 17, i1) else ""
            idx.write(s"$rid\t$at\t${written - at}\n")
          } finally {
            deflater.end()
            out.close()
            idx.close()
          }
        }
    }
  }

  /** The sidecar member index of a [[writeGzMembers]] archive:
    * `(path, record_id, offset, length)` where `path` is the DATA file and
    * `(offset, length)` the member's compressed extent. Metadata-scale —
    * one row per record, three numbers wide, the frame a fetch planner
    * filters before [[readWarcGzRange]].
    */
  def readGzIndex(spark: SparkSession, dir: String): DataFrame =
    spark.read.text(s"$dir/*.warc.gz.idx")
      .select(
        regexp_replace(input_file_name(), "\\.idx$", "").as("path"),
        split(col("value"), "\t").as("f"))
      .select(col("path"), col("f").getItem(0).as("record_id"),
        col("f").getItem(1).cast("long").as("offset"),
        col("f").getItem(2).cast("long").as("length"))

  /** Ranged record fetch: parse EXACTLY the members named by `index`
    * (`path`, `offset`, `length` columns — normally a filtered
    * [[readGzIndex]]) by seeking to each member's compressed extent — the
    * archive files are never scanned, bytes read = compressed bytes of the
    * requested records. One open handle per (task, file): partition the
    * index by path upstream for fetch locality (a fetch BATCH is
    * metadata-scale, so the per-path grouping is bounded). Output schema
    * equals [[readWarc]]'s.
    */
  def readWarcGzRange(spark: SparkSession, index: DataFrame): DataFrame = {
    import spark.implicits._
    val rows = index
      .repartition(col("path"))
      .select(col("path"), col("offset").cast("long"), col("length").cast("long"))
      .as[(String, Long, Long)]
    val framesDs = rows.mapPartitions { it =>
      it.toSeq.groupBy(_._1).iterator.flatMap { case (path, members) =>
        val p =
          if (path.startsWith("file:"))
            java.nio.file.Paths.get(new java.net.URI(path))
          else java.nio.file.Paths.get(path)
        val ch = java.nio.channels.FileChannel.open(p)
        try {
          members.sortBy(_._2).map { case (_, off, len) =>
            val buf = java.nio.ByteBuffer.allocate(len.toInt)
            ch.position(off)
            while (buf.hasRemaining && ch.read(buf) >= 0) {}
            val in = new java.util.zip.GZIPInputStream(
              new java.io.ByteArrayInputStream(buf.array()), 1 << 16)
            val rec = new String(in.readAllBytes(),
              java.nio.charset.StandardCharsets.UTF_8)
            // members carry full records; parseFrames expects the text
            // AFTER the record magic (the framing the splitter produces)
            if (rec.startsWith(Magic)) rec.substring(Magic.length) else rec
          }
        } finally ch.close()
      }
    }
    parseFrames(framesDs.toDF("value"))
  }

  /** Split an inflating chunk stream into record frames at the magic —
    * byte-level (the magic is pure ASCII, so a frame boundary can never
    * split a multi-byte code point; chunk boundaries are healed by
    * accumulating before conversion). Memory is bounded by one frame.
    */
  private[graft] def splitFrames(chunks: Iterator[Array[Byte]]): Iterator[String] = {
    val magic = Magic.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val acc = new scala.collection.mutable.ArrayBuffer[Byte]()
    var searchFrom = 0
    def indexOfMagic(from: Int): Int = {
      var i = from
      val limit = acc.length - magic.length
      while (i <= limit) {
        var j = 0
        while (j < magic.length && acc(i + j) == magic(j)) j += 1
        if (j == magic.length) return i
        i += 1
      }
      -1
    }
    def drain(upTo: Int): String = {
      val frame = new String(acc.take(upTo).toArray,
        java.nio.charset.StandardCharsets.UTF_8)
      acc.remove(0, math.min(acc.length, upTo + magic.length))
      searchFrom = 0
      frame
    }
    new Iterator[String] {
      private var nextFrame: Option[String] = None
      private var exhausted = false
      @annotation.tailrec
      private def advance(): Unit =
        if (nextFrame.isEmpty && !exhausted) {
          val at = indexOfMagic(searchFrom)
          if (at >= 0) nextFrame = Some(drain(at))
          else if (chunks.hasNext) {
            val c = chunks.next()
            searchFrom = math.max(0, acc.length - magic.length + 1)
            acc ++= c
            advance()
          } else {
            exhausted = true
            if (acc.nonEmpty) nextFrame = Some(drain(acc.length))
          }
        }
      override def hasNext: Boolean = { advance(); nextFrame.nonEmpty }
      override def next(): String = {
        advance()
        val f = nextFrame.get
        nextFrame = None
        f
      }
    }.filter(_.nonEmpty)
  }

  /** Parsed records of a per-record-gzip-member archive directory
    * (`*.warc.gz`). One task per FILE (binaryFile rows — the file's raw
    * bytes materialize per task, so the WRITER governs file size and
    * parallelism together: file count must track volume); inside a task
    * the concatenated members stream through one GZIPInputStream (the
    * gzip spec makes inflate-of-concatenation = concatenation-of-
    * inflates) in 64 KB chunks, re-framed at the record magic and parsed
    * by the same codegen'd expressions as the uncompressed path. Inflated
    * memory is bounded by one record. Output schema equals [[readWarc]]'s.
    */
  def readWarcGz(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bin = spark.read.format("binaryFile").load(s"$dir/*.warc.gz")
      .select(col("content"))
    val framesDs = bin.as[Array[Byte]].mapPartitions { files =>
      files.flatMap { bytes =>
        val in = new java.util.zip.GZIPInputStream(
          new java.io.ByteArrayInputStream(bytes), 1 << 16)
        val chunks = Iterator.continually {
          val b = new Array[Byte](1 << 16)
          val n = in.read(b)
          if (n <= 0) null else java.util.Arrays.copyOf(b, n)
        }.takeWhile(_ != null)
        splitFrames(chunks)
      }
    }
    parseFrames(framesDs.toDF("value"))
  }
}
