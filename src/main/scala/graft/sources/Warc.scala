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
  * Compressed WARC (`.warc.gz` as concatenated gzip members) is a
  * whole-file read per member-group — Spark's codec auto-detect handles the
  * decompression but splits vanish; re-stage to uncompressed or parquet for
  * the 100 TB path (the posture Common Crawl's own processing guides take).
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
  def readWarc(spark: SparkSession, path: String): DataFrame = {
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
    frames(spark, path).select(
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
}
