package graft.pipeline

import java.nio.file.{Files, Path}
import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.Runs

/** The explicit series checkpoint manifest (reference artifacts/series.py:48
  * SeriesManifest, version 8): a named JSON record of WHAT a materialized
  * dataset contains — cadence, sample keys + types, per-series sample
  * counts for every feature and target — and of the EXACT bytes that
  * contain it (per-file size/mtime/sha-256 fingerprints plus a dataset-level
  * digest). `materialize` writes it beside the run's dataset; the
  * incremental-materialize freshness check consumes it, so a served dataset
  * whose files drifted under the symlink is rebuilt even when the config
  * and inputs still fingerprint clean — the hole the config-level
  * fingerprint alone cannot see.
  *
  * Validation mirrors the reference's model validators: unique sample keys,
  * type list parallel to the key list, data path relative to the manifest,
  * series ids unique across features and targets, hex-shaped digests.
  *
  * Scale posture: freshness is a STAT check (size + mtime per recorded
  * file — O(files) driver metadata, no data read), the right fast path at
  * 100 TB; the recorded sha-256s are the portable integrity record, and
  * [[verify]] re-hashes them on demand (audit/gate scale).
  */
object SeriesManifest {

  val Version = 1
  val FileName = "series_manifest.json"

  final case class Entry(id: String, samples: Long)
  final case class FileFp(relPath: String, size: Long, mtimeNs: Long,
                          sha256: String)

  final case class Manifest(version: Int, format: String, cadence: String,
                            sampleKeys: Seq[String],
                            sampleKeyTypes: Seq[String],
                            path: String, rows: Long, sha256: String,
                            files: Seq[FileFp],
                            features: Seq[Entry], targets: Seq[Entry]) {
    /** Reference validators (series.py validate_unique_sample_keys /
      * validate_relative_path / validate_contract).
      */
    def validated(): Manifest = {
      require(version == Version, s"unsupported manifest version $version")
      require(sampleKeys.distinct.length == sampleKeys.length,
        "sample keys must be unique")
      require(sampleKeyTypes.length == sampleKeys.length,
        "sample key type count must match sample keys")
      val p = java.nio.file.Paths.get(path)
      require(!p.isAbsolute && !path.split('/').contains(".."),
        "series data path must be relative to the manifest")
      val ids = (features ++ targets).map(_.id)
      require(ids.distinct.length == ids.length,
        "series ids must be unique across features and targets")
      require(rows >= 0 && (features ++ targets).forall(_.samples >= 0),
        "row and sample counts must be non-negative")
      (sha256 +: files.map(_.sha256)).foreach(h =>
        require(h.matches("^[0-9a-f]{64}$"), s"malformed sha256: $h"))
      this
    }
  }

  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString

  private def fileSha(p: Path): String = {
    val md = MessageDigest.getInstance("SHA-256")
    val in = Files.newInputStream(p)
    try {
      val buf = new Array[Byte](1 << 16)
      var n = in.read(buf)
      while (n >= 0) { if (n > 0) md.update(buf, 0, n); n = in.read(buf) }
    } finally in.close()
    hex(md.digest())
  }

  /** The dataset dir's data files (sorted by name; writer markers and
    * hidden checksum files excluded).
    */
  private def dataFiles(datasetDir: Path): Seq[Path] = {
    val s = Files.list(datasetDir)
    try s.iterator().asInstanceOf[java.util.Iterator[Path]]
      .asScala.toSeq
      .filter(p => Files.isRegularFile(p))
      .filterNot(p => p.getFileName.toString.startsWith(".") ||
        p.getFileName.toString.startsWith("_"))
      .sortBy(_.getFileName.toString)
    finally s.close()
  }
  private implicit class IterOps[A](it: java.util.Iterator[A]) {
    def asScala: Iterator[A] = new Iterator[A] {
      def hasNext: Boolean = it.hasNext
      def next(): A = it.next()
    }
  }

  /** Build the manifest for a finished run: one aggregate pass over the
    * written dataset (total rows + per-series non-null sample counts) plus
    * an O(files) fingerprint walk.
    */
  def build(spark: SparkSession, paths: Runs.RunPaths,
            ds: Config.DatasetDef): Manifest = {
    val df = spark.read.parquet(paths.datasetDir.toString)
    val vecIds = ds.features.map(_.id) ++ ds.targets.map(_.id)
    // A raw vector id may be series-EXPANDED in the written dataset
    // (`id__@field:value...` when partition fields are not sample keys —
    // Series.project) or DROPPED entirely by the postprocess coverage
    // thresholds (ConfigRuntime.postprocessStage). Resolve each id against
    // the actual columns by base-id prefix — counting an unresolved column
    // would throw AnalysisException and fail the whole materialize run —
    // summing samples across the expanded columns and recording 0 for
    // vectors the coverage gate pruned (HtmlReport.matrix handles the same
    // expansion; the manifest must too).
    val expanded: Map[String, Seq[String]] = vecIds.map { id =>
      id -> df.columns.toSeq.filter(c =>
        c == id || c.startsWith(id + Series.IdSeparator))
    }.toMap
    val countedCols = vecIds.flatMap(expanded).distinct
    val aggs = count(lit(1)).cast("long").as("__rows") +:
      countedCols.map(c => count(col(c)).cast("long").as(s"__n_$c"))
    val row = df.agg(aggs.head, aggs.tail: _*).collect().head
    val rows = row.getLong(0)
    val perCol = countedCols.zipWithIndex
      .map { case (c, i) => c -> row.getLong(i + 1) }.toMap
    val samples = vecIds
      .map(id => id -> expanded(id).map(perCol).sum).toMap
    val keyTypes = ds.sampleKeys.map(k => df.schema(k).dataType.catalogString)
    val files = dataFiles(paths.datasetDir).map { p =>
      FileFp(paths.runRoot.relativize(p).toString.replace('\\', '/'),
        Files.size(p),
        Files.getLastModifiedTime(p).to(java.util.concurrent.TimeUnit.NANOSECONDS),
        fileSha(p))
    }
    val total = hex(MessageDigest.getInstance("SHA-256")
      .digest(files.map(f => s"${f.relPath}:${f.sha256}").mkString("\n")
        .getBytes("UTF-8")))
    Manifest(Version, "parquet", ds.cadence, ds.sampleKeys, keyTypes,
      paths.runRoot.relativize(paths.datasetDir).toString.replace('\\', '/'),
      rows, total, files,
      ds.features.map(f => Entry(f.id, samples(f.id))),
      ds.targets.map(t => Entry(t.id, samples(t.id)))).validated()
  }

  // ----------------------------------------------------------------- JSON

  import org.json4s._
  import org.json4s.jackson.JsonMethods

  def write(runRoot: Path, m: Manifest): Path = {
    def entries(es: Seq[Entry]) = JArray(es.map(e =>
      JObject("id" -> JString(e.id), "samples" -> JLong(e.samples)): JValue).toList)
    val json = JObject(
      "version" -> JInt(m.version),
      "format" -> JString(m.format),
      "cadence" -> JString(m.cadence),
      "sample_keys" -> JArray(m.sampleKeys.map(JString(_): JValue).toList),
      "sample_key_types" -> JArray(m.sampleKeyTypes.map(JString(_): JValue).toList),
      "path" -> JString(m.path),
      "rows" -> JLong(m.rows),
      "sha256" -> JString(m.sha256),
      "files" -> JArray(m.files.map(f => JObject(
        "path" -> JString(f.relPath), "size" -> JLong(f.size),
        "mtime_ns" -> JLong(f.mtimeNs),
        "sha256" -> JString(f.sha256)): JValue).toList),
      "features" -> entries(m.features),
      "targets" -> entries(m.targets))
    val out = runRoot.resolve(FileName)
    Files.writeString(out, JsonMethods.pretty(JsonMethods.render(json)))
    out
  }

  def read(path: Path): Manifest = {
    val j = JsonMethods.parse(Files.readString(path))
    def str(f: JValue): String = f.asInstanceOf[JString].s
    def lng(f: JValue): Long = f match {
      case JInt(x) => x.toLong; case JLong(x) => x
      case other => throw new IllegalArgumentException(s"bad long: $other")
    }
    def strs(f: JValue): Seq[String] =
      f.asInstanceOf[JArray].arr.map(str)
    def entries(f: JValue): Seq[Entry] = f.asInstanceOf[JArray].arr
      .map(e => Entry(str(e \ "id"), lng(e \ "samples")))
    Manifest(
      lng(j \ "version").toInt, str(j \ "format"), str(j \ "cadence"),
      strs(j \ "sample_keys"), strs(j \ "sample_key_types"),
      str(j \ "path"), lng(j \ "rows"), str(j \ "sha256"),
      (j \ "files").asInstanceOf[JArray].arr.map(f =>
        FileFp(str(f \ "path"), lng(f \ "size"), lng(f \ "mtime_ns"),
          str(f \ "sha256"))),
      entries(j \ "features"), entries(j \ "targets")).validated()
  }

  /** Stat-level freshness — the fast path the incremental materialize
    * consumes: the manifest parses, validates, and every recorded file
    * still exists with the recorded size and mtime. O(files) metadata, no
    * data read.
    */
  def fresh(runRoot: Path): Boolean = {
    val mp = runRoot.resolve(FileName)
    if (!Files.exists(mp)) return false
    try {
      val m = read(mp)
      m.files.nonEmpty && m.files.forall { f =>
        val p = runRoot.resolve(f.relPath)
        Files.isRegularFile(p) && Files.size(p) == f.size &&
          Files.getLastModifiedTime(p)
            .to(java.util.concurrent.TimeUnit.NANOSECONDS) == f.mtimeNs
      }
    } catch { case _: Exception => false }
  }

  /** Deep integrity: re-hash every recorded file and compare digests (the
    * audit path; [[fresh]] is the serving-time check).
    */
  def verify(runRoot: Path): Boolean = {
    val mp = runRoot.resolve(FileName)
    if (!Files.exists(mp)) return false
    try {
      val m = read(mp)
      m.files.forall(f => fileSha(runRoot.resolve(f.relPath)) == f.sha256)
    } catch { case _: Exception => false }
  }
}
