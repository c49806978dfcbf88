package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.time.{Instant, ZoneOffset}
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.DataFrame

/** Run-scoped output directories + run metadata (reference: io/runs.py
  * RunPaths/RunMetadata/start_run/finish_run) and the stdout preview sink
  * (reference: io/sinks/stdout.py StdoutTextSink).
  *
  * Layout, identical to the reference:
  * {{{
  *   serve_root/
  *     runs/<run_id>/dataset/   # main output for this run
  *     runs/<run_id>/run.json   # metadata for this run
  *     latest                   # symlink to the current live run
  * }}}
  */
object Runs {

  case class RunPaths(serveRoot: Path, runsRoot: Path, runId: String,
                      runRoot: Path, datasetDir: Path, metadataPath: Path)

  private val IdFmt =
    DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH-mm-ss-SSSSSS'Z'")
      .withZone(ZoneOffset.UTC)

  /** Filesystem-safe, lexically sortable run id (reference make_run_id).
    * Clock injectable so tests and replayed pipelines are deterministic.
    */
  def makeRunId(now: Instant = Instant.now()): String = IdFmt.format(now)

  /** Resolve the run layout under a serve root (reference get_run_paths). */
  def runPaths(serveRoot: String, runId: String): RunPaths = {
    val root = Paths.get(serveRoot)
    val runsRoot = root.resolve("runs")
    val runRoot = runsRoot.resolve(runId)
    RunPaths(root, runsRoot, runId, runRoot,
      runRoot.resolve("dataset"), runRoot.resolve("run.json"))
  }

  private[graft] def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def writeMeta(paths: RunPaths, startedAt: String,
                        finishedAt: Option[String], status: String,
                        notes: Option[String]): Unit = {
    val json =
      s"""{"run_id": ${jsonStr(paths.runId)}, "started_at": ${jsonStr(startedAt)}, """ +
        s""""finished_at": ${finishedAt.map(jsonStr).getOrElse("null")}, """ +
        s""""status": ${jsonStr(status)}, """ +
        s""""notes": ${notes.map(jsonStr).getOrElse("null")}}"""
    Files.writeString(paths.metadataPath, json)
  }

  /** Create the run directories and mark the run as running. */
  def startRun(paths: RunPaths, now: Instant = Instant.now()): Unit = {
    Files.createDirectories(paths.datasetDir)
    writeMeta(paths, now.toString, None, "running", None)
  }

  /** Mark the run finished. A SUCCESSFUL run repoints `serve_root/latest`
    * at itself (symlink swapped atomically via a temp link + move, so
    * readers never see a missing `latest`); a failed run leaves `latest`
    * on the previous good run — `latest` is the current LIVE run.
    */
  def finishRun(paths: RunPaths, status: String, notes: Option[String] = None,
                now: Instant = Instant.now()): Unit = {
    require(status == "success" || status == "failed", s"bad status: $status")
    val started = {
      val m = """"started_at": "([^"]+)"""".r
      m.findFirstMatchIn(Files.readString(paths.metadataPath))
        .map(_.group(1)).getOrElse(now.toString)
    }
    writeMeta(paths, started, Some(now.toString), status, notes)
    if (status == "success") {
      val latest = paths.serveRoot.resolve("latest")
      val tmp = paths.serveRoot.resolve(s".latest.${paths.runId}")
      Files.deleteIfExists(tmp)
      Files.createSymbolicLink(tmp, paths.serveRoot.relativize(paths.runRoot))
      Files.move(tmp, latest, StandardCopyOption.REPLACE_EXISTING,
        StandardCopyOption.ATOMIC_MOVE)
    }
  }

  /** HTML inspection sink (reference persistence.py:183 _write_html_output
    * over AtomicTextFileSink): write a rendered document atomically —
    * temp file + move, so a crash never leaves a half-written report where
    * a browser (or a freshness check) might read it.
    */
  def writeHtml(html: String, dest: java.nio.file.Path): java.nio.file.Path = {
    import java.nio.file.{Files, StandardCopyOption}
    if (dest.getParent != null) Files.createDirectories(dest.getParent)
    val tmp = dest.resolveSibling(dest.getFileName.toString + ".__tmp")
    Files.writeString(tmp, html)
    Files.move(tmp, dest, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
    dest
  }

  /** Stdout preview sink (reference StdoutTextSink): tab-joined rows of a
    * bounded preview to a text stream. Driver-side by design — this is the
    * human-inspection sink, not a data path; `limit` bounds the collect.
    */
  def writeText(df: DataFrame, limit: Int = 100,
                out: java.io.PrintStream = System.out): Long = {
    val rows = df.limit(limit).collect()
    rows.foreach(r => out.println(r.toSeq.map {
      case null => ""
      case v => v.toString
    }.mkString("\t")))
    out.flush()
    rows.length.toLong
  }
}
