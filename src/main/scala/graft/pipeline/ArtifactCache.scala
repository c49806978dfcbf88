package graft.pipeline

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fingerprint-keyed artifact cache (reference artifacts/fingerprints.py +
  * artifacts/registry.py): a task's report is reusable iff nothing it
  * depends on changed — the config closure (sources, streams, dataset,
  * the task definition itself) and the stat snapshot of every filesystem
  * input (size + mtime per file, like the reference's
  * `file:{size}:{mtime_ns}` states). Any drift — an edited YAML, a
  * re-written parquet, a version bump — changes the sha256 and misses the
  * cache; identical inputs hit it and skip the whole Spark job.
  *
  * Layout: `<cacheDir>/<taskId>/<fingerprint>/report.parquet`. Entries are
  * immutable (the fingerprint IS the content key), so concurrent readers
  * need no locking; writes go through a temp dir + atomic rename.
  */
object ArtifactCache {

  /** Bump when task semantics change without a config change (reference
    * ARTIFACT_CACHE_VERSION).
    */
  val CacheVersion = 1

  private[graft] def sha256Hex(canonical: String): String =
    MessageDigest.getInstance("SHA-256")
      .digest(canonical.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  private def fileState(p: Path): String =
    if (!Files.isRegularFile(p)) "missing"
    // nanosecond mtime (the reference's file:{size}:{mtime_ns} contract):
    // a same-size rewrite within one millisecond must still change the key
    else "file:" + Files.size(p) + ":" +
      Files.getLastModifiedTime(p).to(java.util.concurrent.TimeUnit.NANOSECONDS)

  /** Stat snapshot of one fs path. Directory-shaped tables (multi-file
    * parquet, hive-partitioned layouts) walk RECURSIVELY: every regular file
    * under the directory contributes `relpath:file:size:mtime_ns`, and
    * subdirectory names contribute too, so a rewritten part file inside a
    * partition subdir — or an added/removed partition — changes the key.
    * Missing paths snapshot as "missing" (never an NPE — a fingerprint of
    * an absent input is a legitimate state that simply never matches a
    * fitted artifact). `private[graft]` because train-if-missing artifact
    * owners outside this package (operators/BigramLm) key on the same walk.
    */
  private[graft] def pathState(p: Path): String =
    if (Files.isDirectory(p)) {
      import scala.jdk.CollectionConverters._
      scala.util.Using.resource(Files.walk(p)) { walk =>
        walk.iterator().asScala.filter(_ != p).toSeq
          .map(f => p.relativize(f).toString -> f).sortBy(_._1)
          .map { case (rel, f) =>
            if (Files.isDirectory(f)) s"$rel:dir"
            else s"$rel:${fileState(f)}"
          }.mkString(",")
      }
    } else fileState(p)

  /** Stat snapshot of every source input under `dataDir`, sorted by source
    * id. Freshness is FS-ONLY (the reference contract is the same —
    * fingerprints.py stats local files): `synthetic` sources are fully
    * described by their config (start/end/frequency live in the SourceDef
    * rendering); `http` sources digest the STAGED local copy's CONTENT when
    * one exists — every run re-fetches (new mtime), so a stat snapshot
    * would self-invalidate forever, while a byte digest hits on identical
    * payloads and misses exactly when the payload changed. A changed remote
    * payload that was never re-staged still goes unseen (documented).
    */
  private[pipeline] def sourceState(s: Config.SourceDef, dataDir: String): String =
    s.transport match {
      case "fs" =>
        val p = if (s.path.startsWith("/")) java.nio.file.Paths.get(s.path)
                else java.nio.file.Paths.get(dataDir, s.path)
        s.id + "|" + s.path + "|" + pathState(p) + "|"
      case "http" =>
        val staged = java.nio.file.Paths.get(
          graft.sources.Http.stagedPath(s.path, s.id, s.format))
        val state =
          if (Files.isRegularFile(staged))
            "sha256:" + MessageDigest.getInstance("SHA-256")
              .digest(Files.readAllBytes(staged)).map("%02x".format(_)).mkString
          else "missing"
        s.id + "|" + s.transport + "|" + state + "|"
      case _ => s.id + "|" + s.transport + "|"
    }

  private def sourceStates(project: Config.Project, dataDir: String): String =
    project.sources.sortBy(_.id).map(sourceState(_, dataDir)).mkString

  /** sha256 over (cache version, task id, task/config closure, fs input
    * snapshots). Case-class `toString` is the canonical config rendering —
    * deterministic for a parsed project.
    */
  def fingerprint(project: Config.Project, dataDir: String,
                  taskId: String): String = {
    val task = project.tasks.find(_.id == taskId).getOrElse(
      throw new IllegalArgumentException(s"config: unknown task '$taskId'"))
    val canonical = Seq(
      s"v$CacheVersion", taskId, task.toString,
      project.sources.sortBy(_.id).mkString("|"),
      project.streams.sortBy(_.id).mkString("|"),
      project.dataset.map(_.toString).getOrElse(""),
      sourceStates(project, dataDir)
    ).mkString("|")
    sha256Hex(canonical)
  }

  /** Fingerprint of the whole dataset journey (sources + streams + dataset
    * + fs input snapshots) — the key for incremental materialize
    * (`graft.Cli materialize … --if-changed`).
    */
  def datasetFingerprint(project: Config.Project, dataDir: String): String = {
    val canonical = Seq(
      s"v$CacheVersion", "dataset",
      project.sources.sortBy(_.id).mkString("|"),
      project.streams.sortBy(_.id).mkString("|"),
      project.dataset.map(_.toString).getOrElse(""),
      // corpus-only projects materialize their curation journey, so its
      // definition is part of the incremental key too
      project.corpus.map(_.toString).getOrElse(""),
      sourceStates(project, dataDir)
    ).mkString("|")
    sha256Hex(canonical)
  }

  /** Fingerprint-keyed scalar-statistics cache — the artifact story applied
    * to PLAN-BUILD statistics (VERDICT r6: annIvf's stride needs the corpus
    * count, an extra full scan per invocation at 100 TB). The key is the
    * stat snapshot of the frame's backing files, so a repeat invocation
    * over an unchanged corpus reads one tiny JSON instead of scanning; any
    * rewritten/added/removed input file misses and recounts.
    *
    * Frames with no addressable input files (in-memory test frames, views)
    * compute uncached — correct, just not amortized.
    */
  def cachedCount(df: org.apache.spark.sql.DataFrame, cacheDir: Path): Long =
    cachedStat(df, cacheDir, "count")(df.count())

  /** Any Long plan-build statistic served through the same fingerprint
    * keying as [[cachedCount]] (e.g. annIvf's duplication probe): key =
    * canonicalized plan + input-file stats; non-local or unobservable
    * inputs bypass the cache.
    */
  def cachedStat(df: org.apache.spark.sql.DataFrame, cacheDir: Path,
                 name: String)(compute: => Long): Long = {
    val files = df.inputFiles.sorted
    if (files.isEmpty) return compute
    // Only LOCAL files have a freshness signal we can observe (mtime+size).
    // A non-file scheme (hdfs://, s3a://) or an unresolvable/missing path
    // would stat as a constant "missing", making the key stable regardless
    // of remote data changes — so any such input bypasses the cache and
    // computes directly instead of serving a potentially stale count.
    val states = files.map { f =>
      try {
        val uri = java.net.URI.create(f)
        val scheme = Option(uri.getScheme)
        if (scheme.exists(_ != "file")) None
        else {
          val p = java.nio.file.Paths.get(
            Option(uri.getPath).getOrElse(f))
          if (!Files.exists(p)) None else Some(f + "|" + fileState(p))
        }
      } catch { case _: Exception => None }
    }
    if (states.exists(_.isEmpty)) return compute
    // the key carries the CANONICALIZED plan too, not just the backing
    // files: two different frames over the same parquet (a filtered corpus
    // vs the full one) must not serve each other's statistic
    val plan = df.queryExecution.analyzed.canonicalized.toString
    cachedScalar(cacheDir, name,
      plan + "\n" + states.flatten.mkString("\n"))(compute)
  }

  /** Serve a Long statistic through `<cacheDir>/stats/<name>-<sha>.txt`:
    * hit = parse, miss = compute + atomic publish.
    */
  private[graft] def cachedScalar(cacheDir: Path, name: String,
                                  canonical: String)(compute: => Long): Long = {
    val fp = sha256Hex(canonical)
    val entry = cacheDir.resolve("stats").resolve(s"$name-$fp.txt")
    if (Files.exists(entry)) Files.readString(entry).trim.toLong
    else {
      val value = compute
      Files.createDirectories(entry.getParent)
      val tmp = entry.resolveSibling(
        s".$name-$fp-${java.util.UUID.randomUUID().toString.take(8)}.tmp")
      Files.writeString(tmp, value.toString)
      Files.move(tmp, entry, java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      value
    }
  }

  /** Serve `compute`'s report through the cache: a hit reads the stored
    * parquet without running the job; a miss computes, stores atomically,
    * and returns the stored copy. Returns (frame, hit?).
    */
  def cached(spark: SparkSession, cacheDir: Path, taskId: String,
             fp: String)(compute: => DataFrame): (DataFrame, Boolean) = {
    val entry = cacheDir.resolve(taskId).resolve(fp)
    val report = entry.resolve("report.parquet")
    if (Files.exists(report)) (spark.read.parquet(report.toString), true)
    else {
      // UNIQUE temp dir per writer: concurrent misses on one fingerprint
      // must not share a staging area (mode=overwrite would delete each
      // other's in-flight files and the rename could publish a truncated
      // entry). Each writer stages privately; the first atomic rename wins,
      // the loser discards its byte-equivalent copy.
      val tmp = cacheDir.resolve(taskId)
        .resolve(s".tmp-$fp-${java.util.UUID.randomUUID().toString.take(8)}")
      compute.write.mode("overwrite").parquet(
        tmp.resolve("report.parquet").toString)
      Files.createDirectories(entry.getParent)
      try Files.move(tmp, entry, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      catch {
        case _: java.nio.file.FileSystemException if Files.exists(report) =>
          // a concurrent run landed this fingerprint first — byte-equivalent
          // by construction; drop ours
          org.apache.commons.io.FileUtils.deleteQuietly(tmp.toFile)
      }
      (spark.read.parquet(report.toString), false)
    }
  }

  /** Generic train-if-missing artifact: the one copy of the
    * state-manifest discipline BigramLm pioneered and TokenizerCache
    * reuses (r15 review: the sha8 + Try-parse/compare/refit block had
    * been duplicated). `write` produces the artifact at
    * `<cacheRoot>/<sha(state)>/<artifactName>`; the manifest stores the
    * FULL state string (never a bare existence check) and is written
    * AFTER `write` succeeds, so a crash mid-train leaves an invalid
    * directory that simply refits; a corrupt manifest counts as stale.
    */
  def ensure(cacheRoot: String, state: String, artifactName: String)
            (write: Path => Unit): Path = {
    val dir = java.nio.file.Paths.get(cacheRoot, sha256Hex(state).take(16))
    def validAt(d: Path): Boolean =
      Files.exists(d.resolve("manifest.json")) &&
        Files.exists(d.resolve(artifactName)) &&
        scala.util.Try {
          val j = org.json4s.jackson.JsonMethods.parse(
            Files.readString(d.resolve("manifest.json")))
          (j \ "state") == org.json4s.JString(state)
        }.getOrElse(false)
    if (!validAt(dir)) {
      if (Files.exists(dir))
        System.err.println(s"[graft] artifact at $dir is stale — refitting")
      // Stage into a PRIVATE temp dir and atomically rename into place
      // (r15 advice): two JVMs racing on one cache dir (a Verify and a
      // Bench sharing /tmp/graft_scratch/tok_cache) must never interleave
      // write(artifact) with the manifest write — a valid manifest over a
      // half-written or mixed-generation artifact hydrates forever. With
      // the rename, a reader only ever sees a complete (artifact,
      // manifest) pair; the first rename wins and the loser's
      // byte-equivalent copy (same state fingerprint) is discarded.
      Files.createDirectories(dir.getParent)
      val tmp = dir.getParent.resolve(
        s".tmp-${dir.getFileName}-${java.util.UUID.randomUUID().toString.take(8)}")
      Files.createDirectories(tmp)
      write(tmp.resolve(artifactName))
      import org.json4s.JsonDSL._
      Files.writeString(tmp.resolve("manifest.json"),
        org.json4s.jackson.JsonMethods.pretty(
          org.json4s.jackson.JsonMethods.render(("state" -> state))))
      if (Files.exists(dir)) {
        // a stale generation occupies the slot: move it aside (rename is
        // atomic, so no reader ever sees a half-deleted dir) then delete
        val aside = dir.getParent.resolve(
          s".stale-${dir.getFileName}-${java.util.UUID.randomUUID().toString.take(8)}")
        try Files.move(dir, aside, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        catch { case _: java.nio.file.FileSystemException => () }
        org.apache.commons.io.FileUtils.deleteQuietly(aside.toFile)
      }
      try Files.move(tmp, dir, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      catch {
        case _: java.nio.file.FileSystemException if validAt(dir) =>
          // a concurrent run published this state first — keep theirs
          org.apache.commons.io.FileUtils.deleteQuietly(tmp.toFile)
      }
    }
    dir.resolve(artifactName)
  }
}
