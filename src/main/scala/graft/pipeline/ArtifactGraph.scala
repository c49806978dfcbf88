package graft.pipeline

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Artifact dependency graph + incremental build + hydration — the graft
  * twin of the reference's artifact planning subsystem
  * (artifacts/planning.py:40 ArtifactGraph, artifacts/fingerprints.py
  * calculate_artifact_hashes, artifacts/executor.py run_build_if_needed,
  * artifacts/hydration.py hydrate_runtime_artifacts).
  *
  * Where [[ArtifactCache]] is a flat whole-task fingerprint cache (any
  * project drift misses everything), this graph gives each declared task a
  * SCOPED fingerprint — only the stream/source closure that artifact
  * actually reads, plus the fingerprints of the artifacts it depends on —
  * and classifies per-artifact freshness as the reference does:
  *
  *  - '''missing''': never built, or its stored report files are gone
  *  - '''stale''':   its scoped fingerprint changed, or a stored report
  *                   file's stat drifted under it
  *  - '''outdated''': missing ∪ stale, propagated to transitive dependents
  *                   in topological order (planning.py freshness:409)
  *
  * A build then recomputes ONLY the outdated artifacts and '''hydrates'''
  * the rest — serves their stored reports with no Spark job — which is the
  * reference's core incremental story: ticks unchanged + scaler stale →
  * recompute the scaler alone.
  *
  * Dependency edges mirror specs.py ARTIFACT_DEFINITIONS and
  * planning.required_tick_artifacts, grounded in graft's task kinds:
  *
  *  - ticks                → (no dependencies)
  *  - scaler               → ticks tasks whose stream is in the closure of
  *                           the `scale: true` vectors' streams
  *  - metadata             → ticks tasks whose stream is in the closure of
  *                           ALL dataset vectors' streams (metadata carries
  *                           the reference's series-contract role)
  *  - coverage / matrix    → declared metadata tasks (reference
  *                           COVERAGE_STATS depends on VECTOR_METADATA)
  *
  * Scale posture: the graph is driver-side metadata over task ids — O(tasks)
  * strings and stats. Rebuilt dataset-stage artifacts share ONE assembly
  * plan (ConfigRuntime.runTasks localCheckpoints the assembled frame), so k
  * outdated tasks cost one shuffle, not k; hydrated artifacts cost a parquet
  * scan of their own report only.
  */
object ArtifactGraph {

  final case class Freshness(missing: Set[String], stale: Set[String],
                             outdated: Set[String])

  /** One stored report file: path relative to the artifacts root + the stat
    * snapshot taken right after the build (reference build.state
    * ArtifactFileFingerprint).
    */
  final case class FileState(relPath: String, size: Long, mtimeNs: Long)

  final case class ArtifactState(hash: String, files: Seq[FileState])

  final case class BuildResult(
      reports: Map[String, DataFrame],
      order: Seq[String],
      rebuilt: Seq[String],
      hydrated: Seq[String],
      freshness: Freshness)

  // ------------------------------------------------------------- graph

  /** Stream-id closure (each root stream plus everything it reads from,
    * transitively) and the source ids that feed it — the reference's
    * _stream_config_closure (fingerprints.py:114).
    */
  private[pipeline] def streamClosure(project: Config.Project,
                                      roots: Seq[String]): (Set[String], Set[String]) = {
    val streams = scala.collection.mutable.Set.empty[String]
    val sources = scala.collection.mutable.Set.empty[String]
    def visit(id: String): Unit = if (streams.add(id)) {
      project.stream(id).from match {
        case Config.FromSource(src)     => sources += src
        case Config.FromStream(s)       => visit(s)
        case Config.FromBroadcast(s, b) => visit(s); visit(b)
        case Config.FromAlign(inputs)   => inputs.foreach(visit)
      }
    }
    roots.foreach(visit)
    (streams.toSet, sources.toSet)
  }

  private def vectors(project: Config.Project): Seq[Config.VectorDef] =
    project.dataset.map(d => d.features ++ d.targets).getOrElse(Nil)

  /** Declared dependency edges, key → sorted dependency keys. */
  def dependencies(project: Config.Project): Map[String, Seq[String]] = {
    val ticksByStream = project.tasks.collect {
      case t: Config.TicksTask => t
    }
    val metadataIds = project.tasks.collect {
      case t: Config.MetadataTask => t.id
    }.sorted
    def ticksUnder(rootStreams: Seq[String]): Seq[String] = {
      val (streams, _) = streamClosure(project, rootStreams.distinct)
      ticksByStream.filter(t => streams.contains(t.stream)).map(_.id).sorted
    }
    project.tasks.map {
      case t: Config.TicksTask    => t.id -> Seq.empty[String]
      case t: Config.ScalerTask   =>
        t.id -> ticksUnder(vectors(project).filter(_.scale).map(_.stream))
      case t: Config.MetadataTask =>
        t.id -> ticksUnder(vectors(project).map(_.stream))
      case t: Config.CoverageTask => t.id -> metadataIds
      case t: Config.MatrixTask   => t.id -> metadataIds
    }.toMap
  }

  /** Dependency-respecting order over all declared tasks (reference
    * planning.topological_order), with cycle detection kept for safety even
    * though graft's structural edges cannot cycle.
    */
  def topoOrder(project: Config.Project,
                deps: Map[String, Seq[String]]): Seq[String] = {
    val ordered = scala.collection.mutable.ArrayBuffer.empty[String]
    val visited = scala.collection.mutable.Set.empty[String]
    val onPath = scala.collection.mutable.Set.empty[String]
    def visit(key: String): Unit = {
      if (onPath.contains(key))
        throw new IllegalArgumentException(
          s"config: artifact dependency cycle at '$key'")
      if (visited.add(key)) {
        onPath += key
        deps.getOrElse(key, Nil).foreach(visit)
        onPath -= key
        ordered += key
      }
    }
    project.tasks.map(_.id).foreach(visit)
    ordered.toSeq
  }

  /** Transitive dependents of `roots` among the declared tasks (reference
    * planning.dependents_of).
    */
  def dependentsOf(deps: Map[String, Seq[String]],
                   roots: Set[String]): Set[String] = {
    val dependents = scala.collection.mutable.Set.empty[String]
    var frontier = roots
    while (frontier.nonEmpty) {
      val next = deps.collect {
        case (k, ds) if !dependents.contains(k) && !roots.contains(k) &&
          ds.exists(frontier.contains) => k
      }.toSet
      dependents ++= next
      frontier = next
    }
    dependents.toSet
  }

  // ------------------------------------------------------------- hashes

  /** Per-artifact SCOPED fingerprints, keyed by task id — the reference's
    * calculate_artifact_hashes (fingerprints.py:250): sha256 over the cache
    * version, the task definition, the fingerprints of its dependencies,
    * the stream/source config closure the artifact reads, the dataset slice
    * it observes, and the stat snapshot of every source input in its
    * closure. A drift anywhere in that scope — and nowhere else — changes
    * the key.
    */
  def artifactHashes(project: Config.Project, dataDir: String,
                     deps: Map[String, Seq[String]]): Map[String, String] = {
    val snapshotCache = scala.collection.mutable.Map.empty[String, String]
    def snapshot(sourceId: String): String =
      snapshotCache.getOrElseUpdate(sourceId,
        ArtifactCache.sourceState(project.source(sourceId), dataDir))

    // scoped (config closure, source ids) per task — _artifact_inputs
    def inputs(task: Config.TaskDef): (String, Set[String]) = {
      val ds = project.dataset
      def closure(rootStreams: Seq[String], extra: String): (String, Set[String]) = {
        val (streamIds, sourceIds) = streamClosure(project, rootStreams.distinct)
        val streamDefs = project.streams.filter(s => streamIds.contains(s.id))
          .sortBy(_.id).mkString("|")
        val sourceDefs = project.sources.filter(s => sourceIds.contains(s.id))
          .sortBy(_.id).mkString("|")
        (s"$extra||$streamDefs||$sourceDefs", sourceIds)
      }
      // dataset-stage tasks scope WIDER than the reference's _artifact_inputs
      // because graft computes them differently: the reference fits its
      // scaler on the scaled series pre-assembly, graft's scaler/metadata
      // reports run on the POSTPROCESSED frame, whose surviving rows and
      // retained columns depend on every vector's stream AND the postprocess
      // thresholds — so all of those belong in the hash (a scaled-streams-
      // only scope would serve stale statistics after a non-scaled vector's
      // source or the row threshold changed)
      def datasetScope(t: Config.TaskDef): (String, Set[String]) = {
        val d = ds.get
        val post = t match {
          case m: Config.MatrixTask if m.stage != "postprocessed" => ""
          case c: Config.CoverageTask if c.stage != "postprocessed" => ""
          case _ => d.postprocess.toString
        }
        closure(vectors(project).map(_.stream),
          s"${d.cadence}|${d.sampleKeys.mkString(",")}|$post|" +
            s"${d.split.map(_.toString).getOrElse("")}|" +
            (d.features ++ d.targets).mkString("|"))
      }
      task match {
        case t: Config.TicksTask => closure(Seq(t.stream), "")
        case t => datasetScope(t)
      }
    }

    val hashes = scala.collection.mutable.Map.empty[String, String]
    topoOrder(project, deps).foreach { key =>
      val task = project.task(key)
      val depHashes = deps(key).map(d => s"$d=${hashes(d)}").mkString(",")
      val (scoped, sourceIds) = inputs(task)
      val snapshots = sourceIds.toSeq.sorted.map(snapshot).mkString
      val canonical = Seq(s"v${ArtifactCache.CacheVersion}", key,
        task.toString, depHashes, scoped, snapshots).mkString("|")
      hashes(key) = MessageDigest.getInstance("SHA-256")
        .digest(canonical.getBytes(StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString
    }
    hashes.toMap
  }

  // ------------------------------------------------------------- state

  private def stateFile(root: Path): Path = root.resolve("state.json")

  /** Persist the build state as JSON (reference build/state.py
    * save_build_state): one entry per built artifact with its scoped hash
    * and stored-file stats.
    */
  def saveState(root: Path, state: Map[String, ArtifactState]): Unit = {
    import graft.sources.Runs.jsonStr
    val entries = state.toSeq.sortBy(_._1).map { case (key, a) =>
      val files = a.files.map(f =>
        s"""{"path": ${jsonStr(f.relPath)}, "size": ${f.size}, "mtime_ns": ${f.mtimeNs}}""")
        .mkString("[", ", ", "]")
      s"""  ${jsonStr(key)}: {"hash": ${jsonStr(a.hash)}, "files": $files}"""
    }.mkString(",\n")
    Files.createDirectories(root)
    // unique temp per writer: two concurrent builds must not interleave
    // writes into one staging file (the move stays atomic either way)
    val tmp = stateFile(root).resolveSibling(
      s".state-${java.util.UUID.randomUUID().toString.take(8)}.json.tmp")
    Files.writeString(tmp, s"{\n$entries\n}\n")
    Files.move(tmp, stateFile(root),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  def loadState(root: Path): Map[String, ArtifactState] = {
    if (!Files.exists(stateFile(root))) return Map.empty
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val tree = mapper.readTree(Files.readString(stateFile(root)))
    import scala.jdk.CollectionConverters._
    tree.properties().asScala.map { e =>
      val files = e.getValue.get("files").elements().asScala.map { f =>
        FileState(f.get("path").asText(), f.get("size").asLong(),
          f.get("mtime_ns").asLong())
      }.toSeq
      e.getKey -> ArtifactState(e.getValue.get("hash").asText(), files)
    }.toMap
  }

  /** Stat snapshot of every regular file under a freshly-written report,
    * relative to the artifacts root.
    */
  private def statFiles(root: Path, reportDir: Path): Seq[FileState] = {
    import scala.jdk.CollectionConverters._
    scala.util.Using.resource(Files.walk(reportDir)) { walk =>
      walk.iterator().asScala.filter(Files.isRegularFile(_)).toSeq
        .map { f =>
          FileState(root.relativize(f).toString, Files.size(f),
            Files.getLastModifiedTime(f)
              .to(java.util.concurrent.TimeUnit.NANOSECONDS))
        }.sortBy(_.relPath)
    }
  }

  // ------------------------------------------------------------- freshness

  /** Classify every declared artifact (reference planning.freshness:356). */
  def freshness(root: Path, order: Seq[String],
                deps: Map[String, Seq[String]],
                hashes: Map[String, String],
                state: Map[String, ArtifactState]): Freshness = {
    val missing = scala.collection.mutable.Set.empty[String]
    val stale = scala.collection.mutable.Set.empty[String]
    order.foreach { key =>
      state.get(key) match {
        case None => missing += key
        case Some(a) if a.hash != hashes(key) => stale += key
        case Some(a) =>
          // stored stat drift: a report file rewritten/removed under the
          // state marks the artifact itself, not just its inputs
          a.files.find { f =>
            val p = root.resolve(f.relPath)
            !Files.isRegularFile(p) || Files.size(p) != f.size ||
              Files.getLastModifiedTime(p)
                .to(java.util.concurrent.TimeUnit.NANOSECONDS) != f.mtimeNs
          }.foreach { f =>
            if (Files.isRegularFile(root.resolve(f.relPath))) stale += key
            else missing += key
          }
      }
    }
    // propagate to dependents in topo order (dependency hashes folding into
    // the dependent's key already catch persisted-stale deps; propagation
    // also covers same-run invalidation before the dependent rebuilds)
    val outdated = scala.collection.mutable.Set.empty[String]
    outdated ++= missing ++= stale
    order.foreach { key =>
      if (!outdated.contains(key) && deps(key).exists(outdated.contains))
        outdated += key
    }
    Freshness(missing.toSet, stale.toSet, outdated.toSet)
  }

  // ------------------------------------------------------------- executor

  /** Plan + execute + hydrate (reference executor.run_build_if_needed):
    * classify freshness, rebuild ONLY outdated artifacts in dependency
    * order — all sharing one assembly plan — and hydrate every current
    * artifact from its stored report without a Spark job. State is saved
    * after each job so a crash mid-build leaves completed artifacts
    * reusable (reference _execute_build_jobs saves per job).
    */
  def build(spark: SparkSession, dataDir: String, project: Config.Project,
            root: Path, force: Boolean = false,
            out: java.io.PrintStream = System.out): BuildResult =
    // one build per artifacts root at a time (fail-fast, like the serve
    // root's execution lock): concurrent builds would race on state.json
    // and overwrite each other's report directories mid-write
    graft.sources.Hygiene.withFileLock(
      root.resolve("_system").resolve("artifacts.lock"),
      s"Another graft build is using artifacts root '$root'.") {
      buildLocked(spark, dataDir, project, root, force, out)
    }

  private def buildLocked(spark: SparkSession, dataDir: String,
                          project: Config.Project, root: Path, force: Boolean,
                          out: java.io.PrintStream): BuildResult = {
    require(project.tasks.nonEmpty, "config: project declares no tasks")
    val deps = dependencies(project)
    val order = topoOrder(project, deps)
    val hashes = artifactHashes(project, dataDir, deps)
    val state0 = loadState(root)
    val fresh = freshness(root, order, deps, hashes, state0)
    val toBuild = if (force) order.toSet else fresh.outdated
    out.println(s"artifact plan: rebuild [${order.filter(toBuild).mkString(", ")}]" +
      s" hydrate [${order.filterNot(toBuild).mkString(", ")}]" +
      s" (missing: ${fresh.missing.toSeq.sorted.mkString(", ")};" +
      s" stale: ${fresh.stale.toSeq.sorted.mkString(", ")})")

    // invalidated entries drop from the state BEFORE jobs run, so an
    // interrupted build can never serve a half-replaced artifact
    var state = state0 -- toBuild
    if (toBuild.nonEmpty) saveState(root, state)

    // ONE plan for every rebuilt task: runTasks localCheckpoints the shared
    // assembly, so per-task writes below reuse one shuffle
    val rebuiltAll =
      if (toBuild.isEmpty) None
      else Some(ConfigRuntime.runTasks(spark, dataDir, project,
        only = Some(toBuild)))

    // the rebuilt tasks' report writes are INDEPENDENT jobs over the one
    // checkpointed assembly — overlap them (guide §2.6) so the last
    // stragglers of one write back-fill cores for the next, instead of
    // paying five sequential job latencies. The shared checkpoint is
    // materialized up front by a cheap count so concurrent writes never
    // race its first materialization; state/marker updates serialize
    // under `stateLock` (each save persists every COMPLETED artifact, so
    // an interrupted build still never serves a half-replaced one).
    val stateLock = new Object
    def writeOne(key: String): Unit = {
      val reportDir = root.resolve(key).resolve("report.parquet")
      rebuiltAll.get.filter(col("task") === key)
        .write.mode("overwrite").parquet(reportDir.toString)
      stateLock.synchronized {
        state = state.updated(key,
          ArtifactState(hashes(key), statFiles(root, reportDir)))
        saveState(root, state)
        out.println(s"artifact $key rebuilt [${hashes(key).take(12)}]")
      }
    }
    val buildKeys = order.filter(toBuild)
    // first write runs alone — its action materializes the shared lazy
    // checkpoint exactly once; the remaining writes then read cached
    // blocks and are safe (and cheap) to overlap
    buildKeys.headOption.foreach(writeOne)
    graft.sources.Hygiene.overlap(
      buildKeys.drop(1).map(key => () => writeOne(key)): _*)
    val reports = order.map { key =>
      val reportDir = root.resolve(key).resolve("report.parquet")
      if (!toBuild(key))
        out.println(s"artifact $key hydrated [${hashes(key).take(12)}]")
      key -> spark.read.parquet(reportDir.toString)
    }.toMap

    BuildResult(reports, order,
      rebuilt = order.filter(toBuild),
      hydrated = order.filterNot(toBuild), freshness = fresh)
  }
}
