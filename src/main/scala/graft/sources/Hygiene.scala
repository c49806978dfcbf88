package graft.sources

import java.nio.channels.{FileChannel, OverlappingFileLockException}
import java.nio.file.{Files, Path, StandardOpenOption}
import java.util.UUID

import scala.jdk.CollectionConverters._

/** Workspace hygiene for run roots — the graft twin of the reference's
  * execution lock and temp-spill lifecycle (services/execution_lock.py:1,
  * services/temp_cleanup.py:1):
  *
  *  - [[withExecutionLock]] serializes commands that mutate one serve root: a
  *    second concurrent materialize fails FAST with a named error instead of
  *    corrupting `runs/` (OS file lock under `_system/execution.lock`, so it
  *    also guards across processes).
  *  - [[withSpillDirectory]] hands out `graft-sort-<uuid>` scratch dirs that
  *    hold a lock file while alive; [[cleanTempDirs]] sweeps orphans (dirs
  *    whose lock is free — their owner died) older than a cutoff and skips
  *    live ones, mirroring the reference's active-spill probe.
  */
object Hygiene {

  /** Another command holds the workspace (reference
    * ProjectExecutionBusyError).
    */
  final class ExecutionBusyException(msg: String) extends RuntimeException(msg)

  /** Run independent Spark actions concurrently (optimization guide §2.6:
    * actions are only sequential because the driver calls them
    * sequentially — overlapping independent jobs lets one job's task tail
    * back-fill cores the others freed). Callers must ensure the actions
    * are truly independent AND that any shared lazy localCheckpoint was
    * materialized by an earlier action — concurrent first-materialization
    * would compute the checkpoint twice. Blocks until all finish;
    * rethrows the first failure with its original type.
    */
  def overlap(actions: (() => Unit)*): Unit = {
    if (actions.sizeIs <= 1) { actions.foreach(_()); return }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(actions.size)
    try {
      val fs = actions.map(a => pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit = a()
      }))
      fs.foreach { f =>
        try f.get()
        catch {
          case e: java.util.concurrent.ExecutionException =>
            throw Option(e.getCause).getOrElse(e)
        }
      }
    } finally pool.shutdownNow()
  }

  val SpillDirPrefix = "graft-sort-"

  def executionLockPath(serveRoot: Path): Path =
    serveRoot.resolve("_system").resolve("execution.lock")

  /** Run `body` holding the serve root's exclusive execution lock; throw
    * [[ExecutionBusyException]] immediately if any process (or this one)
    * already holds it. `java.nio` file locks are held per-JVM, so the
    * same-process overlap surfaces as OverlappingFileLockException — mapped
    * to the same busy error.
    */
  def withExecutionLock[A](serveRoot: Path)(body: => A): A =
    withFileLock(executionLockPath(serveRoot),
      s"Another graft command is using serve root '$serveRoot'.")(body)

  /** Fail-fast exclusive lock on an arbitrary lock file (the artifact
    * builds lock their store with this, under a different file name than
    * the serve-root execution lock so `materialize --artifacts` pointing
    * both at one directory cannot self-deadlock).
    */
  def withFileLock[A](path: Path, busyMessage: String)(body: => A): A = {
    Files.createDirectories(path.getParent)
    val ch = FileChannel.open(path, StandardOpenOption.CREATE,
      StandardOpenOption.WRITE)
    val lock =
      try ch.tryLock()
      catch { case _: OverlappingFileLockException => null }
    if (lock == null) {
      ch.close()
      throw new ExecutionBusyException(busyMessage)
    }
    try body
    finally { lock.release(); ch.close() }
  }

  final case class TempDirCandidate(path: Path, sizeBytes: Long,
                                    ageSeconds: Double)
  final case class CleanResult(candidates: Seq[TempDirCandidate],
                               removed: Seq[Path], dryRun: Boolean) {
    def totalBytes: Long = candidates.map(_.sizeBytes).sum
  }

  /** Reference parse_age: a number with optional m / h / d suffix (default
    * hours) → milliseconds. None/empty → 0.
    */
  def parseAgeMs(value: Option[String]): Long = {
    val text = value.map(_.trim.toLowerCase).getOrElse("")
    if (text.isEmpty) return 0L
    val unit = text.last
    val numberText = if ("mhd".contains(unit)) text.dropRight(1) else text
    val amount =
      try numberText.toDouble
      catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          "age must be a number with optional m, h, or d suffix")
      }
    if (amount.isNaN || amount.isInfinite)
      throw new IllegalArgumentException("age must be finite")
    if (amount < 0)
      throw new IllegalArgumentException("age must not be negative")
    val perUnitMs = unit match {
      case 'm' => 60000.0
      case 'd' => 86400000.0
      case _   => 3600000.0
    }
    (amount * perUnitMs).toLong
  }

  private def spillLockPath(dir: Path): Path =
    dir.resolveSibling(s".${dir.getFileName}.lock")

  /** A scratch directory under `root` whose lock file is held while `body`
    * runs; the directory and lock are removed on exit (even on failure).
    */
  def withSpillDirectory[A](root: Path)(body: Path => A): A = {
    Files.createDirectories(root)
    val dir = root.resolve(s"$SpillDirPrefix${UUID.randomUUID().toString.replace("-", "")}")
    val lockPath = spillLockPath(dir)
    val ch = FileChannel.open(lockPath, StandardOpenOption.CREATE,
      StandardOpenOption.WRITE)
    val lock =
      try ch.tryLock()
      catch { case _: OverlappingFileLockException => null }
    if (lock == null) {
      ch.close()
      throw new IllegalStateException(s"Failed to acquire spill lock '$lockPath'.")
    }
    var created = false
    try {
      Files.createDirectory(dir)
      created = true
      body(dir)
    } finally {
      if (created) deleteRecursively(dir)
      lock.release(); ch.close()
      Files.deleteIfExists(lockPath)
    }
  }

  /** A spill dir whose lock file someone still holds is ACTIVE — never a
    * sweep candidate (reference _is_active_sort_spill).
    */
  private def isActive(dir: Path): Boolean = {
    val lockPath = spillLockPath(dir)
    if (!Files.isRegularFile(lockPath)) return false
    val ch =
      try FileChannel.open(lockPath, StandardOpenOption.WRITE)
      catch { case _: java.nio.file.NoSuchFileException => return false }
    try {
      val lock =
        try ch.tryLock()
        catch { case _: OverlappingFileLockException => null }
      if (lock == null) true else { lock.release(); false }
    } finally ch.close()
  }

  // java.nio directory streams hold a file descriptor until close() — every
  // traversal below is Using-wrapped so repeated sweeps in a long-lived JVM
  // can't exhaust fds.
  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p) && !Files.isSymbolicLink(p))
      scala.util.Using.resource(Files.list(p))(
        _.iterator().asScala.toSeq).foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }

  private def directorySize(p: Path): Long =
    scala.util.Using.resource(Files.walk(p)) { walk =>
      walk.iterator().asScala
        .filter(f => Files.isRegularFile(f) && !Files.isSymbolicLink(f))
        .map(Files.size).sum
    }

  /** Orphaned spill dirs under `root` older than `olderThanMs`, sorted by
    * path (reference find_temp_dirs).
    */
  def findTempDirs(root: Path, olderThanMs: Long = 0L): Seq[TempDirCandidate] = {
    if (!Files.isDirectory(root)) return Nil
    val now = System.currentTimeMillis()
    scala.util.Using.resource(Files.list(root))(_.iterator().asScala.toSeq)
      .filter(p => Files.isDirectory(p) && !Files.isSymbolicLink(p) &&
        p.getFileName.toString.startsWith(SpillDirPrefix))
      .filterNot(isActive)
      .flatMap { p =>
        val ageMs = math.max(0L, now - Files.getLastModifiedTime(p).toMillis)
        if (ageMs < olderThanMs) None
        else Some(TempDirCandidate(p, directorySize(p), ageMs / 1000.0))
      }
      .sortBy(_.path.toString)
  }

  /** Sweep orphaned spill dirs (reference clean_temp_dirs): `yes = false` is
    * a dry run that only reports candidates.
    */
  def cleanTempDirs(root: Path, olderThanMs: Long = 0L,
                    yes: Boolean = true): CleanResult = {
    val candidates = findTempDirs(root, olderThanMs)
    if (!yes) return CleanResult(candidates, Nil, dryRun = true)
    val removed = candidates.map { c =>
      deleteRecursively(c.path)
      Files.deleteIfExists(spillLockPath(c.path))
      c.path
    }
    CleanResult(candidates, removed, dryRun = false)
  }

  /** The serve root's scratch area (cleaned on every locked command). */
  def tempRoot(serveRoot: Path): Path =
    serveRoot.resolve("_system").resolve("tmp")

  /** Human sizes for the clean report (reference format_bytes). */
  def formatBytes(n: Long): String = {
    val units = Seq("B", "KiB", "MiB", "GiB", "TiB")
    var v = n.toDouble; var i = 0
    while (v >= 1024 && i < units.length - 1) { v /= 1024; i += 1 }
    if (i == 0) s"$n B" else f"$v%.1f ${units(i)}"
  }

  /** Human ages for the clean report (reference format_age). */
  def formatAge(seconds: Double): String =
    if (seconds < 60) f"${seconds}%.0fs"
    else if (seconds < 3600) f"${seconds / 60}%.1fm"
    else if (seconds < 86400) f"${seconds / 3600}%.1fh"
    else f"${seconds / 86400}%.1fd"
}
