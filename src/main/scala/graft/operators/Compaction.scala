package graft.operators

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.SparkSession

/** Incremental small-file compaction — the PRODUCTION shape of the
  * file-size governance sink_compacted proves by full rewrite: plan the
  * compaction from FILE STATS (an O(files) driver directory listing — no
  * data read), rewrite ONLY the undersized files into governed ones, and
  * leave compliant files byte-untouched. At 100 TB a full rewrite of a
  * mostly-compliant layout is almost all wasted IO; the incremental plan's
  * cost tracks the fragment volume alone.
  *
  * Classification is RELATIVE (undersized = below `minFraction` of the
  * largest data file) so the same rule holds at every scale factor without
  * a bytes constant tuned per corpus.
  */
object Compaction {

  final case class CompactionPlan(compliant: Seq[Path], undersized: Seq[Path])

  private def dataFiles(dir: Path): Seq[Path] = {
    val s = Files.list(dir)
    try {
      val it = s.iterator()
      val buf = scala.collection.mutable.ArrayBuffer.empty[Path]
      while (it.hasNext) {
        val p = it.next()
        val n = p.getFileName.toString
        if (Files.isRegularFile(p) && !n.startsWith(".") && !n.startsWith("_")
          && n.endsWith(".parquet")) buf += p
      }
      buf.toSeq.sortBy(_.getFileName.toString)
    } finally s.close()
  }

  /** The stat-only plan: no data is read, only sizes. The relative rule
    * alone has a blind spot: a directory that is ENTIRELY uniform fragments
    * (no governed file written yet) makes maxSize itself a fragment, every
    * file classifies compliant, and compaction no-ops on exactly the
    * worst-case layout. `minBytes` is the absolute floor that closes it —
    * a file below it is undersized regardless of the relative rule (0
    * keeps the pure relative behavior for already-governed layouts).
    */
  def plan(dir: String, minFraction: Double = 0.5,
           minBytes: Long = 0L): CompactionPlan = {
    val files = dataFiles(Paths.get(dir))
    if (files.isEmpty) return CompactionPlan(Nil, Nil)
    val maxSize = files.map(Files.size).max
    val threshold = math.max((maxSize * minFraction).toLong, minBytes)
    val (compliant, undersized) = files.partition(Files.size(_) >= threshold)
    CompactionPlan(compliant, undersized)
  }

  final case class Result(nInputFiles: Long, nCompliant: Long,
                          nUndersized: Long, rewrittenRows: Long,
                          nNewFiles: Long, compliantUntouched: Boolean)

  /** Link-forward incremental compaction: plan from `srcDir`'s file stats,
    * HARD-LINK every compliant file into `outDir` (O(files) metadata — the
    * bytes are never copied, proven by shared inodes), read ONLY the
    * undersized files and write them as ceil(rows/targetRows) governed
    * files beside the links. The source layout stays intact (snapshot
    * semantics — readers of the old dir are never disturbed), and the cost
    * of the pass tracks the fragment volume alone.
    */
  def compactLinked(spark: SparkSession, srcDir: String, outDir: String,
                    targetRows: Long, capRows: Long,
                    minFraction: Double = 0.5, minBytes: Long = 0L): Result = {
    val p = plan(srcDir, minFraction, minBytes)
    val out = Paths.get(outDir)
    // reset the output snapshot — RECURSIVE: an interrupted Spark write can
    // leave a _temporary subtree behind, and a flat one-level delete would
    // throw DirectoryNotEmptyException on it forever after
    if (Files.isDirectory(out)) {
      val s = Files.walk(out)
      try {
        import scala.jdk.CollectionConverters._
        s.sorted(java.util.Comparator.reverseOrder[Path]())
          .iterator().asScala
          .filterNot(_ == out)
          .foreach(Files.deleteIfExists(_))
      } finally s.close()
    }
    Files.createDirectories(out)
    p.compliant.foreach(f => Files.createLink(out.resolve(f.getFileName), f))
    val (rows, nNew) =
      if (p.undersized.isEmpty) (0L, 0L)
      else {
        val frag = spark.read.parquet(p.undersized.map(_.toString): _*)
        val n = frag.count()
        val k = math.max(1L, (n + targetRows - 1) / targetRows)
        frag.repartition(k.toInt)
          .write.mode("append")
          .option("maxRecordsPerFile", capRows)
          .parquet(outDir)
        (n, k)
      }
    val untouched = p.compliant.forall(f =>
      Files.isSameFile(f, out.resolve(f.getFileName)))
    Result(
      nInputFiles = (p.compliant.size + p.undersized.size).toLong,
      nCompliant = p.compliant.size.toLong,
      nUndersized = p.undersized.size.toLong,
      rewrittenRows = rows,
      nNewFiles = nNew,
      compliantUntouched = untouched)
  }

  /** Execute the incremental compaction in place: read ONLY the undersized
    * files, rewrite them as ceil(rows/targetRows) governed files appended
    * to the directory, delete the originals. Compliant files are never
    * opened — the returned `compliantUntouched` re-stats their mtimes to
    * prove it.
    *
    * NOT atomic for concurrent readers: staging outside the live dir keeps
    * the inconsistency window to the move+delete tail, but a reader landing
    * inside that window sees both the compacted copies and some original
    * fragments — duplicated rows. In-place compaction is for SINGLE-WRITER
    * directories with no concurrent readers; snapshot semantics for live
    * readers is [[compactLinked]]'s contract.
    *
    * CRASH-SAFE via a two-state marker protocol ([[recover]] runs first on
    * every pass): `.compact_pending` (first line: this pass's unique file
    * prefix; then the fragment names) is
    * written before any move — while it exists, originals are
    * authoritative and a recovery deletes partial `part-compacted-*` moves;
    * after ALL moves land it is atomically renamed to `.compact_commit` —
    * from then on the compacted files are authoritative and a recovery
    * finishes the listed deletes. No crash point loses or permanently
    * duplicates rows.
    */
  private val PendingMarker = ".compact_pending"
  private val CommitMarker = ".compact_commit"
  private val CompactedPrefix = "part-compacted-"

  /** Roll an interrupted in-place pass forward or back (see the marker
    * protocol above). Returns true if there was anything to recover.
    */
  def recover(dir: String): Boolean = {
    val d = Paths.get(dir)
    val pending = d.resolve(PendingMarker)
    val commit = d.resolve(CommitMarker)
    if (Files.exists(commit)) {
      // moves complete — compacted files authoritative; finish the deletes
      // (first marker line is the pass prefix, the rest the fragment names)
      Files.readAllLines(commit).stream().skip(1).forEach { n =>
        if (n.nonEmpty) Files.deleteIfExists(d.resolve(n))
      }
      Files.delete(commit)
      true
    } else if (Files.exists(pending)) {
      // moves possibly partial — originals authoritative; undo THIS pass's
      // moves (the recorded prefix — earlier passes' compacted files are
      // legitimate data and must survive)
      val prefix = Files.readAllLines(pending).get(0)
      dataFiles(d).filter(_.getFileName.toString.startsWith(prefix))
        .foreach(Files.delete(_))
      Files.delete(pending)
      true
    } else false
  }

  def compactIncremental(spark: SparkSession, dir: String, targetRows: Long,
                         capRows: Long, minFraction: Double = 0.5,
                         minBytes: Long = 0L): Result = {
    recover(dir)
    val p = plan(dir, minFraction, minBytes)
    val mtimes = p.compliant.map(f => f -> Files.getLastModifiedTime(f)).toMap
    if (p.undersized.isEmpty)
      return Result(p.compliant.size.toLong, p.compliant.size.toLong, 0L, 0L,
        0L, compliantUntouched = true)
    val frag = spark.read.parquet(p.undersized.map(_.toString): _*)
    val rows = frag.count()
    val nNew = math.max(1L, (rows + targetRows - 1) / targetRows)
    // stage the replacement files OUTSIDE the live dir, then move them in
    // and drop the originals — readers of the dir never see a half-state
    // with both copies
    val staging = Paths.get(dir).resolveSibling(
      Paths.get(dir).getFileName.toString + "_compact_staging").toString
    frag.repartition(nNew.toInt)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", capRows)
      .parquet(staging)
    val staged = dataFiles(Paths.get(staging))
    val pending = Paths.get(dir).resolve(PendingMarker)
    val commit = Paths.get(dir).resolve(CommitMarker)
    // per-pass prefix: recovery of an interrupted pass must not touch the
    // compacted files of earlier SUCCESSFUL passes
    val passPrefix =
      s"$CompactedPrefix${java.util.UUID.randomUUID().toString.take(8)}-"
    Files.write(pending,
      (passPrefix +: p.undersized.map(_.getFileName.toString))
        .mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    staged.zipWithIndex.foreach { case (f, i) =>
      Files.move(f, Paths.get(dir).resolve(s"$passPrefix$i-${f.getFileName}"))
    }
    // the authority flip: one atomic rename — before it, originals rule;
    // after it, the compacted files do
    Files.move(pending, commit,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    p.undersized.foreach(Files.delete)
    Files.delete(commit)
    // best-effort staging cleanup (markers etc.)
    val rest = Files.list(Paths.get(staging))
    try {
      val it = rest.iterator()
      while (it.hasNext) Files.deleteIfExists(it.next())
    } finally rest.close()
    Files.deleteIfExists(Paths.get(staging))
    val untouched = p.compliant.forall(f =>
      Files.getLastModifiedTime(f) == mtimes(f))
    Result(
      nInputFiles = (p.compliant.size + p.undersized.size).toLong,
      nCompliant = p.compliant.size.toLong,
      nUndersized = p.undersized.size.toLong,
      rewrittenRows = rows,
      nNewFiles = staged.size.toLong,
      compliantUntouched = untouched)
  }
}
