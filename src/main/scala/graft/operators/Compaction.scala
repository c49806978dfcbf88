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

  /** The stat-only plan: no data is read, only sizes. */
  def plan(dir: String, minFraction: Double = 0.5): CompactionPlan = {
    val files = dataFiles(Paths.get(dir))
    if (files.isEmpty) return CompactionPlan(Nil, Nil)
    val maxSize = files.map(Files.size).max
    val threshold = (maxSize * minFraction).toLong
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
                    minFraction: Double = 0.5): Result = {
    val p = plan(srcDir, minFraction)
    val out = Paths.get(outDir)
    // reset the output snapshot
    if (Files.isDirectory(out)) {
      val s = Files.list(out)
      try {
        val it = s.iterator()
        while (it.hasNext) Files.deleteIfExists(it.next())
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
    */
  def compactIncremental(spark: SparkSession, dir: String, targetRows: Long,
                         capRows: Long, minFraction: Double = 0.5): Result = {
    val p = plan(dir, minFraction)
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
    staged.zipWithIndex.foreach { case (f, i) =>
      Files.move(f,
        Paths.get(dir).resolve(s"part-compacted-$i-${f.getFileName}"))
    }
    p.undersized.foreach(Files.delete)
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
