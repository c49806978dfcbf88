package graft

import java.nio.file.{Files, Path, Paths}

import graft.operators.Compaction

/** In-place incremental compaction (operators/Compaction.scala
  * compactIncremental) + the stat-plan edge cases the r11 advice named:
  * the uniform-fragment-swarm blind spot of the relative threshold, the
  * crash-recovery marker protocol, and the recursive snapshot reset.
  */
class CompactionSpec extends SparkSpec {

  private def scratch(name: String): Path = {
    val p = Paths.get(s"/tmp/graft_scratch/cmp_spec_$name")
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try {
        import scala.jdk.CollectionConverters._
        s.sorted(java.util.Comparator.reverseOrder[Path]())
          .iterator().asScala.foreach(Files.deleteIfExists(_))
      } finally s.close()
    }
    Files.createDirectories(p)
    p
  }

  private def parquets(d: Path): Seq[Path] = {
    val s = Files.list(d)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.filter { p =>
        val n = p.getFileName.toString
        n.endsWith(".parquet") && !n.startsWith(".") && !n.startsWith("_")
      }.toSeq.sortBy(_.getFileName.toString)
    } finally s.close()
  }

  /** One governed file + a fragment swarm, all from the region table. */
  private def fragmented(dir: Path): Unit = {
    val df = graft.sources.Tables.table(spark, "/root/testdata/sf0.001",
      "lineitem").limit(2000).localCheckpoint()
    df.coalesce(1).write.mode("overwrite").parquet(dir.toString)
    df.limit(200).repartition(4).write.mode("append").parquet(dir.toString)
  }

  test("compactIncremental: fragments absorbed, compliant files untouched") {
    val dir = scratch("inplace")
    fragmented(dir)
    val before = parquets(dir)
    val total = spark.read.parquet(dir.toString).count()
    val res = Compaction.compactIncremental(spark, dir.toString,
      targetRows = 10000, capRows = 10000)
    assert(res.compliantUntouched, "compliant files must never be opened")
    assert(res.nUndersized > 0 && res.nCompliant > 0)
    assert(res.nInputFiles == before.length.toLong)
    // content identical after the pass, fragments gone, markers cleaned
    assert(spark.read.parquet(dir.toString).count() == total)
    assert(parquets(dir).length.toLong == res.nCompliant + res.nNewFiles)
    assert(!Files.exists(dir.resolve(".compact_pending")))
    assert(!Files.exists(dir.resolve(".compact_commit")))
    // convergence: at most the single remainder file (the ceil tail of the
    // fragment rewrite) stays under the relative threshold
    val again = Compaction.compactIncremental(spark, dir.toString,
      targetRows = 10000, capRows = 10000)
    assert(again.nUndersized <= 1 && again.compliantUntouched)
    assert(spark.read.parquet(dir.toString).count() == total)
  }

  test("uniform fragment swarm: the absolute floor closes the relative blind spot") {
    val dir = scratch("uniform")
    graft.sources.Tables.table(spark, "/root/testdata/sf0.001", "lineitem")
      .limit(400).repartition(8).write.mode("overwrite").parquet(dir.toString)
    // relative-only rule: maxSize is itself a fragment -> everything
    // classifies compliant and the pass no-ops on the worst-case layout
    val rel = Compaction.plan(dir.toString, minFraction = 0.5)
    assert(rel.undersized.isEmpty, "the blind spot this test pins")
    // absolute floor: every uniform fragment goes undersized
    val floor = Compaction.plan(dir.toString, minFraction = 0.5,
      minBytes = 1024 * 1024)
    assert(floor.compliant.isEmpty && floor.undersized.length == 8)
    val total = spark.read.parquet(dir.toString).count()
    val res = Compaction.compactIncremental(spark, dir.toString,
      targetRows = 10000, capRows = 10000, minBytes = 1024 * 1024)
    assert(res.nUndersized == 8 && res.nNewFiles == 1)
    assert(spark.read.parquet(dir.toString).count() == total)
  }

  test("recovery: pending marker rolls back, commit marker rolls forward") {
    // pending state: a crash BEFORE the authority flip — this pass's
    // compacted files are partial and must be undone; originals (and an
    // earlier pass's compacted file) survive
    val dir = scratch("recover_pending")
    fragmented(dir)
    val originals = parquets(dir)
    val total = spark.read.parquet(dir.toString).count()
    val half = Files.createFile(
      dir.resolve("part-compacted-deadbeef-0-partial.parquet"))
    val older = Files.createFile(
      dir.resolve("part-compacted-11111111-0-old.parquet"))
    Files.writeString(dir.resolve(".compact_pending"),
      "part-compacted-deadbeef-\n" + originals.head.getFileName)
    assert(Compaction.recover(dir.toString))
    assert(!Files.exists(half), "this pass's partial move must be undone")
    assert(Files.exists(older), "earlier passes' compacted files must survive")
    assert(originals.forall(Files.exists(_)))
    Files.delete(older) // zero-byte stand-in, not readable parquet
    assert(spark.read.parquet(dir.toString).count() == total)

    // commit state: a crash AFTER the flip — the listed fragments must be
    // deleted (the compacted copies are authoritative)
    val dir2 = scratch("recover_commit")
    fragmented(dir2)
    val frag = Compaction.plan(dir2.toString).undersized.head
    Files.writeString(dir2.resolve(".compact_commit"),
      "part-compacted-cafecafe-\n" + frag.getFileName)
    assert(Compaction.recover(dir2.toString))
    assert(!Files.exists(frag), "committed deletes must finish")
    assert(!Files.exists(dir2.resolve(".compact_commit")))
    // nothing pending -> recover is a no-op
    assert(!Compaction.recover(dir2.toString))
  }

  test("compactLinked: snapshot reset survives a leftover _temporary subtree") {
    val src = scratch("linked_src")
    fragmented(src)
    val out = scratch("linked_out")
    // an interrupted Spark write leaves a non-empty subdirectory; the flat
    // one-level delete threw DirectoryNotEmptyException forever after
    Files.createDirectories(out.resolve("_temporary/0"))
    Files.createFile(out.resolve("_temporary/0/task.tmp"))
    val total = spark.read.parquet(src.toString).count()
    val res = Compaction.compactLinked(spark, src.toString, out.toString,
      targetRows = 10000, capRows = 10000)
    assert(res.compliantUntouched)
    assert(!Files.exists(out.resolve("_temporary")))
    assert(spark.read.parquet(out.toString).count() == total)
  }
}
